package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // The engine's own tuned session (AQE, Kryo, broadcast threshold,
    // UTC) — benching a plain default session would measure plans the
    // library never actually runs with.
    val spark = GraftSession.local(cores = cpus)
    // Warm the JVM/codegen/parquet-reader paths and the FS cache so
    // per-query numbers measure the plans, not first-job init.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      // events needs the nanos-aware reader; a raw parquet read throws
      try (t match {
        case "events" => graft.sources.Tables.events(spark, sfDir)
        case n => graft.sources.Tables.load(spark, sfDir, n)
      }).count()
      catch { case _: Throwable => () }
    }
    // Best-of-3 per query: one timing run-to-run varies ±30% with
    // machine load (round 2's recorded bench was 2.5× inflated by a
    // competing process); the min of three is the outlier guard —
    // a load spike must hit all three passes to corrupt the number.
    var failed = List.empty[String]
    def once(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // visible breakage: a throwing query must not silently "score"
          // its time-to-crash as a fast benchmark result
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!failed.contains(name)) failed ::= name
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Ambient-load self-defense (rounds 2 and 3 both recorded numbers
    // inflated 1.5-3x by competing processes): snapshot /proc/loadavg
    // before and after, publish it IN the JSON so a recorded bench
    // carries its own validity evidence, and warn loudly when the box
    // wasn't idle so the run gets re-done instead of trusted.
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadStart = load1()
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> Seq.fill(3)(once(name, fn)).min
    }
    val loadEnd = load1()
    val hostCpus = Runtime.getRuntime.availableProcessors()
    if (math.max(loadStart, loadEnd) > hostCpus / 4.0)
      System.err.println(
        f"[bench] WARNING: 1-min load average $loadStart%.1f -> $loadEnd%.1f on $hostCpus CPUs " +
          "— the box was not idle; these timings are load-contaminated, re-run before recording")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","loadavg":{"start":$loadStart,"end":$loadEnd,"cpus":$hostCpus}}""")
    // Release the per-dir persisted bases (dup groups, postings,
    // quantized vectors): a long-lived driver crossing scale-factor
    // dirs must not accumulate caches forever.
    graft.sources.Memo.release(spark)
    spark.stop()
  }
}

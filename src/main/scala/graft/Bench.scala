package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    def load1(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // Five rounds recorded load-inflated numbers despite a warning —
    // don't just warn, WAIT for an idle window BEFORE the session
    // starts (the warmup itself raises the 1-min load): when load1 is
    // above cpus/8, sleep-and-retry (bounded), and mark the JSON
    // contaminated if no window ever appears.
    val idleBar = Runtime.getRuntime.availableProcessors() / 8.0
    var waits = 0
    while (load1() > idleBar && waits < 5) {
      System.err.println(
        f"[bench] load ${load1()}%.1f > $idleBar%.1f — waiting 60s for an idle window " +
          s"(${waits + 1}/5)")
      Thread.sleep(60000L)
      waits += 1
    }
    val startBusy = load1() > idleBar
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
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          // visible breakage: a throwing query must not record its
          // time-to-crash as if it were a healthy timing (round 9's 15
          // broken queries showed ~0.5 s entries that read as fast
          // passes) — NaN here, dropped from the map below
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!failed.contains(name)) failed ::= name
          Double.NaN
      }
    }
    // Ambient-load self-defense (rounds 2 and 3 both recorded numbers
    // inflated 1.5-3x by competing processes): snapshot /proc/loadavg
    // before and after, publish it IN the JSON so a recorded bench
    // carries its own validity evidence, and warn loudly when the box
    // wasn't idle so the run gets re-done instead of trusted.
    // Foreign-load measurement. Round 9's lesson inverted round 8's:
    // sampling loadavg right after a 32-core run ALWAYS trips the gate
    // (the bench's own work is still in the 1-min EMA), so the honest
    // flag had become an always-on flag. loadavg can't separate "we
    // were busy" from "someone else was busy" — jiffy counters can:
    // /proc/stat gives whole-box busy time, /proc/self/stat our own,
    // and the difference over the wall interval is exactly the average
    // number of cores OTHER processes burned while we measured.
    def boxJiffies(): (Long, Long) = { // (busy, total) incl. all cpus
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next().trim
        .split("\\s+").drop(1).map(_.toLong)
      val total = f.sum
      val idle = f(3) + (if (f.length > 4) f(4) else 0L) // idle + iowait
      (total - idle, total)
    }
    def selfJiffies(): Long = {
      // fields 14-17 of /proc/self/stat: utime stime cutime cstime
      // (comm can contain spaces — parse after the closing paren)
      val s = scala.io.Source.fromFile("/proc/self/stat").mkString
      val f = s.substring(s.lastIndexOf(')') + 2).split(" ")
      f(11).toLong + f(12).toLong + f(13).toLong + f(14).toLong
    }
    val hostCpus = Runtime.getRuntime.availableProcessors()
    val loadStart = load1()
    val (boxBusy0, boxTotal0) = boxJiffies()
    val self0 = selfJiffies()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val first = Seq.fill(3)(once(name, fn))
      // a >2x best-of-3 spread means at least one pass fought a load
      // spike (round 8 recorded untouched queries at 6-7x their idle
      // time this way); take three MORE passes so the recorded min
      // gets a chance at an uncontended window
      val good = first.filterNot(_.isNaN)
      val times =
        if (good.nonEmpty && good.min > 0 && good.max > 2.0 * good.min) {
          System.err.println(
            f"[bench] $name spread ${good.max / good.min}%.1fx over 3 passes — re-running")
          good ++ Seq.fill(3)(once(name, fn)).filterNot(_.isNaN)
        } else good
      name -> (if (times.isEmpty) Double.NaN else times.min)
    }.filterNot { case (_, t) => t.isNaN } // failed queries live in "failed", not the timing map
    val loadEnd = load1()
    val (boxBusy1, boxTotal1) = boxJiffies()
    val self1 = selfJiffies()
    // average cores of NON-bench work during the run; boxTotal delta is
    // hostCpus * HZ * wall jiffies, so no HZ constant needed
    val otherCores =
      if (boxTotal1 > boxTotal0)
        ((boxBusy1 - boxBusy0) - (self1 - self0)).max(0L).toDouble *
          hostCpus / (boxTotal1 - boxTotal0)
      else -1.0
    val contaminated = startBusy || otherCores > idleBar
    if (contaminated)
      System.err.println(
        f"[bench] WARNING: foreign processes averaged $otherCores%.1f cores during the run " +
          f"(bar $idleBar%.1f, load $loadStart%.1f -> $loadEnd%.1f on $hostCpus CPUs) " +
          "— these timings are load-contaminated, re-run before recording")
    // The driver snapshots only the LAST ~2000 chars of this process's
    // output (rounds 1-4 all recorded "parsed": null because the full-
    // precision 74-query map pushed the JSON line's start past that
    // window). Two-line defense: the complete per-query map goes on its
    // own line WITHOUT the "metric" marker (so a tail-truncated copy can
    // never be mistaken for the result line), and the final metric line
    // is capped at 1800 chars — per-query entries are kept slowest-first
    // until the budget runs out, so what survives is exactly the part a
    // perf reader needs.
    def f3(d: Double): String = f"$d%.3f"
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{\"per_query_sec\":{", ",", "}}"))
    val head = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":"""
    val tail = s""","failed":$failedJson,"sf":"$sfDir","loadavg":{"start":$loadStart,"end":$loadEnd,"cpus":$hostCpus,"other_cores":${f3(otherCores)}},"contaminated":$contaminated,"nqueries":${results.size}}"""
    val slowestFirst = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val budget = 1800 - head.length - tail.length - 2
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    slowestFirst.foreach { e =>
      if (used + e.length + 1 <= budget) { kept += e; used += e.length + 1 }
    }
    println(head + kept.mkString("{", ",", "}") + tail)
    // Release the per-dir persisted bases (dup groups, postings,
    // quantized vectors): a long-lived driver crossing scale-factor
    // dirs must not accumulate caches forever.
    graft.sources.Memo.release(spark)
    spark.stop()
  }
}

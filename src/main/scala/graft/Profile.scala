package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Optimization-round profiling harness (guide §1: measure first).
  *
  * Runs named [[SparkEntry.queries]] entries once each with a listener
  * attached, and prints per-query wall time, Spark job/stage/task
  * counts, and shuffle bytes — the numbers that decide WHERE the time
  * goes (job-count-bound lifecycle vs shuffle-bound scan). With
  * `-explain`, also writes each query's `.explain("formatted")` to
  * `plans/<tag>/<query>.txt` for plan-shape diffs.
  *
  * Usage: runMain graft.Profile [-explain tag] q1 q2 …  (or `all`)
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like the bench.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val (explainTag, names0) = args.toList match {
      case "-explain" :: tag :: rest => (Some(tag), rest)
      case rest => (None, rest)
    }
    val names = if (names0.isEmpty || names0 == List("all"))
      SparkEntry.queries.keys.toList else names0
    val spark = GraftSession.local(cores = cpus)
    // warmup identical to Bench so first-job init isn't charged to a query
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      try (t match {
        case "events" => graft.sources.Tables.events(spark, sfDir)
        case n => graft.sources.Tables.load(spark, sfDir, n)
      }).count()
      catch { case _: Throwable => () }
    }
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var inputBytes = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufRead += m.shuffleReadMetrics.totalBytesRead
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          inputBytes += m.inputMetrics.bytesRead
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)
    println(f"${"query"}%-28s ${"sec"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"in_MB"}%8s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          jobs = 0; stages = 0; tasks = 0; shufRead = 0L; shufWrite = 0L; inputBytes = 0L
          spark.sparkContext.setJobDescription(s"profile:$name")
          val t0 = System.nanoTime()
          try {
            val df = fn(spark, sfDir)
            df.count()
            val sec = (System.nanoTime() - t0) / 1e9
            // listener events are async; give the bus a moment to drain
            Thread.sleep(200)
            println(f"$name%-28s $sec%8.3f $jobs%5d $stages%6d $tasks%6d ${shufRead / 1e6}%9.1f ${shufWrite / 1e6}%9.1f ${inputBytes / 1e6}%8.1f")
            explainTag.foreach { tag =>
              val dir = java.nio.file.Paths.get(s"plans/$tag")
              java.nio.file.Files.createDirectories(dir)
              // re-build the plan WITHOUT executing (the lifecycle side
              // effects already ran above; queries are re-entrant)
              val planTxt = try df.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
              java.nio.file.Files.writeString(dir.resolve(s"$name.txt"), planTxt)
            }
          } catch {
            case e: Throwable =>
              println(f"$name%-28s   FAILED: ${e.getMessage}")
          } finally spark.sparkContext.setJobDescription(null)
      }
    }
    graft.sources.Memo.release(spark)
    spark.stop()
  }
}

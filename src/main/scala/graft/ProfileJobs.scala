package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job breakdown for one query: prints every Spark job's call site
  * and duration, so job-count-bound lifecycles (guide §1) can be
  * attributed line-by-line. Usage: runMain graft.ProfileJobs <query>. */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      try (t match {
        case "events" => graft.sources.Tables.events(spark, sfDir)
        case n => graft.sources.Tables.load(spark, sfDir, n)
      }).count()
      catch { case _: Throwable => () }
    }
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val fromProps = Option(js.properties).flatMap(p =>
          Option(p.getProperty("callSite.short")))
        val fromStage = js.stageInfos.lastOption.map(si =>
          si.name + " | " + si.details.linesIterator
            .filter(l => l.contains("graft") && !l.contains("ProfileJobs"))
            .take(2).mkString(" <- "))
        val site = fromProps.orElse(fromStage).getOrElse("?")
        starts.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, site) =>
          lines.add(f"job ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3fs  $site")
        }
      }
    })
    args.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        lines.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(s"===== $name  ${f"$sec%.3f"}s  ${lines.size} jobs =====")
        lines.forEach(println)
      }
    }
    graft.sources.Memo.release(spark)
    spark.stop()
  }
}

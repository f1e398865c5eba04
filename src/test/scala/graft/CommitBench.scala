package graft

import org.apache.spark.sql.functions._

/** Scratch: commit throughput over a long append chain (segmented
  * ledger). Not part of the suite. */
object CommitBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cb").toString
    val lake = new graft.sources.Lakehouse(spark, root)
    lake.createOrReplace(Seq((0L, "x")).toDF("k", "v"), "cb")
    // warm
    (1 to 20).foreach(i => lake.append(Seq((i.toLong, "x")).toDF("k", "v"), "cb"))
    val t0 = System.nanoTime()
    (21 to 320).foreach(i => lake.append(Seq((i.toLong, "x")).toDF("k", "v"), "cb"))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[commitbench] 300 appends in $sec%.1f s = ${300 / sec}%.1f commits/s; " +
      f"per-commit ${sec / 300 * 1000}%.0f ms")
    val segs = new java.io.File(s"$root/cb").listFiles.map(_.getName)
      .filter(_.startsWith("_snapshots")).sorted
    println(s"[commitbench] segments: ${segs.length}; rows=${lake.read("cb").count()}")
    spark.stop()
  }
}

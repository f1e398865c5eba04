package graft

import org.apache.spark.sql.functions._

/** Scratch: SPJ layout-load cost isolated (the round-13 judge's ask —
  * the SPJ lifecycle queries drifted ~+12% for two rounds and the
  * suspected cost was `spjLayout` re-computing manifest walks, ledger
  * reads, tombstone loads and conform materials on every load). Times
  * `spjLayout` COLD (cache cleared) vs WARM (the r14 layout cache) on
  * four table shapes: clean, tombstoned, evolved, mixed-layout.
  * Run: `sbt "Test/runMain graft.LayoutBench"`. Not part of the suite. */
object LayoutBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-lb").toString
    val lake = new graft.sources.Lakehouse(spark, root)

    def df(i: Long) = (i * 100 until i * 100 + 100)
      .map(j => (j, j % 7, s"x$j")).toDF("k", "g", "v")

    // CLEAN: 30-commit bucket(8,k) history
    lake.createOrReplace(df(0), "lb_clean", Seq("bucket(8,k)"))
    (1 to 29).foreach(i => lake.append(df(i.toLong), "lb_clean", Seq("bucket(8,k)")))
    // TOMBSTONED: same + 3 MoR deletes and an MoR update
    lake.createOrReplace(df(0), "lb_mor", Seq("bucket(8,k)"))
    (1 to 29).foreach(i => lake.append(df(i.toLong), "lb_mor", Seq("bucket(8,k)")))
    (0 to 2).foreach(r => lake.deleteWhereMor(pmod(col("k"), lit(97)) === r, "lb_mor"))
    lake.updateWhereMor(Seq("g" -> lit(99L)), col("k") === 5L, "lb_mor", Seq("bucket(8,k)"))
    // EVOLVED: rename + add + widen over the history
    lake.createOrReplace(df(0), "lb_evo", Seq("bucket(8,k)"))
    (1 to 14).foreach(i => lake.append(df(i.toLong), "lb_evo", Seq("bucket(8,k)")))
    lake.renameColumn("lb_evo", "v", "label")
    lake.addColumns("lb_evo", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.DoubleType))))
    (15 to 29).foreach(i => lake.append(
      df(i.toLong).withColumnRenamed("v", "label").withColumn("extra", lit(1.5)),
      "lb_evo", Seq("bucket(8,k)")))
    // MIXED: bucket(4) history + bucket(8) tail + unpartitioned deltas
    lake.createOrReplace(df(0), "lb_mix", Seq("bucket(4,k)"))
    (1 to 9).foreach(i => lake.append(df(i.toLong), "lb_mix", Seq("bucket(4,k)")))
    (10 to 19).foreach(i => lake.append(df(i.toLong), "lb_mix", Seq("bucket(8,k)")))
    (20 to 29).foreach(i => lake.append(df(i.toLong), "lb_mix"))

    def time(n: Int)(f: => Unit): Double = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / n
    }
    println(f"[layoutbench] ${"table"}%-9s ${"cold_ms"}%8s ${"warm_ms"}%8s (20 loads each)")
    Seq("lb_clean", "lb_mor", "lb_evo", "lb_mix").foreach { t =>
      val cold = time(20) {
        graft.sources.Lakehouse.spjLayoutCache.synchronized {
          graft.sources.Lakehouse.spjLayoutCache.clear()
        }
        lake.spjLayout(t)
      }
      val warm = time(20)(lake.spjLayout(t))
      println(f"[layoutbench] $t%-9s $cold%8.1f $warm%8.3f")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Partition-scoped compaction (`rewrite_data_files` with a row
  * filter): only stat-matching entries fold; everything else carries
  * by reference, byte-identical. The scale property: compaction cost
  * is O(matching dirs) — the hot partition folds, cold history is
  * never opened. */
class CompactWhereSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-cw").toString

  test("filter folds only matching range dirs; clean dirs carry by reference") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // four one-file dirs, disjoint k ranges
    lake.createOrReplace((0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1), "t")
    (1 to 3).foreach { d =>
      lake.append((d * 100 until (d + 1) * 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .repartition(1), "t")
    }
    val beforeRows = lake.read("t").collect().map(_.toString).sorted
    val preSnap = lake.currentSnapshot("t").get
    val before = Lakehouse.dataDirOpens.get()
    lake.compactWhere(col("k") < 250, "t")
    val opened = Lakehouse.dataDirOpens.get() - before
    // the fold opened the three matching dirs, never the clean one
    assert(opened === 3, s"expected 3 matching dirs opened, got $opened")
    // rows identical, dir count shrank 4 -> 2 (fold + carried)
    assert(lake.read("t").collect().map(_.toString).sorted.toSeq === beforeRows.toSeq)
    val entries = lake.snapshots("t").find(_._1 == lake.currentSnapshot("t").get).get._2
    assert(entries.length === 2, s"expected carried + folded, got $entries")
    // the clean dir carried BY REFERENCE: its entry name survives
    val preEntries = lake.snapshots("t").find(_._1 == preSnap).get._2
    assert(entries.toSet.intersect(preEntries.toSet).size === 1)
    // history still time-travels to the pre-compaction snapshot
    assert(lake.readSnapshot("t", preSnap).count() === 400)
  }

  test("no matching entries / one matching entry: no-op, no new snapshot") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 until 50).map(i => (i.toLong, i)).toDF("k", "x")
      .repartition(1), "t")
    lake.append((100 until 150).map(i => (i.toLong, i)).toDF("k", "x").repartition(1), "t")
    val snap = lake.currentSnapshot("t").get
    assert(lake.compactWhere(col("k") > 1000, "t") === snap)
    assert(lake.compactWhere(col("k") < 10, "t") === snap)
    assert(lake.currentSnapshot("t").get === snap)
  }

  test("partitioned table: only the matching partition's leaves fold") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => (i.toLong, Seq("a", "b")(i % 2))).toDF("k", "p")
    lake.createOrReplace(mk(0, 40), "t", partitionBy = Seq("p"))
    lake.append(mk(40, 80), "t", partitionBy = Seq("p"))
    val preRows = lake.read("t").collect().map(_.toString).sorted
    lake.compactWhere(col("p") === "b", "t", partitionBy = Seq("p"))
    assert(lake.read("t").collect().map(_.toString).sorted.toSeq === preRows.toSeq)
    val entries = lake.snapshots("t").find(_._1 == lake.currentSnapshot("t").get).get._2
    // both old p=a leaves carried by reference; the two p=b leaves folded
    val carried = entries.filter(_.contains("p=a"))
    assert(carried.length === 2, s"expected 2 carried p=a leaves, got $entries")
  }

  test("MoR tombstones materialize into the folded rows and stay applied") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1), "t")
    lake.append((100 until 200).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(1), "t")
    lake.deleteWhereMor(col("k") % 10 === 0, "t")
    assert(lake.read("t").count() === 180)
    lake.compactWhere(col("k") < 150, "t")
    assert(lake.read("t").count() === 180)
    assert(lake.read("t").where(col("k") % 10 === 0).count() === 0)
  }

  test("CALL system.rewrite_data_files with where => scopes through SQL") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 until 100).map(i => (i.toLong, i)).toDF("k", "x")
      .repartition(1), "cwt")
    lake.append((100 until 200).map(i => (i.toLong, i)).toDF("k", "x").repartition(1), "cwt")
    lake.append((200 until 300).map(i => (i.toLong, i)).toDF("k", "x").repartition(1), "cwt")
    lake.registerView("cwt")
    val r = spark.sql("CALL system.rewrite_data_files('cwt', where => 'k < 150')").head()
    assert(r.getLong(1) === 3 && r.getLong(2) === 2, s"files 3 -> 2, got $r")
    assert(spark.sql("SELECT count(*) FROM cwt").head().getLong(0) === 300)
    // filter + clustering strategy is a loud error, not a silent drop
    intercept[Exception] {
      spark.sql("CALL system.rewrite_data_files('cwt', strategy => 'sort', " +
        "sort_order => 'k', where => 'k < 150')").collect()
    }
  }
}

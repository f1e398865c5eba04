package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Runtime join filtering (dynamic file pruning): a dimension side's
  * collected join keys prune fact FILES through the stats/bloom
  * IN-list machinery before the scan — plan-time skipping a static
  * predicate can never provide. Scale property under test: the fact
  * scan opens only dirs whose key ranges can hold a collected key,
  * and plan time itself opens NO dirs (schema-only conjunct
  * analysis). Semantics: identical rows to the unpruned join. */
class RuntimeFilterSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-rtf").toString

  test("dim keys prune the fact scan to matching dirs only; join rows identical") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // four one-file dirs with disjoint key ranges
    lake.createOrReplace((0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .repartition(1), "fact")
    (1 to 3).foreach { d =>
      lake.append((d * 100 until (d + 1) * 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
        .repartition(1), "fact")
    }
    val dim = Seq((120L, "x"), (150L, "y"), (199L, "z")).toDF("dk", "tag")
    val before = Lakehouse.dataDirOpens.get()
    val pruned = lake.readJoinPruned("fact", "k", dim, "dk")
    val rows = pruned.join(dim, col("k") === col("dk")).collect()
    val opened = Lakehouse.dataDirOpens.get() - before
    assert(opened === 1, s"all dim keys live in dir 2 of 4; opened $opened dirs")
    // identical to the unpruned join
    val want = lake.read("fact").join(dim, col("k") === col("dk")).collect()
    assert(rows.map(_.toString).sorted.toSeq === want.map(_.toString).sorted.toSeq)
    assert(rows.length === 3)
  }

  test("over the key cap: no pruning, same rows (semantics never depend on the cap)") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 until 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"), "fact")
    val dim = (0 until 40).map(i => (i.toLong * 2, i)).toDF("dk", "i")
    val capped = lake.readJoinPruned("fact", "k", dim, "dk", maxKeys = 5)
      .join(dim, col("k") === col("dk")).count()
    val plain = lake.read("fact").join(dim, col("k") === col("dk")).count()
    assert(capped === plain && plain === 25)
  }

  test("empty / all-NULL dim keys: inner join is empty, zero fact dirs opened") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "v"), "fact")
    val nullDim = Seq((Option.empty[Long], "a"), (Option.empty[Long], "b")).toDF("dk", "tag")
    assert(lake.readJoinPruned("fact", "k", nullDim, "dk")
      .join(nullDim, col("k") === col("dk")).count() === 0)
  }

  test("q_runtime_filter lifecycle equals the plain-join recomputation; pruned = 1") {
    val out = graft.operators.Medallion.qRuntimeFilter(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val orders = graft.sources.Tables.orders(spark, sf)
    val lineitem = graft.sources.Tables.lineitem(spark, sf)
    val b = orders.agg(max(col("o_orderkey"))).head().getLong(0) / 4
    val dim = orders.where(col("o_orderkey") <= b && col("o_orderstatus") === "F")
      .select("o_orderkey")
    val want = lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double")).head()
    assert(out("pruned") === 1.0, "the join should have opened exactly one of four dirs")
    assert(out("n") === want.getLong(0).toDouble)
    assert(out("revenue") === want.getDouble(1))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Lakehouse, Tables}
import graft.sources.spj.GraftSpjCatalog

/** Copy-on-write row-level operations on the SPJ catalog
  * ([[graft.sources.spj.GraftSpjRowLevelOp]]): Spark-native SQL
  * UPDATE / MERGE INTO / fallback DELETE planned through
  * `SupportsRowLevelOperations`, committed as a conditional entry swap
  * ([[Lakehouse.replaceEntries]]). Every result is compared against
  * the equivalent DataFrame computation over the pre-op rows, and the
  * carry-by-reference property is asserted on raw file paths. */
class SpjRowLevelSpec extends SparkSpec {

  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def layoutPaths(lake: Lakehouse, table: String): Set[String] =
    lake.spjLayout(table).files.valuesIterator.flatten.map(_.path).toSet

  /** Leaf dir (path minus filename) of each file path. */
  private def leavesOf(paths: Set[String]): Set[String] =
    paths.map(p => p.take(p.lastIndexOf('/')))

  test("SQL UPDATE rewrites only stat-matching leaves; untouched leaves carry by reference") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-u").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    lake.createOrReplace(orders, "rl_u", Seq("bucket(8,o_custkey)"))
    val k0 = orders.select(col("o_custkey")).head().getLong(0)
    val before = layoutPaths(lake, "rl_u")
    withSpj(root, "rlc1") {
      spark.sql(
        s"UPDATE rlc1.rl_u SET o_totalprice = o_totalprice * 2 WHERE o_custkey = $k0")
      val expected = orders.select(col("o_orderkey"), col("o_custkey"),
        when(col("o_custkey") === k0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      assert(sortedRows(spark.table("rlc1.rl_u")) === sortedRows(expected))
      // carry-by-reference: only ONE bucket leaf was swapped out — the
      // static bucket pruning limited the CoW scan to k0's bucket
      val after = layoutPaths(lake, "rl_u")
      val removed = before -- after
      assert(removed.nonEmpty, "the touched bucket must be rewritten")
      assert(leavesOf(removed).size === 1,
        s"exactly one leaf should be rewritten, got: ${leavesOf(removed)}")
      assert((before -- removed).subsetOf(after),
        "every untouched file must carry by reference, byte-identical")
    }
  }

  test("SQL MERGE INTO: matched update + not-matched insert, runtime group filtering prunes to source buckets") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-m").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val target = (1L to 40L).map(k => (k, s"v$k", k * 10.0)).toDF("k", "v", "w")
    lake.createOrReplace(target, "rl_m", Seq("bucket(8,k)"))
    val before = layoutPaths(lake, "rl_m")
    withSpj(root, "rlc2") {
      Seq((7L, "upd", 1.0), (100L, "new", 2.0)).toDF("k", "v", "w")
        .createOrReplaceTempView("rl_src")
      spark.sql(
        """MERGE INTO rlc2.rl_m t USING rl_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.w = s.w
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val expected = (1L to 40L).map {
        case 7L => (7L, "upd", 1.0)
        case k => (k, s"v$k", k * 10.0)
      } :+ ((100L, "new", 2.0))
      assert(sortedRows(spark.table("rlc2.rl_m")) ===
        sortedRows(expected.toDF("k", "v", "w")))
      // runtime group filtering: the matched key (7) lives in one
      // bucket — only that leaf may be rewritten, every other leaf
      // carries (the insert lands in the fresh data dir regardless)
      val after = layoutPaths(lake, "rl_m")
      val removed = before -- after
      assert(leavesOf(removed).size <= 2,
        s"group filter should bound the rewrite to the source keys' buckets, got leaves: ${leavesOf(removed)}")
      assert((before -- removed).subsetOf(after))
    }
  }

  test("DELETE with a condition beyond the filter algebra falls back to CoW (was a loud refusal)") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-d").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val rows = (1L to 30L).map(k => (k, s"n$k")).toDF("k", "name")
    lake.createOrReplace(rows, "rl_d", Seq("bucket(4,k)"))
    withSpj(root, "rlc3") {
      // pmod() has no V1 Filter image -> SupportsDelete.canDeleteWhere
      // can never see it; the row-level CoW path must take over
      spark.sql("DELETE FROM rlc3.rl_d WHERE pmod(k, 3) = 0")
      val expected = (1L to 30L).filter(_ % 3 != 0).map(k => (k, s"n$k"))
      assert(sortedRows(spark.table("rlc3.rl_d")) ===
        sortedRows(expected.toDF("k", "name")))
    }
  }

  test("CoW DELETE of every row leaves an empty, readable table") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-e").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 10L).toDF("k"), "rl_e", Seq("bucket(4,k)"))
    withSpj(root, "rlc4") {
      spark.sql("DELETE FROM rlc4.rl_e WHERE pmod(k, 1) = 0") // all rows, untranslatable
      assert(lake.read("rl_e").count() === 0L)
    }
  }

  test("two-level identity x bucket layout: UPDATE by identity value rewrites only that identity's leaves") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-2").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val rows = (1L to 60L).map(k => (if (k % 3 == 0) "A" else "B", k, k * 1.5))
      .toDF("grp", "k", "w")
    lake.createOrReplace(rows, "rl_2", Seq("grp", "bucket(4,k)"))
    val before = layoutPaths(lake, "rl_2")
    withSpj(root, "rlc5") {
      spark.sql("UPDATE rlc5.rl_2 SET w = 0.0 WHERE grp = 'A'")
      val expected = rows.select(col("grp"), col("k"),
        when(col("grp") === "A", lit(0.0)).otherwise(col("w")).as("w"))
      assert(sortedRows(spark.table("rlc5.rl_2")) === sortedRows(expected))
      val removed = before -- layoutPaths(lake, "rl_2")
      assert(removed.nonEmpty)
      assert(leavesOf(removed).forall(_.contains("=A")),
        s"only grp=A leaves may be rewritten, got: ${leavesOf(removed)}")
    }
  }

  test("calendar x bucket layout: a day-scoped UPDATE rewrites only that day's leaves") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-cal").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val rows = (1L to 40L).map { k =>
      (k, java.sql.Timestamp.valueOf(s"2024-03-${10 + (k % 4)} 12:00:00"), k * 1.0)
    }.toDF("k", "ts", "w")
    lake.createOrReplace(rows, "rl_cal", Seq("days(ts)", "bucket(2,k)"))
    val before = layoutPaths(lake, "rl_cal")
    withSpj(root, "rlc7") {
      spark.sql(
        "UPDATE rlc7.rl_cal SET w = -1.0 WHERE ts >= TIMESTAMP '2024-03-12 00:00:00' " +
          "AND ts < TIMESTAMP '2024-03-13 00:00:00'")
      val expected = rows.select(col("k"), col("ts"),
        when(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-12 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-13 00:00:00")), lit(-1.0))
          .otherwise(col("w")).as("w"))
      assert(sortedRows(spark.table("rlc7.rl_cal")) === sortedRows(expected))
      // the temporal predicate bounded the CoW scan to the one day's
      // leaves through the per-file ts ledgers — the other three days
      // carry by reference
      val removed = before -- layoutPaths(lake, "rl_cal")
      assert(removed.nonEmpty)
      assert(leavesOf(removed).size <= 2,
        s"only 2024-03-12's (day, bucket) leaves may rewrite, got: ${leavesOf(removed)}")
      // the rewritten table still serves the calendar layout
      assert(lake.spjLayout("rl_cal").spec === Seq("days(ts)", "bucket(2,k)"))
    }
  }

  test("replaceEntries under a moved head: append-shaped commits merge; true conflicts refuse (r16)") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-c").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    // APPEND-SHAPED concurrency MERGES (Iceberg's validate-then-retry):
    // a staged REWRITE (entries removed) composes with a concurrent
    // append — nothing lost on either side
    val snap1 = lake.createOrReplace((1L to 8L).toDF("k"), "rl_c")
    val entry1 = lake.snapshots("rl_c").find(_._1 == snap1).get._2.head
    lake.append(Seq(9L).toDF("k"), "rl_c") // head moves
    lake.replaceEntries("rl_c", "main", snap1, Seq(entry1),
      (101L to 108L).toDF("k"), Nil)
    assert(lake.read("rl_c").collect().map(_.getLong(0)).sorted.toSeq ===
      (9L +: (101L to 108L)),
      "the merge must keep the concurrent append AND the rewrite")
    // a PURE-INSERT replace (nothing removed) must NOT merge: two
    // concurrent not-matched MERGE legs of the same absent key would
    // both land — serializable-or-fail, the client re-plans
    lake.append(Seq(10L).toDF("k"), "rl_c")
    intercept[graft.sources.CommitConflictException] {
      lake.replaceEntries("rl_c", "main", snap1, Seq.empty,
        Seq(999L).toDF("k"), Nil)
    }
    // TRUE conflict refuses: a MoR tombstone landed after the base
    // while entries are being REMOVED — merging would resurrect the
    // deleted rows under the rewrite's higher sequence
    val snapA = lake.createOrReplace((1L to 8L).toDF("k"), "rl_c2")
    val entryA = lake.snapshots("rl_c2").find(_._1 == snapA).get._2.head
    lake.deleteByKeyMor(Seq(3L).toDF("k"), "rl_c2")
    val e = intercept[graft.sources.CommitConflictException] {
      lake.replaceEntries("rl_c2", "main", snapA, Seq(entryA),
        Seq(99L).toDF("k"), Nil)
    }
    assert(e.getMessage.contains("moved"))
  }

  test("UPDATE on a branch namespace commits to the branch; main is untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft-rl-b").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val rows = (1L to 12L).map(k => (k, k * 1.0)).toDF("k", "w")
    val snap = lake.createOrReplace(rows, "rl_b", Seq("bucket(4,k)"))
    lake.createBranch("rl_b", "dev", snap)
    withSpj(root, "rlc6") {
      spark.sql("UPDATE rlc6.dev.rl_b SET w = -1.0 WHERE k = 5")
      assert(sortedRows(spark.table("rlc6.dev.rl_b")) === sortedRows(
        rows.select(col("k"), when(col("k") === 5, lit(-1.0)).otherwise(col("w")).as("w"))))
      assert(sortedRows(spark.table("rlc6.rl_b")) === sortedRows(rows),
        "main must still read the pre-update rows")
    }
  }
}

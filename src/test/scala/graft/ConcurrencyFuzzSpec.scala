package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Lakehouse
import graft.sources.spj.GraftSpjCatalog

/** CONCURRENCY fuzz (round-14 verdict ask #6; widened r16): the
  * optimistic-commit machinery (reserveSnap markers, conditional
  * commits, retryingCommit) is spec'd elsewhere with choreographed
  * races — here FIVE real threads race interleaved statements against
  * ONE table with no coordination beyond the engine's own: programmatic
  * appends, CoW updates, ALTER (adds + MoR deletes + RENAME COLUMN),
  * the DSv2 STATEMENT surface (UPDATE + update-only MERGE through
  * `cat.ct`), and a BRANCH-scoped writer. After quiescence the table
  * must show
  *  - NO LOST UPDATES: a counter column incremented N times by one
  *    thread lands at exactly seed + N on every row of its slice (a
  *    lost CoW rewrite under a racing append/delete/ALTER would show
  *    fewer) — the classic increment check;
  *  - NO TORN SCHEMA: every racing ADD COLUMNS is present exactly once,
  *    in some order, and the schema ledger carries one line per ALTER;
  *  - NO LOST STATEMENTS: every statement committed exactly one
  *    snapshot (ids unique, count exact);
  *  - LAYOUT CONTRACT intact: the table still SPJ-serves and both read
  *    paths agree row-for-row.
  * The threads' key domains are DISJOINT (appends ≥ 1000, updates
  * ≤ 50, deletes in 201..299), so the final state is order-independent
  * and exact whatever global serialization the commits win — which is
  * precisely what lets a single readout verify EVERY interleaving the
  * race produced. */
class ConcurrencyFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("six racing threads (DML, ALTER+RENAME, DSv2 UPDATE/MERGE, branch writer, VIEW DDL): exact invariants") {
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(
        java.util.concurrent.Executors.newFixedThreadPool(6))
    for (seed <- Seq(7, 42, 1337)) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-conc$seed").toString
      val lake = new Lakehouse(spark, root)
      val spec = Seq("bucket(4,k)")
      // seed: v = k so the increment check is exact per row
      val seedRows = (1L to 300L).map(k => (k, s"g${k % 4}", k.toDouble))
        .toDF("k", "grp", "v")
      lake.createOrReplace(seedRows, "ct", spec)
      lake.createBranch("ct", "side", lake.currentSnapshot("ct").get)
      spark.conf.set(s"spark.sql.catalog.conc$seed", classOf[GraftSpjCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.conc$seed.root", root)

      val nAppends = 6; val nUpdates = 8; val nAdds = 4; val nDeletes = 5
      val nSqlUpdates = 4; val nMerges = 2; val nBranch = 3
      val appender = Future {
        (1 to nAppends).foreach { i =>
          lake.append(
            ((1000L * i + 1) to (1000L * i + 10)).map(k => (k, "gx", k.toDouble))
              .toDF("k", "grp", "v"),
            "ct", spec)
        }
      }
      val updater = Future {
        (1 to nUpdates).foreach { _ =>
          lake.updateWhere(Seq("v" -> (col("v") + 1.0)), col("k") <= 50L, "ct")
        }
      }
      val alterer = Future {
        val rnd = new scala.util.Random(seed)
        val dels = (0 until nDeletes).map(i => Seq(201L + 2 * i, 202L + 2 * i))
        val adds = (1 to nAdds).map(i => s"extra_$i")
        // interleave the two kinds in a seed-shuffled order
        val ops: Seq[Either[String, Seq[Long]]] =
          rnd.shuffle(adds.map(Left(_)) ++ dels.map(Right(_)))
        ops.foreach {
          case Left(name) => lake.addColumns("ct",
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(name,
                org.apache.spark.sql.types.IntegerType))))
          case Right(keys) => lake.deleteWhereMor(col("k").isin(keys: _*), "ct")
        }
        // RENAME COLUMN races the tail of the mix — extra_1 is this
        // thread's own earlier add, so no other thread names it
        lake.renameColumn("ct", "extra_1", "extra_1r")
      }
      // the DSv2 STATEMENT surface races the programmatic one on the
      // SAME table: UPDATE and an update-only MERGE (schema-agnostic
      // legs — racing INSERT VALUES against ADD COLUMNS is an
      // analyzer-level column-count ambiguity, not an engine race)
      // statement-level retry on TRUE conflicts: the engine merges
      // append-shaped concurrent commits into a CoW write by itself
      // (replaceEntries' validate-then-retry), but a MoR tombstone
      // landing inside the rewritten entries is a genuine serialization
      // failure — the engine throws (never corrupts) and the CLIENT
      // re-runs the statement, which re-plans from the fresh snapshot
      // (the Iceberg client contract)
      def retrying(stmt: String): Unit = {
        var attempts = 0
        while (attempts >= 0) {
          try { spark.sql(stmt); attempts = -1 }
          catch {
            case e: Throwable
                if attempts < 30 && Iterator.iterate(e)(_.getCause)
                  .takeWhile(_ != null).take(8)
                  .exists(_.isInstanceOf[graft.sources.CommitConflictException]) =>
              attempts += 1
          }
        }
      }
      val dsv2 = Future {
        (1 to nSqlUpdates).foreach { _ =>
          retrying(s"UPDATE conc$seed.ct SET v = v + 2.0 WHERE k BETWEEN 101 AND 150")
        }
        (1 to nMerges).foreach { _ =>
          retrying(
            s"""MERGE INTO conc$seed.ct t
               |USING (SELECT explode(sequence(151L, 160L)) AS k) s
               |ON t.k = s.k
               |WHEN MATCHED THEN UPDATE SET v = t.v + 10.0""".stripMargin)
        }
      }
      // branch-scoped writer: its commits must NEVER leak into main
      val brancher = Future {
        (1 to nBranch).foreach { i =>
          lake.append(
            ((9000L + 10L * i) until (9010L + 10L * i)).map(k => (k, "gb", k.toDouble))
              .toDF("k", "grp", "v"),
            "ct", spec, branch = "side")
        }
      }
      // VIEW DDL thread (r17 — the topological registration +
      // re-registration hook is order-sensitive): CREATE OR REPLACE
      // of a base view over the racing table AND a dependent
      // view-over-view, interleaved, while every DML statement above
      // re-registers the reference closure
      val nViewOps = 3
      val vA = s"fzva_$seed"; val vB = s"fzvb_$seed"
      val viewer = Future {
        (1 to nViewOps).foreach { i =>
          lake.createSqlView(vA,
            s"SELECT k, grp, v + $i AS vv FROM conc$seed.ct", orReplace = true)
          lake.createSqlView(vB,
            s"SELECT count(1) AS n FROM $vA", orReplace = true)
        }
      }
      Await.result(Future.sequence(
        Seq(appender, updater, alterer, dsv2, brancher, viewer)), 600.seconds)

      val got = lake.read("ct")
      // NO LOST UPDATES: each disjoint slice took exactly its thread's
      // increments — programmatic CoW, DSv2 UPDATE, DSv2 MERGE
      def offsets(lo: Long, hi: Long): Seq[Double] =
        got.where(col("k").between(lo, hi))
          .select((col("v") - col("k")).as("off")).distinct().collect()
          .map(_.getDouble(0)).toSeq
      assert(offsets(1L, 50L) === Seq(nUpdates.toDouble),
        s"seed $seed: lost/duplicated programmatic update")
      assert(offsets(101L, 150L) === Seq(2.0 * nSqlUpdates),
        s"seed $seed: lost/duplicated DSv2 UPDATE")
      assert(offsets(151L, 160L) === Seq(10.0 * nMerges),
        s"seed $seed: lost/duplicated DSv2 MERGE")
      // exact cardinality: seed + appends - deletes (branch writes
      // stay on the branch)
      assert(got.count() === 300L + nAppends * 10 - nDeletes * 2)
      assert(got.where(col("k").between(201L, 201L + 2 * nDeletes - 1)).count() === 0)
      assert(got.where(col("k") >= 9000L).count() === 0,
        s"seed $seed: branch-scoped appends leaked into main")
      // the branch carries its seed rows plus ONLY its own appends
      assert(lake.read("ct", "side").count() === 300L + nBranch * 10)
      // NO TORN SCHEMA: all adds present exactly once, the rename
      // applied (extra_1 gone, extra_1r present), base columns intact
      val cols = got.columns.toSeq
      assert(cols.take(3) === Seq("k", "grp", "v"))
      assert(cols.drop(3).sorted ===
        ((2 to nAdds).map(i => s"extra_$i") :+ "extra_1r").sorted)
      // NO LOST STATEMENTS: one snapshot per statement, ids unique
      val snaps = lake.snapshots("ct").map(_._1)
      assert(snaps.distinct.length === snaps.length)
      assert(snaps.length === 1 + nAppends + nUpdates + nAdds + nDeletes +
        1 + nSqlUpdates + nMerges + nBranch,
        s"seed $seed: expected one snapshot per statement, got ${snaps.length}")
      // LAYOUT CONTRACT: still SPJ-servable, both read paths row-equal
      assert(lake.spjServableSpec("ct").nonEmpty,
        s"seed $seed: table lost SPJ servability under the race")
      assert(sortedRows(spark.table(s"conc$seed.ct")) === sortedRows(got),
        s"seed $seed: SPJ and ordinary reads diverge after the race")
      // VIEWS read the CURRENT base after quiescence. A racing ALTER
      // can leave the LAST capture stale (Spark validates captured V2
      // plans against the current schema — nullability flips count),
      // so first model the contract: the next statement's
      // registerView re-registers the reference closure fresh …
      lake.registerView("ct", spec)
      // … after which (whatever interleaving won) the LAST OR REPLACE
      // text is on file and the registration points at the post-race
      // table:
      assert(lake.sqlViews().map(_._1).toSet === Set(vA, vB),
        s"seed $seed: view ledger lost or duplicated a racing view")
      assert(spark.table(vA).count() === got.count(),
        s"seed $seed: base view went stale under the race")
      assert(spark.sql(s"SELECT n FROM $vB").head().getLong(0) === got.count(),
        s"seed $seed: dependent view went stale under the race")
      // … and a COLD catalog open restores both in dependency order
      Seq(vA, vB).foreach(v => scala.util.Try(spark.catalog.dropTempView(v)))
      graft.sources.LakehouseRegistry.unregister(spark, "ct")
      Lakehouse.openCatalog(spark, root)
      assert(spark.sql(s"SELECT n FROM $vB").head().getLong(0) === got.count(),
        s"seed $seed: cold restore lost the racing views")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Lakehouse, Tables}

/** The incrementally-maintained MinHash-LSH near-dup index
  * ([[Dedup.indexCreate]]/[[Dedup.indexRefresh]]): O(delta) refresh
  * reports exactly the pairs a from-scratch LSH run attributes to the
  * new batch, replays no-op, and the advanced index equals a fresh
  * build over the full corpus. */
class DedupIndexSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("one refresh reports the from-scratch pairs with a new side, exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix1").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    lake.createOrReplace(docs.where(col("doc_id") % 3 =!= 0), "nds")
    Dedup.indexCreate(lake, "nds")
    lake.append(docs.where(col("doc_id") % 3 === 0), "nds")
    val got = Dedup.indexRefresh(lake, "nds")
    // independent reference: the GROUP-level full-corpus pipeline
    // (dup-group collapse + prefix machinery - a different code path),
    // restricted to pairs with at least one delta side
    val want = Dedup.dedupMinhashLsh(spark, sf)
      .where(col("doc_a") % 3 === 0 || col("doc_b") % 3 === 0)
    assert(rows(got) === rows(want))
    assert(got.count() > 0, "testdata should contain cross-batch near-dups")
  }

  test("replay no-ops: same-snapshot refresh returns nothing and moves nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix2").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 200)
    lake.createOrReplace(docs.where(col("doc_id") % 2 === 0), "ndr")
    Dedup.indexCreate(lake, "ndr")
    lake.append(docs.where(col("doc_id") % 2 === 1), "ndr")
    val first = Dedup.indexRefresh(lake, "ndr").collect()
    val bandsSnaps = lake.snapshots("ndr_nd_bands").size
    // watermark == current snapshot: nothing to do, nothing committed
    assert(Dedup.indexRefresh(lake, "ndr").count() === 0)
    assert(lake.snapshots("ndr_nd_bands").size === bandsSnaps)
    // and the committed batch ids are exactly the two source snapshots
    assert(lake.committedBatches("ndr_nd_bands").size === 2)
    assert(first.nonEmpty || docs.count() > 0) // refresh itself ran
  }

  test("the advanced index equals a from-scratch build over the full corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix3").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 300)
    lake.createOrReplace(docs.where(col("doc_id") % 2 === 0), "nda")
    Dedup.indexCreate(lake, "nda")
    lake.append(docs.where(col("doc_id") % 2 === 1), "nda")
    Dedup.indexRefresh(lake, "nda")
    // fresh build of the SAME corpus in a second lake
    val root2 = java.nio.file.Files.createTempDirectory("graft-ndix3b").toString
    val lake2 = new Lakehouse(spark, root2)
    lake2.createOrReplace(docs, "nda")
    Dedup.indexCreate(lake2, "nda")
    assert(rows(lake.read("nda_nd_bands")) === rows(lake2.read("nda_nd_bands")))
    assert(rows(lake.read("nda_nd_posts").select(col("doc_id"), col("gs"))) ===
      rows(lake2.read("nda_nd_posts").select(col("doc_id"), col("gs"))))
  }

  test("streaming maintenance: commits land, pairs ledger fills, replays no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix5").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ndix5-ck").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    lake.createOrReplace(docs.where(col("doc_id") % 3 === 1), "ndm")
    Dedup.indexCreate(lake, "ndm")
    lake.append(docs.where(col("doc_id") % 3 === 2), "ndm")
    lake.append(docs.where(col("doc_id") % 3 === 0), "ndm")
    val q = graft.streaming.EventStream.maintainDedupIndex(spark, root, "ndm", ck)
    try q.awaitTermination(120000) finally q.stop()
    // index advanced to the source head; the pairs ledger holds the
    // admission readout of the maintained interval
    assert(lake.committedBatches("ndm_nd_bands").max ===
      lake.currentSnapshot("ndm").get)
    val ledger = lake.read("ndm_nd_pairs")
    assert(ledger.count() > 0)
    // a second pass over an unchanged source commits nothing
    val snaps = lake.snapshots("ndm_nd_pairs").size
    val q2 = graft.streaming.EventStream.maintainDedupIndex(spark, root, "ndm",
      java.nio.file.Files.createTempDirectory("graft-ndix5-ck2").toString)
    try q2.awaitTermination(120000) finally q2.stop()
    assert(lake.snapshots("ndm_nd_pairs").size === snaps)
  }

  test("CALL system.refresh_dedup_index advances the index through SQL") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix6").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 400)
    lake.createOrReplace(docs.where(col("doc_id") % 2 === 0), "ndq")
    lake.registerView("ndq")
    Dedup.indexCreate(lake, "ndq")
    lake.append(docs.where(col("doc_id") % 2 === 1), "ndq")
    val out = spark.sql("CALL system.refresh_dedup_index('ndq')").collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === lake.currentSnapshot("ndq").get)
    // the ledger holds the create-time bootstrap pairs PLUS this
    // step's new ones
    assert(lake.read("ndq_nd_pairs").count() >= out(0).getLong(1))
    // replay reports zero new pairs and commits nothing
    val again = spark.sql("CALL system.refresh_dedup_index('ndq')").collect()
    assert(again(0).getLong(1) === 0L)
  }

  test("admission decisions from the ledger equal a from-scratch global dedup") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix8").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    lake.createOrReplace(docs.where(col("doc_id") % 3 =!= 0), "ndad")
    Dedup.indexCreate(lake, "ndad")
    lake.append(docs.where(col("doc_id") % 3 === 0), "ndad")
    Dedup.indexMaintainStep(lake, "ndad")
    val got = Dedup.indexAdmission(lake, "ndad")
    // reference: components over the full-corpus group-level pipeline's
    // pairs (different code path), singletons labeled by left join
    val comp = Dedup.connectedComponents(
      Dedup.dedupMinhashLsh(spark, sf).select("doc_a", "doc_b"))
    val want = docs.select(col("doc_id"))
      .join(comp.select(col("doc_id"), col("rep_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep_id"), col("doc_id")).as("canonical_id"))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
    assert(rows(got) === rows(want))
    // the policy actually drops something at this sf
    assert(got.where(!col("keep")).count() > 0)
  }

  test("compacting the index tables preserves content and the watermark") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix7").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 300)
    lake.createOrReplace(docs.where(col("doc_id") % 2 === 0), "ndc")
    Dedup.indexCreate(lake, "ndc")
    lake.append(docs.where(col("doc_id") % 2 === 1), "ndc")
    Dedup.indexRefresh(lake, "ndc")
    val before = rows(lake.read("ndc_nd_bands"))
    val wm = lake.committedBatches("ndc_nd_bands").max
    // bin-pack the delta-append chain under the SAME bucket layout
    lake.compact("ndc_nd_bands", Seq(s"bucket(${Dedup.IndexBuckets},bkey)"))
    lake.compact("ndc_nd_posts", Seq(s"bucket(${Dedup.IndexBuckets},doc_id)"))
    assert(rows(lake.read("ndc_nd_bands")) === before)
    // the commit-batch watermark survives compaction: a refresh after
    // it still sees "nothing new" instead of re-deriving from zero
    assert(lake.committedBatches("ndc_nd_bands").max === wm)
    assert(Dedup.indexRefresh(lake, "ndc").count() === 0)
  }

  test("rewritten source interval rebuilds idempotently instead of crashing") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix4").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 150)
    lake.createOrReplace(docs.where(col("doc_id") % 2 === 0), "ndw")
    Dedup.indexCreate(lake, "ndw")
    // a REWRITE (not an append): the changes interval no longer exists
    lake.createOrReplace(docs, "ndw")
    assert(Dedup.indexRefresh(lake, "ndw").count() === 0)
    // index now serves the rewritten corpus: a fresh build agrees
    val root2 = java.nio.file.Files.createTempDirectory("graft-ndix4b").toString
    val lake2 = new Lakehouse(spark, root2)
    lake2.createOrReplace(docs, "ndw")
    Dedup.indexCreate(lake2, "ndw")
    assert(rows(lake.read("ndw_nd_bands")) === rows(lake2.read("ndw_nd_bands")))
  }

  test("pairs-ahead crash window: the next step finishes the advancement exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft-ndix5").toString
    val lake = new Lakehouse(spark, root)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .where(col("doc_id") < 400)
    val base = docs.where(col("doc_id") % 3 === 1)
    val d1 = docs.where(col("doc_id") % 3 === 2)
    val d2 = docs.where(col("doc_id") % 3 === 0)

    // honest twin: create -> step(d1) -> step(d2)
    lake.createOrReplace(base, "ndh"); Dedup.indexCreate(lake, "ndh")
    val boot = lake.read(Dedup.pairsTable("ndh")).localCheckpoint(true)
    lake.append(d1, "ndh"); Dedup.indexMaintainStep(lake, "ndh")
    val d1Pairs = lake.read(Dedup.pairsTable("ndh")).exceptAll(boot)
      .localCheckpoint(true)
    lake.append(d2, "ndh"); Dedup.indexMaintainStep(lake, "ndh")

    // crash twin: identical commits, but batch d1's step "dies" right
    // after the pairs ledger lands — the ONLY window the pairs-first
    // commit order leaves (ledger ahead, index watermark behind)
    lake.createOrReplace(base, "ndz"); Dedup.indexCreate(lake, "ndz")
    lake.append(d1, "ndz")
    val cur1 = lake.currentSnapshot("ndz").get
    lake.appendOnce(d1Pairs, Dedup.pairsTable("ndz"), batchId = cur1)
    // the next step recovers: index advances, nothing re-ledgered
    val (s1, n1) = Dedup.indexMaintainStep(lake, "ndz")
    assert(s1 === cur1 && n1 === 0L)
    // and the recovered index serves batch d2 exactly like the honest twin
    lake.append(d2, "ndz"); Dedup.indexMaintainStep(lake, "ndz")
    assert(rows(lake.read(Dedup.pairsTable("ndz"))) ===
      rows(lake.read(Dedup.pairsTable("ndh"))))
    assert(rows(lake.read(Dedup.bandsTable("ndz"))) ===
      rows(lake.read(Dedup.bandsTable("ndh"))))
    assert(rows(Dedup.indexAdmission(lake, "ndz")) ===
      rows(Dedup.indexAdmission(lake, "ndh")))
  }
}

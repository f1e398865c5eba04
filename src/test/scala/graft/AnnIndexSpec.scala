package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}
import graft.sources.Lakehouse

/** Persisted incremental ANN index: add-after-train correctness,
  * delta-priced refresh, idempotent replays, index-only querying. */
class AnnIndexSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("incremental refresh lands on the same index a one-shot assignment builds") {
    val root = freshDir("graft-annidx")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") % 2 === 0), "emb")
    AnnIndex.create(lake, "emb")
    lake.append(emb.where(col("vec_id") % 2 === 1), "emb")
    AnnIndex.refresh(lake, "emb")
    // the index's end state must equal a from-scratch assignment of the
    // FULL corpus to the SAME (half-corpus-trained) centroids
    val cents = AnnIndex.centroids(lake, "emb")
    val full = emb
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("v"))
      .withColumn("nsq", graft.functions.VectorFunctions.normSqQ(col("v")))
    val wantAssign = Similarity.assignCells2(full, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotAssign = lake.read(AnnIndex.assignTable("emb"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    assert(gotAssign === wantAssign, "incrementally built assignment diverged")
    assert(lake.read(AnnIndex.vectorsTable("emb")).count() === full.count())

    // refresh appended a delta dir; the create-time dir carried by reference
    val snaps = lake.snapshots(AnnIndex.assignTable("emb"))
    assert(snaps.size === 2)
    assert(snaps.head._2.forall(snaps.last._2.contains),
      "refresh must carry the original index dirs, not rewrite them")

    // replayed refresh against an unmoved source commits nothing
    AnnIndex.refresh(lake, "emb")
    assert(lake.snapshots(AnnIndex.assignTable("emb")).size === 2)
    assert(lake.snapshots(AnnIndex.vectorsTable("emb")).size === 2)

    // querying serves off the index: each corpus query finds itself first
    val got = AnnIndex.query(lake, "emb", emb.where(col("vec_id") < 5))
    val top1 = got.where(col("rnk") === 1).collect()
    assert(top1.length === 5)
    top1.foreach { r =>
      assert(r.getAs[Long]("vec_id") === r.getAs[Long]("q_id"), "self-match must rank first")
      assert(r.getAs[Double]("cosine") === 1.0)
    }
  }

  test("filtered index query: metadata carried into the vectors table gates candidates") {
    val root = freshDir("graft-annidx-filter")
    val lake = new Lakehouse(spark, root)
    val withLabel = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
    lake.createOrReplace(withLabel, "emb_f")
    AnnIndex.create(lake, "emb_f")
    // metadata landed beside the quantized vectors
    assert(lake.read(AnnIndex.vectorsTable("emb_f")).columns.contains("label"))
    val labels = withLabel.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val queries = withLabel.where(col("vec_id") < 5).select("vec_id", "embedding")
    val got = AnnIndex.query(lake, "emb_f", queries,
      filter = Some(col("label") === 3)).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => labels(r.getAs[Long]("vec_id")) == 3),
      "every served neighbor must satisfy the metadata filter")
  }

  test("streaming maintenance: new vectors become searchable as commits land") {
    val root = freshDir("graft-annidx-stream")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") < 30), "emb_st")
    AnnIndex.create(lake, "emb_st")
    lake.append(emb.where(col("vec_id") >= 30 && col("vec_id") < 50), "emb_st")
    lake.append(emb.where(col("vec_id") >= 50 && col("vec_id") < 60), "emb_st")
    val q = graft.streaming.EventStream.maintainAnnIndex(
      spark, root, "emb_st", freshDir("graft-annidx-stream-ck"))
    try q.awaitTermination(120000) finally q.stop()
    assert(lake.read(AnnIndex.vectorsTable("emb_st")).count() === 60)
    assert(lake.read(AnnIndex.assignTable("emb_st")).select("vec_id").distinct().count() === 60)
  }

  test("CALL system.refresh_ann_index advances the index through SQL") {
    val root = freshDir("graft-annidx-sql")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") < 30), "emb_sql")
    lake.registerView("emb_sql")
    AnnIndex.create(lake, "emb_sql")
    lake.append(emb.where(col("vec_id") >= 30 && col("vec_id") < 40), "emb_sql")
    val out = spark.sql("CALL system.refresh_ann_index('emb_sql')").collect()
    assert(out.length === 1 &&
      out(0).getLong(0) === lake.currentSnapshot("emb_sql").get)
    assert(lake.read(AnnIndex.vectorsTable("emb_sql")).count() === 40)
  }

  test("a crash between the two index-table commits heals on the next refresh") {
    val root = freshDir("graft-annidx-crash")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") < 30), "emb_cr")
    AnnIndex.create(lake, "emb_cr")
    lake.append(emb.where(col("vec_id") >= 30 && col("vec_id") < 45), "emb_cr")
    val cur = lake.currentSnapshot("emb_cr").get
    // simulate the torn refresh: the VECTORS table committed its delta
    // (batch id = source snapshot) but the process died before the
    // ASSIGNMENT table advanced
    val delta = lake.readChanges("emb_cr", lake.committedBatches(AnnIndex.vectorsTable("emb_cr")).max, cur)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("v"))
      .withColumn("nsq", graft.functions.VectorFunctions.normSqQ(col("v")))
    lake.appendOnce(delta, AnnIndex.vectorsTable("emb_cr"), batchId = cur)
    assert(lake.read(AnnIndex.vectorsTable("emb_cr")).count() === 45)
    assert(lake.read(AnnIndex.assignTable("emb_cr")).select("vec_id").distinct().count() === 30,
      "assignment is behind — the torn state under test")
    // the re-run refresh: vectors no-op (batch id committed), assignment catches up
    AnnIndex.refresh(lake, "emb_cr")
    assert(lake.read(AnnIndex.vectorsTable("emb_cr")).count() === 45, "no double-append")
    assert(lake.read(AnnIndex.assignTable("emb_cr")).select("vec_id").distinct().count() === 45)
    // and the healed index equals a clean one-shot assignment
    val cents = AnnIndex.centroids(lake, "emb_cr")
    val full = emb.where(col("vec_id") < 45)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("v"))
      .withColumn("nsq", graft.functions.VectorFunctions.normSqQ(col("v")))
    val want = Similarity.assignCells2(full, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lake.read(AnnIndex.assignTable("emb_cr"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet
    assert(got === want)
  }

  test("a source rewrite re-assigns against the SAME centroids (no silent retrain)") {
    val root = freshDir("graft-annidx-rw")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") < 40), "emb")
    val trained = AnnIndex.create(lake, "emb")
    // CoW delete rewrites the source's history
    lake.deleteWhere(col("vec_id") >= 30, "emb")
    AnnIndex.refresh(lake, "emb")
    val after = AnnIndex.centroids(lake, "emb")
    assert(after.map(_._1) === trained.map(_._1) &&
      after.zip(trained).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "centroids are an immutable artifact across refreshes")
    assert(lake.read(AnnIndex.vectorsTable("emb")).count() === 30,
      "rewritten source re-assigns to the surviving rows")
  }
}

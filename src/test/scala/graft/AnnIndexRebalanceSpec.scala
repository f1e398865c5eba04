package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.AnnIndex
import graft.sources.Lakehouse

/** Hot-cell REBALANCE of the persisted ANN index: split-in-place
  * against frozen parents, tree-descent assignment, torn-generation
  * healing, delta refresh through the split tree. */
class AnnIndexRebalanceSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  private def quantized(df: org.apache.spark.sql.DataFrame) = df
    .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("v"))
    .withColumn("nsq", VectorFunctions.normSqQ(col("v")))

  private def assignSet(lake: Lakehouse, src: String): Set[(Long, Long)] =
    lake.read(AnnIndex.assignTable(src)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"))).toSet

  test("forced split re-assigns only the hot cell; end state equals a tree replay") {
    val root = freshDir("graft-reb")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e")
    AnnIndex.create(lake, "e", nCells = 4)
    val before = assignSet(lake, "e")
    val split = AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue, forceTop = 1)
    assert(split.length === 1, "exactly the forced top-1 cell splits")
    val (parent, children) = split.head
    assert(children.length >= 2)
    val after = assignSet(lake, "e")
    // parent rows are gone; every other cell's rows are untouched
    assert(!after.exists(_._2 == parent))
    assert(before.filterNot(_._2 == parent) === after.filterNot(r => children.contains(r._2)),
      "a cell that did not split must not move")
    // the whole index equals one from-scratch (root-assign → descend) replay
    val want = AnnIndex.assignTree(lake, "e", quantized(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === want, "split-in-place diverged from the tree replay")
    // split parents stay in the centroids table, frozen
    assert(AnnIndex.centroids(lake, "e").exists(_._1 == parent))
  }

  test("a balanced index is a no-op; under-threshold cells never split") {
    val root = freshDir("graft-reb-noop")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e")
    AnnIndex.create(lake, "e", nCells = 4)
    assert(AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue) === Nil)
    assert(AnnIndex.splits(lake, "e") === Nil)
  }

  test("query serves from the leaves: every query still finds itself at rank 1") {
    val root = freshDir("graft-reb-q")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e")
    AnnIndex.create(lake, "e", nCells = 4)
    AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue, forceTop = 2)
    val got = AnnIndex.query(lake, "e", emb.where(col("vec_id") < 5), k = 10)
      .collect()
    assert(got.map(_.getAs[Long]("q_id")).distinct.length === 5)
    got.filter(_.getAs[Int]("rnk") == 1).foreach { r =>
      assert(r.getAs[Long]("vec_id") === r.getAs[Long]("q_id"),
        "a corpus vector probed into its own leaf must rank itself first")
    }
  }

  test("a torn generation (ledger committed, assignment rewrite lost) heals") {
    val root = freshDir("graft-reb-torn")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e")
    AnnIndex.create(lake, "e", nCells = 4)
    // pick the most-loaded cell and build the torn state BY HAND: the
    // children-centroids and split-ledger commits landed (the ids and
    // generation a real rebalance would derive), but the process died
    // before the assignment rewrite
    val counts = lake.read(AnnIndex.assignTable("e")).groupBy("cell").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = counts.maxBy(c => (c._2, -c._1))._1
    val gen = -(lake.currentSnapshot(AnnIndex.assignTable("e")).get + 1L)
    val pc = AnnIndex.centroids(lake, "e").find(_._1 == parent).get._2
    val kids = Seq(0, 1).map(i =>
      (1000000L + parent * 1024L + i, pc.map(x => x + (if (i == 0) -1L else 1L))))
    lake.appendOnce(
      spark.createDataFrame(kids.map { case (id, cv) => (id, cv.toSeq) }).toDF("cell", "cv"),
      AnnIndex.centroidsTable("e"), batchId = gen)
    lake.appendOnce(
      spark.createDataFrame(kids.map { case (id, _) => (parent, id, gen) })
        .toDF("parent", "child", "gen"),
      AnnIndex.splitsTable("e"), batchId = gen)
    assert(assignSet(lake, "e").exists(_._2 == parent), "torn: parent rows still live")
    // the next rebalance call heals the generation before anything else
    assert(AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue) === Nil)
    val after = assignSet(lake, "e")
    assert(!after.exists(_._2 == parent), "healed: parent rows descended + deleted")
    val want = AnnIndex.assignTree(lake, "e", quantized(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === want)
  }

  test("refresh after a rebalance assigns the delta through the split tree") {
    val root = freshDir("graft-reb-refresh")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb.where(col("vec_id") % 2 === 0), "e")
    AnnIndex.create(lake, "e", nCells = 4)
    AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue, forceTop = 1)
    lake.append(emb.where(col("vec_id") % 2 === 1), "e")
    AnnIndex.refresh(lake, "e")
    val after = assignSet(lake, "e")
    assert(after.map(_._1) === emb.collect().map(_.getLong(0)).toSet)
    // incremental (half-build → split → delta) ≡ one-shot tree replay
    val want = AnnIndex.assignTree(lake, "e", quantized(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === want)
    // replayed refresh no-ops (idempotent by batch id)
    val snaps = lake.snapshots(AnnIndex.assignTable("e")).size
    AnnIndex.refresh(lake, "e")
    assert(lake.snapshots(AnnIndex.assignTable("e")).size === snaps)
  }

  test("a rebuild clears the split tree: fresh codebook, all cells leaves") {
    val root = freshDir("graft-reb-rebuild")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e")
    AnnIndex.create(lake, "e", nCells = 4)
    AnnIndex.rebalance(lake, "e", maxLoad = Double.MaxValue, forceTop = 1)
    assert(AnnIndex.splits(lake, "e").nonEmpty)
    lake.append(emb.limit(0), "e") // move the source snapshot so create re-keys
    AnnIndex.create(lake, "e", nCells = 4)
    assert(AnnIndex.splits(lake, "e") === Nil)
  }

  test("CALL system.rebalance_ann_index splits through SQL and reports the children") {
    val root = freshDir("graft-reb-sql")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(emb, "e_sql")
    lake.registerView("e_sql")
    AnnIndex.create(lake, "e_sql", nCells = 4)
    val out = spark.sql(
      "CALL system.rebalance_ann_index('e_sql', max_load => '1000000000', force_top => 1)")
      .collect()
    assert(out.length === 1 && out(0).getLong(1) >= 2,
      "one split parent with its child count")
    assert(AnnIndex.splits(lake, "e_sql").map(_._1).distinct.length === 1)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse
import graft.streaming.EventStream

/** LAKE→LAKE CDC REPLICATION: the changelog stream source composed
  * with [[Lakehouse.applyChangesOnce]] — a follower lakehouse that
  * tracks a primary across appends, MoR deletes and MoR updates with
  * delta-priced batches and end-to-end exactly-once (snapshot-id
  * offsets + batch-id-idempotent applies). The Iceberg-style
  * replication topology with no full-table diff anywhere. */
class CdcReplicationSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def changelog(root: String, table: String) =
    spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root)
      .option("table", table)
      .option("cdc", "true")
      .load()

  private def state(lake: Lakehouse, table: String): Seq[(Long, String)] =
    lake.read(table).collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("replica follows the primary across append, MoR update and MoR delete") {
    import spark.implicits._
    val srcRoot = freshDir("graft-cdc-src")
    val dstRoot = freshDir("graft-cdc-dst")
    val ck = freshDir("graft-cdc-ck")
    val src = new Lakehouse(spark, srcRoot)
    val dst = new Lakehouse(spark, dstRoot)
    src.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "t")
    // checkpoint lives across sync() calls: each run resumes offsets
    def sync(): Unit = {
      val q = EventStream.replicateChanges(
        changelog(srcRoot, "t"), dst, "t", Seq("k"), checkpoint = Some(ck))
      try { q.awaitTermination() } finally q.stop()
    }
    sync()
    assert(state(dst, "t") === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "first batch seeds the replica with the full snapshot")
    // append + MoR update + MoR delete on the primary, then re-sync:
    // the replica must converge to the primary's exact state
    src.append(Seq((4L, "d")).toDF("k", "v"), "t")
    src.updateWhereMor(Seq("v" -> lit("B")), col("k") === 2L, "t")
    src.deleteWhereMor(col("k") === 3L, "t")
    sync()
    assert(state(dst, "t") === state(src, "t"))
    assert(state(dst, "t") === Seq((1L, "a"), (2L, "B"), (4L, "d")))
    // quiescent re-sync changes nothing (no empty-batch commits)
    val snaps = dst.snapshots("t").size
    sync()
    assert(dst.snapshots("t").size === snaps, "an idle sync must not commit")
  }

  test("multi-snapshot batch nets out insert+delete of the same key (no resurrection)") {
    import spark.implicits._
    val srcRoot = freshDir("graft-cdc-net")
    val src = new Lakehouse(spark, srcRoot)
    val v1 = src.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "t")
    // while the stream is DOWN: insert k=5, then MoR-delete it — the
    // catch-up interval spans both snapshots and the net change is nil
    src.append(Seq((5L, "x")).toDF("k", "v"), "t")
    src.deleteWhereMor(col("k") === 5L, "t")
    val vNow = src.currentSnapshot("t").get
    val batch = src.readChangesCdc("t", v1, vNow)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(!batch.contains((5L, "x", "insert")),
      s"a row inserted AND deleted within the interval must net out: $batch")
    assert(!batch.exists(_._1 == 5L), s"no change rows at all for the netted key: $batch")
    // and an update of a WITHIN-INTERVAL insert nets to one insert image
    src.append(Seq((6L, "y")).toDF("k", "v"), "t")
    src.updateWhereMor(Seq("v" -> lit("Y")), col("k") === 6L, "t")
    val batch2 = src.readChangesCdc("t", vNow, src.currentSnapshot("t").get)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(batch2 === Seq((6L, "Y", "insert")),
      s"insert-then-update in one interval = the new image only: $batch2")
  }

  test("applyChangesOnce is idempotent by batch id and refuses duplicate insert images") {
    import spark.implicits._
    val root = freshDir("graft-cdc-apply")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "r")
    val batch = Seq((2L, "b", "delete"), (2L, "B", "insert"), (9L, "z", "insert"))
      .toDF("k", "v", "_change_type")
    lake.applyChangesOnce(batch, "r", Seq("k"), batchId = 7L)
    assert(state(lake, "r") === Seq((1L, "a"), (2L, "B"), (9L, "z")))
    // replaying the same batch id commits nothing
    val snaps = lake.snapshots("r").size
    lake.applyChangesOnce(batch, "r", Seq("k"), batchId = 7L)
    assert(lake.snapshots("r").size === snaps)
    assert(state(lake, "r") === Seq((1L, "a"), (2L, "B"), (9L, "z")))
    // a pure delete batch removes its key
    lake.applyChangesOnce(Seq((9L, "z", "delete")).toDF("k", "v", "_change_type"),
      "r", Seq("k"), batchId = 8L)
    assert(state(lake, "r") === Seq((1L, "a"), (2L, "B")))
    // two insert images for one key fail loudly
    val dup = Seq((3L, "x", "insert"), (3L, "y", "insert")).toDF("k", "v", "_change_type")
    intercept[IllegalStateException](
      lake.applyChangesOnce(dup, "r", Seq("k"), batchId = 9L))
    // a non-changelog frame is refused
    intercept[IllegalArgumentException](
      lake.applyChangesOnce(Seq((1L, "a")).toDF("k", "v"), "r", Seq("k"), 10L))
  }

  test("replication keeps the replica's partition layout") {
    import spark.implicits._
    val srcRoot = freshDir("graft-cdc-part-src")
    val dstRoot = freshDir("graft-cdc-part-dst")
    val src = new Lakehouse(spark, srcRoot)
    val dst = new Lakehouse(spark, dstRoot)
    src.createOrReplace(
      Seq((1L, "us", "a"), (2L, "eu", "b")).toDF("k", "region", "v")
        .select(col("k"), col("v"), col("region")), "p")
    val q = EventStream.replicateChanges(
      changelog(srcRoot, "p"), dst, "p", Seq("k"), partitionBy = Seq("region"),
      checkpoint = Some(freshDir("graft-cdc-part-ck")))
    try { q.awaitTermination() } finally q.stop()
    // the replica's data dir carries region= leaves
    val dirs = new java.io.File(s"$dstRoot/p").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("data-"))
    assert(dirs.nonEmpty)
    val leaves = new java.io.File(s"$dstRoot/p/${dirs.head}").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(leaves.exists(_.startsWith("region=")), s"expected region= leaves, got $leaves")
  }
}

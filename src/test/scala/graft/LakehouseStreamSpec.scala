package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.sources.Lakehouse

/** Streaming reads OF the lakehouse (snapshot-offset tailing): the
  * table is now a streaming SOURCE as well as an exactly-once sink. */
class LakehouseStreamSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def readLake(root: String, table: String) =
    spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root)
      .option("table", table)
      .load()

  test("tailing a lakehouse table: full snapshot first, then per-append micro-batches") {
    import spark.implicits._
    val root = freshDir("graft-lstream")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t")
    val q = readLake(root, "t").writeStream
      .format("memory").queryName("lstream_tail")
      .option("checkpointLocation", freshDir("graft-lstream-ck"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lstream_tail").count() === 2, "first batch = full snapshot")
      lake.append(Seq((3L, "c")).toDF("k", "v"), "t")
      q.processAllAvailable()
      assert(spark.table("lstream_tail").count() === 3)
      lake.append(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), "t")
      q.processAllAvailable()
      val got = spark.table("lstream_tail").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 4L, 5L), "each append arrives exactly once")
    } finally q.stop()
  }

  test("restart resumes from the checkpointed snapshot; startSnapshot skips history") {
    import spark.implicits._
    val root = freshDir("graft-lstream2")
    val ck = freshDir("graft-lstream2-ck")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "t2")
    // memory sink refuses checkpoint recovery — collect via foreachBatch
    // (a recoverable sink) into a per-run buffer
    val run1 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q1 = readLake(root, "t2").writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => run1.add(r.getLong(0))); ()
      }.start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(run1.size === 1)
    // rows appended while the stream is DOWN...
    lake.append(Seq((2L, "b")).toDF("k", "v"), "t2")
    val run2 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = readLake(root, "t2").writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => run2.add(r.getLong(0))); ()
      }.start()
    try {
      q2.processAllAvailable()
      // ...arrive after restart, WITHOUT replaying the first snapshot
      // (SerializedOffset from the checkpoint parses back to a snap id)
      val got = run2.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      assert(got === Seq(2L), s"restart must emit only the new append, got $got")
    } finally q2.stop()
    // startSnapshot: tail from a given snapshot instead of full history
    val snapNow = lake.currentSnapshot("t2").get
    lake.append(Seq((3L, "c")).toDF("k", "v"), "t2")
    val q3 = spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", "t2")
      .option("startSnapshot", snapNow.toString)
      .load()
      .writeStream.format("memory").queryName("lstream_r3")
      .option("checkpointLocation", freshDir("graft-lstream3-ck")).start()
    try {
      q3.processAllAvailable()
      assert(spark.table("lstream_r3").collect().map(_.getLong(0)).toSeq === Seq(3L))
    } finally q3.stop()
  }

  test("a rewrite between micro-batches fails the stream loudly, never replays rows") {
    import spark.implicits._
    val root = freshDir("graft-lstream4")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t4")
    val q = readLake(root, "t4").writeStream
      .format("memory").queryName("lstream_fail")
      .option("checkpointLocation", freshDir("graft-lstream4-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("lstream_fail").count() === 2)
      // copy-on-write delete rewrites the data dir: not append-only
      lake.deleteWhere(col("k") === 1L, "t4")
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("append-only")),
        s"expected the incremental-read refusal, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("streaming ingestion into a hidden day-partitioned table prunes like batch") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val root = freshDir("graft-lhidden")
    val lake = new Lakehouse(spark, root)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = mem.toDF().toDF("id", "event_ts", "amount").writeStream
      .option("checkpointLocation", freshDir("graft-lhidden-ck"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        lake.appendOnce(batch, "ev_bronze", id, partitionBy = Seq("days(event_ts)")); ()
      }.start()
    try {
      mem.addData((1L, ts("2024-01-01 03:00:00"), 1.0), (2L, ts("2024-01-02 04:00:00"), 2.0))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-03 05:00:00"), 3.0))
      q.processAllAvailable()
      assert(lake.read("ev_bronze").count() === 3)
      assert(lake.read("ev_bronze").columns.toSet === Set("id", "event_ts", "amount"))
      val day2 = lake.readWhere(
        col("event_ts") >= lit(ts("2024-01-02 00:00:00")) &&
          col("event_ts") < lit(ts("2024-01-03 00:00:00")), "ev_bronze")
      assert(day2.collect().map(_.getLong(0)).toSeq === Seq(2L))
      assert(day2.inputFiles.length < lake.read("ev_bronze").inputFiles.length,
        "the day predicate must prune the other days' leaves")
    } finally q.stop()
  }

  test("tailing a hidden-partitioned table: appended day leaves stream clean-schema") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val root = freshDir("graft-lstream-hp")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(
      Seq((1L, ts("2024-01-01 01:00:00"))).toDF("id", "event_ts"),
      "hp", partitionBy = Seq("days(event_ts)"))
    val q = readLake(root, "hp").writeStream
      .format("memory").queryName("lstream_hp")
      .option("checkpointLocation", freshDir("graft-lstream-hp-ck")).start()
    try {
      q.processAllAvailable()
      lake.append(
        Seq((2L, ts("2024-02-05 09:00:00")), (3L, ts("2024-02-06 10:00:00")))
          .toDF("id", "event_ts"), "hp", partitionBy = Seq("days(event_ts)"))
      q.processAllAvailable()
      val got = spark.table("lstream_hp")
      assert(got.columns.toSet === Set("id", "event_ts"),
        "the hidden layout column must not leak into the stream")
      assert(got.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("default mode refuses MoR tombstones between batches (documented rule)") {
    import spark.implicits._
    val root = freshDir("graft-lstream-mor")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "m0")
    val q = readLake(root, "m0").writeStream
      .format("memory").queryName("lstream_mor0")
      .option("checkpointLocation", freshDir("graft-lstream-mor-ck")).start()
    try {
      q.processAllAvailable()
      lake.deleteWhereMor(col("k") === 1L, "m0")
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msg(t: Throwable): String =
        Option(t).map(x => x.getMessage + msg(x.getCause)).getOrElse("")
      assert(msg(e).contains("tombstones"),
        s"expected the tombstone refusal, got: ${e.getMessage}")
    } finally q.stop()
  }

  test("cdc mode: MoR deletes and updates stream as row-level change deltas") {
    import spark.implicits._
    val root = freshDir("graft-lstream-cdc")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "c1")
    val q = spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", "c1").option("cdc", "true")
      .load()
      .writeStream.format("memory").queryName("lstream_cdc")
      .option("checkpointLocation", freshDir("graft-lstream-cdc-ck")).start()
    try {
      q.processAllAvailable()
      val first = spark.table("lstream_cdc").collect()
      assert(first.length === 3 && first.forall(_.getString(2) === "insert"),
        "first batch = full snapshot as inserts")
      // MoR delete streams the deleted row's image
      lake.deleteWhereMor(col("k") === 2L, "c1")
      q.processAllAvailable()
      val afterDel = spark.table("lstream_cdc").where(col("_change_type") === "delete")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(afterDel === Seq((2L, "b")))
      // MoR update streams old image's delete + new image's insert
      lake.updateWhereMor(Seq("v" -> lit("C")), col("k") === 3L, "c1")
      q.processAllAvailable()
      val rows = spark.table("lstream_cdc").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(rows.count(_ == ((3L, "c", "delete"))) === 1, s"update delete image: $rows")
      assert(rows.count(_ == ((3L, "C", "insert"))) === 1, s"update new image: $rows")
      // plain appends still arrive as inserts
      lake.append(Seq((4L, "d")).toDF("k", "v"), "c1")
      q.processAllAvailable()
      val all = spark.table("lstream_cdc").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(all.contains((4L, "d", "insert")))
      // materializing the changelog reproduces the table state
      val inserts = all.filter(_._3 == "insert").map(t => (t._1, t._2))
      val deletes = all.filter(_._3 == "delete").map(t => (t._1, t._2))
      val state = inserts.filterNot(deletes.contains).sorted
      val want = lake.read("c1").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(state === want, s"changelog must reconstruct the table: $state vs $want")
      // a true rewrite still refuses in cdc mode
      lake.compact("c1")
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def msg(t: Throwable): String =
        Option(t).map(x => x.getMessage + msg(x.getCause)).getOrElse("")
      assert(msg(e).contains("rewrote data"))
    } finally q.stop()
  }

  test("lakehouse-to-lakehouse hop: streaming read + appendOnce sink is exactly-once") {
    import spark.implicits._
    val srcRoot = freshDir("graft-lsrc")
    val dstRoot = freshDir("graft-ldst")
    val src = new Lakehouse(spark, srcRoot)
    val dst = new Lakehouse(spark, dstRoot)
    src.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "bronze")
    dst.createOrReplace(Seq.empty[(Long, String)].toDF("k", "v"), "silver")
    val q = readLake(srcRoot, "bronze")
      .withColumn("v", upper(col("v")))
      .writeStream
      .option("checkpointLocation", freshDir("graft-lhop-ck"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        dst.appendOnce(batch, "silver", id); ()
      }
      .start()
    try {
      q.processAllAvailable()
      src.append(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), "bronze")
      q.processAllAvailable()
      val got = dst.read("silver").orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((1L, "A"), (2L, "B"), (3L, "C")))
    } finally q.stop()
  }

  test("maxSnapshotsPerBatch bounds a catch-up to N snapshots per micro-batch") {
    import spark.implicits._
    val root = freshDir("graft-lrate")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((0L, "s")).toDF("k", "v"), "t")
    val base = lake.currentSnapshot("t").get
    // five appends while no stream is running — the outage backlog
    (1L to 5L).foreach(i => lake.append(Seq((i, s"v$i")).toDF("k", "v"), "t"))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val q = spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", "t")
      .option("startSnapshot", base.toString) // tail: skip the bootstrap snapshot
      .option("maxSnapshotsPerBatch", "2")
      .load()
      .writeStream
      .option("checkpointLocation", freshDir("graft-lrate-ck"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(batch.collect().map(_.getLong(0)).sorted.toSeq); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val got = batches.toArray(Array.empty[Seq[Long]]).toSeq.filter(_.nonEmpty)
    // 5 backlogged append-snapshots drain as 2+2+1, never one giant batch
    assert(got.map(_.size) === Seq(2, 2, 1),
      s"expected the backlog to drain 2+2+1, got batches $got")
    assert(got.flatten.sorted === (1L to 5L), "rate limiting must not drop or repeat rows")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event routed into stateful sessionization. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

/** A closed (or batch-finalized) user session. */
case class UserSession(
    user_id: Long,
    session_id: Long,
    n_events: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp)

/** Carry-over state for an open streaming session. Original event
  * timestamps are carried (not reconstructed) so microsecond
  * precision survives into the emitted sessions. */
case class OpenSession(
    sessionId: Long, n: Long, start: java.sql.Timestamp, last: java.sql.Timestamp)

/** Structured Streaming over the events table: watermarked windowed
  * aggregation and stateful gap-sessionization.
  *
  * Streams mirror the batch operators (`q_events_hourly`,
  * `q_events_sessionize`) so a user can switch a batch report to a
  * live one without changing semantics: same grouping keys, same
  * 30-minute gap, same session numbering. State is per-key and
  * watermark-bounded — at 100 TB the state store holds one
  * [[OpenSession]] per active user, evicted by timeout, never the
  * event history.
  */
object EventStream {

  /** Streaming events reader, schema-aware like the batch twin
    * ([[graft.sources.Tables.events]]). A stream needs its schema
    * up-front, so peek at the parquet footer with a batch read and
    * branch on the physical `ts` encoding the driver actually wrote —
    * TIMESTAMP(NANOS) (LongType under `nanosAsLong`), TIMESTAMP_NTZ,
    * or session TIMESTAMP — normalizing all three to session-zone
    * TimestampType (UTC session: value-identical). The footer peek is
    * one driver-side metadata read, not a data scan. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // cached-schema load (graft.sources.Tables): avoids re-running the
    // schema-inference job on the immutable testdata file per call
    val footer = graft.sources.Tables.load(spark, dir, "events").schema
    val stream = spark.readStream
      .schema(footer)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(dir)
    footer("ts").dataType match {
      case LongType => stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
  }

  /** Tumbling-window hourly aggregate with a 1-hour watermark —
    * streaming twin of `q_events_hourly` (same column names and the
    * same decimal-exact sum). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** NATIVE session windows — the built-in `session_window(ts, gap)`
    * alternative to the custom `flatMapGroupsWithState` operator
    * ([[sessionizeStream]]): when the engine's session semantics fit
    * (strict gap boundary — an event landing EXACTLY gap after the
    * last one opens a NEW session; session end = last event + gap,
    * not last event), prefer this form — Catalyst owns the state
    * store layout, merging, and watermark eviction, and the same
    * expression runs batch or streaming unchanged. The custom
    * operator remains for the batch-twin-exact semantics
    * (`>`-boundary, ordinal session ids, max-ts session end) that the
    * relational oracle pins. Same mandate rule as everywhere:
    * built-in operator first, custom state only where semantics
    * demand it — this pair documents exactly where that line sits. */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Stream-into-lakehouse: commit each micro-batch of a streaming
    * DataFrame as an APPEND snapshot of a lakehouse table via
    * `foreachBatch`. Appends write only the batch's files plus a
    * manifest line, so commit cost is O(batch) regardless of table
    * size, and every micro-batch remains individually
    * time-travelable.
    *
    * EXACTLY-ONCE: the micro-batch id is recorded in the commit
    * metadata ([[graft.sources.Lakehouse.appendOnce]]), so a restart
    * that replays a batch (foreachBatch is at-least-once) finds the id
    * already committed and appends nothing — the same commit-metadata
    * dedup Iceberg's streaming writer does. Returns the started query
    * (caller awaits). */
  def streamToLakehouse(
      df: DataFrame,
      lake: graft.sources.Lakehouse,
      table: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { lake.appendOnce(batch, table, batchId); () }
      }
      .start()

  /** `stream_events_hourly` — a STREAM-EXECUTED driver query with a
    * cross-engine oracle: the events table is ingested by a REAL
    * Structured Streaming run (AvailableNow, `foreachBatch` →
    * exactly-once [[graft.sources.Lakehouse.appendOnce]] commits),
    * then the whole input is REPLAYED from a FRESH checkpoint — the
    * strongest dedup test, because every micro-batch re-fires with the
    * same batch ids and the commit ledger must no-op each one; a mere
    * same-checkpoint restart would skip them at the offset log and
    * never exercise the sink. The hourly rollup over the INGESTED
    * table must then be bit-equal to DuckDB's rollup over the raw
    * parquet (same shape as `q_events_hourly`), which pins
    * end-to-end that streaming ingestion lost nothing, duplicated
    * nothing, and preserved values exactly. `exactly_once = 1.0` is
    * the replay-invariance readout. At 100 TB this is the ingestion
    * contract: O(batch) commit cost, at-least-once delivery upstream,
    * exactly-once table state downstream. */
  def streamEventsHourlyOracle(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Lakehouse
    val root = java.nio.file.Files.createTempDirectory("graft-stream-ora").toString
    val lake = new Lakehouse(spark, root)
    def runOnce(): Unit = {
      val ck = java.nio.file.Files.createTempDirectory("graft-stream-ck").toString
      val q = readEvents(spark, dir).writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (!batch.isEmpty) { lake.appendOnce(batch, "ev_stream", batchId); () }
        }
        .start()
      q.awaitTermination()
    }
    runOnce()
    val n1 = lake.read("ev_stream").count()
    val snaps1 = lake.snapshots("ev_stream").size
    runOnce() // fresh checkpoint: full replay, same batch ids — must no-op
    val exactlyOnce =
      if (lake.read("ev_stream").count() == n1 &&
        lake.snapshots("ev_stream").size == snaps1) 1.0 else 0.0
    lake.read("ev_stream")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy(col("hour"), col("event_type"))
  }

  /** `stream_spj_tail` — LAKE→LAKE TAILING through the DSv2 CATALOG
    * surface ([[graft.sources.spj.GraftSpjMicroBatchStream]]):
    * `spark.readStream.table("cat.bronze")` — no provider string, no
    * options, the SQL-native streaming read every catalog user
    * expects — drains a bucket-layout bronze table into a silver
    * sink with exactly-once `appendOnce` commits. Three runs on ONE
    * checkpoint: bootstrap (full snapshot), delta (only the two
    * commits that landed in between — snapshot-id offsets plan the
    * appended dirs' files, never the table), and an idle run that
    * must move NOTHING (`exactly_once = 1.0` pins both row count and
    * sink snapshot count unchanged). The silver rollup must be
    * bit-equal to DuckDB over the raw parquet — the bronze→silver
    * hop of the reference's pipeline as a restartable stream. */
  def streamSpjTail(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Lakehouse
    import graft.sources.spj.GraftSpjCatalog
    val root = java.nio.file.Files.createTempDirectory("graft-sptail").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sptail-ck").toString
    val lake = new Lakehouse(spark, root)
    val orders = graft.sources.Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("price"))
    val spec = Seq("bucket(8,o_custkey)")
    // bronze starts at two commits; two more land between runs
    lake.createOrReplace(orders.where(col("o_orderkey") % 4 === 0), "sptail_bronze", spec)
    lake.append(orders.where(col("o_orderkey") % 4 === 1), "sptail_bronze", spec)
    val cat = s"graft_spj_tail_${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    // the silver side is DDL-created and stream-written THROUGH the
    // catalog too — the whole hop is reader `readStream.table` →
    // writer `writeStream.toTable`, zero foreachBatch plumbing
    spark.sql(s"""CREATE TABLE $cat.sptail_silver (
      |  o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
      |  price DECIMAL(12,2)) PARTITIONED BY (bucket(8, o_custkey))""".stripMargin)
    def drain(): Unit = {
      val q = spark.readStream.table(s"$cat.sptail_bronze").writeStream
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(s"$cat.sptail_silver")
      q.awaitTermination()
    }
    drain() // bootstrap
    lake.append(orders.where(col("o_orderkey") % 4 === 2), "sptail_bronze", spec)
    lake.append(orders.where(col("o_orderkey") % 4 === 3), "sptail_bronze", spec)
    drain() // delta only
    val n2 = lake.read("sptail_silver").count()
    val snaps2 = lake.snapshots("sptail_silver").size
    drain() // idle: must move nothing
    val exactlyOnce =
      if (lake.read("sptail_silver").count() == n2 &&
        lake.snapshots("sptail_silver").size == snaps2) 1.0 else 0.0
    lake.read("sptail_silver")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("total"))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy("o_orderstatus")
  }

  /** Streaming CDC UPSERT sink: each micro-batch MERGEs into the
    * lakehouse table on `keyCols` (source rows replace matches,
    * newcomers insert) — the shape a change-data-capture feed needs,
    * where a plain append would accumulate stale versions of every
    * key. EXACTLY-ONCE via the same batch-id commit ledger as the
    * append sink ([[graft.sources.Lakehouse.upsertOnce]]): a replayed
    * batch finds its id committed and changes nothing. Partition-
    * scoped when the table is partitioned — a micro-batch touching
    * one partition rewrites one partition. */
  def streamUpsertToLakehouse(
      df: DataFrame,
      lake: graft.sources.Lakehouse,
      table: String,
      keyCols: Seq[String],
      partitionBy: Seq[String] = Nil,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { lake.upsertOnce(batch, table, keyCols, batchId, partitionBy); () }
      }
      .start()

  /** LAKE→LAKE CDC REPLICATION: consume a lakehouse CHANGELOG stream
    * (the source's `cdc=true` mode — `_change_type` rows, MoR deletes
    * and updates included) and apply each micro-batch to a replica
    * table keyed on `keyCols` — inserts upsert, deletes remove, an
    * update's delete+insert pair collapses to its new image — via
    * [[graft.sources.Lakehouse.applyChangesOnce]] as ONE snapshot
    * commit per batch. End-to-end EXACTLY-ONCE: offsets are source
    * snapshot ids in the checkpoint, and the apply is idempotent by
    * batch id, so a crash anywhere replays into a no-op. The replica
    * follows the source across appends, MoR deletes and MoR updates
    * with delta-priced work per batch — the Iceberg-style replication
    * topology (primary lake → changelog → follower lake) with no
    * full-table diffs anywhere. */
  def replicateChanges(
      changelog: DataFrame,
      replicaLake: graft.sources.Lakehouse,
      table: String,
      keyCols: Seq[String],
      partitionBy: Seq[String] = Nil,
      checkpoint: Option[String] = None,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = changelog.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          replicaLake.applyChangesOnce(batch, table, keyCols, batchId, partitionBy); ()
        }
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** `stream_cdc_replicate` — [[replicateChanges]] AT THE DRIVER
    * SURFACE, the strongest streaming contract pinned cross-engine: a
    * primary lake seeds from orders, a follower lake replicates its
    * CDC changelog over one checkpoint across THREE runs (bootstrap;
    * a catch-up spanning an append + a MoR UPDATE + a MoR DELETE in
    * one interval; an idle run), and the readout rolls up the REPLICA.
    * `replica_exact = 1.0` iff the replica's full row multiset equals
    * the primary's (the in-engine hash-exact reconstruction check);
    * `exactly_once = 1.0` iff the idle run moved nothing (rows AND
    * sink snapshots). The oracle restates the net final state straight
    * from raw orders — so the changelog a replica applies provably
    * reproduces the primary's state, cross-engine, deletes included. */
  def streamCdcReplicate(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Lakehouse
    val srcRoot = java.nio.file.Files.createTempDirectory("graft-cdcr-src").toString
    val dstRoot = java.nio.file.Files.createTempDirectory("graft-cdcr-dst").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-cdcr-ck").toString
    val src = new Lakehouse(spark, srcRoot)
    val dst = new Lakehouse(spark, dstRoot)
    val orders = graft.sources.Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("price"))
    src.createOrReplace(orders.where(col("o_orderkey") % 7 =!= 0), "cdcr")
    def sync(): Unit = {
      val q = replicateChanges(
        spark.readStream
          .format("graft.streaming.LakehouseStreamProvider")
          .option("root", srcRoot).option("table", "cdcr")
          .option("cdc", "true").load(),
        dst, "cdcr", Seq("o_orderkey"), checkpoint = Some(ck))
      try q.awaitTermination() finally q.stop()
    }
    sync() // bootstrap: full snapshot as insert images
    // three primary commits while the stream is down — the catch-up
    // interval must net them into one exact batch
    src.append(orders.where(col("o_orderkey") % 7 === 0), "cdcr")
    src.updateWhereMor(
      Seq("price" -> (col("price") * 2).cast("decimal(12,2)")),
      col("o_orderkey") % 11 === 5, "cdcr")
    src.deleteWhereMor(
      col("o_orderstatus") === "F" && col("o_orderkey") % 10 === 3, "cdcr")
    sync() // catch-up
    val rows2 = dst.read("cdcr").count()
    val snaps2 = dst.snapshots("cdcr").size
    sync() // idle
    val exactlyOnce =
      if (dst.read("cdcr").count() == rows2 &&
        dst.snapshots("cdcr").size == snaps2) 1.0 else 0.0
    val replicaExact =
      if (graft.operators.Medallion.sameMultiset(
        dst.read("cdcr"), src.read("cdcr"))) 1.0 else 0.0
    dst.read("cdcr")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("total"))
      .withColumn("replica_exact", lit(replicaExact))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy("o_orderstatus")
  }

  /** `stream_sessionize` — TRUE incremental sessionization
    * ([[sessionizeStream]]: one fixed-size [[OpenSession]] per user in
    * the state store, event-time timeouts) exercised at the driver
    * surface against the batch oracle. Determinism without waiting on
    * wall clocks: the events feed as THREE file-source micro-batches —
    * (1) every real event in one batch (a watermark only constrains
    * batches after the one that advances it, so nothing drops), then
    * (2, 3) two far-future SENTINEL events for a reserved user, each a
    * day apart — batch 2's watermark advance passes every real
    * session's gap and batch 3's processing fires the event-time
    * timeouts, flushing every real open session; the sentinel's own
    * final session never closes and so never emits. The readout is the
    * per-session relation, hash-compared against the batch
    * window-function restatement (the `q_events_sessionize` SQL) — the
    * strongest batch/stream parity pin: custom streaming state,
    * timeout flushes and session numbering all land bit-identically
    * on what DuckDB computes from the raw table. */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // BATCH read for staging (the normalized events reader); the
    // stream below tails the staged copies
    val events = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
    val stage = Files.createTempDirectory("graft-ssz").toString
    val scratch = Files.createTempDirectory("graft-ssz-w").toString
    val ck = Files.createTempDirectory("graft-ssz-ck").toString
    def onePart(df: DataFrame, tag: String): Unit = {
      val d = s"$scratch/$tag"
      df.coalesce(1).write.parquet(d)
      val part = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(s"$stage/$tag.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    def sentinel(days: Int) = spark.createDataFrame(Seq(
      (-1L, new java.sql.Timestamp(maxTs.getTime + days * 86400000L), -1L)))
      .toDF("user_id", "ts", "event_id")
    // the file source orders batches by modification time: events
    // first, sentinels after (sequential moves, mtime monotone)
    onePart(events, "a-events"); Thread.sleep(5)
    onePart(sentinel(1), "b-sentinel1"); Thread.sleep(5)
    onePart(sentinel(2), "c-sentinel2")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val sessions = sessionizeStream(
      toSessionEvents(stream.withWatermark("ts", "0 seconds")))
    val sink = s"ssz_out_${System.nanoTime()}"
    // state-store-FIXED-cost dominated, same engineering note as
    // stream_range_join: the stateful op keeps one store per shuffle
    // partition, checkpointed as many small files per micro-batch —
    // 8 partitions (pinned by the checkpoint) cut the store count 4x
    // while the per-user state still spreads
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = sessions.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    spark.table(sink)
      .where(col("user_id") =!= -1L) // the sentinel's closed session
      .orderBy("user_id", "session_id")
  }

  /** `stream_range_join` — the STREAM-STREAM INTERVAL JOIN at the
    * driver surface (r15; [[clickPurchaseJoin]], `q_range_join`'s
    * streaming twin, previously spec-only): purchases and clicks tail
    * the SAME file-source stream (a self-join of one stream — both
    * sides watermark so Spark bounds the buffered state to the
    * in-flight 10-minute window). Determinism without flush timing:
    * the INNER join emits a (purchase, click) pair as soon as both
    * sides are in state, and every real event feeds in ONE micro-batch
    * (a watermark only constrains batches after the one that advances
    * it), so AvailableNow drains the complete pair set — no sentinel
    * choreography needed (that is the OUTER variant's problem, which
    * stays spec-pinned). A SECOND run over the same checkpoint must
    * add nothing (`exactly_once` pinned). The readout is the
    * per-purchase click count, hash-compared against the INNER
    * restatement of the `q_range_join` SQL in DuckDB — stream-stream
    * join semantics, the interval predicate, and the per-purchase
    * grouping all land bit-identically cross-engine. */
  def streamRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // a DETERMINISTIC user slice (2/7 of the population): the whole
    // event span lands in one micro-batch, so the join buffers
    // O(batch) state — the slice keeps the oracle exact while the
    // bench pays for join semantics, not state-store volume
    val events = graft.sources.Tables.events(spark, dir)
      .where(pmod(col("user_id"), lit(7)) < 2)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val stage = Files.createTempDirectory("graft-srj").toString
    val scratch = Files.createTempDirectory("graft-srj-w").toString
    val ck = Files.createTempDirectory("graft-srj-ck").toString
    val d = s"$scratch/all"
    events.coalesce(1).write.parquet(d)
    val part = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$stage/all.parquet"),
      StandardCopyOption.ATOMIC_MOVE)
    // the pair sink is a lakehouse table written appendOnce-per-epoch:
    // surviving a replay is then the checkpoint+batch-ledger
    // COMPOSITION, the same exactly-once contract the CDC oracles pin
    val sinkRoot = Files.createTempDirectory("graft-srj-sink").toString
    val lake = new graft.sources.Lakehouse(spark, sinkRoot)
    def drain(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(stage)
      val joined = clickPurchaseJoin(
        stream.where(col("event_type") === "click"),
        stream.where(col("event_type") === "purchase"))
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          lake.appendOnce(df, "srj_pairs", batchId = id); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // the run is state-store-FIXED-cost dominated (a stream-stream
    // join keeps two stores per shuffle partition, checkpointed as
    // many small files): 8 partitions, pinned by the checkpoint,
    // cut the store count 4x while the sliced data still spreads
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val (rows1, exactlyOnce) = try {
      drain()
      val r1 = lake.read("srj_pairs").count()
      drain() // replay over the same checkpoint: exactly-once
      (r1, if (lake.read("srj_pairs").count() == r1) 1.0 else 0.0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    lake.read("srj_pairs")
      .groupBy(col("purchase_id").as("event_id"))
      .agg(count(col("click_id")).as("n_clicks_10m"))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy("event_id")
  }

  /** `stream_range_join_outer` — the LEFT-OUTER stream-stream interval
    * join at the driver surface (r16; [[clickPurchaseJoinOuter]],
    * previously spec-only): the watermark-flush NULL-EXTENSION is the
    * semantics most likely to diverge cross-engine — a click-less
    * purchase emits exactly once, with null click columns, only after
    * the watermark closes its 10-minute window. Same one-file staging
    * as the inner oracle, plus two SENTINEL FILES (a far-future click
    * + purchase each, user_id −1): outer state flushes on a LATER
    * batch's watermark move, so the first sentinel advances both
    * sides' watermarks past every real window and the second runs the
    * batch that emits the held null-extended rows. All three files
    * stage up front with ascending mtimes and `maxFilesPerTrigger=1`
    * slices ONE AvailableNow run into the three ordered batches —
    * two streaming runs total (the drain + the replay) instead of
    * four, since a stream-stream join's cost here is state-store
    * startup, not data. A final replay over
    * the same checkpoint must add nothing (`exactly_once`). Readout =
    * per-purchase click count over the sentinel-filtered pair ledger —
    * count(click_id) turns the null extension into the LEFT-join 0 —
    * hash-compared against DuckDB's LEFT restatement of q_range_join. */
  def streamRangeJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // a 1/7 user slice, disjoint choice from the inner oracle's 2/7 —
    // the whole span lands in one micro-batch; cost is state-store
    // count, not volume (same engineering note as stream_range_join)
    val events = graft.sources.Tables.events(spark, dir)
      .where(pmod(col("user_id"), lit(7)) === 2)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val stage = Files.createTempDirectory("graft-srjo").toString
    val scratch = Files.createTempDirectory("graft-srjo-w").toString
    val ck = Files.createTempDirectory("graft-srjo-ck").toString
    def stageFile(df: DataFrame, name: String): Unit = {
      val d = s"$scratch/$name"
      df.coalesce(1).write.parquet(d)
      val part = new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(s"$stage/$name.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    }
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    def sentinel(hours: Int): DataFrame = {
      import spark.implicits._
      val ts = new java.sql.Timestamp(maxTs.getTime + hours * 3600 * 1000L)
      Seq((-1L, ts, -1L, "click"), (-1L, ts, -2L, "purchase"))
        .toDF("user_id", "ts", "event_id", "event_type")
    }
    // all three files up front, ascending mtimes (the file source
    // orders batches by modification time under maxFilesPerTrigger=1)
    stageFile(events, "a_all")
    stageFile(sentinel(1), "b_s1")
    stageFile(sentinel(2), "c_s2")
    val t0 = System.currentTimeMillis()
    Seq("a_all", "b_s1", "c_s2").zipWithIndex.foreach { case (n, i) =>
      new java.io.File(s"$stage/$n.parquet").setLastModified(t0 - 30000 + i * 10000)
    }
    val sinkRoot = Files.createTempDirectory("graft-srjo-sink").toString
    val lake = new graft.sources.Lakehouse(spark, sinkRoot)
    def drain(): Unit = {
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(stage)
      val joined = clickPurchaseJoinOuter(
        stream.where(col("event_type") === "click"),
        stream.where(col("event_type") === "purchase"))
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          lake.appendOnce(df, "srjo_pairs", batchId = id); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val exactlyOnce = try {
      drain() // data batch, then two watermark-advancing sentinel batches
      val n = lake.read("srjo_pairs").count()
      drain() // replay over the same checkpoint: exactly-once
      if (lake.read("srjo_pairs").count() == n) 1.0 else 0.0
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    lake.read("srjo_pairs")
      .where(col("user_id") >= 0L) // the sentinels' own rows
      .groupBy(col("purchase_id").as("event_id"))
      .agg(count(col("click_id")).as("n_clicks_10m"))
      .withColumn("exactly_once", lit(exactlyOnce))
      .orderBy("event_id")
  }

  /** STREAMING ANOMALY SCREEN — train offline, score online: the
    * per-user moment stats computed over the historical batch table
    * ([[graft.operators.Relational.userValueStats]], the "model")
    * broadcast against a live event stream; each arriving event is
    * scored map-only with zero streaming state (a stream-static
    * broadcast join — Spark re-plans the static side per micro-batch,
    * so replacing the stats table between batches picks up a
    * re-trained model without restarting the query). The screen
    * expression is the SAME code as the batch `q_events_anomaly`, so
    * batch/stream parity is by construction and the spec pins it. */
  def anomalyScreen(events: DataFrame, stats: DataFrame,
      sigma: Double = 2.5): DataFrame =
    graft.operators.Relational.anomalyScreen(events, stats, sigma)

  /** CONTINUOUS MATERIALIZED-VIEW MAINTENANCE: keep a
    * [[graft.sources.MaterializedView]] fresh as its source table
    * takes commits, by composing the lakehouse stream source (whose
    * offsets are source snapshots) with the view's own exactly-once
    * `refresh`. The stream is the SCHEDULER, not the data path: each
    * micro-batch fires exactly when new source snapshots exist, and
    * `refresh` re-derives its delta from the view's committed
    * watermark — so a checkpoint/watermark disagreement after a crash
    * resolves to a no-op, never a double-apply, and a rewrite landing
    * mid-stream falls back to the view's full recompute instead of
    * failing the query the way the raw tailing stream must.
    * `Trigger.AvailableNow` (default) drains to the pinned head and
    * terminates — the scheduled-job shape; a ProcessingTime trigger
    * gives a long-running refresher. */
  def maintainMview(spark: SparkSession, root: String, view: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.sources.{Lakehouse, MaterializedView}
    val lake = new Lakehouse(spark, root)
    val d = MaterializedView.load(lake, view).getOrElse(
      throw new IllegalArgumentException(s"$view has no _mviews.jsonl definition in $root"))
    // the SCHEDULER shape (`ticks`): micro-batches carry snapshot ids
    // only — zero data I/O, and a rewrite/compaction on the watched
    // table can never wedge the maintenance query (the refresh itself
    // handles rewrites by recomputing; a data-carrying interval read
    // would rightly fail and take the scheduler down with it)
    def tickStream(table: String, start: Long): DataFrame = spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", table)
      .option("ticks", "true")
      .option("startSnapshot", start.toString)
      .load()
    // tail from the view's current watermark: batch 0 must not plan
    // a full-history read the refresh would ignore anyway
    val src = tickStream(d.src, MaterializedView.watermark(lake, d))
    // JOIN views follow every DIM too: a dim-only change (the backfill /
    // re-label shape dimDelta prices incrementally for single-hop
    // views; multi-hop chains recompute) must fire a refresh without
    // waiting for a fact commit. ONE unioned query keeps the
    // one-refresher-per-view contract.
    val dimStarts = MaterializedView.dimWatermarkOf(lake, view, d.joins.length)
    val ticks = d.joins.zipWithIndex.foldLeft(src) { case (acc, (j, i)) =>
      val start = dimStarts.map(_(i))
        .orElse(lake.currentSnapshot(j.dim)).getOrElse(0L)
      acc.union(tickStream(j.dim, start))
    }
    ticks.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        MaterializedView.refresh(lake, d); ()
      }
      .start()
  }

  /** CONTINUOUS ANN-INDEX MAINTENANCE — [[maintainMview]]'s twin for
    * the persisted vector index ([[graft.operators.AnnIndex]]): the
    * lakehouse stream source schedules a delta-priced `refresh`
    * whenever the embeddings table takes a commit, so newly ingested
    * vectors become searchable without re-encoding the corpus or
    * restarting anything. Same crash story: refresh re-derives its
    * delta from the index tables' own watermarks, so checkpoint
    * drift resolves to a no-op. */
  def maintainAnnIndex(spark: SparkSession, root: String, src: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.AnnIndex
    import graft.sources.Lakehouse
    val lake = new Lakehouse(spark, root)
    spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", src)
      .option("ticks", "true") // scheduler shape: rewrite-proof wake-ups
      .option("startSnapshot",
        lake.committedBatches(AnnIndex.vectorsTable(src)).max.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        AnnIndex.refresh(lake, src); ()
      }
      .start()
  }

  /** CONTINUOUS NEAR-DUP-INDEX MAINTENANCE — the dedup twin of
    * [[maintainAnnIndex]]: whenever the docs table takes a commit, one
    * delta-priced [[graft.operators.Dedup.indexMaintainStep]] runs —
    * new documents' signatures land in the persisted index and the
    * batch's near-dup pairs append to the `<src>_nd_pairs` ledger,
    * exactly-once (batch id = source snapshot). Crash story as ever:
    * the step re-derives its delta from the index tables' own
    * watermarks, so checkpoint drift resolves to a no-op. */
  def maintainDedupIndex(spark: SparkSession, root: String, src: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    import graft.sources.Lakehouse
    val lake = new Lakehouse(spark, root)
    val wm = lake.committedBatches(Dedup.bandsTable(src))
    require(wm.nonEmpty, s"$src carries no dedup index; Dedup.indexCreate first")
    spark.readStream
      .format("graft.streaming.LakehouseStreamProvider")
      .option("root", root).option("table", src)
      .option("ticks", "true") // scheduler shape: rewrite-proof wake-ups
      .option("startSnapshot", wm.max.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        Dedup.indexMaintainStep(lake, src); ()
      }
      .start()
  }

  /** Stream-stream interval join: purchases enriched with the same
    * user's clicks from the preceding 10 minutes — the streaming twin
    * of `q_range_join`. Both sides are watermarked so Spark can bound
    * the join state: buffered clicks are evicted once the watermark
    * passes their ts + 10 min; state is O(in-flight window), never
    * O(stream). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
    p.join(c,
      col("user_id") === col("c_user")
        && col("c_ts") < col("p_ts")
        && col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
      joinType)
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("click_id"), col("c_ts"))
  }

  /** LEFT-OUTER streaming interval join: every purchase emits exactly
    * once — with its in-window clicks when they exist, or with NULL
    * click columns once the watermark passes the purchase's window and
    * no click can still arrive. The inner variant silently drops
    * click-less purchases, which is the first live-funnel surprise;
    * the outer row is held in state only until the watermark closes
    * its 10-minute window, so state stays O(in-flight), never
    * O(stream). */
  def clickPurchaseJoinOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clickPurchaseJoin(clicks, purchases, "leftOuter")

  /** Streaming exact dedup on event_id: watermark-bounded state, so
    * the dedup set never grows past the lateness horizon — the
    * streaming twin of `dedup_exact`'s hash-group semantics for an
    * at-least-once event feed. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")

  /** Streaming dedup AGAINST HISTORY: drop incoming documents whose
    * normalized-text fingerprint already exists in the historical
    * corpus (a static relation — e.g. the lakehouse documents table's
    * fingerprints), then exact-dedup within the stream itself. The
    * ingestion-time guard a training pipeline actually runs: without
    * it, every restart or re-crawl re-admits the whole archive.
    *
    * Shape: stream-static LEFT ANTI equi-join on the 62-bit hash —
    * Spark broadcasts or hash-joins the static side per micro-batch,
    * no state store involvement. The within-stream dedup state is
    * bounded ONLY when `eventTimeCol` is given: it then watermarks
    * that column and uses `dropDuplicatesWithinWatermark`, so state
    * is evicted past the lateness horizon. Without an event-time
    * column the dedup set grows with the stream's distinct
    * fingerprints — acceptable for a BOUNDED replay/backfill, wrong
    * for continuous ingestion (pass the crawl timestamp there). At
    * 100 TB the static side is a fingerprint TABLE (doc-count × 8
    * bytes), not the corpus. */
  def dedupAgainstHistory(docs: DataFrame, historyFingerprints: DataFrame,
      eventTimeCol: Option[String] = None, lateness: String = "1 hour"): DataFrame = {
    import graft.functions.HashFunctions
    import graft.operators.TextAnalysis.normText
    val fresh = docs
      .withColumn("fp_h62", HashFunctions.h62(normText(col("text"))))
      .join(historyFingerprints.select(col("fp_h62")), Seq("fp_h62"), "left_anti")
    eventTimeCol match {
      case Some(ts) =>
        fresh.withWatermark(ts, lateness).dropDuplicatesWithinWatermark("fp_h62")
      case None => fresh.dropDuplicates("fp_h62")
    }
  }

  val GapSeconds = 1800L

  /** Stateful gap-sessionization via `flatMapGroupsWithState`.
    *
    * Streaming: one [[OpenSession]] per user; a micro-batch's events
    * are folded in event order, closed sessions are emitted, the open
    * one is carried (emitted at timeout). Batch: the iterator holds
    * the whole group, so every session finalizes — output is
    * identical to the window-function batch plan
    * (`q_events_sessionize`), which the spec asserts.
    */
  def sessionize(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[UserSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
          // Gap test on SECOND-floored epochs — the exact arithmetic of
          // the batch plan (`epoch-second diff > 1800`), so streaming
          // and batch can never disagree on a boundary event.
          def gapExceeded(a: java.sql.Timestamp, b: java.sql.Timestamp): Boolean =
            Math.floorDiv(b.getTime, 1000L) - Math.floorDiv(a.getTime, 1000L) > GapSeconds
          var open = state.getOption
          val out = Seq.newBuilder[UserSession]
          evs.foreach { e =>
            open match {
              case Some(s) if !gapExceeded(s.last, e.ts) =>
                open = Some(s.copy(n = s.n + 1, last = e.ts))
              case Some(s) =>
                out += UserSession(userId, s.sessionId, s.n, s.start, s.last)
                open = Some(OpenSession(s.sessionId + 1, 1, e.ts, e.ts))
              case None =>
                open = Some(OpenSession(1, 1, e.ts, e.ts))
            }
          }
          // Batch mode sees the whole group at once: finalize the tail
          // session. (A pure streaming deployment would instead keep it
          // in state and flush on event-time timeout.)
          open.foreach { s =>
            out += UserSession(userId, s.sessionId, s.n, s.start, s.last)
            state.remove()
          }
          out.result().iterator
        })
  }

  /** Adapter: batch or streaming events DataFrame → typed session
    * input. */
  def toSessionEvents(events: DataFrame): Dataset[SessionEvent] = {
    implicit val enc = Encoders.product[SessionEvent]
    events.select(col("user_id"), col("ts"), col("event_id")).as[SessionEvent]
  }

  /** TRUE incremental sessionization for unbounded streams: the open
    * session lives in the state store across micro-batches and is
    * emitted only when closed — either by a later event beyond the
    * gap, or by an event-time timeout once the watermark passes
    * last-event + gap. Requires `withWatermark("ts", …)` upstream.
    * State per key is ONE [[OpenSession]] (fixed-size), so state-store
    * growth at 100 TB is bounded by concurrently-active users, not by
    * events. */
  def sessionizeStream(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[UserSession]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) => {
          def gapExceeded(aMs: Long, bMs: Long): Boolean =
            Math.floorDiv(bMs, 1000L) - Math.floorDiv(aMs, 1000L) > GapSeconds
          val out = Seq.newBuilder[UserSession]
          if (state.hasTimedOut) {
            // Timeout fired: emit the open session but KEEP the state as
            // a closed marker (n = 0) so the per-user session counter
            // survives — session_id must stay strictly increasing like
            // the batch twin's cumulative numbering, never reset to 1.
            state.getOption.filter(_.n > 0).foreach { s =>
              out += UserSession(userId, s.sessionId, s.n, s.start, s.last)
              state.update(s.copy(n = 0))
            }
          } else {
            val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            evs.foreach { e =>
              open match {
                case Some(s) if s.n > 0 && !gapExceeded(s.last.getTime, e.ts.getTime) =>
                  open = Some(s.copy(n = s.n + 1, last = e.ts))
                case Some(s) =>
                  if (s.n > 0) out += UserSession(userId, s.sessionId, s.n, s.start, s.last)
                  open = Some(OpenSession(s.sessionId + 1, 1, e.ts, e.ts))
                case None =>
                  open = Some(OpenSession(1, 1, e.ts, e.ts))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last.getTime + GapSeconds * 1000 + 1000)
            }
          }
          out.result().iterator
        })
  }
}

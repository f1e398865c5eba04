package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg (readStream → watermark → window) matches the batch plan") {
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, sf))
    val qname = "hourly_test"
    val q = stream.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(qname).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    val want = Relational.qEventsHourly(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    assert(got === want)
  }

  test("streaming anomaly screen over batch-trained stats matches q_events_anomaly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batch = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("value"))
    val stats = Relational.userValueStats(batch)
    // replay the whole history through a stream in two micro-batches
    val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val source = MemoryStream[(Long, Long, Double)]
    val screened = EventStream.anomalyScreen(
      source.toDF.toDF("event_id", "user_id", "value"), stats)
    val q = screened.writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      source.addData(a.toSeq); q.processAllAvailable()
      source.addData(b.toSeq); q.processAllAvailable()
      val got = spark.table("anomaly_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
      val want = Relational.qEventsAnomaly(spark, sf).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("zscore"))).toSet
      assert(got === want, "stream-scored flags must equal the batch screen")
    } finally q.stop()
  }

  test("stateful sessionization (flatMapGroupsWithState) matches the window-function batch plan") {
    val sessions = EventStream.sessionize(
      EventStream.toSessionEvents(Tables.events(spark, sf)))
    val got = sessions.collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end)).toSet
    val want = Relational.qEventsSessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"))).toSet
    assert(got === want)
  }

  test("incremental sessionization: open sessions survive micro-batches, close on gap or timeout") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(user: Long, minute: Long, id: Long) =
      graft.streaming.SessionEvent(user, new java.sql.Timestamp(minute * 60000L), id)

    val source = MemoryStream[graft.streaming.SessionEvent]
    val sessions = EventStream.sessionizeStream(
      EventStream.toSessionEvents(
        source.toDF().withWatermark("ts", "0 seconds")))
    val q = sessions.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // batch 1: user 1 has two events 5 min apart — one OPEN session
      source.addData(ev(1, 10, 1), ev(1, 15, 2))
      q.processAllAvailable()
      assert(spark.table("sess_test").count() === 0, "open session must not emit")
      // batch 2: 40 min later (> 30-min gap) → session 1 closes, session 2 opens
      source.addData(ev(1, 55, 3))
      q.processAllAvailable()
      val closed = spark.table("sess_test").as[graft.streaming.UserSession].collect()
      assert(closed.length === 1)
      assert(closed.head.session_id === 1 && closed.head.n_events === 2)
      // batch 3: an unrelated late-watermark event advances event time far
      // enough that user 1's open session times out and flushes
      source.addData(ev(2, 200, 4))
      q.processAllAvailable()
      source.addData(ev(2, 300, 5))
      q.processAllAvailable()
      val all = spark.table("sess_test").as[graft.streaming.UserSession].collect()
      assert(all.exists(s => s.user_id == 1 && s.session_id == 2 && s.n_events == 1),
        s"timeout flush missing: ${all.mkString(", ")}")
      // counter survives the timeout: the user's NEXT session must be
      // id 3, never a reset to 1
      source.addData(ev(1, 400, 6))
      q.processAllAvailable()
      source.addData(ev(2, 500, 7), ev(1, 500, 8))
      q.processAllAvailable()
      val later = spark.table("sess_test").as[graft.streaming.UserSession].collect()
      assert(later.exists(s => s.user_id == 1 && s.session_id == 3),
        s"session counter reset after timeout: ${later.filter(_.user_id == 1).mkString(", ")}")
    } finally q.stop()
  }

  test("streamToLakehouse appends each micro-batch as a time-travelable snapshot") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-lake").toString
    val lake = new graft.sources.Lakehouse(spark, root)
    lake.createOrReplace(Seq.empty[(Long, String)].toDF("id", "v"), "stream_tbl")
    val source = MemoryStream[(Long, String)]
    source.addData((1L, "a"), (2L, "b"))
    val q = EventStream.streamToLakehouse(
      source.toDF().toDF("id", "v"), lake, "stream_tbl",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      source.addData((3L, "c"))
      q.processAllAvailable()
      assert(lake.read("stream_tbl").count() === 3)
      // each micro-batch is its own snapshot in history
      assert(lake.snapshots("stream_tbl").length >= 3)
    } finally q.stop()
  }

  test("streamToLakehouse restart replays batch ids without double-appending (exactly-once)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-eo").toString
    val lake = new graft.sources.Lakehouse(spark, root)
    lake.createOrReplace(Seq.empty[(Long, String)].toDF("id", "v"), "eo_tbl")
    // first run: batches 0..n
    val s1 = MemoryStream[(Long, String)]
    s1.addData((1L, "a"), (2L, "b"))
    val q1 = EventStream.streamToLakehouse(
      s1.toDF().toDF("id", "v"), lake, "eo_tbl",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try q1.processAllAvailable() finally q1.stop()
    val countAfterRun1 = lake.read("eo_tbl").count()
    assert(countAfterRun1 === 2)
    // "restart" without a checkpoint: a fresh query REPLAYS batch 0
    // with the same data — at-least-once delivery from the source; the
    // commit-metadata ledger must make the duplicate append a no-op
    val s2 = MemoryStream[(Long, String)]
    s2.addData((1L, "a"), (2L, "b"))
    val q2 = EventStream.streamToLakehouse(
      s2.toDF().toDF("id", "v"), lake, "eo_tbl",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try q2.processAllAvailable() finally q2.stop()
    assert(lake.read("eo_tbl").count() === countAfterRun1)
  }

  test("curate gates run identically on a stream and on a batch (same codegen'd projection)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and that is it you see"),
      (2L, "el perro y el gato se fueron a la casa de los vecinos en un dia"),
      (3L, "!!!###$$$ %%%"),
      (4L, "the " * 60 + "of and to a in is you that it"))
      .map { case (id, t) => (id, t.trim) }
    val batchOut = graft.operators.Curate.gates(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"), r.getAs[String]("pred_lang"))).toSet
    val source = MemoryStream[(Long, String)]
    source.addData(docs: _*)
    val q = graft.operators.Curate.gates(source.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gates_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamOut = spark.table("gates_stream")
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"), r.getAs[String]("pred_lang"))).toSet
      assert(streamOut === batchOut)
      assert(streamOut.exists(_._3 == "en") && streamOut.exists(_._3 == "es"))
    } finally q.stop()
  }

  test("streaming dedup against history drops archive twins and in-stream repeats, admits new docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.HashFunctions
    import graft.operators.TextAnalysis.normText
    // the historical corpus: fingerprints only, never the text
    val history = Seq((100L, "the archive already has this document"))
      .toDF("doc_id", "text")
      .select(HashFunctions.h62(normText(col("text"))).as("fp_h62"))
    val source = MemoryStream[(Long, String)]
    source.addData(
      (1L, "The  ARCHIVE already has this document!"), // normText twin of history → dropped
      (2L, "a genuinely new document"), // admitted
      (3L, "a GENUINELY new document"), // in-stream normText repeat of 2 → dropped
      (4L, "another new one")) // admitted
    val out = EventStream.dedupAgainstHistory(source.toDF().toDF("doc_id", "text"), history)
    val q = out.writeStream.format("memory").queryName("hist_dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("hist_dedup").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 4L))
      // a later micro-batch replaying an admitted doc is dropped by the
      // within-stream state
      source.addData((5L, "another NEW one"))
      q.processAllAvailable()
      val kept2 = spark.table("hist_dedup").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept2 === Set(2L, 4L))
    } finally q.stop()
  }

  test("history dedup with an event-time column holds watermark-BOUNDED state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.HashFunctions
    import graft.operators.TextAnalysis.normText
    val history = Seq((100L, "archived doc"))
      .toDF("doc_id", "text")
      .select(HashFunctions.h62(normText(col("text"))).as("fp_h62"))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = EventStream.dedupAgainstHistory(
      source.toDF().toDF("doc_id", "text", "crawl_ts"), history,
      eventTimeCol = Some("crawl_ts"))
    val q = out.writeStream.format("memory").queryName("hist_dedup_wm")
      .outputMode("append").start()
    try {
      def kept() =
        spark.table("hist_dedup_wm").select("doc_id").collect().map(_.getLong(0)).toSet
      // batch 1: archive twin dropped, fresh doc admitted
      source.addData(
        (1L, "ARCHIVED doc", ts("2026-01-01 10:00:00")),
        (2L, "fresh doc", ts("2026-01-01 10:00:30")))
      q.processAllAvailable()
      assert(kept() === Set(2L))
      // batch 2: replay of 2 INSIDE the 1h horizon is dropped; the
      // 13:00 event advances the watermark to 12:00, past 2's expiry
      source.addData(
        (3L, "FRESH doc", ts("2026-01-01 10:10:00")),
        (4L, "later doc", ts("2026-01-01 13:00:00")))
      q.processAllAvailable()
      assert(kept() === Set(2L, 4L))
      // batch 3: 2's fingerprint state has been EVICTED (expiry 11:00 <
      // watermark 12:00) — a replay past the horizon is re-admitted,
      // the bounded-state trade dropDuplicatesWithinWatermark makes
      source.addData((5L, "fresh DOC", ts("2026-01-01 13:01:00")))
      q.processAllAvailable()
      assert(kept() === Set(2L, 4L, 5L))
    } finally q.stop()
  }

  test("streaming CDC upsert: batches merge by key, replays change nothing") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val lake = new graft.sources.Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "cdc")
    val source = MemoryStream[(Long, String)]
    val q = EventStream.streamUpsertToLakehouse(
      source.toDF().toDF("k", "v"), lake, "cdc", Seq("k"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    def state() = lake.read("cdc").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    try {
      // batch 0: update k=2, insert k=3
      source.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
      assert(state() === Set((1L, "a"), (2L, "B"), (3L, "c")))
      // replay batch 0 (a restarted foreachBatch is at-least-once):
      // the committed batch id must make it a no-op
      val snapsBefore = lake.snapshots("cdc").length
      lake.upsertOnce(Seq((2L, "STALE"), (3L, "STALE")).toDF("k", "v"), "cdc", Seq("k"), 0L)
      assert(state() === Set((1L, "a"), (2L, "B"), (3L, "c")),
        "a replayed batch re-applied stale values")
      assert(lake.snapshots("cdc").length === snapsBefore, "a replayed batch committed")
      // batch 1: a later update to the same key flows through
      source.addData((3L, "C2"))
      q.processAllAvailable()
      assert(state() === Set((1L, "a"), (2L, "B"), (3L, "C2")))
    } finally q.stop()
  }

  test("end-to-end: streamed docs flow through curate gates into an exactly-once lakehouse table") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-curate").toString
    val lake = new graft.sources.Lakehouse(spark, root)
    lake.createOrReplace(
      Seq.empty[(Long, Double, String)].toDF("doc_id", "quality", "pred_lang"), "curated")
    val source = MemoryStream[(Long, String)]
    source.addData(
      (1L, "the quick brown fox jumps over the lazy dog and that is it you know " * 3),
      (2L, "el perro y el gato se fueron a la casa de los vecinos en un dia"),
      (3L, "%%% !!! ###"))
    val gated = graft.operators.Curate.gates(source.toDF().toDF("doc_id", "text"))
      .where(col("quality") >= 0.5 && col("pred_lang") === "en")
    val q = EventStream.streamToLakehouse(gated, lake, "curated",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100))
    try {
      q.processAllAvailable()
      // only the high-quality English doc lands
      val rows = lake.read("curated").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(1L))
      assert(rows.head.getString(2) === "en")
      assert(lake.committedBatches("curated").nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with in-window clicks only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def df(s: MemoryStream[(Long, Long, Long)]) = // (event_id, user_id, minute)
      s.toDF().toDF("event_id", "user_id", "m")
        .withColumn("ts", expr("timestamp_millis(m * 60000)")).drop("m")
    val clicks = MemoryStream[(Long, Long, Long)]
    val purchases = MemoryStream[(Long, Long, Long)]
    val joined = EventStream.clickPurchaseJoin(df(clicks), df(purchases))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 7L, 100L), (2L, 7L, 94L), (3L, 8L, 100L))
      purchases.addData((10L, 7L, 105L)) // click 1 in window (5m), click 2 out (11m), click 3 wrong user
      q.processAllAvailable()
      val got = spark.table("ssj_test").select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((10L, 1L)), s"got $got")
    } finally q.stop()
  }

  test("left-outer interval join emits click-less purchases with nulls exactly once after the watermark closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def df(s: MemoryStream[(Long, Long, Long)]) = // (event_id, user_id, minute)
      s.toDF().toDF("event_id", "user_id", "m")
        .withColumn("ts", expr("timestamp_millis(m * 60000)")).drop("m")
    val clicks = MemoryStream[(Long, Long, Long)]
    val purchases = MemoryStream[(Long, Long, Long)]
    val joined = EventStream.clickPurchaseJoinOuter(df(clicks), df(purchases))
    val q = joined.writeStream.format("memory").queryName("ssj_outer_test")
      .outputMode("append").start()
    try {
      // purchase 10 has an in-window click; purchase 11 (user 9) has none
      clicks.addData((1L, 7L, 100L))
      purchases.addData((10L, 7L, 105L), (11L, 9L, 105L))
      q.processAllAvailable()
      // advance BOTH watermarks far past purchase 11's window, twice
      // (outer results flush on the watermark move of a later batch)
      clicks.addData((4L, 5L, 140L))
      purchases.addData((12L, 5L, 141L))
      q.processAllAvailable()
      clicks.addData((5L, 6L, 170L))
      purchases.addData((13L, 6L, 171L))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer_test").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      // matched purchase unchanged
      assert(rows.contains((10L, Some(1L))), s"matched row missing: ${rows.mkString(", ")}")
      // the click-less purchase emits once, with null click columns
      val outer = rows.filter(_._1 == 11L)
      assert(outer === Seq((11L, None)),
        s"click-less purchase must emit exactly once with nulls: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long)] // (event_id, minute)
    val deduped = EventStream.dedupEvents(
      source.toDF().toDF("event_id", "m")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_millis(m * 60000)")))
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      source.addData((1L, 10L), (2L, 10L), (1L, 11L)) // 1 duplicated in-batch
      q.processAllAvailable()
      source.addData((2L, 12L), (3L, 12L)) // 2 replayed across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("native session_window streaming agg matches its batch run and the hand reference") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(user: Long, minute: Long, id: Long) =
      graft.streaming.SessionEvent(user, new java.sql.Timestamp(minute * 60000L), id)
    // user 1: minutes 10,15 | 55 (40-min gap splits) ; user 2: 200
    val fixture = Seq(ev(1, 10, 1), ev(1, 15, 2), ev(1, 55, 3), ev(2, 200, 4))
    val source = MemoryStream[graft.streaming.SessionEvent]
    val q = EventStream.sessionizeNative(source.toDF())
      .writeStream.format("memory").queryName("sessnat_test")
      .outputMode("append").start()
    try {
      source.addData(fixture: _*); q.processAllAvailable()
      // watermark far past everything closes all sessions
      source.addData(ev(9, 5000, 9)); q.processAllAvailable()
      val got = spark.table("sessnat_test")
        .select("user_id", "session_start", "session_end", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
          r.getTimestamp(2).getTime / 60000L, r.getLong(3))).toSet
      // session end = last event + gap (native semantics)
      val want = Set((1L, 10L, 45L, 2L), (1L, 55L, 85L, 1L), (2L, 200L, 230L, 1L))
      assert(got === want)
      // the SAME expression on a batch DataFrame gives the same sessions
      val batch = EventStream.sessionizeNative(fixture.toDF())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
          r.getTimestamp(2).getTime / 60000L, r.getLong(3))).toSet
      assert(batch === want)
    } finally q.stop()
  }

  test("stream-ingested hourly rollup matches the batch query; fresh-checkpoint replay no-ops") {
    val out = EventStream.streamEventsHourlyOracle(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(4) == 1.0),
      "full replay from a fresh checkpoint must change nothing (exactly_once)")
    val want = graft.operators.Relational.qEventsHourly(spark, sf).collect()
    assert(rows.map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq ===
      want.map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSeq,
      "the ingested table's rollup must bit-equal the batch query over raw parquet")
  }

  test("sessions respect the 30-minute gap invariant") {
    val sessions = EventStream.sessionize(
      EventStream.toSessionEvents(Tables.events(spark, sf))).collect()
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.session_id)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.session_start.getTime - a.session_end.getTime > EventStream.GapSeconds * 1000,
          s"adjacent sessions closer than the gap: $a $b")
      }
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftshim.StreamingShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.Lakehouse

/** STREAMING READS of a lakehouse table — Iceberg's streaming-read
  * parity, closing the loop the exactly-once `appendOnce` sink opened:
  * the lakehouse is now both SOURCE and SINK, so bronze→silver→gold
  * hops run as restartable micro-batch streams with end-to-end
  * exactly-once (checkpointed snapshot offsets on the read side,
  * batch-id-deduped commits on the write side).
  *
  * OFFSETS ARE SNAPSHOT IDS. `getOffset` reports the branch's current
  * snapshot; each micro-batch reads exactly the data dirs APPENDED
  * between two snapshots ([[Lakehouse.readChanges]]) — metadata-only
  * planning, no diffing of rows. The first batch is the full snapshot
  * at stream start (or nothing before `startSnapshot` when set). A
  * REWRITE between batches — replace, copy-on-write DML, compaction,
  * MoR tombstones — fails the stream loudly instead of silently
  * re-emitting rewritten rows (Iceberg's incremental-read rule);
  * switch to batch refresh for such tables. Restart resumes from the
  * checkpointed snapshot id.
  *
  * `option("cdc", "true")` switches to the CHANGELOG shape
  * ([[Lakehouse.readChangesCdc]]): rows carry a `_change_type` column
  * (`insert` | `delete`) and MERGE-ON-READ deletes/updates between
  * batches stream as row-level deltas instead of failing — a MoR
  * UPDATE arrives as its old image's delete plus its new image's
  * insert. True rewrites still fail loudly in either mode.
  *
  * `option("ticks", "true")` switches to the SCHEDULER shape: each
  * micro-batch is just the snapshot ids committed in the interval
  * (one `snapshot_id` row per commit, straight off the manifest —
  * zero data I/O) and NEVER fails on rewrites, because there is no
  * interval data to mis-emit. This is what the maintenance streams
  * ([[EventStream.maintainMview]] and friends) consume: the batch is
  * only a wake-up, the maintained artifact re-derives its own delta
  * from its own watermarks — so a compaction on the watched table
  * must not wedge the maintenance query the way a data-carrying
  * interval read rightly would.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft.streaming.LakehouseStreamProvider")
  *   .option("root", lakeRoot).option("table", "events_bronze")
  *   .load()
  * }}}
  *
  * Scale posture: planning is O(appended dirs) manifest reads on the
  * driver; the per-batch scan is the appended files only, pruned and
  * schema-faithful through the same [[Lakehouse]] read machinery as
  * batch reads. At 100 TB a tailing hop costs the delta, never the
  * table. */
class LakehouseStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-lakehouse"

  private def required(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key,
      throw new IllegalArgumentException(s"graft-lakehouse stream needs option '$key'"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val lake = new Lakehouse(sqlContext.sparkSession, required(parameters, "root"))
    val data = lake.read(required(parameters, "table"),
      parameters.getOrElse("branch", "main")).schema
    (shortName(),
      if (parameters.get("ticks").exists(_.toBoolean))
        LakehouseStreamSource.ticksSchema
      else if (parameters.get("cdc").exists(_.toBoolean))
        LakehouseStreamSource.withChangeType(data)
      else data)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new LakehouseStreamSource(sqlContext.sparkSession, required(parameters, "root"),
      required(parameters, "table"), parameters.getOrElse("branch", "main"),
      parameters.get("startSnapshot").map(_.toLong),
      parameters.get("cdc").exists(_.toBoolean),
      parameters.get("maxSnapshotsPerBatch").map { v =>
        val n = v.toInt
        require(n > 0, s"maxSnapshotsPerBatch must be positive, got $n")
        n
      },
      parameters.get("ticks").exists(_.toBoolean))
}

object LakehouseStreamSource {
  /** The CDC schema: the table's columns plus `_change_type`. */
  def withChangeType(data: StructType): StructType =
    StructType(data.fields :+ org.apache.spark.sql.types.StructField(
      "_change_type", org.apache.spark.sql.types.StringType, nullable = false))
  /** The scheduler schema: one snapshot id per interval commit. */
  val ticksSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("snapshot_id",
      org.apache.spark.sql.types.LongType, nullable = false)))
}

/** See [[LakehouseStreamProvider]]. `startSnapshot` = tail from that
  * snapshot (exclusive) instead of emitting the full history first;
  * `cdc` = changelog shape (`_change_type` rows, MoR deltas stream).
  *
  * Implements [[SupportsTriggerAvailableNow]] the way Spark's own v1
  * `FileStreamSource` does: `Trigger.AvailableNow` pins the branch's
  * snapshot at stream start and drains up to exactly that offset, so
  * the query terminates deterministically even while writers keep
  * committing — no single-batch fallback, no warning. */
class LakehouseStreamSource(spark: SparkSession, root: String, table: String,
    branch: String, startSnapshot: Option[Long], cdc: Boolean = false,
    maxSnapshotsPerBatch: Option[Int] = None, ticks: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val lake = new Lakehouse(spark, root)

  override val schema: StructType =
    if (ticks) LakehouseStreamSource.ticksSchema
    else {
      val data = lake.read(table, branch).schema
      if (cdc) LakehouseStreamSource.withChangeType(data) else data
    }

  // the snapshot AvailableNow drains to: pinned once at query start
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = lake.currentSnapshot(table, branch)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  /** Cap a catch-up at `maxSnapshotsPerBatch` snapshots past `from`
    * along the manifest's commit order (Iceberg's
    * `streaming-max-files-per-micro-batch` admission-control analog,
    * at snapshot granularity — our unit of appended data). A long
    * outage then drains as several bounded micro-batches instead of
    * one giant scan whose failure loses all progress; each batch's
    * offset commits, so a crash mid-catch-up resumes at the last
    * drained snapshot, not the outage start. The bootstrap batch
    * (no start offset) is the full snapshot and can't be split —
    * use `startSnapshot` to skip history when tailing. */
  private def capAt(from: Option[Long], target: Long): Long =
    (maxSnapshotsPerBatch, from) match {
      case (Some(n), Some(f)) if f != target =>
        val chain = lake.snapshots(table).map(_._1)
        val after = chain.dropWhile(_ != f).drop(1)
        // snapshots strictly after `from`, up to and including `target`
        val window =
          if (after.contains(target)) after.takeWhile(_ != target) :+ target
          else after
        window.take(n).lastOption.getOrElse(target)
      case _ => target
    }

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(_.json.toLong).orElse(startSnapshot)
    availableNowCap.orElse(lake.currentSnapshot(table, branch))
      .map(t => LongOffset(capAt(from, t))).orNull
  }

  override def getOffset: Option[Offset] =
    lake.currentSnapshot(table, branch).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // start arrives as LongOffset in-session and SerializedOffset from
    // a checkpoint restart; both carry the snapshot id as their json
    val to = end.json.toLong
    val from = start.map(_.json.toLong).orElse(startSnapshot)
    def tagInserts(df: DataFrame) =
      if (cdc) df.withColumn("_change_type", lit("insert")) else df
    if (ticks) {
      // scheduler shape: the interval's snapshot ids, manifest-only —
      // rewrites cannot fail a batch that carries no interval data
      val chain = lake.snapshots(table).map(_._1)
      val ids = from match {
        case None => chain.filter(_ <= to)
        case Some(f) => chain.filter(id => id > f && id <= to)
      }
      import spark.implicits._
      return StreamingShim.asStreaming(ids.toDF("snapshot_id"))
    }
    StreamingShim.asStreaming(from match {
      case None => tagInserts(lake.readSnapshot(table, to))
      case Some(f) if f == to =>
        tagInserts(lake.readSnapshot(table, to).where(lit(false)))
      case Some(f) if cdc => lake.readChangesCdc(table, f, to)
      case Some(f) => lake.readChanges(table, f, to)
    })
  }

  override def stop(): Unit = ()

  override def toString: String = s"LakehouseStreamSource[$table@$branch, $root]"
}

package graft.sources.spj

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.sources.Lakehouse

/** DSv2 MICRO-BATCH STREAMING of a catalog table —
  * `spark.readStream.table("cat.t")`, the Iceberg streaming-read
  * shape on the SQL-native surface (no provider string, no options:
  * the catalog IS the stream source). Offsets are SNAPSHOT IDS, the
  * same contract as [[graft.streaming.LakehouseStreamSource]]: each
  * micro-batch plans exactly the files of the data dirs APPENDED
  * between two snapshots — metadata-only planning off the layout at
  * the batch's end snapshot, so identity-column injection, pruned
  * projection and the vectorized parquet path all ride the shared
  * batch reader ([[SpjReaders]]). The first batch is the full
  * snapshot at stream start. A REWRITE inside an interval (replace,
  * CoW DML, compaction) fails the stream loudly instead of silently
  * re-emitting rewritten rows — Iceberg's incremental-read rule.
  * Restart resumes from the checkpointed snapshot id;
  * `Trigger.AvailableNow` pins the head at start and drains to
  * exactly it. At 100 TB a tailing hop costs the delta's files,
  * never the table. */
private[spj] class GraftSpjMicroBatchStream(root: String, table: String,
    branch: String, required: StructType)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def lake = new Lakehouse(SparkSession.active, root)

  // the snapshot AvailableNow drains to: pinned once at query start
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = lake.currentSnapshot(table, branch)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The pre-first-batch sentinel: no snapshot consumed yet. */
  private val Bootstrap = -1L

  override def initialOffset(): Offset = LongOffset(Bootstrap)
  override def deserializeOffset(json: String): Offset = LongOffset(json.toLong)
  override def latestOffset(): Offset =
    availableNowCap.orElse(lake.currentSnapshot(table, branch))
      .map(LongOffset(_)).orNull
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.json().toLong
    val to = end.json().toLong
    if (from == to) return Array.empty
    val l = lake
    val entriesAt = (s: Long) => l.snapshots(table).find(_._1 == s)
      .getOrElse(throw new IllegalStateException(
        s"$table has no snapshot $s (expired under a running stream? " +
          "retain snapshots longer than the stream's restart window)"))._2.toSet
    val toEntries = entriesAt(to)
    val appendedTop: Set[String] = if (from == Bootstrap) {
      toEntries.map(_.takeWhile(_ != '/'))
    } else {
      val fromEntries = entriesAt(from)
      val removed = fromEntries -- toEntries
      if (removed.nonEmpty) throw new IllegalStateException(
        s"$table was REWRITTEN between snapshots $from and $to " +
          s"(${removed.take(3).mkString(", ")} left the table) — streaming reads " +
          "serve append-only intervals; switch to batch refresh or CDC")
      (toEntries -- fromEntries).map(_.takeWhile(_ != '/'))
    }
    // the layout AT the end snapshot: files grouped per partition with
    // their leaf entries — filter to the appended data dirs only
    val layout = l.spjLayout(table, branch, Some(to))
    (0 until layout.nParts).map { i =>
      GraftBucketPartition(
        layout.identityKeyAt(i).map(_._2).toSeq ++ layout.bucketAt(i),
        layout.files.getOrElse(i, Seq.empty)
          .filter(f => appendedTop(f.entry.takeWhile(_ != '/'))).toArray)
    }.filter(_.files.nonEmpty).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the reader binds to the CURRENT layout's schema shape; the
    // layout is re-resolved per factory build so schema stays the
    // pinned table schema (evolution refuses in spjLayout)
    SpjReaders.factory(lake.spjLayout(table, branch), required, Seq.empty)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftSpjMicroBatchStream[$table@$branch, $root]"
}

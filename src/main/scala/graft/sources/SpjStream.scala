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
  * re-emitting rewritten rows — Iceberg's incremental-read rule — and
  * so does a MERGE-ON-READ DELETE inside an interval (rows left the
  * table but no appended dir carries that fact; Iceberg fails delete
  * snapshots too), unless the user opts into
  * `option("streaming-skip-delete-snapshots", "true")` — Iceberg's
  * own escape hatch. Delete PROPAGATION is the lakehouse CDC stream's
  * job (`option("cdc")` on the graft-lakehouse-stream format). The
  * BOOTSTRAP batch is unaffected either way: it reads the full
  * snapshot through the anti-filtering reader, deletes applied.
  * Restart resumes from the checkpointed snapshot id;
  * `Trigger.AvailableNow` pins the head at start and drains to
  * exactly it. At 100 TB a tailing hop costs the delta's files,
  * never the table. */
private[spj] class GraftSpjMicroBatchStream(root: String, table: String,
    branch: String, required: StructType, skipDeleteSnapshots: Boolean = false)
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
      // MERGE-ON-READ deletes inside the interval add only a
      // `_deletes-` dir — the appended-entry diff is blind to them, so
      // a tailing replica would silently diverge (rows left the table
      // and downstream never learns). Iceberg's posture, ours too:
      // FAIL the interval loudly unless the user opted into skipping
      // (`streaming-skip-delete-snapshots`, Iceberg's own option name —
      // appended rows still stream, the deletes' effect is knowingly
      // ignored). True delete propagation is the lakehouse CDC stream
      // (format graft-lakehouse-stream, option("cdc")).
      val allDels = l.snapshotDeletes(table)
      val newDels = allDels.getOrElse(to, Seq.empty).toSet --
        allDels.getOrElse(from, Seq.empty).toSet
      if (newDels.nonEmpty && !skipDeleteSnapshots) throw new IllegalStateException(
        s"$table committed merge-on-read DELETE(s) between snapshots $from and $to " +
          s"(${newDels.toSeq.sorted.take(3).mkString(", ")}) — a tailing stream cannot " +
          "represent removed rows; replicate deletes with the CDC stream " +
          "(format graft-lakehouse-stream, option(\"cdc\", \"true\")) or opt into " +
          "ignoring them with option(\"streaming-skip-delete-snapshots\", \"true\")")
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
    // the reader binds to the CURRENT layout: per-dir conform
    // projections serve evolved dirs, and merge-on-read tombstones
    // anti-filter per file — which matters exactly for the BOOTSTRAP
    // batch (the full-snapshot read; appended dirs always outrank
    // existing tombstones, so tailing batches are untouched). A
    // mid-stream rename that strands a required column refuses loudly
    // instead of null-filling what used to resolve.
    val layout = lake.spjLayout(table, branch)
    val missing = required.fieldNames.filterNot(layout.schema.fieldNames.contains)
    require(missing.isEmpty,
      s"$table's schema drifted under the running stream — " +
        s"column(s) ${missing.mkString(", ")} no longer resolve; restart the query")
    SpjReaders.factory(layout, required, Seq.empty)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftSpjMicroBatchStream[$table@$branch, $root]"
}

/** DSv2 STREAMING WRITE into a catalog table —
  * `df.writeStream.toTable("cat.t")`, closing the loop
  * [[GraftSpjMicroBatchStream]] opened: bronze→silver hops run
  * END-TO-END on the catalog surface, reader and writer both plain
  * SQL-native streaming, zero provider strings or foreachBatch
  * plumbing. Each epoch stages its rows as plain parquet
  * (executor-side, the shared [[GraftSpjStagingWriter]]) and the
  * driver commit lands them through the ordinary layout writer with
  * the EPOCH ID as the exactly-once batch id
  * ([[Lakehouse.appendOnce]] / `replaceOnce` under Complete mode) —
  * a restarted query replaying its last epoch finds the id in the
  * commit ledger and appends nothing, the same dedup contract as the
  * foreachBatch sinks. An epoch that wrote no rows commits nothing. */
private[spj] class GraftSpjStreamingWrite(root: String, table: String,
    spec: Seq[String], branch: String, writeSchema: StructType,
    truncate: Boolean)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.{PhysicalWriteInfo, WriterCommitMessage}
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory
  import org.apache.spark.sql.connector.read.{InputPartition => _}

  private val stagingBase =
    s"$root/$table/_stream-staging-${java.util.UUID.randomUUID()}"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty[String, String], writeSchema)
    val conf = new org.apache.spark.util.SerializableConfiguration(job.getConfiguration)
    // a named factory so the task closure ships (owf, conf, paths)
    // only — the write itself stays driver-side
    GraftSpjEpochWriterFactory(owf, conf, stagingBase, writeSchema)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val staged = messages.toSeq.collect { case GraftSpjStagedFile(Some(p)) => p }
    try {
      if (staged.nonEmpty) {
        val df = spark.read.schema(writeSchema).parquet(staged: _*)
        val lake = new Lakehouse(spark, root)
        if (truncate) lake.replaceOnce(df, table, batchId = epochId, spec, branch)
        else lake.appendOnce(df, table, batchId = epochId, spec, branch)
      }
    } finally deleteEpoch(spark, epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    deleteEpoch(SparkSession.active, epochId)

  private def deleteEpoch(spark: SparkSession, epochId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$stagingBase/epoch-$epochId")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    // the base dir goes when its last epoch does (idempotent)
    val base = new org.apache.hadoop.fs.Path(stagingBase)
    if (fs.exists(base) && fs.listStatus(base).isEmpty) fs.delete(base, true)
    ()
  }
}

/** Epoch-scoped staging writers for the streaming write — each epoch
  * stages under its own subdir so commit/abort are per-epoch. */
private[spj] case class GraftSpjEpochWriterFactory(
    owf: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: org.apache.spark.util.SerializableConfiguration,
    stagingBase: String, schema: StructType)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] =
    new GraftSpjStagingWriter(owf, conf, s"$stagingBase/epoch-$epochId",
      schema, partitionId, taskId)
}

package graft.sources.spj

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.sources.{Lakehouse, SpjFile, SpjLayout}

/** COPY-ON-WRITE ROW-LEVEL OPERATIONS on the SPJ catalog — what makes
  * Spark's own `UPDATE cat.t SET … WHERE …` and `MERGE INTO cat.t
  * USING src ON … WHEN MATCHED …` plan natively against a graft
  * layout, the way they do against an Iceberg table (the reference's
  * MERGE lifecycle, mongo_to_iceberg.py, runs exactly this statement
  * shape through Iceberg's Spark extensions). Spark's group-based
  * rewrite (`RewriteUpdateTable`/`RewriteMergeIntoTable`/
  * `RewriteDeleteFromTable`) needs two connector legs:
  *
  *  - a CoW SCAN ([[GraftSpjCowScan]]) that reads the affected GROUPS
  *    whole. Our replace granularity is the snapshot-ledger ENTRY
  *    (a data dir or partition leaf — the unit [[Lakehouse]] commits
  *    carry by reference), so pruning here is entry-conservative: an
  *    entry leaves the scan only when EVERY file in it provably holds
  *    no matching row (static stat/partition pruning at plan time,
  *    runtime group filtering at execution — Spark ships the matching
  *    partition keys via [[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]
  *    before execution, so an UPDATE touching one bucket rewrites one
  *    bucket's entries, not the table). Unlike the plain read, NO
  *    filter reaches the parquet reader: carried rows must round-trip
  *    byte-exact, and a row-group skip would silently drop them.
  *
  *  - a REPLACE-DATA WRITE ([[GraftSpjReplaceWrite]]) whose executors
  *    stage the rewritten rows as plain parquet
  *    (`_cow-staging-<uuid>/`, invisible to readers), and whose
  *    driver-side commit swaps the scanned entries for one fresh data
  *    dir written UNDER THE TABLE'S OWN LAYOUT via
  *    [[Lakehouse.replaceEntries]] — stats/sums/sort ledgers, hidden
  *    partitioning and optimistic concurrency all ride the ordinary
  *    writer. The commit is CONDITIONAL on the snapshot the scan
  *    pinned: a racing writer moving the branch fails the statement
  *    loudly ([[graft.sources.CommitConflictException]]) instead of
  *    resurrecting stale carried rows — Iceberg's
  *    serializable-isolation contract for CoW DML.
  *
  * With this in place the DSv2 surface is write-complete: INSERT
  * (append), INSERT OVERWRITE (truncate), DELETE (metadata-filter
  * fast path via [[org.apache.spark.sql.connector.catalog.SupportsDelete]],
  * CoW fallback here for conditions beyond the filter algebra —
  * Spark's `OptimizeMetadataOnlyDeleteFromTable` picks per statement),
  * UPDATE and MERGE. At 100 TB the cost model is the right one: a
  * keyed UPDATE prices O(matching entries) rewrite + one staging pass
  * of the rewritten rows, never a table rewrite, and the carried
  * entries move by ledger reference only. */
private[spj] class GraftSpjRowLevelOp(root: String, tableName: String,
    branch: String, layout: SpjLayout, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** The CoW scan of this statement — set at scan build, read at write
    * commit (Spark builds the scan strictly before executing the
    * write, and commit happens after execution, so the handoff is
    * race-free within the one statement that owns this op). */
  @volatile private[spj] var cowScan: GraftSpjCowScan = _

  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjCowScanBuilder(layout, this)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftSpjReplaceWrite(root, tableName, branch, layout, GraftSpjRowLevelOp.this,
          info.schema())
    }
  override def description(): String = s"GraftSpjCoW $cmd $tableName@$branch"
}

/** Filter pushdown for the CoW scan: pruning only, ENTRY-granular,
  * nothing reaches the reader. Every filter stays residual — the
  * rewritten plan re-evaluates the full condition on rows, and the
  * scan's job is just to keep every entry that might hold a match
  * (plus, unavoidably, every row of those entries: they are rewritten
  * whole). */
private[spj] class GraftSpjCowScanBuilder(layout: SpjLayout, op: GraftSpjRowLevelOp)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  import org.apache.spark.sql.sources.Filter

  private var required: StructType = layout.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SpjPruning.usable)
    filters // ALL residual: pruning is may-match only
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val allowedId = for {
      ic <- layout.identityCol
      keys <- layout.identityKeys
      a <- SpjPruning.allowedIdentity(ic, keys, pushed.toSeq)
    } yield a
    val allowedBk = layout.bucketLevel.flatMap { case (n, k) =>
      SpjPruning.allowedBuckets(k, n, pushed.toSeq)
    }
    // an entry stays in the scan iff ANY of its files may hold a match;
    // kept entries keep ALL their files (they are replaced whole)
    val live: Set[String] = layout.files.toSeq.flatMap { case (i, fs) =>
      fs.collect {
        case f if layout.keepPartition(i, allowedId, allowedBk) &&
          pushed.forall(SpjPruning.mayMatch(f.stats, _)) => f.entry
      }
    }.toSet
    val files = layout.files.map { case (i, fs) =>
      i -> fs.filter(f => live(f.entry))
    }
    val scan = new GraftSpjCowScan(layout, required, files)
    op.cowScan = scan
    scan
  }
}

/** The CoW read: [[GraftSpjScan]] with ZERO reader-side filters (every
  * row of every kept entry must round-trip), entry-granular runtime
  * group filtering, and the final kept-entry set exposed for the
  * replace commit. Partitioning/ordering/statistics reports are
  * inherited — a MERGE between two co-partitioned SPJ tables plans
  * its join Exchange-free exactly like a read-only join. */
private[spj] class GraftSpjCowScan(layout: SpjLayout, required: StructType,
    cowFiles: Map[Int, Seq[SpjFile]])
  extends GraftSpjScan(layout, required, cowFiles, Seq.empty) {

  // the post-order-claim seed: runtime re-expansion must preserve the
  // per-partition file order the ordering claim promised
  private val seeded: Map[Int, Seq[SpjFile]] = files

  override def filter(filters: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    super.filter(filters) // file-level partition + stat pruning
    // re-expand to whole entries: a file surviving the runtime filter
    // means its entry is rewritten, so every sibling file must be
    // scanned (their rows carry into the replacement)
    val live = files.valuesIterator.flatten.map(_.entry).toSet
    files = seeded.map { case (i, fs) => i -> fs.filter(f => live(f.entry)) }
  }

  /** The snapshot entries this scan actually read (post runtime
    * filtering) — exactly the set the replace commit swaps out. */
  private[spj] def removedEntries: Seq[String] =
    files.valuesIterator.flatten.map(_.entry).toSeq.distinct.sorted

  override def description(): String = super.description() + " CoW"
}

/** One staged parquet file per non-empty write task. */
private[spj] case class GraftSpjStagedFile(path: Option[String])
  extends WriterCommitMessage

/** The replace-data write: executors stage rows as plain parquet; the
  * driver commit re-reads the staging set and hands it to
  * [[Lakehouse.replaceEntries]] together with the CoW scan's final
  * entry set. Staging is the honest cost of routing the rewrite back
  * through the table's own writer (stats/sums/sort/bloom ledgers,
  * hidden-partition dirs and write distribution all re-derive
  * bit-identically to every other write path); it prices one extra
  * sequential pass over the REWRITTEN rows only — the carried entries
  * never move. */
private[spj] class GraftSpjReplaceWrite(root: String, tableName: String,
    branch: String, layout: SpjLayout, op: GraftSpjRowLevelOp,
    writeSchema: StructType) extends Write with BatchWrite {

  private val stagingDir =
    s"$root/$tableName/_cow-staging-${java.util.UUID.randomUUID()}"

  override def toBatch: BatchWrite = this
  override def description(): String = s"GraftSpjReplaceData $tableName@$branch"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // the session's own parquet writer factory (codec, dictionary,
    // micros timestamps all from the session conf) — serializable by
    // design, exactly how FileFormatWriter ships it to tasks
    val owf = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], writeSchema)
    new GraftSpjStagingWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), stagingDir, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val staged = messages.toSeq.collect { case GraftSpjStagedFile(Some(p)) => p }
    try {
      // the scan is built strictly before the write executes; a missing
      // handoff must refuse — an empty removed set would re-append the
      // carried rows the query already wrote (silent duplication)
      val removed = Option(op.cowScan).getOrElse(throw new IllegalStateException(
        s"replace-data commit for $tableName without its CoW scan — " +
          "the row-level operation was not planned through GraftSpjCowScanBuilder"))
        .removedEntries
      val replacement =
        if (staged.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], layout.schema)
        else
          spark.read.schema(writeSchema).parquet(staged: _*)
            .select(layout.schema.fieldNames.toIndexedSeq
              .map(org.apache.spark.sql.functions.col): _*)
      new Lakehouse(spark, root).replaceEntries(
        tableName, branch, layout.snapshot, removed, replacement, layout.spec)
    } finally deleteStaging(spark)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging(SparkSession.active)

  private def deleteStaging(spark: SparkSession): Unit = {
    val p = new Path(stagingDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ()
  }
}

/** DELTA-BASED (merge-on-read) ROW-LEVEL OPERATIONS — the Iceberg v2
  * position-delete DML shape, taken when the session routes
  * `spark.graft.update-mode` / `delete-mode` to merge-on-read: the
  * scan reads MATCHED rows (ordinary may-match file pruning — not the
  * CoW scan's whole-entry strictness) together with their
  * `(_file, _pos)` row ids ([[SpjMetaColumns]]), updates decompose to
  * delete + insert pairs (`representUpdateAsDeleteAndInsert`), and
  * the write stages two legs per task — position rows and new images.
  * The driver commit lands ONE snapshot: a `_deletes-<snap>`
  * positional tombstone plus (when images exist) one `data-<snap>`
  * dir under the table's own layout ([[Lakehouse.commitDelta]]),
  * carrying every existing entry BY REFERENCE. At 100 TB a wide
  * low-selectivity UPDATE prices O(matched rows) instead of the CoW
  * path's full-leaf rewrites — and the SPJ read path serves the
  * result directly (per-file anti-filters), so compaction stays a
  * throughput optimization, not a correctness step. Conditional on
  * the scan's pinned snapshot, exactly like the CoW commit. */
private[spj] class GraftSpjDeltaOp(root: String, tableName: String,
    branch: String, layout: SpjLayout, cmd: RowLevelOperation.Command)
  extends RowLevelOperation with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(layout)
  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    SpjMetaColumns.Names.map(
      org.apache.spark.sql.connector.expressions.Expressions.column).toArray
  override def representUpdateAsDeleteAndInsert(): Boolean = true
  override def newWriteBuilder(info: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new GraftSpjDeltaWrite(root, tableName, branch, layout, info.schema())
    }
  override def description(): String = s"GraftSpjDelta $cmd $tableName@$branch"
}

/** The delta write: per-task staged parquet for position deletes and
  * new row images, one conditional snapshot at commit. */
private[spj] class GraftSpjDeltaWrite(root: String, tableName: String,
    branch: String, layout: SpjLayout, writeSchema: StructType)
  extends org.apache.spark.sql.connector.write.DeltaWrite
  with org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private val stagingDir =
    s"$root/$tableName/_delta-staging-${java.util.UUID.randomUUID()}"

  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite = this
  override def description(): String = s"GraftSpjDeltaWrite $tableName@$branch"

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    val spark = SparkSession.active
    val rowJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val rowOwf = new ParquetFileFormat().prepareWrite(
      spark, rowJob, Map.empty[String, String], writeSchema)
    val rowConf = new SerializableConfiguration(rowJob.getConfiguration)
    // SEPARATE job/conf per schema: prepareWrite embeds the write
    // schema into the conf it is handed
    val posJob = Job.getInstance(spark.sessionState.newHadoopConf())
    val posOwf = new ParquetFileFormat().prepareWrite(
      spark, posJob, Map.empty[String, String], GraftSpjDeltaWrite.PosSchema)
    val posConf = new SerializableConfiguration(posJob.getConfiguration)
    GraftSpjDeltaWriterFactory(rowOwf, rowConf, posOwf, posConf,
      stagingDir, writeSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val staged = messages.toSeq.collect { case m: GraftSpjDeltaStaged => m }
    try {
      val delPaths = staged.flatMap(_.posPath)
      val rowPaths = staged.flatMap(_.rowPath)
      val positions =
        if (delPaths.isEmpty) None
        else Some(spark.read.schema(GraftSpjDeltaWrite.PosSchema)
          .parquet(delPaths: _*))
      val inserts =
        if (rowPaths.isEmpty) None
        else Some(spark.read.schema(writeSchema).parquet(rowPaths: _*)
          .select(layout.schema.fieldNames.toIndexedSeq
            .map(org.apache.spark.sql.functions.col): _*))
      new Lakehouse(spark, root).commitDelta(
        tableName, branch, layout.snapshot, positions, inserts, layout.spec)
    } finally deleteStaging(spark)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging(SparkSession.active)

  private def deleteStaging(spark: SparkSession): Unit = {
    val p = new Path(stagingDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ()
  }
}

private[spj] object GraftSpjDeltaWrite {
  /** The positional-tombstone schema — column names MUST match the
    * `_deletes-<snap>` contract every reader anti-joins on. */
  val PosSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("__file",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("__pos",
      org.apache.spark.sql.types.LongType, nullable = false)))
}

private[spj] case class GraftSpjDeltaStaged(rowPath: Option[String],
    posPath: Option[String]) extends WriterCommitMessage

private[spj] case class GraftSpjDeltaWriterFactory(
    rowOwf: OutputWriterFactory, rowConf: SerializableConfiguration,
    posOwf: OutputWriterFactory, posConf: SerializableConfiguration,
    stagingDir: String, rowSchema: StructType)
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftSpjDeltaWriter(rowOwf, rowConf, posOwf, posConf,
      stagingDir, rowSchema, partitionId, taskId)
}

/** One task's delta legs: `delete` stages the row id as a position
  * row, `insert` stages the image; `update` never fires (updates are
  * represented as delete + insert). Writers open lazily — a task that
  * only deletes stages no row file and vice versa. */
private[spj] class GraftSpjDeltaWriter(
    rowOwf: OutputWriterFactory, rowConf: SerializableConfiguration,
    posOwf: OutputWriterFactory, posConf: SerializableConfiguration,
    stagingDir: String, rowSchema: StructType, partitionId: Int, taskId: Long)
  extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {

  private var rowWriter: OutputWriter = _
  private var rowPath: String = _
  private var posWriter: OutputWriter = _
  private var posPath: String = _
  private val posRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

  private def ctx(kind: String) = new TaskAttemptContextImpl(
    (if (kind == "rows") rowConf else posConf).value,
    new TaskAttemptID(new TaskID(new JobID(s"graft-delta-$kind", 0),
      TaskType.MAP, partitionId), 0))

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (posWriter == null) {
      val c = ctx("pos")
      posPath = s"$stagingDir/pos/part-$partitionId-$taskId${posOwf.getFileExtension(c)}"
      posWriter = posOwf.newInstance(posPath, GraftSpjDeltaWrite.PosSchema, c)
    }
    // id arrives in rowId() order: (_file, _pos)
    posRow.update(0, id.getUTF8String(0).clone())
    posRow.setLong(1, id.getLong(1))
    posWriter.write(posRow)
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IllegalStateException(
      "updates are represented as delete + insert pairs")

  override def insert(row: InternalRow): Unit = {
    if (rowWriter == null) {
      require(row.numFields == rowSchema.length,
        s"delta insert row width ${row.numFields} != schema ${rowSchema.length}")
      val c = ctx("rows")
      rowPath = s"$stagingDir/rows/part-$partitionId-$taskId${rowOwf.getFileExtension(c)}"
      rowWriter = rowOwf.newInstance(rowPath, rowSchema, c)
    }
    rowWriter.write(row)
  }

  override def commit(): WriterCommitMessage = {
    if (rowWriter != null) rowWriter.close()
    if (posWriter != null) posWriter.close()
    GraftSpjDeltaStaged(Option(rowPath), Option(posPath))
  }
  override def abort(): Unit = {
    if (rowWriter != null) rowWriter.close()
    if (posWriter != null) posWriter.close()
  }
  override def close(): Unit = ()
}

private[spj] class GraftSpjStagingWriterFactory(owf: OutputWriterFactory,
    conf: SerializableConfiguration, stagingDir: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSpjStagingWriter(owf, conf, stagingDir, schema, partitionId, taskId)
}

/** One task's staging leg: rows to one parquet file (opened lazily —
  * empty tasks stage nothing), path reported in the commit message.
  * Shared by the CoW replace write and the streaming epoch write. */
private[spj] class GraftSpjStagingWriter(owf: OutputWriterFactory,
    conf: SerializableConfiguration, stagingDir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private var writer: OutputWriter = _
  private var path: String = _
  // Spark's group-based rewrites PREPEND `__row_operation`
  // (RowDeltaUtils.OPERATION_COLUMN) to the replacement rows, and
  // with no required metadata attributes the plain writing task
  // hands them through un-projected — strip the marker column when
  // present (row one wider than the declared write schema; every
  // surviving row is a write in group-based semantics, so the
  // operation code itself carries no information here)
  private var strip = false
  private lazy val stripProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          i + 1, f.dataType, f.nullable)
      })
  override def write(row: InternalRow): Unit = {
    if (writer == null) { // open lazily: empty tasks stage nothing
      require(row.numFields == schema.length || row.numFields == schema.length + 1,
        s"row width ${row.numFields} matches neither the write schema " +
          s"(${schema.length}) nor schema + operation column")
      strip = row.numFields == schema.length + 1
      val ctx = new TaskAttemptContextImpl(conf.value,
        new TaskAttemptID(new TaskID(new JobID("graft-cow", 0),
          TaskType.MAP, partitionId), 0))
      path = s"$stagingDir/part-$partitionId-$taskId${owf.getFileExtension(ctx)}"
      writer = owf.newInstance(path, schema, ctx)
    }
    writer.write(if (strip) stripProj(row) else row)
  }
  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    GraftSpjStagedFile(Option(path))
  }
  override def abort(): Unit = {
    if (writer != null) writer.close()
    // physical cleanup is the staging-dir delete on the driver
  }
  override def close(): Unit = ()
}

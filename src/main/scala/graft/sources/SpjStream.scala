package graft.sources.spj

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.sources.{Lakehouse, SpjFile}

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
  * own escape hatch. Delete PROPAGATION is the CDC stream's job —
  * `option("cdc", "true")` right here on the catalog surface
  * ([[GraftSpjCdcMicroBatchStream]]) or on the
  * graft-lakehouse-stream format. The
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
          "(readStream.option(\"cdc\", \"true\").table(...), or format " +
          "graft-lakehouse-stream) or opt into " +
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

/** DSv2 CDC (CHANGELOG) STREAMING of a catalog table (r15) —
  * `spark.readStream.option("cdc", "true").table("cat.t")
  * .select($"*", $"_change_type")`, the Iceberg-parity ergonomics the
  * round-14 verdict asked for: delete PROPAGATION on the catalog
  * surface itself, not only on the format-string lakehouse stream.
  * Offsets are SNAPSHOT IDS, same as the plain stream; each
  * micro-batch emits the interval's NET row deltas tagged
  * `_change_type` ∈ insert | delete (the table's `_change_type`
  * metadata column must be selected — without it a changelog is
  * indistinguishable from a tail, so the stream refuses):
  *
  *  - INSERT leg: the appended dirs' files through the STANDARD
  *    anti-filtering reader at the end snapshot — seq-gating applies
  *    exactly the interval's new tombstones to them, so a row inserted
  *    AND deleted inside one interval nets to NOTHING for free (the
  *    net-out [[graft.sources.Lakehouse.readChangesCdc]] pays an
  *    anti-join for);
  *  - DELETE leg: only the pre-existing dirs a NEW tombstone touches
  *    (positional: the files its recorded paths name; equality: the
  *    lower-sequence dirs) read through a layout whose deletes are the
  *    OLD tombstones only — rows alive at the start snapshot — and the
  *    reader keeps exactly the rows a new tombstone matches
  *    (positional by (file, raw row index); equality by null-safe
  *    canonical key tuple, seq-gated per row via the `_file` path's
  *    dir sequence). A MoR UPDATE therefore arrives as its old image's
  *    delete plus its new image's insert — Iceberg's changelog shape.
  *
  * Bootstrap is the full snapshot as inserts (deletes applied — the
  * standard reader). True REWRITES (replace, CoW DML, compaction)
  * still fail loudly: the changelog cannot restate moved bytes.
  * Above-gate NEW positional tombstones serve LAZILY (r16): slice
  * paths + footer bounds plan the touched files, and each delete-leg
  * reader opens its file's admitted slices executor-side — the
  * payload never touches the driver AND the stream never refuses.
  * The one refusal left: tables whose data columns shadow the row-id
  * metadata names (the delete leg needs `_file`/`_pos`).
  * Delta-priced at 100 TB: planning is O(appended dirs +
  * tombstone-touched files — equality legs stats-pruned per
  * tombstone key), never a table diff. */
private[spj] class GraftSpjCdcMicroBatchStream(root: String, table: String,
    branch: String, required: StructType)
  extends MicroBatchStream with SupportsTriggerAvailableNow {
  import graft.sources.{SpjEqTombstone, SpjEqTombstoneFiles, SpjPosTombstone, SpjPosTombstoneFiles, SpjLayout}
  import org.apache.spark.sql.types.StructField

  // STREAMING OUTPUT CONTRACT: Spark applies no column pruning to a
  // micro-batch scan, and when ANY metadata column is referenced the
  // analyzer appends the table's ENTIRE metadataOutput to the
  // relation output — attribute binding is positional against it. So
  // the CDC rows always carry required(= the data schema) ++ every
  // metadata column in [[GraftSpjTable.metadataColumns]] order
  // (`_file`, `_pos`, `_change_type` on unshadowed tables); when the
  // plan referenced none, the trailing fields are simply unbound —
  // harmless. This is what makes `option("cdc","true")` composable
  // with `.select($"*", $"_change_type")`.
  private val rowIdAvailable =
    !required.fieldNames.exists(SpjMetaColumns.Names.contains)
  private val metaFields: Array[StructField] =
    (if (rowIdAvailable) SpjMetaColumns.Fields.toSeq else Seq.empty) ++
      (if (required.fieldNames.exists(_.equalsIgnoreCase(SpjMetaColumns.ChangeType)))
        Seq.empty else Seq(SpjMetaColumns.ChangeTypeField)) match {
      case fs => fs.toArray
    }
  require(metaFields.exists(_.name == SpjMetaColumns.ChangeType),
    s"$table shadows _change_type — a CDC stream cannot tag its rows; " +
      "rename the column or use the format-string CDC stream")

  private def lake = new Lakehouse(SparkSession.active, root)

  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = lake.currentSnapshot(table, branch)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private val Bootstrap = -1L
  override def initialOffset(): Offset = LongOffset(Bootstrap)
  override def deserializeOffset(json: String): Offset = LongOffset(json.toLong)
  override def latestOffset(): Offset =
    availableNowCap.orElse(lake.currentSnapshot(table, branch))
      .map(LongOffset(_)).orNull
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()

  /** The current batch's interval, stashed by [[planInputPartitions]]
    * for [[createReaderFactory]] (Spark calls them in that order for
    * each micro-batch; batches are sequential per query). */
  @volatile private var interval: (Long, Long) = (Bootstrap, Bootstrap)

  /** What the inner factories read: the data columns plus the row-id
    * pair (virtual, reader-appended) when the table serves it. */
  private val innerRequired = StructType(
    required.fields ++ (if (rowIdAvailable) SpjMetaColumns.Fields.toSeq else Nil))
  /** The tag's ordinal in the emitted row: data ++ metaFields order. */
  private val outLen = required.length + metaFields.length
  private val ctOut = required.length +
    metaFields.indexWhere(_.name == SpjMetaColumns.ChangeType)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.json().toLong
    val to = end.json().toLong
    interval = (from, to)
    if (from == to) return Array.empty
    val l = lake
    def entriesAt(s: Long) = l.snapshots(table).find(_._1 == s)
      .getOrElse(throw new IllegalStateException(
        s"$table has no snapshot $s (expired under a running stream? " +
          "retain snapshots longer than the stream's restart window)"))._2.toSet
    val toEntries = entriesAt(to)
    val layout = l.spjLayout(table, branch, Some(to))
    def parts(keep: (Int, SpjFile) => Boolean, leg: Byte): Seq[InputPartition] =
      (0 until layout.nParts).map { i =>
        GraftBucketPartition(
          layout.identityKeyAt(i).map(_._2).toSeq ++ layout.bucketAt(i),
          layout.files.getOrElse(i, Seq.empty).filter(keep(i, _)).toArray)
      }.filter(_.files.nonEmpty).map(GraftCdcPartition(leg, _))
    if (from == Bootstrap) {
      val tops = toEntries.map(_.takeWhile(_ != '/'))
      return parts((_, f) => tops(f.entry.takeWhile(_ != '/')), leg = 0).toArray
    }
    val fromEntries = entriesAt(from)
    val removed = fromEntries -- toEntries
    if (removed.nonEmpty) throw new IllegalStateException(
      s"$table was REWRITTEN between snapshots $from and $to " +
        s"(${removed.take(3).mkString(", ")} left the table) — a changelog cannot " +
        "restate rewritten bytes; consume the full snapshot instead")
    val fromDels = l.snapshotDeletes(table).getOrElse(from, Seq.empty).toSet
    val toDels = l.snapshotDeletes(table).getOrElse(to, Seq.empty).toSet
    if (!(fromDels -- toDels).isEmpty) throw new IllegalStateException(
      s"$table dropped tombstones between snapshots $from and $to (a rewrite " +
        "materialized them) — consume the full snapshot instead")
    val appendedTops = (toEntries -- fromEntries).map(_.takeWhile(_ != '/'))
    val inserts = parts((_, f) => appendedTops(f.entry.takeWhile(_ != '/')), leg = 0)
    val newSeqs = (toDels -- fromDels).map(_.stripPrefix("_deletes-").toLong)
    val deletes = if (newSeqs.isEmpty) Seq.empty else {
      val newTombs = layout.deletes.filter(t => newSeqs(t.seq))
      // ABOVE-GATE positional tombstones serve LAZILY (r16): the
      // payload never touches the driver — planning admits a
      // pre-existing file when some new tombstone slice's recorded
      // `__file` footer bounds contain its URL-encoded path (the same
      // unsigned-UTF-8 bound test the batch path's lazy anti-filter
      // uses), and the delete-leg reader opens the admitted slices
      // executor-side per file. A big MoR delete now streams instead
      // of refusing.
      val lazyNew = newTombs.collect { case t: SpjPosTombstoneFiles => t }
      def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      def lazyTouches(f: SpjFile): Boolean = lazyNew.nonEmpty && {
        val encU = u8(SparkPath.fromPathString(f.path).urlEncoded)
        lazyNew.exists(_.slices.exists {
          case (_, _, None) => true // no footer bounds: open it, exact inside
          case (_, _, Some((lo, hi))) =>
            u8(lo).compareTo(encU) <= 0 && encU.compareTo(u8(hi)) <= 0
        })
      }
      // byFile keys are the DECODED Hadoop-Path form (Lakehouse
      // normalizes recorded `__file` strings on load) — compare in
      // that same domain, exactly like the standard reader's bcPos
      // lookup; the URL-encoded SparkPath form silently never matches
      // on roots with encodable characters (space, %, non-ASCII)
      val posFiles: Set[String] = newTombs
        .collect { case t: SpjPosTombstone => t.byFile.keySet }.flatten.toSet
      // PER-TOMBSTONE file sets for the equality leg (r16): an
      // equality tombstone can touch a lower-sequence file only when
      // the file's recorded column stats admit at least one of its
      // key tuples — so a two-tombstone interval whose keys live in
      // disjoint dirs opens exactly those dirs, not every pre-existing
      // one (per-row seq-gating in the reader keeps it exact; wide key
      // sets skip the probe and degrade to the seq rule alone)
      val eqNew = newTombs.collect { case t: SpjEqTombstone => t }
      def eqTombTouches(t: SpjEqTombstone, f: SpjFile): Boolean =
        t.seq > f.dirSeq && (t.keys.size > 64 || t.keys.exists(tup =>
          t.keyCols.zip(tup).forall { case ((c, _), v) =>
            SpjPruning.mayMatch(f.stats, org.apache.spark.sql.sources.EqualTo(c, v))
          }))
      // ABOVE-GATE equality tombstones (r17): the keys live on disk —
      // planning cannot stats- or bucket-prune per key, so every
      // lower-sequence file is admitted (the reader's executor-side
      // set probe keeps the emitted events exact); this is the same
      // admit-all degradation a >64-key broadcast tombstone takes
      val lazyEqNew = newTombs.collect { case t: SpjEqTombstoneFiles => t }
      def lazyEqTouches(f: SpjFile): Boolean = lazyEqNew.exists(_.seq > f.dirSeq)
      // BUCKET pruning per tombstone (r16; gated PER TOMBSTONE since
      // r17 — the unioned allowed set over-admitted multi-tombstone
      // intervals: tombstone A's buckets admitted files only
      // tombstone B's stats touched): a single-column equality key ON
      // the layout's bucket column maps through the layout hash —
      // per-file stats can't discriminate hash-scattered bucket keys,
      // the transform can; a tombstone that can't map (multi-col key,
      // null/non-canonical value, wide set) admits every bucket
      val eqBucketsPer: Seq[Option[Set[Int]]] = {
        // hash-safe key types only: canonKey widens Int/Short/Byte to
        // Long whose toString equals the layout hash input, String
        // passes through, and DATE canonKeys (epoch-day Longs, r17)
        // re-print ISO — bit-identical to the writer's
        // `cast(d AS STRING)` hash input, so `days×bucket` CDC tables
        // prune equality deletes too. Timestamp/Decimal canonKeys do
        // NOT stringify to the writer's dir encoding (and the bucket
        // transform whitelist excludes them anyway): they admit all.
        import org.apache.spark.sql.types._
        def hashSafe(dt: DataType) = dt match {
          case StringType | LongType | IntegerType | ShortType | ByteType |
               DateType => true
          case _ => false
        }
        def canonOf(dt: DataType, v: Any): Option[String] = (dt, v) match {
          case (DateType, d: java.lang.Long) =>
            Some(java.time.LocalDate.ofEpochDay(d.longValue()).toString)
          case _ => SpjPruning.canonicalOf(v)
        }
        eqNew.map { t =>
          layout.bucketLevel.flatMap { case (n, kc) =>
            if (t.keyCols.length == 1 && t.keyCols.head._1.equalsIgnoreCase(kc) &&
              hashSafe(t.keyCols.head._2) && t.keys.size <= 1024) {
              val cs = t.keys.toSeq.map(k => canonOf(t.keyCols.head._2, k.head))
              if (cs.forall(_.isDefined))
                Some(cs.flatten.map(SpjPruning.bucketOf(_, n)).toSet)
              else None
            } else None
          }
        }
      }
      // a file admits when SOME tombstone passes BOTH its own bucket
      // gate and its own stats probe — A's buckets never launder B's
      def eqAdmits(i: Int, f: SpjFile): Boolean =
        eqNew.zip(eqBucketsPer).exists { case (t, allowed) =>
          allowed.forall(a => layout.bucketAt(i).forall(a.contains)) &&
            eqTombTouches(t, f)
        }
      val preTops = fromEntries.map(_.takeWhile(_ != '/'))
      parts((i, f) => preTops(f.entry.takeWhile(_ != '/')) && (
        posFiles.contains(new org.apache.hadoop.fs.Path(f.path).toString) ||
          eqAdmits(i, f) || lazyTouches(f) || lazyEqTouches(f)), leg = 1)
    }
    (inserts ++ deletes).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (from, to) = interval
    val l = lake
    val layout = l.spjLayout(table, branch,
      if (to == Bootstrap) None else Some(to))
    val missing = required.fieldNames
      .filterNot(n => layout.schema.fieldNames.contains(n))
    require(missing.isEmpty,
      s"$table's schema drifted under the running stream — " +
        s"column(s) ${missing.mkString(", ")} no longer resolve; restart the query")
    // INSERT leg: the standard anti-filtering reader (seq-gating
    // applies exactly the interval's new tombstones to appended dirs)
    // emitting innerRequired order = data ++ (row-id pair) — the tag
    // appends LAST, which is exactly the metaFields position
    val insertInner = new GraftSpjTagFactory(
      SpjReaders.factory(layout, innerRequired, Seq.empty), ctOut,
      outLen, "insert", innerRequired.fields.map(_.dataType))
    val newSeqs: Set[Long] =
      if (from == Bootstrap || from == to) Set.empty
      else {
        val fromDels = l.snapshotDeletes(table).getOrElse(from, Seq.empty).toSet
        l.snapshotDeletes(table).getOrElse(to, Seq.empty).toSet
          .diff(fromDels).map(_.stripPrefix("_deletes-").toLong)
      }
    if (newSeqs.isEmpty)
      return new GraftSpjCdcReaderFactory(insertInner, null, null, null, 0, 0, null)
    // the DELETE leg needs row ids: refuse on shadowed tables
    require(rowIdAvailable,
      s"$table shadows the row-id metadata columns (_file/_pos) — the CDC " +
        "delete leg cannot attribute rows; use the format-string CDC stream")
    val (newTombs, oldTombs) = layout.deletes.partition(t => newSeqs(t.seq))
    val eqTombs = newTombs.collect { case t: SpjEqTombstone => t }
    // ABOVE-GATE new equality tombstones (r17): same binding as the
    // broadcast kind, but the key set materializes executor-side
    // (SpjEqKeyCache) — the delete leg streams a huge equality MoR
    // delete with the driver never holding a key
    val lazyEqTombs = newTombs.collect { case t: SpjEqTombstoneFiles => t }
    // the delete leg's read set: data columns + row-id pair + any
    // equality key columns the match still needs, each exactly once
    val extraKeys = (eqTombs.flatMap(_.keyCols) ++ lazyEqTombs.flatMap(_.keyCols))
      .map(_._1).distinct
      .filterNot(n => innerRequired.fieldNames.exists(_.equalsIgnoreCase(n)))
      .map(n => layout.schema.fields.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalStateException(
          s"equality-tombstone key column $n is not in $table's schema")))
    val deleteSchema = StructType(innerRequired.fields.toSeq ++ extraKeys)
    val fileOrd = deleteSchema.fieldNames.indexOf(SpjMetaColumns.File)
    val posOrd = deleteSchema.fieldNames.indexOf(SpjMetaColumns.Pos)
    val deleteInner = SpjReaders.factory(
      layout.copy(deletes = oldTombs), deleteSchema, Seq.empty)
    // merged new positional payloads (under the gate): byFile keys are
    // the DECODED Hadoop-Path form (Lakehouse normalizes on load), but
    // the reader's `_file` value is the URL-ENCODED SparkPath form —
    // RE-ENCODE the keys here, driver-side, so the per-row lookup
    // stays a plain string match (a root with e.g. spaces would
    // otherwise silently drop every CDC delete event)
    val mergedPos: Map[String, Array[Long]] = newTombs
      .collect { case t: SpjPosTombstone => t.byFile.toSeq }.flatten
      .groupBy(_._1).map { case (f, xs) =>
        SparkPath.fromPathString(f).urlEncoded ->
          xs.flatMap(_._2).distinct.sorted.toArray }
    // ABOVE-GATE new positional tombstones (r16): slice paths + footer
    // bounds ship; each delete-leg reader opens the slices its file's
    // encoded path admits and collects that file's positions alone —
    // the payload stays on disk, read executor-side, exactly the batch
    // path's SpjPosTombstoneFiles contract
    val lazySlices: Seq[(String, Long, Option[(String, String)])] = newTombs
      .collect { case t: SpjPosTombstoneFiles => t.slices }.flatten
    val lazyReaderFn: org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[InternalRow] =
      if (lazySlices.isEmpty) null
      else new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .buildReaderWithPartitionValues(
          SparkSession.active, GraftSpjDeltaWrite.PosSchema, new StructType(),
          GraftSpjDeltaWrite.PosSchema, Seq.empty,
          Map(org.apache.spark.sql.execution.datasources.FileFormat
            .OPTION_RETURNING_BATCH -> "false"),
          SparkSession.active.sessionState.newHadoopConf())
    val eqSpecs: Seq[(Long, Array[Int], Array[org.apache.spark.sql.types.DataType],
        Set[Seq[Any]])] =
      eqTombs.map { t =>
        val ords = t.keyCols.map { case (n, _) =>
          deleteSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n)) }.toArray
        val types = ords.map(o => deleteSchema.fields(o).dataType)
        (t.seq, ords, types, t.keys)
      }
    val lazyEqSpecs: Seq[(Long, Array[Int],
        Array[org.apache.spark.sql.types.DataType], SpjEqLazyLoad)] =
      lazyEqTombs.map { t =>
        val ords = t.keyCols.map { case (n, _) =>
          deleteSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n)) }.toArray
        val types = ords.map(o => deleteSchema.fields(o).dataType)
        (t.seq, ords, types,
          SpjEqLazyLoad(t.slices, t.fileSchema.fields.map(_.dataType),
            new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
              .buildReaderWithPartitionValues(
                SparkSession.active, t.fileSchema, new StructType(),
                t.fileSchema, Seq.empty,
                Map(org.apache.spark.sql.execution.datasources.FileFormat
                  .OPTION_RETURNING_BATCH -> "false"),
                SparkSession.active.sessionState.newHadoopConf())))
      }
    // final projection for the delete leg: emitted field -> ordinal in
    // deleteSchema (-1 = the tag slot); emission order is the insert
    // leg's — data ++ metaFields
    val deleteOrdinals: Array[Int] =
      (required.fields.map(f => deleteSchema.fieldNames.indexOf(f.name)) ++
        metaFields.map(m =>
          if (m.name == SpjMetaColumns.ChangeType) -1
          else deleteSchema.fieldNames.indexOf(m.name))).toArray
    new GraftSpjCdcReaderFactory(insertInner, deleteInner,
      deleteSchema, deleteOrdinals, fileOrd, posOrd,
      GraftCdcSemi(mergedPos, eqSpecs, lazySlices, lazyReaderFn, lazyEqSpecs))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftSpjCdcMicroBatchStream[$table@$branch, $root]"
}

/** A CDC-leg-tagged scan partition: leg 0 = insert (standard read +
  * tag), leg 1 = delete (old-tombstone-filtered read, new-tombstone
  * SEMI match + tag). */
private[spj] case class GraftCdcPartition(leg: Byte, inner: GraftBucketPartition)
  extends InputPartition

/** The delete leg's matching payloads: merged new positional
  * tombstones (encoded file path -> sorted raw row indexes), the
  * new equality tombstones' (seq, key ordinals in the delete-leg
  * schema, declared key types, canonical key-tuple set), and the
  * ABOVE-GATE new positional tombstones as on-disk slice descriptors
  * (path, length, optional recorded-`__file` footer bounds in the
  * URL-encoded domain) with the parquet reader that opens them
  * executor-side (r16 — lazy, never driver-materialized), and the
  * ABOVE-GATE new EQUALITY tombstones (r17) with the same binding as
  * `eq` but the key set as an executor-side load descriptor
  * ([[SpjEqLazyLoad]] → [[SpjEqKeyCache]]) instead of a driver set. */
private[spj] case class GraftCdcSemi(
    pos: Map[String, Array[Long]],
    eq: Seq[(Long, Array[Int], Array[org.apache.spark.sql.types.DataType], Set[Seq[Any]])],
    lazySlices: Seq[(String, Long, Option[(String, String)])] = Seq.empty,
    lazyReaderFn: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow] = null,
    lazyEq: Seq[(Long, Array[Int],
      Array[org.apache.spark.sql.types.DataType], SpjEqLazyLoad)] = Seq.empty)

private[spj] class GraftSpjCdcReaderFactory(
    insertInner: PartitionReaderFactory,
    deleteInner: PartitionReaderFactory,
    deleteSchema: StructType,
    deleteOrdinals: Array[Int],
    fileOrd: Int, posOrd: Int,
    semi: GraftCdcSemi) extends PartitionReaderFactory {
  import graft.sources.SpjLayout

  override def createReader(partition: InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdcPartition]
    if (p.leg == 0) return insertInner.createReader(p.inner)
    val in = deleteInner.createReader(p.inner)
    val delTag = org.apache.spark.unsafe.types.UTF8String.fromString("delete")
    val types = deleteSchema.fields.map(_.dataType)
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private val out = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(deleteOrdinals.length)
      private var row: InternalRow = _
      // dir sequence per distinct file path (equality seq-gating),
      // parsed once per file
      private val seqCache = new java.util.HashMap[String, java.lang.Long]()
      private val DirSeq = ".*/data-(\\d+)/.*".r
      private def dirSeqOf(enc: String): Long = {
        val hit = seqCache.get(enc)
        if (hit != null) hit.longValue()
        else {
          val s = enc match { case DirSeq(d) => d.toLong; case _ => Long.MaxValue }
          seqCache.put(enc, s); s
        }
      }
      // above-gate positional payloads load ONCE per distinct file:
      // open only the slices whose footer bounds admit this file's
      // encoded path, keep exactly its rows' positions (the batch
      // path's lazy anti-filter, repurposed as a semi)
      private val lazyCache = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
      private def lazyPosOf(enc: String): java.util.HashSet[java.lang.Long] = {
        val hit = lazyCache.get(enc)
        if (hit != null) return hit
        val set = new java.util.HashSet[java.lang.Long]()
        if (semi.lazySlices.nonEmpty) {
          val encU = org.apache.spark.unsafe.types.UTF8String.fromString(enc)
          def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          semi.lazySlices.foreach {
            case (sp, slen, bounds)
                if bounds.forall { case (lo, hi) =>
                  u8(lo).compareTo(encU) <= 0 && encU.compareTo(u8(hi)) <= 0 } =>
              semi.lazyReaderFn(org.apache.spark.sql.execution.datasources
                .PartitionedFile(InternalRow.empty,
                  SparkPath.fromPathString(sp), 0L, slen,
                  Array.empty[String], 0L, slen, Map.empty))
                .asInstanceOf[Iterator[Any]]
                .flatMap {
                  case b: org.apache.spark.sql.vectorized.ColumnarBatch =>
                    scala.jdk.CollectionConverters.IteratorHasAsScala(b.rowIterator()).asScala
                  case r: InternalRow => Iterator.single(r)
                }
                .foreach { r =>
                  if (r.getUTF8String(0) == encU) set.add(r.getLong(1))
                }
            case _ => ()
          }
        }
        lazyCache.put(enc, set)
        set
      }
      private def matched(r: InternalRow): Boolean = {
        val enc = r.getUTF8String(fileOrd).toString
        val pos = r.getLong(posOrd)
        val posHit = semi.pos.get(enc)
          .exists(a => java.util.Arrays.binarySearch(a, pos) >= 0) ||
          (semi.lazySlices.nonEmpty && lazyPosOf(enc).contains(pos))
        posHit || {
          val dirSeq = dirSeqOf(enc)
          semi.eq.exists { case (seq, ords, ts, keys) =>
            seq > dirSeq && {
              val tup: Seq[Any] = ords.indices.map(i =>
                SpjLayout.canonKey(ts(i), r, ords(i))).toVector
              keys.contains(tup)
            }
          } ||
          // above-gate equality: the executor-materialized set (one
          // load per JVM via SpjEqKeyCache) probed with the same
          // canonical tuple the broadcast branch builds
          semi.lazyEq.exists { case (seq, ords, ts, load) =>
            seq > dirSeq && {
              val tup: Seq[Any] = ords.indices.map(i =>
                SpjLayout.canonKey(ts(i), r, ords(i))).toVector
              SpjEqKeyCache.keysOf(load).contains(tup)
            }
          }
        }
      }
      override def next(): Boolean = {
        while (in.next()) {
          val r = in.get()
          if (matched(r)) { row = r; return true }
        }
        false
      }
      override def get(): InternalRow = {
        var i = 0
        while (i < deleteOrdinals.length) {
          val ord = deleteOrdinals(i)
          out.update(i, if (ord < 0) delTag else row.get(ord, types(ord)))
          i += 1
        }
        out
      }
      override def close(): Unit = in.close()
    }
  }
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

package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType}

/** Iceberg-style SQL maintenance procedures:
  * `CALL system.<proc>(arg, …)` with positional or `name => value`
  * arguments (reference rides Iceberg's Spark procedures — this is
  * the surface behind `spark.sql("CALL catalog.system.…")` a
  * lakehouse operator runs from a scheduler). Supported:
  *
  *  - `rewrite_data_files(table [, strategy [, sort_order [, file_count]]]
  *    [, where => '<pred>'])` — strategy `binpack` (default; folds
  *    dirs smaller than `small_bytes`, default 128 MiB, cost O(small
  *    files)) | `sort` (range-cluster on `sort_order` — falls back to
  *    the table's declared write sort order) | `zorder` (two-column
  *    Morton clustering) | `full` (rewrite everything under the
  *    declared identity layout); `where` scopes the rewrite to
  *    stat-matching entries ([[Lakehouse.compactWhere]] — the hot
  *    partition folds, cold history carries by reference).
  *    Returns the new snapshot id and the parquet
  *    file counts before/after (driver metadata walk — the same
  *    listing the write itself already paid).
  *  - `expire_snapshots(table [, retain_last])` — manifest truncation
  *    + dead-dir collection ([[Lakehouse.expireSnapshots]]; tags and
  *    branch heads always survive).
  *  - `remove_orphan_files(table [, older_than_ms])` — reap dead
  *    writers' leavings ([[Lakehouse.removeOrphans]]); one row per
  *    removed name, empty result = nothing stale.
  *  - `rollback_to_snapshot(table, snapshot_id)` — branch-pointer
  *    move to an earlier committed snapshot.
  *  - `rewrite_position_deletes(table)` — materialize live EQUALITY
  *    tombstones into one positional tombstone, zero data files
  *    rewritten ([[Lakehouse.rewritePositionDeletes]]): unblocks
  *    `DROP COLUMN` of former key columns and removes the per-row key
  *    probe from every read, far cheaper than a full compaction.
  *  - `refresh_mview(view)` — advance a [[MaterializedView]] to its
  *    source's current snapshot (delta-priced incremental merge;
  *    full recompute on rewritten intervals). The definition loads
  *    from the lake's `_mviews.jsonl`, so any session can refresh a
  *    view another session created.
  *  - `refresh_ann_index(src)` — advance the persisted ANN index over
  *    `src` ([[graft.operators.AnnIndex]]): assign only the appended
  *    vectors to the existing centroids.
  *  - `refresh_dedup_index(src)` — advance the persistent near-dup
  *    index over `src` ([[graft.operators.Dedup.indexMaintainStep]]):
  *    signatures for appended documents only, pairs ledgered
  *    exactly-once.
  *  - `rebalance_ann_index(src [, max_load [, force_top]])` — split
  *    the index's hot cells in place ([[graft.operators.AnnIndex
  *    .rebalance]]): cells loaded beyond `max_load` × the mean leaf
  *    load get children trained on their own vectors; only their rows
  *    re-assign. One result row per split parent.
  *
  * All procedures act on the SESSION BRANCH (`spark.graft.branch`,
  * NESSIE_REF semantics), so a branch-scoped maintenance job can
  * compact its own branch without touching `main`. Mutating
  * procedures refresh the registered temp view afterwards.
  */
case class LakehouseCallCommand(proc: String, args: Seq[(Option[String], String)])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = proc match {
    case "rewrite_data_files" => Seq(
      AttributeReference("snapshot_id", LongType)(),
      AttributeReference("files_before", LongType)(),
      AttributeReference("files_after", LongType)())
    case "expire_snapshots" => Seq(
      AttributeReference("expired_snapshots", LongType)(),
      AttributeReference("kept_snapshots", LongType)())
    case "remove_orphan_files" => Seq(
      AttributeReference("orphan_name", StringType)())
    case "rollback_to_snapshot" => Seq(
      AttributeReference("previous_snapshot_id", LongType)(),
      AttributeReference("current_snapshot_id", LongType)())
    case "rewrite_position_deletes" => Seq(
      AttributeReference("snapshot_id", LongType)(),
      AttributeReference("converted_tombstones", LongType)())
    case "refresh_mview" => Seq(
      AttributeReference("snapshot_id", LongType)(),
      AttributeReference("source_snapshot_id", LongType)())
    case "refresh_ann_index" => Seq(
      AttributeReference("source_snapshot_id", LongType)())
    case "refresh_dedup_index" => Seq(
      AttributeReference("source_snapshot_id", LongType)(),
      AttributeReference("new_pairs", LongType)())
    case "rebalance_ann_index" => Seq(
      AttributeReference("parent_cell", LongType)(),
      AttributeReference("child_cells", LongType)())
    case "compute_sums" => Seq(
      AttributeReference("column_name", StringType)())
    case "set_sort_order" | "set_bloom_columns" => Seq(
      AttributeReference("column_name", StringType)())
    case other => throw new UnsupportedOperationException(
      s"unknown procedure: system.$other (supported: rewrite_data_files, " +
        "rewrite_position_deletes, expire_snapshots, remove_orphan_files, " +
        "rollback_to_snapshot, refresh_mview, refresh_ann_index, " +
        "refresh_dedup_index, rebalance_ann_index, compute_sums, " +
        "set_sort_order, set_bloom_columns)")
  }

  /** Positional parameter names per procedure; named args (`k => v`)
    * may come in any order and win over position. */
  private val positional: Seq[String] = proc match {
    case "rewrite_data_files" => Seq("table", "strategy", "sort_order", "file_count")
    case "expire_snapshots" => Seq("table", "retain_last")
    case "remove_orphan_files" => Seq("table", "older_than_ms")
    case "rollback_to_snapshot" => Seq("table", "snapshot_id")
    case "rewrite_position_deletes" => Seq("table")
    case "refresh_mview" => Seq("table")
    case "refresh_ann_index" => Seq("table")
    case "refresh_dedup_index" => Seq("table")
    case "rebalance_ann_index" => Seq("table", "max_load", "force_top")
    case "compute_sums" => Seq("table", "columns")
    case "set_sort_order" | "set_bloom_columns" => Seq("table", "columns")
    case _ => Seq("table")
  }

  private def named: Map[String, String] = {
    val known = positional.toSet + "small_bytes" + "where"
    val (kw, pos) = args.partition(_._1.isDefined)
    kw.foreach { case (k, _) =>
      require(known.contains(k.get.toLowerCase),
        s"system.$proc has no parameter ${k.get} (expected: ${known.mkString(", ")})")
    }
    require(pos.length <= positional.length,
      s"system.$proc takes at most ${positional.length} positional arguments")
    val byPos = positional.zip(pos.map(_._2)).toMap
    // named wins: CALL p('t', strategy => 'sort') must not also bind
    // position 1
    byPos ++ kw.map { case (k, v) => (k.get.toLowerCase, v) }
  }

  /** Strip the quotes from a parsed string literal (doubled-quote
    * escapes un-double); numbers pass through unchanged. */
  private def lit(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  private def longArg(m: Map[String, String], k: String, default: => Long): Long =
    m.get(k).map(v => java.lang.Long.parseLong(lit(v))).getOrElse(default)

  override def run(spark: SparkSession): Seq[Row] = {
    val m = named
    val table = lit(m.getOrElse("table",
      throw new IllegalArgumentException(s"system.$proc needs a table argument")))
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, table)
      .getOrElse(throw new IllegalStateException(s"$table is not a registered lakehouse view"))
    val branch = lake.sessionBranch

    proc match {
      case "rewrite_data_files" =>
        val strategy = m.get("strategy").map(v => lit(v).toLowerCase).getOrElse("binpack")
        val before = lake.filesDf(table, branch).count()
        // `where => '<pred>'` scopes the rewrite to stat-matching
        // entries (Iceberg's row-filter scope); it folds whole
        // matching entries, so clustering strategies don't combine
        val snap = if (m.contains("where")) {
          require(!m.contains("strategy") || strategy == "binpack",
            "rewrite_data_files(where => …) scopes the fold; " +
              "sort/zorder strategies do not combine with a filter")
          lake.compactWhere(org.apache.spark.sql.functions.expr(lit(m("where"))),
            table, partitionBy, branch)
        } else strategy match {
          case "binpack" =>
            lake.compactBinPack(table, longArg(m, "small_bytes", 128L * 1024 * 1024), branch)
          case "sort" =>
            val cols = m.get("sort_order").map(v => lit(v).split(",").map(_.trim).toSeq)
              .getOrElse(lake.sortOrderOf(table))
            require(cols.nonEmpty,
              s"rewrite_data_files(strategy => 'sort') on $table needs sort_order " +
                "(no declared write sort order to fall back to)")
            lake.compactClustered(table, cols, longArg(m, "file_count", 8L).toInt, branch)
          case "zorder" =>
            val cols = m.get("sort_order").map(v => lit(v).split(",").map(_.trim).toSeq)
              .getOrElse(Seq.empty)
            lake.compactZOrdered(table, cols, longArg(m, "file_count", 8L).toInt, branch)
          case "full" =>
            lake.compact(table, partitionBy, branch)
          case other => throw new IllegalArgumentException(
            s"rewrite_data_files strategy must be binpack|sort|zorder|full; got: $other")
        }
        lake.registerView(table, partitionBy)
        Seq(Row(snap, before, lake.filesDf(table, branch).count()))

      case "expire_snapshots" =>
        val retain = longArg(m, "retain_last", 1L).toInt
        require(retain >= 1, s"expire_snapshots must retain at least 1 snapshot, got $retain")
        val before = lake.snapshots(table).size.toLong
        lake.expireSnapshots(table, keepLast = retain)
        val kept = lake.snapshots(table).size.toLong
        Seq(Row(before - kept, kept))

      case "remove_orphan_files" =>
        lake.removeOrphans(table, longArg(m, "older_than_ms", 24L * 3600 * 1000))
          .map(Row(_))

      case "rollback_to_snapshot" =>
        val snap = longArg(m, "snapshot_id",
          throw new IllegalArgumentException("rollback_to_snapshot needs snapshot_id"))
        val prev = lake.currentSnapshot(table, branch)
          .getOrElse(throw new IllegalArgumentException(s"no such table/branch: $table@$branch"))
        lake.rollback(table, snap, branch)
        lake.registerView(table, partitionBy)
        Seq(Row(prev, snap))

      case "rewrite_position_deletes" =>
        val before = lake.snapshotDeletes(table)
          .getOrElse(lake.currentSnapshot(table, branch).getOrElse(-1L), Seq.empty)
        val snap = lake.rewritePositionDeletes(table, branch)
        val after = lake.snapshotDeletes(table).getOrElse(snap, Seq.empty)
        lake.registerView(table, partitionBy)
        // converted = equality dirs that left the live set
        Seq(Row(snap, (before.toSet -- after.toSet).size.toLong))

      case "refresh_mview" =>
        val d = MaterializedView.load(lake, table).getOrElse(
          throw new IllegalArgumentException(
            s"$table has no definition in this lake's _mviews.jsonl — " +
              "create it with CREATE MATERIALIZED VIEW"))
        // chain-aware: a fresh view implies a fresh upstream, so a
        // view whose source is itself a view refreshes bottom-up
        val snap = MaterializedView.refreshChain(lake, table)
        lake.registerView(table, partitionBy)
        Seq(Row(snap, MaterializedView.watermark(lake, d)))

      case "refresh_ann_index" =>
        // `table` is the SOURCE the index was created over; advance
        // the index tables to its current snapshot (delta-priced).
        // The one sources→operators reference in this layer: the
        // index machinery lives beside the other ANN operators.
        graft.operators.AnnIndex.refresh(lake, table)
        Seq(Row(lake.currentSnapshot(table, branch).getOrElse(-1L)))

      case "refresh_dedup_index" =>
        // advance the persistent near-dup index over `table` and
        // record the batch's admission pairs in the durable ledger
        val (snap, n) = graft.operators.Dedup.indexMaintainStep(lake, table)
        Seq(Row(snap, n))

      case "rebalance_ann_index" =>
        // split the index's hot cells in place (see AnnIndex.rebalance)
        // — one row per split parent with its new child count
        val maxLoad = m.get("max_load").map(v => lit(v).toDouble).getOrElse(2.0)
        val forceTop = longArg(m, "force_top", 0L).toInt
        graft.operators.AnnIndex.rebalance(lake, table, maxLoad, forceTop)
          .map { case (p, kids) => Row(p, kids.length.toLong) }

      case "compute_sums" =>
        // declare + backfill write-time column sums (the Iceberg
        // compute-stats-procedure analog): `sum(col)` over the table
        // becomes a metadata readout after this returns
        val cols = lit(m.getOrElse("columns",
            throw new IllegalArgumentException("compute_sums needs columns")))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        lake.computeSums(table, cols, branch)
        cols.map(Row(_))

      case "set_sort_order" | "set_bloom_columns" =>
        // declare the write sort order / native-bloom columns through
        // SQL (r16) — the spec-vocabulary twins of declareSortOrder /
        // declareBloomColumns, so SHOW CREATE TABLE's emitted script
        // is fully executable
        val cols = lit(m.getOrElse("columns",
            throw new IllegalArgumentException(s"$proc needs columns")))
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        val schema = lake.tableSchema(table, branch)
        cols.foreach(c => require(
          schema.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"$table has no column $c"))
        if (proc == "set_sort_order") lake.declareSortOrder(table, cols)
        else lake.declareBloomColumns(table, cols)
        cols.map(Row(_))

      case other => throw new UnsupportedOperationException(s"unknown procedure: system.$other")
    }
  }
}

package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** SQL DML over lakehouse tables — the surface the reference gets from
  * Iceberg's SparkSessionExtensions (reference: gold_reporting.py:70
  * `IcebergSparkSessionExtensions` is what makes `MERGE INTO` /
  * `DELETE FROM` real SQL there). [[graft.GraftExtensions]] injects
  * [[GraftSqlParser]], which intercepts the two DML statements for
  * REGISTERED lakehouse views and routes them through the snapshot-
  * committing [[Lakehouse.sqlMerge]]/[[Lakehouse.sqlDelete]] paths;
  * every other statement delegates untouched to Spark's parser.
  */
object LakehouseRegistry {
  // keyed by (session UUID, lowercase view name): two sessions over two
  // lakehouse roots can register the same view name without routing
  // each other's DML to whichever registered last. The UUID (not the
  // SparkSession object) keeps the process-global map from pinning
  // every session it ever saw; unregisterSession drops a dying
  // session's entries so long-lived drivers churning short-lived
  // sessions don't accumulate them.
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (Lakehouse, Seq[String])]()

  // The KEY side is a weak session id ([[SessionIds]]) so the map never
  // pins a session through its keys — but the VALUE side holds Lakehouse
  // handles, which reference their SparkSession. Collection of a retired
  // session therefore still requires unregisterSession; the weak keying
  // only guarantees the registry adds no pin of its own.
  private def key(spark: SparkSession, view: String): (String, String) =
    (SessionIds.idOf(spark), view.toLowerCase(java.util.Locale.ROOT))

  /** Register `view` as DML-addressable in `spark`, with the partition
    * layout its copy-on-write rewrites should preserve. */
  def register(spark: SparkSession, view: String, lake: Lakehouse,
      partitionBy: Seq[String] = Nil): Unit =
    tables.put(key(spark, view), (lake, partitionBy))

  def lookup(spark: SparkSession, view: String): Option[(Lakehouse, Seq[String])] =
    Option(tables.get(key(spark, view)))

  /** Drop one view's DML registration. */
  def unregister(spark: SparkSession, view: String): Unit =
    tables.remove(key(spark, view))

  /** Drop every registration of `spark` — call when retiring a
    * session so its Lakehouse handles become collectable. */
  def unregisterSession(spark: SparkSession): Unit = {
    val id = SessionIds.idOf(spark)
    tables.keySet.removeIf(_._1 == id)
  }

  /** View names registered in `spark` (statement-pinning scan). */
  def names(spark: SparkSession): Seq[String] = {
    val id = SessionIds.idOf(spark)
    import scala.jdk.CollectionConverters._
    tables.keySet.asScala.toSeq.collect { case (sid, n) if sid == id => n }
  }

  /** Parser-time check: is `view` registered in the ACTIVE session? */
  def isRegistered(view: String): Boolean =
    SparkSession.getActiveSession.exists(s => lookup(s, view).isDefined)

  /** Distinct lakes registered in `spark`, as (catalog name, handle).
    * The catalog name is the lake root's final path segment — the role
    * the Nessie catalog name plays in the reference's
    * `SHOW CATALOGS` / `USE nessie` notebook cells. */
  def lakes(spark: SparkSession): Seq[(String, Lakehouse)] = {
    val id = SessionIds.idOf(spark)
    import scala.jdk.CollectionConverters._
    tables.entrySet().asScala.toSeq
      .collect { case e if e.getKey._1 == id => e.getValue._1 }
      .groupBy(_.root).map { case (root, ls) =>
        (new java.io.File(root).getName, ls.head)
      }.toSeq.sortBy(_._1)
  }
}

/** Bounded registry of the `__asof_*`/`__meta_*` temp views the travel
  * rewrite materializes. A view is only needed through ANALYSIS of the
  * one statement that referenced it (an analyzed Dataset inlines the
  * view's plan — dropping the view later never breaks it), so the
  * registry keeps a most-recently-used window of [[TravelViews.Max]]
  * names per session and drops the oldest from the catalog beyond
  * that: a long-lived session issuing thousands of DISTINCT travel
  * references keeps a bounded catalog instead of accumulating one
  * view per distinct snapshot/timestamp/tag forever. */
private[graft] object TravelViews {
  val Max = 32
  private val perSession = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.LinkedHashSet[String]]()
  SessionIds.onRelease(id => perSession.remove(id))

  def track(spark: SparkSession, view: String): Unit = {
    val set = perSession.computeIfAbsent(SessionIds.idOf(spark),
      _ => new java.util.LinkedHashSet[String]())
    set.synchronized {
      set.remove(view) // refresh recency (re-referenced view moves to newest)
      set.add(view)
      while (set.size > Max) {
        val it = set.iterator()
        val oldest = it.next()
        it.remove()
        spark.catalog.dropTempView(oldest)
      }
    }
  }
}

/** Row-level write-mode selection for the parsed SQL DML surface —
  * the Iceberg table-property analog (`write.delete.mode` /
  * `write.update.mode`): session confs `spark.graft.delete-mode` and
  * `spark.graft.update-mode`, value `copy-on-write` (default,
  * read-optimized) or `merge-on-read` (write-optimized: tombstones /
  * deltas, zero data files rewritten — compaction materializes). */
private object WriteMode {
  def isMor(spark: SparkSession, op: String): Boolean =
    spark.conf.get(s"spark.graft.$op-mode", "copy-on-write") match {
      case "copy-on-write" => false
      case "merge-on-read" => true
      case other => throw new IllegalArgumentException(
        s"spark.graft.$op-mode must be copy-on-write or merge-on-read; got: $other")
    }
}

/** `DELETE FROM <lakehouse view> [WHERE <pred>]` — row-level delete
  * committed as a new snapshot; no WHERE deletes every row (the form
  * Iceberg supports); returns the snapshot id. Copy-on-write by
  * default; `spark.graft.delete-mode=merge-on-read` routes through
  * the positional-tombstone path ([[WriteMode]]). */
case class LakehouseDeleteCommand(view: String, whereClause: Option[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    Seq(Row(
      if (WriteMode.isMor(spark, "delete"))
        lake.sqlDeleteMor(view, whereClause.getOrElse("true"))
      else lake.sqlDelete(view, whereClause.getOrElse("true"), partitionBy)))
  }
}

/** `UPDATE <lakehouse view> SET col = expr[, …] [WHERE <pred>]` —
  * stat-pruned row-level update committed as a new snapshot.
  * Copy-on-write by default; `spark.graft.update-mode=merge-on-read`
  * routes through the tombstone+delta path ([[WriteMode]]). */
case class LakehouseUpdateCommand(view: String, setClause: String,
    whereClause: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    Seq(Row(
      if (WriteMode.isMor(spark, "update"))
        lake.sqlUpdateMor(view, setClause, whereClause.getOrElse("true"))
      else lake.sqlUpdate(view, setClause, whereClause, partitionBy)))
  }
}

/** `INSERT INTO <lakehouse view> [(col, …)] <SELECT …|VALUES …>` —
  * O(rows) append committed as a new snapshot. Without a column list
  * the query maps positionally onto the whole schema; with one, onto
  * the listed columns, and unlisted columns insert NULL (must be
  * nullable) — the partial-insert shape an evolved schema makes
  * routine (new columns exist, old INSERT statements keep working). */
case class LakehouseInsertCommand(view: String, query: String,
    cols: Seq[String] = Nil) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    Seq(Row(lake.sqlInsert(view, query, partitionBy, cols)))
  }
}

/** `MERGE INTO <lakehouse view> USING <view> ON t.k = s.k [AND …]
  * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` —
  * the canonical upsert-all shape, committed as a new snapshot. */
case class LakehouseMergeCommand(view: String, sourceView: String, keyCols: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    Seq(Row(lake.sqlMerge(view, sourceView, keyCols, partitionBy)))
  }
}

/** Conditional MERGE: ordered `WHEN MATCHED [AND cond] THEN
  * UPDATE SET * | UPDATE SET col = expr, … | DELETE` clauses, an
  * optional `WHEN NOT MATCHED [AND cond] THEN INSERT …`, and ordered
  * `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … | DELETE`
  * clauses (the full-sync side), routed through
  * [[Lakehouse.sqlMergeClauses]] as ONE snapshot commit. */
case class LakehouseMergeCondCommand(view: String, sourceView: String, keyCols: Seq[String],
    matched: Seq[MergeMatched], notMatchedInsert: Option[MergeInsert],
    notMatchedBySource: Seq[MergeMatched] = Nil)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    Seq(Row(lake.sqlMergeClauses(
      view, sourceView, keyCols, matched, notMatchedInsert, partitionBy,
      lake.sessionBranch, notMatchedBySource)))
  }
}

/** `ALTER TABLE t SET PARTITION SPEC (days(ts)[, bucket(8,k)…])` —
  * PARTITION EVOLUTION through SQL (Iceberg's `ALTER TABLE … ADD/
  * REPLACE PARTITION FIELD` surface, collapsed to a whole-spec
  * replace): the registry's layout for the view changes, so the NEXT
  * write takes the new spec while committed dirs keep their own
  * self-describing layouts until a rewrite touches them. Specs may be
  * identity columns or hidden-partitioning transforms
  * ([[Transforms]]); each entry is validated at parse time. */
case class LakehouseAlterSpecCommand(view: String, spec: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("table", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    spec.foreach(Transforms.parse) // reject unknown transforms before registering
    lake.registerView(view, spec)
    Seq(Row(view))
  }
}

/** `ALTER TABLE t ADD COLUMNS (c1 type1, c2 type2, …)` — SQL SCHEMA
  * EVOLUTION (the Iceberg DDL the reference's catalog tables get for
  * free): an additive, metadata-only snapshot commit. Existing dirs
  * are untouched and read NULL for the new columns; subsequent
  * INSERT/MERGE take the evolved schema; time travel below the
  * commit shows the old schema. Narrowing is refused by construction
  * (no type-change surface) and added columns must be nullable. */
case class LakehouseAddColumnsCommand(view: String, colsDdl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    // DOTTED names (`shipping_address.country string`) are NESTED adds
    // — `StructType.fromDDL` can't parse them, so split the list at
    // depth-0 commas and build the fields by hand; plain lists keep
    // the stock DDL parser (comments, char types, …)
    // QUOTE-AWARE scanning (r16): both the depth-0 comma split and the
    // DEFAULT keyword search skip SQL string literals — single- OR
    // double-quoted (Spark's default dialect treats both as strings),
    // doubled same-char = escape — otherwise `DEFAULT 'a,b'` splits
    // mid-literal and a COMMENT containing " default " false-positives
    // into the hand parser.
    def splitTop(ddl: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0; var start = 0; var i = 0; var q: Char = 0
      while (i < ddl.length) {
        val c = ddl.charAt(i)
        if (q != 0) {
          if (c == q) {
            if (i + 1 < ddl.length && ddl.charAt(i + 1) == q) i += 1
            else q = 0
          }
        } else c match {
          case '\'' | '"' => q = c
          case '(' | '<' => depth += 1
          case ')' | '>' => depth -= 1
          case ',' if depth == 0 => out += ddl.substring(start, i); start = i + 1
          case _ => ()
        }
        i += 1
      }
      out += ddl.substring(start)
      out.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    // index of a depth-0, unquoted, whitespace-bounded DEFAULT keyword
    // (-1 = none) — the split point between the type DDL and the
    // default's SQL text
    def defaultIdx(item: String): Int = {
      var depth = 0; var i = 0; var q: Char = 0
      while (i < item.length) {
        val c = item.charAt(i)
        if (q != 0) {
          if (c == q) {
            if (i + 1 < item.length && item.charAt(i + 1) == q) i += 1
            else q = 0
          }
        } else c match {
          case '\'' | '"' => q = c
          case '(' | '<' => depth += 1
          case ')' | '>' => depth -= 1
          case _ if depth == 0 && i > 0 && item.charAt(i - 1).isWhitespace &&
            i + 7 <= item.length && item.regionMatches(true, i, "DEFAULT", 0, 7) &&
            (i + 7 == item.length || item.charAt(i + 7).isWhitespace) =>
            return i
          case _ => ()
        }
        i += 1
      }
      -1
    }
    val cols =
      if (!splitTop(colsDdl).exists(i =>
        i.takeWhile(!_.isWhitespace).contains('.') || defaultIdx(i) >= 0))
        try StructType.fromDDL(colsDdl) catch {
          case e: Exception => throw new IllegalArgumentException(
            s"cannot parse ADD COLUMNS list: ($colsDdl): ${e.getMessage}")
        }
      else StructType(splitTop(colsDdl).map { item =>
        val name = item.takeWhile(!_.isWhitespace).stripPrefix("`").stripSuffix("`")
        val rest = item.drop(item.takeWhile(!_.isWhitespace).length).trim
        // `name type [DEFAULT <literal>]` — the default's SQL text
        // rides the field metadata (graft.sources.ColumnDefaults)
        val (typeDdl, defaultSql) = defaultIdx(rest) match {
          case -1 => (rest, None)
          case k =>
            val d = rest.substring(k + 7).trim
            if (d.isEmpty) throw new IllegalArgumentException(
              s"ADD COLUMNS: DEFAULT for $name names no literal: ($item)")
            (rest.substring(0, k).trim, Some(d))
        }
        val dt = try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(typeDdl)
        catch { case e: Exception => throw new IllegalArgumentException(
          s"cannot parse ADD COLUMNS type for $name: $typeDdl: ${e.getMessage}") }
        val f = org.apache.spark.sql.types.StructField(name, dt)
        defaultSql.fold(f)(graft.sources.ColumnDefaults.withDefault(f, _))
      })
    val snap = lake.addColumns(view, cols, lake.sessionBranch)
    lake.registerView(view, partitionBy) // temp view takes the evolved schema
    Seq(Row(snap))
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` — metadata-only snapshot;
  * dirs written before it resolve the old physical name at read. */
case class LakehouseRenameColumnCommand(view: String, from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val snap = lake.renameColumn(view, from, to, lake.sessionBranch)
    lake.registerView(view, partitionBy)
    Seq(Row(snap))
  }
}

/** `ALTER TABLE t DROP COLUMN c` — metadata-only snapshot: the
  * column vanishes from reads and new writes; history keeps it. */
case class LakehouseDropColumnCommand(view: String, col: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val snap = lake.dropColumn(view, col, lake.sessionBranch)
    lake.registerView(view, partitionBy)
    Seq(Row(snap))
  }
}

/** `ALTER TABLE t CREATE BRANCH b [AS OF VERSION n]` / `DROP BRANCH b`
  * — branch lifecycle through SQL (Iceberg's branch DDL, the surface
  * behind the reference's NESSIE_REF workflow): CREATE points a new
  * branch at the session branch's head (or an explicit snapshot);
  * DROP removes the pointer, snapshots stay in history. */
case class LakehouseBranchCommand(view: String, create: Boolean, branch: String,
    asOfVersion: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("branch", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    if (create) {
      val snap = asOfVersion.getOrElse(
        lake.currentSnapshot(view, lake.sessionBranch).getOrElse(
          throw new IllegalStateException(s"$view has no snapshot to branch from")))
      lake.createBranch(view, branch, snap)
    } else lake.dropBranch(view, branch)
    Seq(Row(branch))
  }
}

/** `ALTER TABLE t FAST FORWARD [BRANCH] b [INTO target]` — the
  * `fast_forward` procedure as a statement: moves `target` (default:
  * the session branch) to `b`'s head. Snapshots are immutable and
  * shared, so the merge is a pointer move. */
case class LakehouseFastForwardCommand(view: String, from: String,
    into: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val snap = lake.mergeBranch(view, from, into.getOrElse(lake.sessionBranch))
    lake.registerView(view, partitionBy) // refresh the temp view to the merged head
    Seq(Row(snap))
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` — widening type
  * promotion (int→bigint, float→double, decimal precision) as a
  * metadata-only snapshot; everything else refused. */
case class LakehouseAlterTypeCommand(view: String, col: String, typeDdl: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, partitionBy) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val dt = try org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(typeDdl)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"cannot parse ALTER COLUMN type: $typeDdl: ${e.getMessage}") }
    val snap = lake.alterColumnType(view, col, dt, lake.sessionBranch)
    lake.registerView(view, partitionBy)
    Seq(Row(snap))
  }
}

/** `CREATE [OR REPLACE] TABLE t [PARTITIONED BY (spec,…)]
  * [SORTED BY (col,…)] AS <query>` against the session's DEFAULT LAKE
  * (`spark.graft.lake-root` — the catalog-role conf; the parser
  * intercepts CTAS only when it is set). Partition specs take
  * identity columns or hidden-partitioning transforms
  * ([[Transforms]]); SORTED BY declares the write sort order
  * ([[Lakehouse.declareSortOrder]] — under range distribution,
  * writes land key-clustered). Plain CREATE refuses an existing
  * table; OR REPLACE commits a replacing snapshot (history stays
  * travel-readable). Registers the view for DML/SQL on success. */
case class LakehouseCtasCommand(table: String, replace: Boolean, spec: Seq[String],
    sortBy: Seq[String], query: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val root = spark.conf.get(LakehouseCtasCommand.RootConf)
    val lake = new Lakehouse(spark, root)
    spec.foreach(Transforms.parse) // reject unknown transforms first
    if (!replace && lake.currentSnapshot(table, lake.sessionBranch).isDefined)
      throw new IllegalStateException(
        s"table $table already exists in lake $root; use CREATE OR REPLACE TABLE")
    if (sortBy.nonEmpty) lake.declareSortOrder(table, sortBy)
    // CTAS lands on the session branch (NESSIE_REF semantics): a
    // branch-scoped session creates tables main never sees until a
    // fast-forward
    val snap = lake.createOrReplace(spark.sql(query), table, spec, lake.sessionBranch)
    lake.registerView(table, spec)
    Seq(Row(snap))
  }
}

/** `CREATE MATERIALIZED VIEW v AS SELECT … FROM t [WHERE …] GROUP BY …`
  * — materializes the restricted aggregate shape [[MaterializedView]]
  * maintains incrementally, persists the definition in the source
  * lake's `_mviews.jsonl`, and registers the view table for SQL
  * access. Refresh via `CALL system.refresh_mview('v')`. */
case class LakehouseCreateMviewCommand(view: String, src: String,
    groups: Seq[String], aggs: Seq[(String, Option[String], String)],
    where: Option[String],
    joins: Seq[(String, String, String, String)] = Nil)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("snapshot_id", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    import MaterializedView._
    val (lake, _) = LakehouseRegistry.lookup(spark, src)
      .getOrElse(throw new IllegalStateException(s"$src is not a registered lakehouse view"))
    val aggCols = aggs.map {
      case ("sum", Some(c), al) => SumCol(c, al)
      case ("count", _, al) => CountAll(al)
      case ("min", Some(c), al) => MinCol(c, al)
      case ("max", Some(c), al) => MaxCol(c, al)
      case other => throw new UnsupportedOperationException(s"unsupported aggregate: $other")
    }
    val d = ViewDef(view, src, groups, aggCols, where,
      joins.map { case (dim, fk, dk, jt) => JoinSpec(dim, fk, dk, jt) })
    val snap = MaterializedView.create(lake, d)
    MaterializedView.persist(lake, d)
    lake.registerView(view)
    Seq(Row(snap))
  }
}

object LakehouseCtasCommand {
  val RootConf = "spark.graft.lake-root"
  /** CTAS routes to the lakehouse only when the session declared a
    * default lake — otherwise Spark's own parser handles CREATE. */
  def enabled: Boolean = SparkSession.getActiveSession
    .exists(_.conf.getOption(RootConf).exists(_.nonEmpty))
}

/** `VACUUM t [RETAIN n SNAPSHOTS]` — table maintenance through SQL:
  * expires all but the last n snapshots (default 1; tags stay pinned,
  * branch heads survive) and deletes orphaned dirs no kept snapshot
  * references (stale-grace 0 here: everything unreferenced after
  * expiry goes). The Iceberg `expire_snapshots` + `remove_orphan_files`
  * procedures collapsed into the familiar statement. Returns the
  * number of snapshots expired (expiry itself collects their
  * now-unreferenced dirs; the orphan sweep then reaps dead writers'
  * leavings). */
case class LakehouseVacuumCommand(view: String, retain: Int)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("expired_snapshots", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    require(retain >= 1, s"VACUUM must retain at least 1 snapshot, got $retain")
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val before = lake.snapshots(view).size
    lake.expireSnapshots(view, keepLast = retain)
    lake.removeOrphans(view, staleMillis = 0L)
    Seq(Row((before - lake.snapshots(view).size).toLong))
  }
}

/** `SHOW CATALOGS` — the reference notebook's literal first cell
  * (query_iceberg.ipynb: list the Nessie catalog before USE-ing it).
  * One row per distinct lake root registered in the session plus the
  * built-in `spark_catalog`, with the lake root as the location — a
  * driver-side metadata listing, no data scan. */
case class LakehouseShowCatalogsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("catalog", StringType)(),
    AttributeReference("location", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    // native V2 catalogs first (spark.sql.catalog.* plugins +
    // spark_catalog) — intercepting must not HIDE configured catalogs
    // the delegate statement would have listed
    val native = scala.util.Try(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.catalogManager.listCatalogs(None))
      .getOrElse(Seq("spark_catalog")).sorted
    val lakeNames = LakehouseRegistry.lakes(spark)
    val nativeRows = native.filterNot(n => lakeNames.exists(_._1 == n)).map(Row(_, null))
    nativeRows ++ lakeNames.map { case (name, lake) => Row(name, lake.root) }
  }
}

/** `SHOW NAMESPACES IN <lake>` — a graft lake is a flat,
  * single-namespace catalog (tables live directly under the root), so
  * the listing is the one implicit namespace; the statement exists so
  * the reference's catalog-browsing cells run unchanged. */
case class LakehouseShowNamespacesCommand(catalog: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("namespace", StringType)())
  override def run(spark: SparkSession): Seq[Row] = Seq(Row("default"))
}

/** `CREATE [OR REPLACE] VIEW v AS <select>` over registered lake
  * tables (r16) — the Iceberg view-spec analog (the reference's saved
  * ad-hoc queries, query_iceberg.ipynb): the SQL text persists in the
  * owning lake's `_views.jsonl`, analyzes eagerly (a broken view
  * refuses at CREATE), and [[Lakehouse.openCatalog]] restores it in a
  * fresh session. NO data is stored — every read re-plans against the
  * base tables' current state. */
case class LakehouseCreateViewCommand(view: String, body: String,
    orReplace: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("view", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = LakehouseSqlUtil.bodyLake(spark, body).getOrElse(
      throw new IllegalStateException(
        s"CREATE VIEW $view: the body references no registered lakehouse table"))
    lake.createSqlView(view, body, orReplace)
    Seq(Row(view))
  }
}

/** `DROP VIEW v` on a persisted lake view. */
case class LakehouseDropViewCommand(view: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("view", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = LakehouseSqlUtil.viewLake(spark, view).getOrElse(
      throw new IllegalStateException(s"$view is not a persisted lakehouse view"))
    lake.dropSqlView(view)
    Seq(Row(view))
  }
}

private[sources] object LakehouseSqlUtil {
  /** The lake a view body belongs to: the first registered lake table
    * — or, for views over views, persisted view — in TABLE POSITION
    * (after FROM/JOIN), and ONLY there. A broad identifier scan would
    * hijack native CREATE VIEW statements whose body merely mentions a
    * column/alias matching some registered lake table's name — when no
    * table-position identifier resolves, the statement belongs to
    * Spark's own catalog and must delegate untouched. */
  def bodyLake(spark: SparkSession, body: String): Option[Lakehouse] = {
    // table position = after FROM/JOIN, including comma-join lists and
    // qualified names (every dot segment is a candidate — registered
    // names are bare, so `lake.orders` resolves through `orders`)
    val fromIds = """(?i)\b(?:from|join)\s+([`A-Za-z_][\w.`]*(?:\s*,\s*[`A-Za-z_][\w.`]*)*)""".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
      .flatMap(_.split(',').toSeq).map(_.trim.replace("`", ""))
      .flatMap(q => q +: q.split('.').toSeq).filter(_.nonEmpty).distinct
    fromIds.collectFirst(scala.Function.unlift(t =>
        LakehouseRegistry.lookup(spark, t).map(_._1)))
      .orElse(fromIds.collectFirst(scala.Function.unlift(viewLake(spark, _))))
  }

  /** The lake holding persisted view `v`, if any. */
  def viewLake(spark: SparkSession, v: String): Option[Lakehouse] =
    LakehouseRegistry.lakes(spark).map(_._2).distinct
      .find(_.sqlViews().exists(_._1.equalsIgnoreCase(v)))
}

/** `SHOW TABLES IN <lake>` — the `SHOW TABLES IN nessie.sales` analog
  * through the parsed surface: routes to [[Lakehouse.tablesDf]]
  * (table, current snapshot, snapshot count, branches, type — table |
  * materialized_view | view). Pure manifest metadata; bounded by
  * table count, not data size. */
case class LakehouseShowTablesCommand(catalog: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_name", StringType)(),
    AttributeReference("current_snapshot", LongType)(),
    AttributeReference("n_snapshots", LongType)(),
    AttributeReference("branches", StringType)(),
    AttributeReference("type", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val lake = LakehouseRegistry.lakes(spark).collectFirst {
      case (name, l) if name.equalsIgnoreCase(catalog) => l
    }.getOrElse(throw new IllegalStateException(s"$catalog is not a registered lake catalog"))
    lake.tablesDf().collect().toSeq
  }
}

/** `SHOW CREATE TABLE t` (r16) — the full declared state as an
  * executable statement list: [[Lakehouse.showCreateStatements]] for
  * tables; the recorded `CREATE VIEW … AS <text>` for persisted views. */
case class LakehouseShowCreateCommand(view: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("createtab_stmt", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    LakehouseRegistry.lookup(spark, view) match {
      case Some((lake, _)) => lake.showCreateStatements(view).map(Row(_))
      case None =>
        val lake = LakehouseSqlUtil.viewLake(spark, view).getOrElse(
          throw new IllegalStateException(
            s"$view is not a registered lakehouse table or persisted view"))
        val sql = lake.sqlViews().find(_._1.equalsIgnoreCase(view)).get._2
        Seq(Row(s"CREATE VIEW $view AS $sql"))
    }
}

/** `DESCRIBE EXTENDED t` (r16) — columns (with DEFAULTs) plus the
  * declared-state block ([[Lakehouse.describeRows]]); persisted views
  * describe their analyzed schema plus the view text. */
case class LakehouseDescribeCommand(view: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType)(),
    AttributeReference("data_type", StringType)(),
    AttributeReference("comment", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    LakehouseRegistry.lookup(spark, view) match {
      case Some((lake, _)) =>
        lake.describeRows(view).map { case (a, b, c) => Row(a, b, c) }
      case None =>
        val lake = LakehouseSqlUtil.viewLake(spark, view).getOrElse(
          throw new IllegalStateException(
            s"$view is not a registered lakehouse table or persisted view"))
        val sql = lake.sqlViews().find(_._1.equalsIgnoreCase(view)).get._2
        spark.table(view).schema.fields.toSeq
          .map(f => Row(f.name, f.dataType.sql, null)) ++ Seq(
          Row("", "", null),
          Row("# Detailed Table Information", "", null),
          Row("Type", "view", null),
          Row("View Text", sql, null))
    }
}

/** `DROP TABLE t [PURGE]` on a registered lakehouse view: unregisters
  * the temp view, the DML routing, and the persistent catalog line;
  * PURGE also deletes the table directory. Without PURGE the
  * immutable snapshots stay on disk and the table can be re-attached
  * later — Iceberg's external-table drop semantics. */
case class LakehouseDropCommand(view: String, purge: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(AttributeReference("table", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    lake.dropTable(view, purge)
    Seq(Row(view))
  }
}

object LakehouseMetaAggCommand {
  private val CountStarRe =
    """(?is)\s*COUNT\s*\(\s*(?:\*|1)\s*\)\s*(?:AS\s+`?([A-Za-z_]\w*)`?)?\s*""".r
  private val MinMaxRe =
    """(?is)\s*(MIN|MAX|SUM)\s*\(\s*`?([A-Za-z_]\w*)`?\s*\)\s*(?:AS\s+`?([A-Za-z_]\w*)`?)?\s*""".r

  /** Parse a select list into metadata-answerable aggregate items;
    * None if ANY item is something else (the statement then delegates
    * to Spark untouched). Default output names replicate Spark's own
    * (`count(1)`, `min(c)`) so the fast path is invisible to callers. */
  def parseItems(selectList: String): Option[Seq[Lakehouse.MetaAggItem]] = {
    val parsed = selectList.split(",").toSeq.map {
      case CountStarRe(al) =>
        Some(Lakehouse.MetaAggItem("count", None, Option(al).getOrElse("count(1)")))
      case MinMaxRe(op, c, al) =>
        Some(Lakehouse.MetaAggItem(op.toLowerCase, Some(c),
          Option(al).getOrElse(s"${op.toLowerCase}($c)")))
      case _ => None
    }
    if (parsed.nonEmpty && parsed.forall(_.isDefined)) Some(parsed.flatten) else None
  }

  /** Spark's own result type for `sum(<col of type dt>)` — the
    * intercepted command's output must match the delegate path
    * bit-for-bit, whichever leg answers. */
  def sumResultType(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => LongType
      case d: DecimalType => DecimalType(math.min(38, d.precision + 10), d.scale)
      case _ => DoubleType
    }
  }

  /** The view's current schema when it resolves AND every referenced
    * aggregate column exists on it; None delegates to Spark so the
    * user gets the standard unresolved-column error, not a
    * lakehouse-flavored one. Resolved ONCE at intercept time and
    * threaded into the command — `output` and `run` must not re-read
    * the manifest/schema ledgers for what the guard already knows. */
  def resolvedSchema(spark: SparkSession, view: String,
      items: Seq[Lakehouse.MetaAggItem]): Option[org.apache.spark.sql.types.StructType] =
    scala.util.Try {
      LakehouseRegistry.lookup(spark, view).map { case (lake, _) =>
        lake.tableSchema(view, lake.sessionBranch)
      }.filter { st =>
        val names = st.fieldNames.toSet
        items.forall(i => i.col.forall(names.contains))
      }
    }.toOption.flatten // unreadable view/branch: delegate, Spark reports it
}

/** `SELECT count(*) | min(c) | max(c) [, …] FROM <lakehouse view>
  * [WHERE <simple predicate>]` — the Iceberg aggregate-pushdown
  * surface: answered from manifest + stats-ledger metadata via
  * [[Lakehouse.metaAgg]] whenever metadata can answer EXACTLY, else
  * by the ordinary scan. Both paths produce identical rows — the
  * statement's meaning never depends on which fired. Intercepted only
  * for the tight shape above (single registered view, plain aggregate
  * list, subquery-free WHERE); everything else delegates to Spark. */
case class LakehouseMetaAggCommand(view: String, items: Seq[Lakehouse.MetaAggItem],
    whereClause: Option[String],
    viewSchema: Option[org.apache.spark.sql.types.StructType] = None)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = {
    // schema resolved at intercept time ([[LakehouseMetaAggCommand
    // .resolvedSchema]]) — no second metadata read here
    val schema = viewSchema
    items.map { i =>
      lazy val colType = schema.flatMap(st => i.col.flatMap(c => st.fields.find(_.name == c)))
        .map(_.dataType).getOrElse(StringType)
      i.op match {
        case "count" => AttributeReference(i.alias, LongType, nullable = false)()
        case "sum" =>
          AttributeReference(i.alias, LakehouseMetaAggCommand.sumResultType(colType))()
        case _ => AttributeReference(i.alias, colType)()
      }
    }
  }
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, min}
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val pred = whereClause.map(expr)
    lake.metaAgg(view, items, pred, lake.sessionBranch) match {
      case Some(df) => df.collect().toSeq
      case None => // metadata can't answer exactly: ordinary scan, same rows
        import org.apache.spark.sql.functions.sum
        val base = pred.foldLeft(lake.read(view, lake.sessionBranch))(_ where _)
        val aggs = items.map { i =>
          i.op match {
            case "count" => count(lit(1)).as(i.alias)
            case "min" => min(col(i.col.get)).as(i.alias)
            case "max" => max(col(i.col.get)).as(i.alias)
            case "sum" => sum(col(i.col.get)).as(i.alias)
          }
        }
        base.agg(aggs.head, aggs.tail: _*).collect().toSeq
    }
  }
}

object LakehouseGroupAggCommand {
  private val BareColRe = """\s*`?([A-Za-z_]\w*)`?\s*""".r
  private val OrderItemRe = """(?is)\s*`?([A-Za-z_]\w*)`?(?:\s+(ASC|DESC))?\s*""".r

  /** Bare column list (`a, b`) → names; None on anything else. */
  def parseBareCols(s: String): Option[Seq[String]] = {
    val parsed = s.split(",").toSeq.map {
      case BareColRe(c) => Some(c)
      case _ => None
    }
    if (parsed.nonEmpty && parsed.forall(_.isDefined)) Some(parsed.flatten) else None
  }

  /** Select list of a grouped aggregate: each entry either a bare
    * GROUP BY column or a metadata-answerable aggregate. The bare
    * columns must be exactly the GROUP BY set (SQL's grouping rule,
    * and the shape [[Lakehouse.metaGroupAgg]] returns). */
  def parseSelect(selectList: String, groupCols: Seq[String])
      : Option[Seq[Either[String, Lakehouse.MetaAggItem]]] = {
    val parsed: Seq[Option[Either[String, Lakehouse.MetaAggItem]]] =
      selectList.split(",").toSeq.map { item =>
        LakehouseMetaAggCommand.parseItems(item) match {
          case Some(Seq(i)) => Some(Right(i))
          case _ => item match {
            case BareColRe(c) if groupCols.contains(c) => Some(Left(c))
            case _ => None
          }
        }
      }
    if (parsed.isEmpty || parsed.exists(_.isEmpty)) return None
    val sel = parsed.flatten
    val bare = sel.collect { case Left(c) => c }
    val aliases = sel.collect { case Right(i) => i.alias }
    // exact group coverage, no duplicate/colliding output names
    if (bare.sorted == groupCols.sorted && bare.distinct.size == bare.size &&
      (bare ++ aliases).distinct.size == sel.size) Some(sel) else None
  }

  /** `ORDER BY` tail → (output column, ascending) pairs; names must
    * be output columns of the select list. */
  def parseOrder(s: String, outNames: Seq[String]): Option[Seq[(String, Boolean)]] = {
    if (s == null) return Some(Seq.empty)
    val parsed = s.split(",").toSeq.map {
      case OrderItemRe(c, dir) if outNames.contains(c) =>
        Some((c, dir == null || dir.equalsIgnoreCase("ASC")))
      case _ => None
    }
    if (parsed.nonEmpty && parsed.forall(_.isDefined)) Some(parsed.flatten) else None
  }
}

/** `SELECT <group cols + count/min/max/sum aggs> FROM <lakehouse
  * view> [WHERE …] GROUP BY <cols> [ORDER BY <output cols>]` — the
  * grouped aggregate-pushdown surface (the reference's gold report,
  * spark_jobs/gold_reporting.py:70, priced as metadata): answered
  * from partition paths + ledgers via [[Lakehouse.metaGroupAgg]]
  * whenever metadata restates the grouped scan EXACTLY, else by that
  * ordinary grouped scan. Both paths produce identical rows. */
case class LakehouseGroupAggCommand(view: String,
    select: Seq[Either[String, Lakehouse.MetaAggItem]],
    groupCols: Seq[String], whereClause: Option[String],
    order: Seq[(String, Boolean)],
    viewSchema: org.apache.spark.sql.types.StructType)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = select.map {
    case Left(g) =>
      AttributeReference(g,
        viewSchema.fields.find(_.name == g).map(_.dataType).getOrElse(StringType))()
    case Right(i) =>
      lazy val colType = i.col.flatMap(c => viewSchema.fields.find(_.name == c))
        .map(_.dataType).getOrElse(StringType)
      i.op match {
        case "count" => AttributeReference(i.alias, LongType, nullable = false)()
        case "sum" =>
          AttributeReference(i.alias, LakehouseMetaAggCommand.sumResultType(colType))()
        case _ => AttributeReference(i.alias, colType)()
      }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, count, expr, lit, max, min, sum}
    val (lake, _) = LakehouseRegistry.lookup(spark, view)
      .getOrElse(throw new IllegalStateException(s"$view is not a registered lakehouse view"))
    val pred = whereClause.map(expr)
    val items = select.collect { case Right(i) => i }
    val grouped = lake.metaGroupAgg(view, groupCols, items, pred, lake.sessionBranch)
      .getOrElse {
        // metadata can't answer exactly: ordinary grouped scan, same rows
        val base = pred.foldLeft(lake.read(view, lake.sessionBranch))(_ where _)
        val aggs = items.map { i =>
          i.op match {
            case "count" => count(lit(1)).as(i.alias)
            case "min" => min(col(i.col.get)).as(i.alias)
            case "max" => max(col(i.col.get)).as(i.alias)
            case "sum" => sum(col(i.col.get)).as(i.alias)
          }
        }
        base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }
    val projected = grouped.select(select.map {
      case Left(g) => col(g)
      case Right(i) => col(i.alias)
    }: _*)
    val ordered =
      if (order.isEmpty) projected
      else projected.orderBy(order.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc
      }: _*)
    ordered.collect().toSeq
  }
}

/** Thin statement front-end: recognizes the two lakehouse DML shapes
  * against REGISTERED views, delegates everything else (including DML
  * on unregistered tables — Spark's own analyzer then reports its
  * usual v2-table error) to the session's default parser. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  // names may be backquoted; DELETE's WHERE is optional (no WHERE =
  // full-table delete, the form Iceberg supports)
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+`?([A-Za-z_]\w*)`?(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val MergeRe =
    ("""(?is)\s*MERGE\s+INTO\s+`?([A-Za-z_]\w*)`?\s+USING\s+`?([A-Za-z_]\w*)`?""" +
      // ON must stop at the FIRST WHEN: a lazy (.+?) would swallow a
      // leading conditional clause whenever a later canonical
      // `SET * … INSERT *` pair exists, mis-routing the statement
      """\s+ON\s+((?:(?!\bWHEN\b).)+?)""" +
      """\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*""" +
      """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r
  // general MERGE head: everything from the first WHEN on is the
  // clause list, tokenized by splitClauses
  private val MergeHeadRe =
    ("""(?is)\s*MERGE\s+INTO\s+`?([A-Za-z_]\w*)`?\s+USING\s+`?([A-Za-z_]\w*)`?""" +
      """\s+ON\s+(.+?)\s+(WHEN\s+.+?)\s*;?\s*""").r
  private val MatchedUpdateRe =
    """(?is)\s*WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+\*\s*""".r
  private val MatchedUpdateSetRe =
    """(?is)\s*WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val MatchedDeleteRe =
    """(?is)\s*WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*""".r
  // BY TARGET is the standard's optional alias for the insert side
  private val NotMatchedInsertRe =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s+\*\s*""".r
  private val NotMatchedInsertValsRe =
    ("""(?is)\s*WHEN\s+NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?(?:AND\s+(.+?)\s+)?THEN\s+INSERT\s*""" +
      """\(([^)]*)\)\s*VALUES\s*\((.+)\)\s*""").r
  // the full-sync side: target rows with no source match
  private val BySourceDeleteRe =
    """(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*""".r
  private val BySourceUpdateSetRe =
    ("""(?is)\s*WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+(?:AND\s+(.+?)\s+)?THEN\s+""" +
      """UPDATE\s+SET\s+(.+?)\s*""").r
  private val SubqueryRe = """(?is).*\(\s*SELECT\b.*""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+`?([A-Za-z_]\w*)`?\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val InsertRe =
    """(?is)\s*INSERT\s+INTO\s+`?([A-Za-z_]\w*)`?\s+((?:SELECT|VALUES|FROM|WITH|TABLE)\b.+?)\s*;?\s*""".r
  // explicit column list: the paren group sits between the table name
  // and the query keyword ([^()]* keeps it from swallowing VALUES parens)
  private val InsertColsRe =
    ("""(?is)\s*INSERT\s+INTO\s+`?([A-Za-z_]\w*)`?\s*\(([^()]*)\)""" +
      """\s*((?:SELECT|VALUES|FROM|WITH|TABLE)\b.+?)\s*;?\s*""").r
  private val AlterSpecRe =
    """(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+SET\s+PARTITION\s+SPEC\s*\((.*)\)\s*;?\s*""".r
  private val AlterAddColsRe =
    """(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+ADD\s+COLUMNS?\s*\((.*)\)\s*;?\s*""".r
  private val AlterRenameColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+RENAME\s+COLUMN\s+""" +
      """`?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)`?\s+TO\s+`?([A-Za-z_]\w*)`?\s*;?\s*""").r
  private val AlterDropColRe =
    """(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+DROP\s+COLUMNS?\s+`?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)`?\s*;?\s*""".r
  private val AlterTypeRe =
    ("""(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+ALTER\s+COLUMN\s+""" +
      """`?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)`?\s+TYPE\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*;?\s*""").r
  private val BranchDdlRe =
    ("""(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+(CREATE|DROP)\s+BRANCH\s+""" +
      """`?([A-Za-z_]\w*)`?(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""").r
  private val FastForwardRe =
    ("""(?is)\s*ALTER\s+TABLE\s+`?([A-Za-z_]\w*)`?\s+FAST\s+FORWARD\s+(?:BRANCH\s+)?""" +
      """`?([A-Za-z_]\w*)`?(?:\s+INTO\s+`?([A-Za-z_]\w*)`?)?\s*;?\s*""").r
  private val DropRe =
    """(?is)\s*DROP\s+TABLE\s+`?([A-Za-z_]\w*)`?(\s+PURGE)?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+`?([A-Za-z_]\w*)`?(?:\s+RETAIN\s+(\d+)\s+SNAPSHOTS)?\s*;?\s*""".r
  private val CtasRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+`?([A-Za-z_]\w*)`?""" +
      """(?:\s+PARTITIONED\s+BY\s*\((.*?)\))?""" +
      """(?:\s+SORTED\s+BY\s*\((.*?)\))?""" +
      """\s+AS\s+((?:SELECT|WITH|VALUES|FROM|TABLE)\b.+?)\s*;?\s*""").r
  // CREATE MATERIALIZED VIEW v AS SELECT <groups + mergeable aggs>
  // FROM <lake table> [WHERE <row predicate>] GROUP BY <groups> —
  // the restricted aggregate shape MaterializedView maintains
  // incrementally (sum/count(*)/min/max only, single source table)
  private val CreateMviewRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+`?([A-Za-z_]\w*)`?\s+AS\s+""" +
      """SELECT\s+(.+?)\s+FROM\s+`?([A-Za-z_]\w*)`?""" +
      """(?:\s+WHERE\s+((?:(?!\bGROUP\b).)+?))?""" +
      """\s+GROUP\s+BY\s+(.+?)\s*;?\s*""").r
  // join-shaped variant: FROM <fact> ([LEFT [OUTER]|INNER] JOIN <dim>
  // ON <equality>)+ — the silver_enrich shape (and its snowflake
  // chains), maintained by the same delta machinery (fact appends
  // incremental through the pinned dim chain; single-hop dim changes
  // incremental, multi-hop dim movement recomputes)
  private val CreateMviewJoinRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+`?([A-Za-z_]\w*)`?\s+AS\s+""" +
      """SELECT\s+(.+?)\s+FROM\s+`?([A-Za-z_]\w*)`?""" +
      """((?:\s+(?:LEFT\s+(?:OUTER\s+)?|INNER\s+)?JOIN\s+`?[A-Za-z_]\w*`?""" +
      """\s+ON\s+(?:(?!\bWHERE\b|\bGROUP\b|\bJOIN\b).)+?)+)""" +
      """(?:\s+WHERE\s+((?:(?!\bGROUP\b).)+?))?""" +
      """\s+GROUP\s+BY\s+(.+?)\s*;?\s*""").r
  // one hop of the join chain, re-scanned out of the captured blob
  private val MviewJoinHopRe =
    ("""(?is)\s*(LEFT\s+(?:OUTER\s+)?|INNER\s+)?JOIN\s+`?([A-Za-z_]\w*)`?""" +
      """\s+ON\s+((?:(?!\bWHERE\b|\bGROUP\b|\bJOIN\b).)+)""").r
  private val MviewAggRe =
    """(?is)\s*(sum|min|max)\s*\(\s*`?([A-Za-z_]\w*)`?\s*\)\s+AS\s+`?([A-Za-z_]\w*)`?\s*""".r
  private val MviewCountRe =
    """(?is)\s*count\s*\(\s*\*\s*\)\s+AS\s+`?([A-Za-z_]\w*)`?\s*""".r
  private val MviewBareColRe = """\s*`?([A-Za-z_]\w*)`?\s*""".r
  private val OnConjunct =
    """(?i)\s*(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*=\s*(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*""".r
  // Iceberg-style maintenance procedures; the optional `graft.` prefix
  // mirrors Iceberg's `CALL <catalog>.system.<proc>` form
  private val CallRe =
    """(?is)\s*CALL\s+(?:graft\.)?system\.([A-Za-z_]\w*)\s*\((.*)\)\s*;?\s*""".r
  // catalog/namespace browsing (the reference notebook's first cells);
  // SHOW NAMESPACES/TABLES intercept only when IN names a registered
  // lake — Spark's native statements keep working for everything else
  private val ShowCatalogsRe = """(?is)\s*SHOW\s+CATALOGS\s*;?\s*""".r
  // metadata-answerable aggregate SELECT: a plain agg list over ONE
  // registered view with an optional simple WHERE. The select list
  // must not contain FROM (no subqueries) and the WHERE tail must be
  // free of any further clause keyword — anything else falls through
  // to Spark's parser untouched.
  private val MetaAggRe =
    ("""(?is)\s*SELECT\s+((?:(?!\bFROM\b).)+?)\s+FROM\s+`?([A-Za-z_]\w*)`?""" +
      """(?:\s+WHERE\s+(.+?))?\s*;?\s*""").r
  private val MetaAggStopRe =
    """(?is).*\b(GROUP|ORDER|HAVING|LIMIT|JOIN|UNION|SELECT|INTERSECT|EXCEPT|WINDOW)\b.*""".r
  // grouped aggregate SELECT over ONE registered view: the WHERE tail
  // stops at GROUP BY, the GROUP BY tail at an optional ORDER BY —
  // trailing HAVING/LIMIT/etc. land inside the captured groups and
  // fail the bare-column parse, so those statements delegate
  private val GroupAggRe =
    ("""(?is)\s*SELECT\s+((?:(?!\bFROM\b).)+?)\s+FROM\s+`?([A-Za-z_]\w*)`?""" +
      """(?:\s+WHERE\s+((?:(?!\bGROUP\b).)+?))?""" +
      """\s+GROUP\s+BY\s+((?:(?!\bORDER\b).)+?)""" +
      """(?:\s+ORDER\s+BY\s+(.+?))?\s*;?\s*""").r
  private val GroupWhereStopRe =
    """(?is).*\b(ORDER|HAVING|LIMIT|JOIN|UNION|SELECT|INTERSECT|EXCEPT|WINDOW)\b.*""".r
  private val ShowNamespacesRe =
    """(?is)\s*SHOW\s+(?:NAMESPACES|DATABASES|SCHEMAS)\s+IN\s+`?([A-Za-z_][\w.-]*)`?\s*;?\s*""".r
  private val ShowTablesRe =
    """(?is)\s*SHOW\s+TABLES\s+IN\s+`?([A-Za-z_][\w.-]*)`?\s*;?\s*""".r
  // plain persisted views (r16): CREATE VIEW must NOT swallow Spark's
  // own TEMP/GLOBAL TEMP view forms, and CREATE MATERIALIZED VIEW has
  // its own grammar above — the pattern admits only the bare keyword
  private val CreateViewRe =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+`?([A-Za-z_]\w*)`?\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropViewRe =
    """(?is)\s*DROP\s+VIEW\s+`?([A-Za-z_]\w*)`?\s*;?\s*""".r
  private val ShowCreateRe =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+`?([A-Za-z_]\w*)`?\s*;?\s*""".r
  private val DescribeExtRe =
    """(?is)\s*DESC(?:RIBE)?\s+EXTENDED\s+`?([A-Za-z_]\w*)`?\s*;?\s*""".r
  private def isLake(name: String): Boolean =
    SparkSession.getActiveSession.exists(s =>
      LakehouseRegistry.lakes(s).exists(_._1.equalsIgnoreCase(name)))
  private val NamedArgRe = """(?s)\s*([A-Za-z_]\w*)\s*=>\s*(.+?)\s*""".r

  /** `CALL` argument list → (name, raw value) pairs; positional args
    * carry None. Split is quote-aware ([[splitSpecs]]), so a string
    * literal holding a comma survives. */
  /** The restricted mview select shape shared by the plain and join
    * CREATE MATERIALIZED VIEW forms: bare group columns (must match
    * GROUP BY) + aliased mergeable aggregates. */
  private def parseMviewSelect(selectList: String, groupBy: String)
      : (Seq[String], Seq[(String, Option[String], String)]) = {
    val groups = splitSpecs(groupBy).map(_.trim.stripPrefix("`").stripSuffix("`"))
    var bare = Seq.empty[String]
    var aggs = Seq.empty[(String, Option[String], String)]
    splitSpecs(selectList).foreach {
      case MviewAggRe(op, c, al) => aggs :+= ((op.toLowerCase, Some(c), al))
      case MviewCountRe(al) => aggs :+= (("count", None, al))
      case MviewBareColRe(c) => bare :+= c
      case other => throw new UnsupportedOperationException(
        s"CREATE MATERIALIZED VIEW supports group columns and sum/min/max(col) " +
          s"/ count(*) with AS aliases (mergeable aggregates only); got: $other")
    }
    if (bare.sorted != groups.sorted) throw new UnsupportedOperationException(
      s"CREATE MATERIALIZED VIEW: non-aggregate select columns ${bare.mkString(", ")} " +
        s"must match GROUP BY ${groups.mkString(", ")}")
    if (aggs.isEmpty) throw new UnsupportedOperationException(
      "CREATE MATERIALIZED VIEW needs at least one aggregate column")
    (groups, aggs)
  }

  private def callArgs(argstr: String): Seq[(Option[String], String)] =
    splitSpecs(argstr).map {
      case NamedArgRe(k, v) => (Some(k), v)
      case v => (None, v)
    }

  /** The table a CALL addresses (first positional or `table => …`),
    * unquoted — the parser intercepts only registered views. */
  private def callTable(argstr: String): Option[String] = {
    val as = callArgs(argstr)
    as.collectFirst { case (Some(k), v) if k.equalsIgnoreCase("table") => v }
      .orElse(as.collectFirst { case (None, v) => v })
      .map { v =>
        val t = v.trim
        if (t.length >= 2 && t.head == '\'' && t.last == '\'')
          t.substring(1, t.length - 1).replace("''", "'")
        else t
      }
  }

  /** Split a partition-spec / expression list on TOP-LEVEL commas
    * only — transform entries carry commas inside their parens
    * (`bucket(8,k)`), and the MERGE SET / INSERT VALUES reuse carries
    * string literals whose commas, parens and doubled-quote escapes
    * (`SET v = concat(x, ',')`) must not split or unbalance. */
  private def splitSpecs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        cur += c
        if (c == '\'') {
          // SQL escapes a quote by doubling it — consume the pair
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur += '\''; i += 1 }
          else inQuote = false
        }
      } else if (c == ',' && depth == 0) {
        out += cur.toString; cur.clear()
      } else {
        if (c == '\'') inQuote = true
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        cur += c
      }
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Equality key columns of the ON clause when every conjunct is
    * `t.k = s.k` with matching column names; None = not the canonical
    * shape, let Spark's parser handle (and reject) it. */
  private def keyColsOf(on: String, target: String, source: String): Option[Seq[String]] = {
    val conjuncts = on.split("(?i)\\s+AND\\s+").toSeq
    val keys = conjuncts.map {
      case OnConjunct(q1, c1, q2, c2)
        if c1.equalsIgnoreCase(c2) &&
          Seq(q1, q2).forall(q => q == null ||
            q.equalsIgnoreCase(target) || q.equalsIgnoreCase(source)) => Some(c1)
      case _ => None
    }
    if (keys.forall(_.isDefined)) Some(keys.flatten) else None
  }

  /** Single-pass MetaAgg intercept: the regex match, item parse,
    * WHERE guard and schema resolution each run ONCE (the previous
    * guard chain re-ran `parseItems` three times and read the
    * manifest/schema ledgers twice per intercepted SELECT), and the
    * resolved schema rides into the command so `output` doesn't
    * re-derive it. */
  private object MetaAggIntercept {
    def unapply(sqlText: String): Option[LakehouseMetaAggCommand] = sqlText match {
      case MetaAggRe(selectList, table, where)
          if LakehouseRegistry.isRegistered(table) &&
            (where == null || (!SubqueryRe.matches(where) && !MetaAggStopRe.matches(where))) =>
        for {
          items <- LakehouseMetaAggCommand.parseItems(selectList)
          spark <- SparkSession.getActiveSession
          schema <- LakehouseMetaAggCommand.resolvedSchema(spark, table, items)
        } yield LakehouseMetaAggCommand(table, items, Option(where), Some(schema))
      case _ => None
    }
  }

  /** Single-pass grouped-aggregate intercept, mirroring
    * [[MetaAggIntercept]]: regex, select/group/order parses and
    * schema resolution each run once; any miss (expression select
    * items, mismatched grouping set, unknown columns, subquery WHERE)
    * delegates to Spark untouched, and run() itself falls back to the
    * ordinary grouped scan when metadata can't answer exactly. */
  private object GroupAggIntercept {
    def unapply(sqlText: String): Option[LakehouseGroupAggCommand] = sqlText match {
      case GroupAggRe(selectList, table, where, groupBy, orderBy)
          if LakehouseRegistry.isRegistered(table) &&
            (where == null || (!SubqueryRe.matches(where) && !GroupWhereStopRe.matches(where))) =>
        for {
          groups <- LakehouseGroupAggCommand.parseBareCols(groupBy)
          sel <- LakehouseGroupAggCommand.parseSelect(selectList, groups)
          outNames = sel.map { case Left(g) => g; case Right(i) => i.alias }
          ord <- LakehouseGroupAggCommand.parseOrder(orderBy, outNames)
          spark <- SparkSession.getActiveSession
          items = sel.collect { case Right(i) => i }
          schema <- LakehouseMetaAggCommand.resolvedSchema(spark, table, items)
          if groups.forall(schema.fieldNames.contains)
        } yield LakehouseGroupAggCommand(table, sel, groups, Option(where), ord, schema)
      case _ => None
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    parseStripped(GraftSqlParser.stripComments(sqlText), sqlText)

  /** The intercept regexes match the COMMENT-STRIPPED text (`stripped`;
    * quote-aware, so comment markers inside a string literal survive) —
    * a trailing `-- note` must not make a registered-view DELETE fall
    * through to the delegate, and a comment inside a WHERE tail must
    * not be captured into a predicate that then fails `expr()` at run.
    * Captured fragments therefore come comment-free; the DELEGATE
    * always receives the ORIGINAL statement, so delegation stays
    * byte-exact (fuzz-pinned by SqlParserFuzzSpec). */
  private def parseStripped(stripped: String, sqlText: String): LogicalPlan = stripped match {
    case CallRe(proc, argstr) if callTable(argstr).exists(LakehouseRegistry.isRegistered) =>
      LakehouseCallCommand(proc.toLowerCase, callArgs(argstr))
    case ShowCatalogsRe() => LakehouseShowCatalogsCommand()
    case MetaAggIntercept(cmd) => cmd
    case GroupAggIntercept(cmd) => cmd
    case ShowNamespacesRe(cat) if isLake(cat) => LakehouseShowNamespacesCommand(cat)
    case ShowTablesRe(cat) if isLake(cat) => LakehouseShowTablesCommand(cat)
    case CreateViewRe(orRepl, view, body)
        if SparkSession.getActiveSession
          .exists(s => LakehouseSqlUtil.bodyLake(s, body).isDefined) =>
      LakehouseCreateViewCommand(view, body.trim, orRepl != null)
    case DropViewRe(view)
        if SparkSession.getActiveSession
          .exists(s => LakehouseSqlUtil.viewLake(s, view).isDefined) =>
      LakehouseDropViewCommand(view)
    case ShowCreateRe(table)
        if LakehouseRegistry.isRegistered(table) ||
          SparkSession.getActiveSession
            .exists(s => LakehouseSqlUtil.viewLake(s, table).isDefined) =>
      LakehouseShowCreateCommand(table)
    case DescribeExtRe(table)
        if LakehouseRegistry.isRegistered(table) ||
          SparkSession.getActiveSession
            .exists(s => LakehouseSqlUtil.viewLake(s, table).isDefined) =>
      LakehouseDescribeCommand(table)
    case DeleteRe(table, where) if LakehouseRegistry.isRegistered(table) =>
      if (where != null && SubqueryRe.matches(where))
        throw new UnsupportedOperationException(
          s"lakehouse DELETE supports row-local WHERE predicates, not subqueries; " +
            s"got: WHERE $where")
      LakehouseDeleteCommand(table, Option(where))
    case UpdateRe(table, set, where) if LakehouseRegistry.isRegistered(table) =>
      if (where != null && SubqueryRe.matches(where))
        throw new UnsupportedOperationException(
          s"lakehouse UPDATE supports row-local WHERE predicates, not subqueries; " +
            s"got: WHERE $where")
      if (SubqueryRe.matches(set))
        throw new UnsupportedOperationException(
          s"lakehouse UPDATE supports row-local SET expressions, not subqueries; " +
            s"got: SET $set")
      LakehouseUpdateCommand(table, set, Option(where))
    case InsertRe(table, query) if LakehouseRegistry.isRegistered(table) =>
      LakehouseInsertCommand(table, query)
    case InsertColsRe(table, cols, query) if LakehouseRegistry.isRegistered(table) =>
      val colNames = cols.split(",").toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
      if (colNames.isEmpty) throw new UnsupportedOperationException(
        s"INSERT INTO $table () — empty column list")
      LakehouseInsertCommand(table, query, colNames)
    case AlterSpecRe(table, specs) if LakehouseRegistry.isRegistered(table) =>
      LakehouseAlterSpecCommand(table, splitSpecs(specs))
    case AlterAddColsRe(table, cols) if LakehouseRegistry.isRegistered(table) =>
      LakehouseAddColumnsCommand(table, cols)
    case AlterRenameColRe(table, from, to) if LakehouseRegistry.isRegistered(table) =>
      LakehouseRenameColumnCommand(table, from, to)
    case AlterDropColRe(table, colName) if LakehouseRegistry.isRegistered(table) =>
      LakehouseDropColumnCommand(table, colName)
    case AlterTypeRe(table, colName, typeDdl) if LakehouseRegistry.isRegistered(table) =>
      LakehouseAlterTypeCommand(table, colName, typeDdl)
    case BranchDdlRe(table, verb, branch, asOf) if LakehouseRegistry.isRegistered(table) =>
      val create = verb.equalsIgnoreCase("CREATE")
      if (!create && asOf != null) throw new UnsupportedOperationException(
        s"DROP BRANCH takes no AS OF VERSION")
      LakehouseBranchCommand(table, create, branch, Option(asOf).map(_.toLong))
    case FastForwardRe(table, from, into) if LakehouseRegistry.isRegistered(table) =>
      LakehouseFastForwardCommand(table, from, Option(into))
    case DropRe(table, purge) if LakehouseRegistry.isRegistered(table) =>
      LakehouseDropCommand(table, purge != null)
    case CreateMviewJoinRe(view, selectList, src, joinChain, where, groupBy)
        if LakehouseRegistry.isRegistered(src) &&
          MviewJoinHopRe.findAllMatchIn(joinChain).forall(m =>
            LakehouseRegistry.isRegistered(m.group(2))) =>
      var leftTables = Seq(src) // src + earlier dims: the LEFT side grows per hop
      val hops = MviewJoinHopRe.findAllMatchIn(joinChain).map { m =>
        val (jt, dim, on) = (m.group(1), m.group(2), m.group(3))
        val (fk, dk) = on match {
          case OnConjunct(q1, c1, q2, c2) =>
            def is(q: String, t: String) = q != null && q.equalsIgnoreCase(t)
            // a qualifier naming THIS hop's dim marks that side as the
            // dim key; one naming the fact or an EARLIER dim marks the
            // LEFT side (snowflake chains); bare columns read
            // left-first (`ON left_key = dim_key`)
            if (is(q1, dim) || leftTables.exists(is(q2, _))) (c2, c1) else (c1, c2)
          case _ => throw new UnsupportedOperationException(
            s"materialized join view supports ON <left.key = dim.key>; got: ON $on")
        }
        val joinType =
          if (jt != null && jt.trim.toUpperCase.startsWith("LEFT")) "left" else "inner"
        leftTables = leftTables :+ dim
        (dim, fk, dk, joinType)
      }.toSeq
      val (groups, aggs) = parseMviewSelect(selectList, groupBy)
      LakehouseCreateMviewCommand(view, src, groups, aggs,
        Option(where).map(_.trim), hops)
    case CreateMviewRe(view, selectList, src, where, groupBy)
        if LakehouseRegistry.isRegistered(src) =>
      val (groups, aggs) = parseMviewSelect(selectList, groupBy)
      LakehouseCreateMviewCommand(view, src, groups, aggs, Option(where).map(_.trim))
    case CtasRe(replace, table, specs, sortBy, query) if LakehouseCtasCommand.enabled =>
      LakehouseCtasCommand(table, replace != null,
        Option(specs).map(splitSpecs).getOrElse(Nil),
        Option(sortBy).map(splitSpecs).getOrElse(Nil), query)
    case VacuumRe(table, retain) if LakehouseRegistry.isRegistered(table) =>
      LakehouseVacuumCommand(table, Option(retain).map(_.toInt).getOrElse(1))
    case MergeRe(table, source, on) if LakehouseRegistry.isRegistered(table) =>
      keyColsOf(on, table, source) match {
        case Some(keys) if keys.nonEmpty => LakehouseMergeCommand(table, source, keys)
        case _ => throw new UnsupportedOperationException(
          s"lakehouse MERGE supports ON <equi-key conjunction> " +
            s"WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *; got: ON $on")
      }
    case MergeHeadRe(table, source, on, clauses) if LakehouseRegistry.isRegistered(table) =>
      val keys = keyColsOf(on, table, source) match {
        case Some(ks) if ks.nonEmpty => ks
        case _ => throw new UnsupportedOperationException(
          s"lakehouse MERGE supports ON <equi-key conjunction>; got: ON $on")
      }
      // tokenize at each WHEN keyword; every token must parse as a clause
      val tokens = clauses.split("(?i)(?=\\bWHEN\\b)").toSeq.filter(_.trim.nonEmpty)
      var matched = Seq.empty[MergeMatched]
      var insert: Option[MergeInsert] = None
      var bySource = Seq.empty[MergeMatched]
      // explicit assignments: SET a = expr, b = expr (top-level comma
      // split — function calls and string literals keep their commas)
      val AsgRe = """(?s)\s*`?([A-Za-z_]\w*)`?\s*=\s*(.+?)\s*""".r
      def parseAssignments(sets: String): Seq[(String, String)] =
        splitSpecs(sets).map {
          case AsgRe(c, e) => (c, e)
          case bad => throw new UnsupportedOperationException(
            s"unsupported MERGE SET assignment: $bad (expected col = expr)")
        }
      tokens.foreach { tok =>
        def checked(cond: String): Option[String] = Option(cond).map { c =>
          if (SubqueryRe.matches(c)) throw new UnsupportedOperationException(
            s"lakehouse MERGE clause conditions are row-local predicates, " +
              s"not subqueries; got: AND $c")
          c
        }
        tok match {
          // BY SOURCE first (most specific), then the insert side, then
          // matched — the patterns are disjoint, the order documents it
          case BySourceDeleteRe(cond) =>
            bySource :+= MergeMatched(checked(cond), isDelete = true)
          case BySourceUpdateSetRe(cond, sets) =>
            if (SubqueryRe.matches(sets)) throw new UnsupportedOperationException(
              s"lakehouse MERGE SET expressions are row-local, not subqueries; got: SET $sets")
            bySource :+= MergeMatched(checked(cond), isDelete = false,
              Some(parseAssignments(sets)))
          case NotMatchedInsertRe(cond) =>
            if (insert.isDefined) throw new UnsupportedOperationException(
              "lakehouse MERGE takes at most one WHEN NOT MATCHED clause")
            insert = Some(MergeInsert(checked(cond)))
          // explicit-column insert: INSERT (a, b) VALUES (e1, e2)
          case NotMatchedInsertValsRe(cond, cols, vals) =>
            if (insert.isDefined) throw new UnsupportedOperationException(
              "lakehouse MERGE takes at most one WHEN NOT MATCHED clause")
            if (SubqueryRe.matches(vals)) throw new UnsupportedOperationException(
              s"lakehouse MERGE INSERT values are row-local, not subqueries; got: VALUES ($vals)")
            val colNames = cols.split(",").toSeq
              .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)
            insert = Some(MergeInsert(checked(cond), Some((colNames, splitSpecs(vals)))))
          case MatchedUpdateRe(cond) => matched :+= MergeMatched(checked(cond), false)
          case MatchedDeleteRe(cond) => matched :+= MergeMatched(checked(cond), true)
          // explicit assignments: SET a = expr, b = expr (top-level
          // comma split — function calls keep their inner commas)
          case MatchedUpdateSetRe(cond, sets) =>
            if (SubqueryRe.matches(sets)) throw new UnsupportedOperationException(
              s"lakehouse MERGE SET expressions are row-local, not subqueries; got: SET $sets")
            matched :+= MergeMatched(checked(cond), isDelete = false,
              Some(parseAssignments(sets)))
          case other => throw new UnsupportedOperationException(
            s"unsupported MERGE clause: $other (supported: WHEN MATCHED [AND cond] THEN " +
              "UPDATE SET * | UPDATE SET col = expr, ... | DELETE, " +
              "WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT …, " +
              "WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET col = expr, ... | DELETE)")
        }
      }
      LakehouseMergeCondCommand(table, source, keys, matched, insert, bySource)
    case _ =>
      val plan = delegate.parsePlan(rewriteTimeTravel(sqlText))
      pinReferencedViews(plan)
      plan
  }

  /** SNAPSHOT-ISOLATION pinning (Iceberg's per-query snapshot rule):
    * every registered lakehouse view the statement REFERENCES is
    * re-resolved ONCE, at statement start, to the table's current
    * snapshot (on the session branch — see [[Lakehouse.sessionBranch]]).
    * All references within the statement — a self-join, repeated
    * subqueries — then read one consistent snapshot, and a concurrent
    * writer committing between two references can never produce a
    * mixed read; it also means plain SQL reads are always FRESH, not
    * pinned to registration time. The temp view's plan is inlined at
    * analysis, so re-pinning for a later statement never disturbs an
    * already-analyzed Dataset; data dirs are immutable once committed,
    * so the pinned dir list stays valid whatever commits race it.
    *
    * References come from the PARSED plan's unresolved single-part
    * relations (incl. subqueries), not a word-regex over the SQL text:
    * a registered name inside a string literal or comment no longer
    * triggers a manifest read, and cost is O(plan) per statement
    * instead of O(registered views × text length). */
  private def pinReferencedViews(plan: LogicalPlan): Unit = {
    val sessionOpt = SparkSession.getActiveSession
    if (sessionOpt.isEmpty) return
    val spark = sessionOpt.get
    val referenced = plan.collectWithSubqueries {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size == 1 =>
        r.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)
    }.toSet
    referenced.foreach { name =>
      LakehouseRegistry.lookup(spark, name).foreach { case (lake, _) =>
        // a vacuumed/retired table must not fail statements that
        // reference a same-named non-lakehouse relation
        scala.util.Try(
          lake.read(name, lake.sessionBranch).createOrReplaceTempView(name))
      }
    }
  }

  private val MetaRe =
    """(?i)`?([A-Za-z_]\w*)`?\.(history|snapshots|files|tags|partition_stats|partitions|refs|mviews|views)\b""".r
  private val VersionAsOfRe =
    """(?i)`?([A-Za-z_]\w*)`?\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val VersionTagRe =
    """(?i)`?([A-Za-z_]\w*)`?\s+VERSION\s+AS\s+OF\s+'([^']+)'""".r
  private val TimestampAsOfRe =
    """(?i)`?([A-Za-z_]\w*)`?\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r

  /** SQL time travel on registered lakehouse views — the Iceberg
    * query surface `SELECT … FROM t VERSION AS OF <snap>` /
    * `TIMESTAMP AS OF '<ts>'`. Each travel reference is rewritten to
    * a temp view over the snapshot read the programmatic API already
    * does (`readSnapshot` / `readAsOf`), then the whole statement
    * delegates to Spark's parser — travel composes with any SELECT,
    * including joins of two versions of the same table. References to
    * unregistered names are left untouched for Spark to reject. */
  /** Regex replacement that NEVER fires inside a string literal,
    * quoted identifier, or comment: a literal `'fz VERSION AS OF 3'`
    * (with `fz` registered) must reach the delegate byte-exact, not be
    * rewritten into a travel view name — the silent-corruption class
    * the fuzz spec exists to catch. A match may legitimately EXTEND
    * into a quoted region (the travel ref in `t VERSION AS OF 'dev'`
    * is itself a literal); only matches STARTING inside one skip. */
  private def guardedReplace(text: String, re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val prot = GraftSqlParser.protectedSpans(text)
    re.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (prot.exists(sp => m.start >= sp._1 && m.start < sp._2)) m.matched
        else f(m)))
  }

  private def rewriteTimeTravel(sqlText: String): String = {
    // fast path: no travel syntax and no metadata-table ref — don't
    // touch the text
    if (!"""(?i)\b(?:VERSION|TIMESTAMP)\s+AS\s+OF\b|\.(?:history|snapshots|files|tags|partition_stats|partitions|refs|mviews|views)\b"""
        .r.unanchored.matches(sqlText))
      return sqlText
    val sessionOpt = SparkSession.getActiveSession
    if (sessionOpt.isEmpty) return sqlText
    val spark = sessionOpt.get
    def travelView(view: String, suffix: String,
        read: Lakehouse => org.apache.spark.sql.DataFrame): Option[String] =
      LakehouseRegistry.lookup(spark, view).map { case (lake, _) =>
        val tv = s"${view}__asof_$suffix"
        read(lake).createOrReplaceTempView(tv)
        TravelViews.track(spark, tv)
        tv
      }
    // Iceberg-style METADATA TABLES on registered views: t.history /
    // t.snapshots / t.files / t.tags rewrite to temp views over the
    // programmatic metadata relations. Only registered view names
    // rewrite, so alias-qualified COLUMNS named e.g. `files` on other
    // relations pass through untouched.
    val metaed = guardedReplace(sqlText, MetaRe) { m =>
      {
        val view = m.group(1)
        val which = m.group(2).toLowerCase(java.util.Locale.ROOT)
        LakehouseRegistry.lookup(spark, view).map { case (lake, _) =>
          val tv = s"${view}__meta_$which"
          (which match {
            case "history" => lake.history(view)
            case "snapshots" => lake.snapshotsDf(view)
            case "files" => lake.filesDf(view)
            case "partitions" => lake.partitionsDf(view)
            case "partition_stats" => lake.partitionStatsDf(view)
            case "refs" => lake.refsDf(view)
            case "mviews" => lake.mviewsDf(view)
            case "views" => lake.viewsDf()
            case _ => lake.tagsDf(view)
          }).createOrReplaceTempView(tv)
          TravelViews.track(spark, tv)
          tv
        }.getOrElse(m.matched)
      }
    }
    val versioned = guardedReplace(metaed, VersionAsOfRe)(m =>
      travelView(m.group(1), m.group(2),
        _.readSnapshot(m.group(1), m.group(2).toLong)).getOrElse(m.matched))
    // quoted VERSION AS OF = a NAMED REF (Iceberg's tag/branch refs):
    // tags win (they are immutable audit pointers), then branch heads
    // resolve — `SELECT … FROM t VERSION AS OF 'dev'` reads the dev
    // branch from a main-scoped session without touching the session
    // branch conf
    val tagged = guardedReplace(versioned, VersionTagRe) { m =>
      {
        val ref = m.group(2)
        val view = m.group(1)
        travelView(view, "ref_" + ref.replaceAll("\\W", "_"), { lake =>
          if (lake.tags(view).exists(_._1 == ref)) lake.readTag(view, ref)
          else lake.read(view, ref)
        }).getOrElse(m.matched)
      }
    }
    guardedReplace(tagged, TimestampAsOfRe) { m =>
      {
        // parse in the SESSION timezone (spark.sql.session.timeZone),
        // like every other timestamp literal in the statement —
        // Timestamp.valueOf would use the JVM-default zone, resolving
        // the travel to a wrong snapshot window on a non-UTC host
        val raw = m.group(2)
        val millis = timestampMillis(spark, raw)
        travelView(m.group(1), s"t$millis", _.readAsOf(m.group(1), millis))
          .getOrElse(m.matched)
      }
    }
  }

  /** `TIMESTAMP AS OF` literal → epoch millis, resolved in the session
    * timezone via Catalyst's own literal parser (accepts date-only and
    * full timestamp forms, plus an explicit zone offset in the literal
    * which then wins, exactly as in a SQL timestamp literal). */
  private def timestampMillis(spark: SparkSession, raw: String): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val zone = DateTimeUtils.getZoneId(spark.sessionState.conf.sessionLocalTimeZone)
    val micros = DateTimeUtils.stringToTimestamp(
        org.apache.spark.unsafe.types.UTF8String.fromString(raw), zone)
      .getOrElse(throw new IllegalArgumentException(
        s"invalid TIMESTAMP AS OF literal: '$raw'"))
    Math.floorDiv(micros, 1000L)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** Remove SQL comments QUOTE-AWARELY: `-- …\n` line comments and
    * slash-star bracketed comments (nested, as Spark's lexer allows)
    * are replaced by a single space; comment markers inside `'…'`,
    * `"…"` and `` `…` `` survive untouched (both `''`-doubling and
    * backslash escapes respected). Only the intercept MATCHING reads
    * this text — the delegate always parses the original — so the
    * worst a stripper bug can do is delegate a statement the intercept
    * could have served, never corrupt one. */
  /** Character spans [start, end) of every PROTECTED region — string
    * literals (`'…'`, `"…"`), backquoted identifiers, and comments
    * (line + nested bracketed) — under the same scanner rules as
    * [[stripComments]]. Used to keep regex rewrites from firing on
    * text a user wrote as DATA. */
  private[sources] def protectedSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    val n = sql.length
    var i = 0
    var state = 0
    var depth = 0
    var from = -1
    while (i < n) {
      val c = sql.charAt(i)
      if (depth > 0) {
        if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') { depth += 1; i += 2 }
        else if (c == '*' && i + 1 < n && sql.charAt(i + 1) == '/') {
          depth -= 1; i += 2
          if (depth == 0) { spans += ((from, i)); from = -1 }
        } else i += 1
      } else if (state == 0) {
        if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
          val start = i
          while (i < n && sql.charAt(i) != '\n') i += 1
          spans += ((start, i))
        } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
          depth = 1; from = i; i += 2
        } else {
          if (c == '\'') { state = 1; from = i }
          else if (c == '"') { state = 2; from = i }
          else if (c == '`') { state = 3; from = i }
          i += 1
        }
      } else {
        if (c == '\\' && state != 3 && i + 1 < n) i += 2
        else {
          if ((state == 1 && c == '\'') || (state == 2 && c == '"') ||
            (state == 3 && c == '`')) {
            state = 0; spans += ((from, i + 1)); from = -1
          }
          i += 1
        }
      }
    }
    if (from >= 0) spans += ((from, n)) // unterminated region: protect to EOF
    spans.result()
  }

  private[sources] def stripComments(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length)
    val n = sql.length
    var i = 0
    var state = 0 // 0 normal, 1 inside '…', 2 inside "…", 3 inside `…`
    var depth = 0 // bracketed-comment nesting
    while (i < n) {
      val c = sql.charAt(i)
      if (depth > 0) {
        if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') { depth += 1; i += 2 }
        else if (c == '*' && i + 1 < n && sql.charAt(i + 1) == '/') {
          depth -= 1; i += 2
          if (depth == 0) out.append(' ')
        } else i += 1
      } else if (state == 0) {
        if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
          while (i < n && sql.charAt(i) != '\n') i += 1 // keep the newline
          out.append(' ')
        } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
          depth = 1; i += 2
        } else {
          if (c == '\'') state = 1
          else if (c == '"') state = 2
          else if (c == '`') state = 3
          out.append(c); i += 1
        }
      } else {
        // inside a quoted region: backslash escapes the next char;
        // a doubled closer reads as exit-then-reenter, which is safe
        if (c == '\\' && state != 3 && i + 1 < n) {
          out.append(c).append(sql.charAt(i + 1)); i += 2
        } else {
          if ((state == 1 && c == '\'') || (state == 2 && c == '"') ||
            (state == 3 && c == '`')) state = 0
          out.append(c); i += 1
        }
      }
    }
    out.toString
  }
}

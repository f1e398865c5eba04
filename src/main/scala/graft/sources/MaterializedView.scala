package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized AGGREGATE views over
  * lakehouse tables — the gold-layer pattern the reference rebuilds
  * from scratch every run (reference: spark_jobs/gold_reporting.py:70
  * recomputes its sales rollup with a full `groupBy` over the whole
  * silver table each execution) done the way a 100 TB deployment must:
  * each refresh reads ONLY the source rows appended since the last
  * refresh, partial-aggregates that delta, and merges it into the
  * stored view with mergeable-aggregate algebra. Cost per refresh is
  * O(delta) + O(touched groups), never a source re-scan.
  *
  * Only MERGEABLE aggregates are supported — sum, count, min, max —
  * because those are exactly the ones whose partial results compose
  * associatively (Iceberg/Materialize incremental-view rule; avg is
  * sum/count at read time). FACT intervals apply incrementally in two
  * shapes: append-only intervals merge their delta
  * ([[Lakehouse.readChanges]]), and — r17 — MoR-TOMBSTONED intervals
  * apply SUBTRACTIVELY for sum/count views through the CDC changelog
  * ([[Lakehouse.readChangesCdc]] restates the interval net: appended
  * rows as inserts, tombstone-matched old images as deletes), so a
  * fact MoR delete/update is O(delta) instead of a fact
  * re-aggregation, with fully-retracted groups vanishing through the
  * commit's keyed delete leg. Min/max ride the same pass via EXTREMUM
  * SURVIVORSHIP (a retraction that reaches a stored extremum
  * re-derives that group alone against the target snapshot); true
  * rewrites (CoW delete/merge/compaction — both readers refuse)
  * recompute as before instead of merging unsoundly. Under DIM
  * RETRACTIONS (the subtractive [[dimDelta]] path) min/max apply via
  * EXTREMUM SURVIVORSHIP (r16): a retraction whose own extremum is
  * strictly inside the stored one cannot have removed it, so the group
  * merges incrementally; only groups whose retraction reaches the
  * stored extremum re-derive, and they re-derive alone (one pass
  * filtered to exactly those groups) — a churning dim on a min/max
  * dashboard view is O(delta) in the common case instead of a
  * whole-fact re-aggregate per refresh.
  *
  * EXACTLY-ONCE without a side ledger: every refresh commit carries
  * the SOURCE SNAPSHOT it advanced the view to as its idempotency
  * batch id, so the view's own commit metadata
  * ([[Lakehouse.committedBatches]]) IS the high-watermark store — the
  * watermark and the data it describes commit in one atomic manifest
  * line. A crash anywhere, then a re-run, either recomputes the same
  * delta (pre-commit crash) or no-ops on the already-committed batch
  * id (post-commit crash). Concurrent source commits during a refresh
  * are safe: the target snapshot is pinned first and the delta read
  * is bounded to it; later commits are the next refresh's delta.
  *
  * Operating assumption: ONE refresher per view at a time (the
  * scheduled-maintenance-job shape; [[graft.streaming.EventStream]]'s
  * `maintainMview` serializes refreshes by construction). Two
  * refreshers racing toward the SAME source snapshot are still safe
  * (one commit no-ops on the batch id), but racing toward DIFFERENT
  * snapshots is not coordinated — the merge each computed against a
  * pre-race view state cannot see the other's commit. Crash-REPLAY
  * safety (the common failure) needs no coordination at all.
  */
object MaterializedView {

  /** One mergeable output column of a view. `alias` must be unique
    * across the view and distinct from every group column. */
  sealed trait AggCol { def alias: String }
  /** sum(src) — over DECIMAL or integer inputs for cross-engine /
    * partition-order determinism (float addition is neither). */
  final case class SumCol(src: String, alias: String) extends AggCol
  /** count(*) of the group's rows. */
  final case class CountAll(alias: String) extends AggCol
  final case class MinCol(src: String, alias: String) extends AggCol
  final case class MaxCol(src: String, alias: String) extends AggCol

  /** One dimension hop of a JOIN-shaped view (the silver_enrich
    * shape, reference: spark_jobs/silver_transformation.py): the
    * view's rows are `fact {INNER|LEFT} JOIN dim ON <left>.factKey =
    * dim.dimKey` before filtering/grouping, where `<left>` is the
    * relation accumulated so far — so a LATER hop's `factKey` may
    * name a column introduced by an EARLIER dim (the snowflake shape:
    * orders ⋈ customer on custkey, then ⋈ nation on the customer's
    * nationkey). The fact side is the APPENDING side
    * (delta-maintained); dims are the enrichment side — ANY hop's
    * movement applies incrementally when [[dimDelta]]'s gates hold
    * (prefix hops enrich at their pins before the moved hop's changed
    * rows join, suffix hops after; moved hops compose sequentially in
    * [[refresh]]). LEFT keeps unmatched left-side rows with
    * null-extended dim columns; since r14 a LEFT hop's movement is
    * subtractive AT ANY CHAIN POSITION — the null-extension algebra
    * (match-count-crossing-zero probes at the moved hop's two pins)
    * composes because unmoved hops are PINNED (identical enrichment
    * on the plus and minus legs, so their extensions cancel) and the
    * reconstructed rows — matched pairs and null-extended rows alike —
    * flow through the suffix hops under each hop's own join semantics,
    * exactly as the from-scratch view would (a null key drops at an
    * inner suffix, extends at a left one, on both legs). */
  final case class JoinSpec(dim: String, factKey: String, dimKey: String,
      joinType: String = "inner") {
    require(joinType == "inner" || joinType == "left",
      s"join view supports inner|left, got $joinType")
  }

  /** A view definition: `view` materializes
    * `SELECT groupCols, aggs FROM src [JOIN dim]* [WHERE filter]
    * GROUP BY groupCols`. The row filter is a plain column predicate
    * — applied identically to full recomputes and to deltas, which is
    * sound because a row's filter verdict never changes after it
    * lands (append-only intervals; rewrites fall back to recompute).
    * With [[JoinSpec]] hops, group/filter/agg columns may come from
    * any side of the join chain (names must not collide across the
    * tables, except shared join-key names). */
  final case class ViewDef(view: String, src: String,
      groupCols: Seq[String], aggs: Seq[AggCol],
      filter: Option[String] = None, joins: Seq[JoinSpec] = Nil) {
    require(groupCols.nonEmpty, "a materialized aggregate view needs group columns")
    require(aggs.nonEmpty, "a materialized aggregate view needs aggregate columns")
    require(joins.map(_.dim).distinct == joins.map(_.dim),
      s"duplicate dim table in join chain ${joins.map(_.dim)}")
    private val names = groupCols ++ aggs.map(_.alias)
    require(names.distinct == names, s"duplicate output column in $names")
    /** The single-dim hop, when the view has exactly one (the shape
      * [[dimDelta]] maintains incrementally). */
    def join: Option[JoinSpec] = if (joins.length == 1) joins.headOption else None
  }

  /** The aggregation, runnable over the full source OR any delta of
    * it — partial aggregates merge because every AggCol is mergeable. */
  private def aggOf(rows: DataFrame, d: ViewDef): DataFrame = {
    val cols = d.aggs.map {
      case SumCol(s, a) => sum(col(s)).as(a)
      case CountAll(a) => count(lit(1)).as(a)
      case MinCol(s, a) => min(col(s)).as(a)
      case MaxCol(s, a) => max(col(s)).as(a)
    }
    d.filter.map(f => rows.where(expr(f))).getOrElse(rows)
      .groupBy(d.groupCols.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Enrich fact rows through the view's join chain, every dim PINNED
    * to its snapshot — the delta path must join against exactly the
    * dim states its watermark recorded, or a concurrent dim commit
    * would split one refresh across two dim versions. Hops apply in
    * declaration order, so a later hop's factKey resolves against the
    * accumulated relation (snowflake chains). */
  private def joined(lake: Lakehouse, factRows: DataFrame, hops: Seq[JoinSpec],
      dimSnaps: Seq[Long]): DataFrame =
    hops.zip(dimSnaps).foldLeft(factRows) { case (acc, (j, snap)) =>
      val dim = lake.readSnapshot(j.dim, snap)
      if (j.factKey == j.dimKey) acc.join(dim, Seq(j.factKey), j.joinType)
      else acc.join(dim, acc(j.factKey) === dim(j.dimKey), j.joinType)
    }

  // ---- dim-side watermark (join views only) ------------------------------
  // Lives in a side file, NOT in the view's commit — so it is only
  // ADVISORY, and every consumer must survive it being stale:
  //  - the DELTA path starts its CDC read at max(aux, the view's own
  //    negative-batch-id ledger), which is atomic with the data — a
  //    crash between a delta commit and the aux write can never
  //    replay the committed sub-interval ([[dimDelta]]);
  //  - the RECOMPUTE path writes a `pending:` marker FIRST (parses as
  //    no watermark), so its crash window routes the next refresh
  //    back through the idempotent recompute instead of feeding a
  //    stale numeric watermark to the subtractive path.
  // Worst case in every window is one spurious recompute — never a
  // double-applied delta.
  /** Parsed per-hop dim watermarks (comma-joined for multi-hop views;
    * single-long lines from pre-multi-hop rounds parse as the one-hop
    * list). A malformed line, a `pending:` marker, or an ARITY
    * MISMATCH against the definition's hop count all answer None —
    * no-watermark routes every consumer to the idempotent recompute. */
  private def dimWatermark(lake: Lakehouse, view: String,
      nHops: Int): Option[Seq[Long]] =
    lake.readMviewAux(view).flatMap { s =>
      val parts = s.trim.split(",").toSeq
      val longs = parts.flatMap(p => scala.util.Try(p.trim.toLong).toOption)
      if (longs.length == parts.length && longs.length == nHops) Some(longs)
      else None
    }
  /** The dim snapshots a join view currently reflects (one per hop) —
    * the streaming scheduler tails each dim from here. */
  private[graft] def dimWatermarkOf(lake: Lakehouse, view: String,
      nHops: Int): Option[Seq[Long]] =
    dimWatermark(lake, view, nHops)
  private def writeDimWatermark(lake: Lakehouse, view: String,
      snaps: Seq[Long]): Unit =
    lake.writeMviewAux(view, snaps.mkString(","))
  /** Mark a dim-side RECOMPUTE as in flight BEFORE its commit: the
    * marker parses as no watermark, so a crash inside the window
    * routes the next refresh back through the (idempotent) recompute
    * instead of letting a stale numeric watermark feed [[dimDelta]] a
    * sub-interval the view already reflects — the double-apply that
    * silently corrupts totals. Worst case is one spurious recompute. */
  private[graft] def markDimRecompute(lake: Lakehouse, view: String,
      target: Seq[Long]): Unit =
    lake.writeMviewAux(view, s"pending:${target.mkString(",")}")
  /** Per-hop partition of the negative batch-id namespace: hop 0
    * commits as `-dimTo` (the pre-round-13 form, so existing ledgers
    * decode unchanged), hop h > 0 as `-(h·2^40 + dimTo)` — snapshot
    * ids are far below 2^40, so the two components never collide and
    * each hop's applied-delta watermark reads back unambiguously. */
  private val HopBase = 1L << 40
  private def hopBatchId(hop: Int, dimTo: Long): Long = {
    require(dimTo > 0 && dimTo < HopBase && hop >= 0,
      s"dim snapshot $dimTo out of hop-batch range")
    -(hop * HopBase + dimTo)
  }
  /** The dim snapshots whose DELTAS the view has already applied FOR
    * ONE HOP — read from the commit ledger itself (the negative
    * batch-id namespace), which is atomic with the data, unlike the
    * aux file. */
  private def dimApplied(lake: Lakehouse, view: String, hop: Int): Seq[Long] =
    lake.committedBatches(view).filter(_ < 0L).map(-_)
      .filter(v => (v / HopBase).toInt == hop).map(_ % HopBase).toSeq

  // ---- persisted definitions (`_mviews.jsonl`) ---------------------------

  private def aggJson(lake: Lakehouse, a: AggCol): String = a match {
    case SumCol(s, al) => s"""{"op":"sum","col":"${lake.jsonEscape(s)}","as":"${lake.jsonEscape(al)}"}"""
    case CountAll(al) => s"""{"op":"count","as":"${lake.jsonEscape(al)}"}"""
    case MinCol(s, al) => s"""{"op":"min","col":"${lake.jsonEscape(s)}","as":"${lake.jsonEscape(al)}"}"""
    case MaxCol(s, al) => s"""{"op":"max","col":"${lake.jsonEscape(s)}","as":"${lake.jsonEscape(al)}"}"""
  }

  private val JoinJson =
    """\{"dim":"([^"]*)","fk":"([^"]*)","dk":"([^"]*)"(?:,"jt":"([^"]*)")?\}"""
  private val LineRe =
    ("""\{"mview":"([^"]*)","src":"([^"]*)","group":\[([^\]]*)\],"aggs":\[(.*?)\]""" +
      s"""(?:,"join":$JoinJson)?""" +
      """(?:,"joins":\[(.*?)\])?""" +
      """(?:,"where":"(.*)")?\}""").r
  private val JoinRe = JoinJson.r
  private val AggRe =
    """\{"op":"(\w+)"(?:,"col":"([^"]*)")?,"as":"([^"]*)"\}""".r

  /** Record the definition in the lake's `_mviews.jsonl` (upsert by
    * view name) so a fresh session can refresh it by name. Single-hop
    * views keep the pre-multi-hop `"join"` key (older lines stay
    * parseable both ways); multi-hop chains write `"joins":[…]`. */
  def persist(lake: Lakehouse, d: ViewDef): Unit = {
    val e = lake.jsonEscape _
    def joinJson(j: JoinSpec) =
      s"""{"dim":"${e(j.dim)}","fk":"${e(j.factKey)}","dk":"${e(j.dimKey)}"""" +
        s""","jt":"${e(j.joinType)}"}"""
    val line = s"""{"mview":"${e(d.view)}","src":"${e(d.src)}","group":[${
      d.groupCols.map(c => s""""${e(c)}"""").mkString(",")}],"aggs":[${
      d.aggs.map(aggJson(lake, _)).mkString(",")}]${
      d.joins match {
        case Seq() => ""
        case Seq(j) => s""","join":${joinJson(j)}"""
        case many => s""","joins":[${many.map(joinJson).mkString(",")}]"""
      }}${
      d.filter.map(f => s""","where":"${e(f)}"""").getOrElse("")}}"""
    lake.upsertMviewLine(d.view, line)
  }

  private def parseLine(line: String): Option[ViewDef] = line match {
    case LineRe(v, src, groups, aggs, dim, fk, dk, jt, joinsArr, where) =>
      val groupCols = groups.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty)
      val aggCols = AggRe.findAllMatchIn(aggs).map { m =>
        (m.group(1), Option(m.group(2)), m.group(3)) match {
          case ("sum", Some(s), al) => SumCol(s, al)
          case ("count", _, al) => CountAll(al)
          case ("min", Some(s), al) => MinCol(s, al)
          case ("max", Some(s), al) => MaxCol(s, al)
          case other => throw new IllegalStateException(s"corrupt mview agg entry: $other")
        }
      }.toSeq
      // pre-r12 lines carry no "jt": those views are inner joins
      val single = Option(dim).map(dm => JoinSpec(dm, fk, dk,
        Option(jt).getOrElse("inner")))
      val chain = Option(joinsArr).toSeq.flatMap(arr =>
        JoinRe.findAllMatchIn(arr).map(m => JoinSpec(m.group(1), m.group(2),
          m.group(3), Option(m.group(4)).getOrElse("inner"))).toSeq)
      Some(ViewDef(v, src, groupCols, aggCols, Option(where),
        single.toSeq ++ chain))
    case _ => None
  }

  /** Load a persisted definition by view name. */
  def load(lake: Lakehouse, view: String): Option[ViewDef] =
    defs(lake).reverseIterator.find(_.view == view)

  /** All persisted definitions of a lake, in ledger order. */
  def defs(lake: Lakehouse): Seq[ViewDef] =
    lake.readMviewLines().flatMap(parseLine)

  private def describe(a: AggCol): String = a match {
    case SumCol(s, al) => s"sum($s) AS $al"
    case CountAll(al) => s"count(*) AS $al"
    case MinCol(s, al) => s"min($s) AS $al"
    case MaxCol(s, al) => s"max($s) AS $al"
  }

  /** Refresh a CHAIN of views (gold-over-silver-over-bronze rollup
    * DAGs): when a view's source is itself a persisted materialized
    * view of the same lake, the upstream view refreshes first, then
    * the downstream hop advances. The downstream hop lands on the
    * recompute path by construction — upstream refreshes commit as
    * keyed UPSERTS (history rewrites), which the append-only delta
    * reader correctly refuses — and that recompute reads the
    * AGGREGATE-SIZED upstream view, never the corpus: a two-level
    * chain costs O(source delta) + O(|upstream view|) per refresh.
    * Each hop keeps its own exactly-once watermark, so a crash
    * anywhere in the chain resumes cleanly. Cycles refuse loudly. */
  def refreshChain(lake: Lakehouse, view: String): Long = {
    def walk(v: String, seen: Set[String]): Long = {
      require(!seen.contains(v), s"materialized-view cycle through $v")
      val d = load(lake, v).getOrElse(throw new IllegalArgumentException(
        s"$v has no _mviews.jsonl definition in this lake"))
      if (load(lake, d.src).isDefined) walk(d.src, seen + v)
      refresh(lake, d)
    }
    walk(view, Set.empty)
  }

  /** The `t.mviews` metadata relation: the materialized views
    * maintained OVER source table `src` in this lake, with their
    * definitions and refresh state — `current_src_snapshot` vs
    * `watermark` tells an operator at a glance whether a view is
    * stale (pure ledger reads, no data I/O). */
  def viewsDf(lake: Lakehouse, src: String): DataFrame = {
    val spark = lake.spark
    val cur = lake.currentSnapshot(src)
    val rows = defs(lake).filter(_.src == src).map { d =>
      val note = lake.readMviewRefreshNote(d.view)
      (d.view, d.src, d.groupCols.mkString(", "), d.aggs.map(describe).mkString(", "),
        d.filter.orNull,
        scala.util.Try(watermark(lake, d)).toOption.map(Long.box).orNull,
        cur.map(Long.box).orNull,
        note.map(_._1).orNull, note.map(_._2).filter(_.nonEmpty).orNull)
    }
    spark.createDataFrame(rows).toDF("mview", "src", "group_cols", "aggs",
      "where_clause", "watermark", "current_src_snapshot",
      "last_refresh", "refresh_note")
  }

  /** Merge expression for one agg column across (stored view value
    * `al`, delta partial value `__d_al`) of a full-outer join — null
    * on either side means "group absent there". Delta columns are
    * RENAMED before the join: both relations descend from the same
    * source scan, so attribute-based disambiguation would trip
    * Spark's ambiguous-self-join detection. */
  private def mergeCol(a: AggCol): Column = {
    val t = col(a.alias); val d = col("__d_" + a.alias)
    (a match {
      // new-group / absent-delta cases fall through the coalesce chain
      case _: SumCol | _: CountAll => coalesce(t + d, t, d)
      case _: MinCol => least(t, d) // least/greatest skip nulls
      case _: MaxCol => greatest(t, d)
    }).as(a.alias)
  }

  /** Group columns wrapped into ONE struct key `__gk`. Group values
    * may legitimately be NULL (a left-join view's unmatched bucket, a
    * null fact attribute), and SQL equality strands null keys on both
    * sides of every join — but struct comparison treats field nulls
    * as EQUAL, so joining/anti-joining on the wrapped key merges null
    * groups exactly like `groupBy` formed them. */
  private def gk(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.withColumn("__gk", struct(groupCols.map(col): _*))

  /** Null-safe group merge: split the stored view `t` against a delta
    * relation `da` (`__gk` + `__d_<alias>` columns) into the UNTOUCHED
    * rows (carried as-is) and the MERGED rows (stored ⊕ delta through
    * [[mergeCol]], new groups included). The caller gates/commits. */
  private def mergeSplit(d: ViewDef, t: DataFrame, da: DataFrame)
      : (DataFrame, DataFrame) = {
    val tgk = gk(t, d.groupCols)
    val untouched = tgk.join(da.select(col("__gk")), Seq("__gk"), "left_anti")
      .drop("__gk")
    // only groups the delta TOUCHES enter the merge (the full-outer
    // with the whole view would re-emit every untouched group too)
    val touched = tgk.drop(d.groupCols: _*)
      .join(da.select(col("__gk")), Seq("__gk"), "left_semi")
    val merged = touched.join(da, Seq("__gk"), "full_outer")
      .select(d.groupCols.map(c => col("__gk").getField(c).as(c)) ++
        d.aggs.map(mergeCol): _*)
    (untouched, merged)
  }

  /** A delta relation in [[mergeSplit]] shape: the aggregation of
    * `rows` with group columns wrapped into `__gk` and agg columns
    * renamed to `__d_<alias>`. */
  private def deltaOf(rows: DataFrame, d: ViewDef): DataFrame =
    gk(aggOf(rows, d), d.groupCols)
      .select(col("__gk") +: d.aggs.map(a => col(a.alias).as("__d_" + a.alias)): _*)

  /** Create (or recreate) the view at the source's CURRENT snapshot.
    * Idempotent per source snapshot: recreating against an unmoved
    * source commits nothing. Join views also pin the dim snapshot
    * they were built against. */
  def create(lake: Lakehouse, d: ViewDef): Long = {
    val s0 = lake.currentSnapshot(d.src).getOrElse(
      throw new IllegalArgumentException(s"no such source table: ${d.src}"))
    // pin every dim snapshot ONCE: the join reads and the recorded
    // watermarks must name the same dim states even if a dim commits
    // concurrently
    val dimPins = d.joins.map { j =>
      lake.currentSnapshot(j.dim).getOrElse(
        throw new IllegalArgumentException(s"no such dim table: ${j.dim}"))
    }
    val rows =
      if (d.joins.isEmpty) lake.read(d.src)
      else joined(lake, lake.readSnapshot(d.src, s0), d.joins, dimPins)
    // a RE-create over an existing join view must not leave the OLD
    // numeric dim watermark paired with the NEW content (the stale-aux
    // double-apply window) — mark pending before the commit
    if (dimPins.nonEmpty) markDimRecompute(lake, d.view, dimPins)
    val snap = lake.replaceOnce(aggOf(rows, d), d.view, batchId = s0)
    if (dimPins.nonEmpty) writeDimWatermark(lake, d.view, dimPins)
    // the view is a queryable lakehouse table: register it so SQL can
    // read it — and so a downstream CREATE MATERIALIZED VIEW can name
    // it as a source (the parser guard keys on registration)
    lake.registerView(d.view)
    snap
  }

  /** The source snapshot the view currently reflects. */
  def watermark(lake: Lakehouse, d: ViewDef): Long = {
    val wm = lake.committedBatches(d.view)
    require(wm.nonEmpty, s"${d.view} is not a materialized view (no refresh watermark); " +
      "MaterializedView.create it first")
    wm.max
  }

  /** Key-set bound on the dim-delta path's IN-LIST fact probe: up to
    * this many changed dim keys, the fact rows are re-read through
    * [[Lakehouse.readWhere]]'s stats/bloom IN-list file skipping —
    * O(matching files). ABOVE it the probe switches to a SEMI-JOIN
    * against the changed-key set (plan choice, not a soundness bound):
    * one fact pass filtered to the changed keys' rows, which still
    * beats the recompute fallback (full fact re-aggregation plus a
    * whole-view rewrite) whenever the changed keys' rows are a
    * minority — the 5,000-key dim backfill case the old recompute
    * cliff punished. */
  private val DimDeltaKeysCap = 1024

  /** Bound on the exhausted-group key collect for min/max scoped
    * re-derivation ([[dimDelta]]): at or below it (and with every
    * group column an atomic fact column), the re-derivation read is
    * an OR-of-equalities `readWhere` — stats/bloom file-pruned;
    * above it, one filtered full-fact pass. */
  private val ExhaustedKeysCap = 256

  /** Apply a DIM-side change interval INCREMENTALLY: the view moves
    * from `fact@factSnap ⋈ dim@dimFrom` to `fact@factSnap ⋈
    * dim@dimTo` by subtractive merge — the CDC changelog of the dim
    * interval names the changed keys, the fact rows joining those
    * keys are re-read (IN-pruned, at the PINNED fact snapshot), and
    * per group the view adds Γ(fact ⋈ inserted dim rows) minus
    * Γ(fact ⋈ deleted dim rows). LEFT joins add the null-extension
    * legs: two key-filtered pinned dim probes decide which changed
    * keys matched nothing before/after, and those keys' fact rows
    * enter the minus/plus sides null-extended — exact for ANY dim key
    * cardinality (an added duplicate of a matched key extends
    * nothing). Sound ONLY under gates, each of
    * which returns None so the caller recomputes:
    *  - every aggregate is sum/count (subtracted) or min/max (merged
    *    by extremum survivorship, r16 — exhausted groups re-derive
    *    scoped, see the inline note), with a count(*) present to
    *    witness group emptiness;
    *  - the dim interval is CDC-readable (appends + MoR
    *    deletes/updates; a CoW rewrite refuses) — maintain enrichment
    *    dims MoR-style to keep join views delta-priced.
    * A group whose count reaches ZERO (all rows retracted) VANISHES
    * incrementally since r17: its key rides the delete leg of the
    * same snapshot commit as the upsert
    * ([[Lakehouse.upsertDeleteOnce]] — atomic, batch-id idempotent),
    * so even full-group retractions stay O(delta); only a NEGATIVE
    * count (an over-retracting ledger, impossible under these gates)
    * still refuses to the exact recompute.
    * The changed-key CARDINALITY is a plan choice, not a gate: up to
    * [[DimDeltaKeysCap]] keys the fact probe is an IN-pruned read
    * (stats/bloom file skipping); above it a semi-join probe keeps
    * the path incremental — a 5,000-key backfill applies
    * subtractively instead of falling off a recompute cliff.
    * EXACTLY-ONCE: the commit's idempotency batch id is the
    * HOP-PARTITIONED [[hopBatchId]] (`-dimTo` for the head hop,
    * `-(h·2^40 + dimTo)` deeper) — the NEGATIVE namespace keeps
    * dim-keyed commits from colliding with fact-snapshot batch ids,
    * the hop partition keeps two dims' snapshot counters from
    * colliding with each other, and [[watermark]]'s `.max` still
    * reads the fact watermark. A crash after the commit but before
    * the aux dim-watermark write replays into the already-committed
    * batch id and converges (never a double-applied delta).
    * At 100 TB this is the difference between "a dim attribute was
    * backfilled for 50 keys" costing O(50 keys' fact rows) and
    * costing a full fact re-aggregation. */
  private[graft] def dimDelta(lake: Lakehouse, d: ViewDef, factSnap: Long,
      dimFrom: Option[Long], dimTo: Long,
      restPins: Seq[Long] = Seq.empty, hop: Int = 0): Option[Long] = {
    // `hop` names the MOVED dim; `restPins` carries the OTHER hops'
    // snapshots in chain order (prefix before, suffix after). The
    // changed keys' contributions re-enrich through the prefix hops at
    // their pins AND the suffix hops at theirs, identically on the
    // plus and minus legs, so the subtractive algebra is untouched —
    // unchanged-dim pairs cancel exactly as in the single-hop case.
    // LEFT hops compose too (r14): an unmoved LEFT hop is pinned, so
    // its null-extensions are identical on both legs and cancel; a
    // MOVED left hop's extension legs (the two match-count probes
    // below) rebuild rows whose moved-dim columns are NULL, and those
    // rows then take the suffix hops under each hop's own semantics —
    // dropping at inner suffixes, extending at left ones — exactly as
    // the from-scratch view does, on both legs.
    val j = d.joins(hop)
    // MIN/MAX aggregates join the subtractable family (r16) through
    // EXTREMUM SURVIVORSHIP: the stored group extremum is the sole
    // candidate — a retraction whose own extremum is strictly inside
    // it cannot have removed it (max(minus) < stored max ⇒ the stored
    // max survives; symmetrically for min), so the group merges
    // incrementally as greatest(stored, plus)/least(stored, plus).
    // Only groups whose minus leg REACHES the stored extremum
    // (candidate exhausted — the extremum row may be among the
    // retracted) re-derive, and they re-derive ALONE: one pass
    // filtered to exactly those groups, never the whole-view
    // recompute this used to cost on every dim churn.
    if (!d.aggs.forall(a => a.isInstanceOf[SumCol] || a.isInstanceOf[CountAll] ||
      a.isInstanceOf[MinCol] || a.isInstanceOf[MaxCol]))
      return None
    val minmaxAggs = d.aggs.filter(a =>
      a.isInstanceOf[MinCol] || a.isInstanceOf[MaxCol])
    val countAlias = d.aggs.collectFirst { case CountAll(a) => a }
      .getOrElse(return None)
    val prefixPins = restPins.take(hop)
    val suffixPins = restPins.drop(hop)
    // The aux file is ADVISORY (it commits after the data): the
    // authoritative "deltas applied through" mark is the view's own
    // negative-batch-id ledger, atomic with each commit. A crash
    // between a delta commit and the aux write, followed by MORE dim
    // movement, must not replay the committed sub-interval — start
    // the CDC read at the furthest point either source proves.
    val f0 = (dimFrom.toSeq ++ dimApplied(lake, d.view, hop))
      .reduceOption(_ max _).getOrElse(return None) // no pin at all: recompute
    if (f0 == dimTo) // fully applied; only the aux needs converging
      return Some(lake.currentSnapshot(d.view).get)
    if (f0 > dimTo) return None // dim ROLLED BACK: only a recompute is sound
    // the fact probe time-travels to the view's fact watermark — an
    // EXPIRED snapshot can't be read (readWhere would throw), so the
    // recompute fallback takes over before any plan is built
    if (!lake.snapshots(d.src).exists(_._1 == factSnap)) return None
    val batchId = hopBatchId(hop, dimTo)
    if (lake.committedBatches(d.view).contains(batchId))
      return Some(lake.currentSnapshot(d.view).get) // crash replay: converge aux only
    val cdc =
      try lake.readChangesCdc(j.dim, f0, dimTo).localCheckpoint(true)
      catch { case _: IllegalArgumentException => return None }
    val dOld = cdc.where(col("_change_type") === "delete").drop("_change_type")
    val dNew = cdc.where(col("_change_type") === "insert").drop("_change_type")
    // ONE bounded probe job decides the plan: ≤ cap keys collect to an
    // IN list (readWhere's stats/bloom skipping prunes fact FILES —
    // O(matching files)); larger sets keep the incremental path
    // through a semi-join probe against the materialized key set (one
    // fact pass filtered to the changed keys — a plan choice, still
    // far cheaper than the full-recompute fallback this used to take)
    val keysDf = dOld.select(col(j.dimKey)).union(dNew.select(col(j.dimKey)))
      .distinct().toDF("__ck")
    val probe = keysDf.limit(DimDeltaKeysCap + 1).collect()
    if (probe.isEmpty) // net-empty interval: nothing to apply
      return Some(lake.currentSnapshot(d.view).get)
    val inList: Option[Seq[Any]] =
      if (probe.length <= DimDeltaKeysCap) Some(probe.map(_.get(0)).toIndexedSeq)
      else None
    // materialized only when a consumer actually joins against it
    // (above-cap probes, left-join null-extension legs)
    lazy val keysCk = keysDf.localCheckpoint(true)
    // the moved hop's join column comes either from the FACT itself
    // (star chains — the probe prunes the fact directly, whatever the
    // hop index) or from an earlier dim (snowflake chains — the
    // changed-row join restricts instead; one filtered fact pass)
    val factBase = lake.readSnapshot(d.src, factSnap)
    val keyOnFact = factBase.columns.contains(j.factKey)
    val fact0 =
      if (!keyOnFact) factBase
      else inList match {
        case Some(vs) => lake.readWhere(col(j.factKey).isin(vs: _*),
          d.src, atSnapshot = Some(factSnap))
        case None => factBase.join(keysCk, col(j.factKey) === col("__ck"), "left_semi")
      }
    // prefix hops enrich BEFORE the moved hop joins, at their pins
    val fact =
      if (hop == 0) fact0
      else joined(lake, fact0, d.joins.take(hop), prefixPins)
    // LEFT joins additionally need per-key MATCH EXISTENCE at both dim
    // snapshots: the matched-pair algebra is additive per (fact, dim)
    // row, but a null-EXTENSION appears/disappears only when a key's
    // match count crosses zero — and the CDC alone can't tell (an
    // added duplicate of an already-matched key changes nothing).
    // Two pinned dim probes answer it exactly (key-filtered IN the
    // bounded case, full pinned dim reads above the cap — dim-sized).
    def unmatched(at: Long): DataFrame = {
      val dimKeys = (inList match {
        case Some(vs) => lake.readWhere(col(j.dimKey).isin(vs: _*),
          j.dim, atSnapshot = Some(at))
        case None => lake.readSnapshot(j.dim, at)
      }).select(col(j.dimKey).as("__dk")).where(col("__dk").isNotNull).distinct()
      keysCk.join(dimKeys, col("__ck") === col("__dk"), "left_anti")
    }
    val (nullOld, nullNew): (Option[DataFrame], Option[DataFrame]) =
      if (j.joinType == "inner") (None, None)
      else {
        // both pinned-dim probes materialize in ONE checkpoint and
        // answer both emptiness gates with ONE aggregate — previously
        // two checkpoints + two head(1) probes (4 jobs → 2, guide §1.2)
        val both = unmatched(f0).withColumn("__w", lit(0))
          .unionByName(unmatched(dimTo).withColumn("__w", lit(1)))
          .localCheckpoint(true)
        val sides = both.groupBy(col("__w")).count().collect()
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
        val o = both.where(col("__w") === 0).drop("__w")
        val n = both.where(col("__w") === 1).drop("__w")
        (if (sides.getOrElse(0, 0L) == 0L) None else Some(o),
          if (sides.getOrElse(1, 0L) == 0L) None else Some(n))
      }
    val emptyDim = cdc.drop("_change_type").limit(0)
    def contrib(dim: DataFrame, nullKeys: Option[DataFrame], prefix: String): DataFrame = {
      // matched pairs join INNER against the changed dim rows (the
      // additive part); null-extensions rebuild as fact rows of the
      // unmatched keys left-joined to an empty dim (all dim cols null)
      val matched = if (j.factKey == j.dimKey) fact.join(dim, Seq(j.factKey))
      else fact.join(dim, fact(j.factKey) === dim(j.dimKey))
      val rows = nullKeys match {
        case None => matched
        case Some(nk) =>
          val ne = fact.join(nk, col(j.factKey) === nk("__ck"), "left_semi")
          val extended = if (j.factKey == j.dimKey)
            ne.join(emptyDim, Seq(j.factKey), "left")
          else ne.join(emptyDim, ne(j.factKey) === emptyDim(j.dimKey), "left")
          matched.unionByName(extended)
      }
      // the SUFFIX hops of the chain, pinned: each hop re-applies
      // under its OWN join semantics (left hops included) on both the
      // plus and minus legs — an unmoved hop's null-extensions are
      // IDENTICAL on the two legs, so they cancel in the subtraction
      // (the composition argument in [[dimDelta]]'s docstring)
      val enriched =
        if (hop == d.joins.length - 1) rows
        else joined(lake, rows, d.joins.drop(hop + 1), suffixPins)
      aggOf(enriched, d).select(d.groupCols.map(col) ++
        d.aggs.map(a => col(a.alias).as(prefix + a.alias)): _*)
    }
    // net per-group delta = inserted-side minus deleted-side partials
    // (null partial = "no rows on that side": contributes zero); the
    // plus/minus legs meet null-safely on the wrapped group key
    def leg(dim: DataFrame, nullKeys: Option[DataFrame], prefix: String): DataFrame =
      gk(contrib(dim, nullKeys, prefix), d.groupCols).drop(d.groupCols: _*)
    val da = leg(dNew, nullNew, "__p_")
      .join(leg(dOld, nullOld, "__m_"), Seq("__gk"), "full_outer")
      .select(col("__gk") +: d.aggs.flatMap {
        case a if a.isInstanceOf[SumCol] || a.isInstanceOf[CountAll] =>
          Seq((coalesce(col("__p_" + a.alias), lit(0)) -
            coalesce(col("__m_" + a.alias), lit(0))).as("__d_" + a.alias))
        // min/max carry BOTH partials: the merge below needs the plus
        // side (candidate challenger) and the minus side (survivorship
        // test against the stored extremum) separately
        case a => Seq(col("__p_" + a.alias), col("__m_" + a.alias))
      }: _*)
    val t = lake.read(d.view)
    val viewSchema = t.schema
    val (untouched, merged0, vanishedMm) =
      if (minmaxAggs.isEmpty) {
        val (u, m) = mergeSplit(d, t, da); (u, m, None)
      } else survivorMerge(lake, d, t, da, minmaxAggs, factBase.schema,
        pred => {
          val allPins = prefixPins ++ (dimTo +: suffixPins)
          val base = pred match {
            case Some(p) => lake.readWhere(p, d.src, atSnapshot = Some(factSnap))
            case None => lake.readSnapshot(d.src, factSnap)
          }
          joined(lake, base, d.joins, allPins)
        })
    commitMerged(lake, d, viewSchema, untouched, merged0, vanishedMm,
      countAlias, batchId)
  }

  /** Merge a min/max-bearing delta `da` — net sum/count columns
    * (`__d_<alias>`) plus min/max PARTIAL PAIRS (`__p_/__m_<alias>`,
    * the plus-leg candidate and the minus-leg retraction extremum) —
    * into the stored view via EXTREMUM SURVIVORSHIP. Shared by the
    * dim-delta and the fact-CDC subtractive paths (r17): the stored
    * group extremum is the sole candidate — a retraction whose own
    * extremum is strictly inside it cannot have removed it, so the
    * group merges incrementally; only groups whose minus leg REACHES
    * the stored extremum re-derive, and they re-derive ALONE through
    * `factRowsAt` — the caller's reader of the fact rows the target
    * state aggregates (ENRICHED through the full join chain at the
    * target pins), `pred`-pruned (stats/bloom file skipping) when the
    * exhausted key set is bounded and every group column is an atomic
    * column of `factSchema`. Groups whose re-derivation comes back
    * EMPTY return as the vanished set (third element) for the
    * commit's keyed delete leg. */
  private def survivorMerge(lake: Lakehouse, d: ViewDef, t: DataFrame,
      da: DataFrame, minmaxAggs: Seq[AggCol],
      factSchema: org.apache.spark.sql.types.StructType,
      factRowsAt: Option[Column] => DataFrame)
      : (DataFrame, DataFrame, Option[DataFrame]) = {
    val tgk = gk(t, d.groupCols)
    val untouchedMm = tgk
      .join(da.select(col("__gk")), Seq("__gk"), "left_anti").drop("__gk")
    val joinedMm = tgk.drop(d.groupCols: _*)
      .join(da.select(col("__gk")), Seq("__gk"), "left_semi")
      .join(da, Seq("__gk"), "full_outer")
    // EXHAUSTED: the minus leg's extremum equals the stored one
    // (the retracted rows may include the extremum row — duplicates
    // make equality conservative, which is the sound direction); a
    // group absent from the view (new group) is never exhausted
    val exhausted = minmaxAggs.map {
      case a: MinCol => col(a.alias).isNotNull &&
        col("__m_" + a.alias).isNotNull && (col("__m_" + a.alias) <= col(a.alias))
      case a => col(a.alias).isNotNull &&
        col("__m_" + a.alias).isNotNull && (col("__m_" + a.alias) >= col(a.alias))
    }.reduce(_ || _)
    val tagged = joinedMm.withColumn("__exh", exhausted).localCheckpoint(true)
    val exhKeys = tagged.where(col("__exh")).select(col("__gk"))
    val survivorCols = d.groupCols.map(c => col("__gk").getField(c).as(c)) ++
      d.aggs.map {
        case a @ (_: SumCol | _: CountAll) => mergeCol(a)
        case a: MinCol => least(col(a.alias), col("__p_" + a.alias)).as(a.alias)
        case a: MaxCol => greatest(col(a.alias), col("__p_" + a.alias)).as(a.alias)
      }
    val survivors = tagged.where(!col("__exh")).select(survivorCols: _*)
    // ONE bounded probe decides emptiness AND boundedness AND hands
    // over the keys: the previous head(1) emptiness job + separate
    // limit-collect job collapse into this single action over the
    // checkpointed `tagged` (guide §1.2 — fewer driver round-trips;
    // the probe stays ≤ ExhaustedKeysCap+1 tiny rows either way)
    val exhProbe = exhKeys.limit(ExhaustedKeysCap + 1).collect()
    if (exhProbe.isEmpty) (untouchedMm, survivors, None)
    else {
      // SCOPED re-derivation: exactly the exhausted groups, one
      // filtered pass at the target pins. When every group column
      // lives ON THE FACT and the exhausted key set is bounded,
      // the pass is stats/bloom FILE-pruned — truly O(those groups'
      // rows); otherwise it is one fact scan filtered to those groups
      // (group keys born on a dim can't prune the fact), still never
      // a whole-view rewrite
      val factForRe = {
        // group keys must be ATOMIC fact columns: lit(...) cannot
        // build complex-typed literals (an array/struct group key
        // would crash a refresh the plain scan path completes)
        val atomicFactKeys = d.groupCols.forall(c =>
          factSchema.fields.exists { f =>
            import org.apache.spark.sql.types._
            f.name == c && (f.dataType match {
              case _: StructType | _: ArrayType | _: MapType |
                   _: UserDefinedType[_] => false
              case _ => true
            })
          })
        val bounded =
          if (atomicFactKeys)
            Some(exhProbe).filter(_.length <= ExhaustedKeysCap)
          else None
        bounded match {
          case Some(rows) =>
            val pred = rows.map { r =>
              val st = r.getStruct(0)
              d.groupCols.zipWithIndex.map { case (c, i) =>
                val v = st.get(i)
                if (v == null) col(c).isNull else col(c) === lit(v)
              }.reduce(_ && _)
            }.reduce(_ || _)
            factRowsAt(Some(pred))
          case None => factRowsAt(None)
        }
      }
      val reRows = gk(factForRe, d.groupCols)
        .join(exhKeys, Seq("__gk"), "left_semi").drop("__gk")
      val reagg = aggOf(reRows, d)
      // a group whose rows ALL left the table VANISHES: its keys
      // ride the commit's delete leg (upsertDeleteOnce) — O(delta),
      // atomic with the upsert, no recompute
      val van = exhKeys.join(gk(reagg, d.groupCols).select(col("__gk")),
        Seq("__gk"), "left_anti")
        .select(d.groupCols.map(c => col("__gk").getField(c).as(c)): _*)
        .localCheckpoint(true)
      (untouchedMm, survivors.unionByName(reagg),
        if (van.head(1).nonEmpty) Some(van) else None)
    }
  }

  /** Gate and commit a merged view state — shared by the dim-delta
    * path and the CDC fact path (r17). Zeroed groups (and the min/max
    * path's re-derived-to-nothing groups, via `vanishedMm`) VANISH
    * through the keyed delete leg of the SAME snapshot commit as the
    * upsert ([[Lakehouse.upsertDeleteOnce]], batch-id idempotent);
    * the nullable-group replace path drops them by simply not writing
    * them. A NEGATIVE count means the subtractive ledger
    * over-retracted — impossible under the callers' soundness gates —
    * so it returns None and the caller recomputes exactly rather than
    * delete on a broken ledger. */
  private def commitMerged(lake: Lakehouse, d: ViewDef,
      viewSchema: org.apache.spark.sql.types.StructType,
      untouched: DataFrame, merged0: DataFrame,
      vanishedMm: Option[DataFrame], countAlias: String,
      batchId: Long, advanceOnEmpty: Boolean = false): Option[Long] = {
    val merged = merged0
      .localCheckpoint(true) // feeds the emptiness gate AND the commit
    // ONE aggregate over the checkpointed delta answers all three
    // gates (empty / any-zeroed / any-negative) — previously three
    // separate probe jobs (isEmpty + two head(1) scans; guide §1.2)
    val gateRow = merged.agg(
      count(lit(1)).as("__n"),
      count(when(col(countAlias) <= 0, 1)).as("__nonpos"),
      count(when(col(countAlias) < 0, 1)).as("__neg")).head()
    val (mergedEmpty, hasZeroed, hasNegative) =
      (gateRow.getLong(0) == 0L, gateRow.getLong(1) > 0L, gateRow.getLong(2) > 0L)
    if (mergedEmpty && vanishedMm.isEmpty)
      // a NET-EMPTY delta: the dim path leaves the snapshot untouched
      // (its watermark is the aux + negative-batch ledger), but the
      // fact-CDC path must still RECORD batchId=to — the fact
      // watermark IS the positive batch ledger, and skipping it would
      // make every later refresh re-read this interval's prefix
      return Some(
        if (!advanceOnEmpty) lake.currentSnapshot(d.view).get
        else lake.upsertOnce(
          merged.select(viewSchema.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*),
          d.view, d.groupCols, batchId = batchId, sourceKeyUnique = true))
    if (hasNegative) return None
    val keep = if (hasZeroed) merged.where(col(countAlias) > 0) else merged
    val vanZero =
      if (hasZeroed)
        Some(merged.where(col(countAlias) === 0).select(d.groupCols.map(col): _*))
      else None
    val vanKeys: Option[DataFrame] = (vanishedMm, vanZero) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b) => a.orElse(b)
    }
    def stable(df: DataFrame) = df.select(viewSchema.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    Some(
      // sourceKeyUnique: every commit source here is one row per
      // wrapped group key by construction (tgk ⟗ da on __gk, and the
      // survivor/re-derived legs partition the exhausted flag), so the
      // merge-cardinality guard's probe job is provably redundant
      if (nullFreeGroups(viewSchema, d)) vanKeys match {
        case None =>
          lake.upsertOnce(stable(keep), d.view, d.groupCols,
            batchId = batchId, sourceKeyUnique = true)
        case Some(vk) =>
          lake.upsertDeleteOnce(stable(keep), vk, d.view, d.groupCols,
            batchId = batchId, sourceKeyUnique = true)
      }
      else lake.replaceOnce(stable(untouched.unionByName(keep)),
        d.view, batchId = batchId))
  }

  /** Advance the view to the source's current snapshot. Incremental
    * when the interval is append-only (delta scan + merge of touched
    * groups); full recompute when the source history was rewritten.
    * Join views additionally compare the DIM watermark: an unmoved
    * dim keeps the delta path (delta ⋈ pinned dim merges soundly); a
    * moved dim applies the dim interval incrementally when
    * [[dimDelta]]'s soundness gates hold (subtractive merge of the
    * changed keys' contributions), else recomputes against the new
    * pin. Both-sides-moved refreshes sequence dim-then-fact, each leg
    * exactly-once. Returns the view snapshot now current (unchanged
    * when neither source moved). */
  def refresh(lake: Lakehouse, d: ViewDef): Long = {
    val from = watermark(lake, d)
    val to = lake.currentSnapshot(d.src).getOrElse(
      throw new IllegalArgumentException(s"no such source table: ${d.src}"))
    val dimAt = dimWatermark(lake, d.view, d.joins.length)
    val dimNow = d.joins.map { j =>
      lake.currentSnapshot(j.dim).getOrElse(
        throw new IllegalArgumentException(s"no such dim table: ${j.dim}"))
    }
    val dimMoved = d.joins.nonEmpty && !dimAt.contains(dimNow)
    if (from == to && !dimMoved)
      return lake.currentSnapshot(d.view).get
    if (dimMoved) {
      // SUBTRACTIVE dim maintenance, any hop, any inner/left mix (r13
      // closed the deep-hop recompute cliff, r14 the left-hop one):
      // each moved hop's interval applies in chain order —
      // already-applied hops pin at their NEW snapshots,
      // not-yet-applied ones at their old pins, so the composition
      // equals moving every dim at once. Per-hop exactly-once rides
      // the hop-partitioned negative batch-id namespace
      // ([[hopBatchId]]); a mid-sequence failure falls back to the
      // recompute, which is correct over any partial application.
      val delta: Option[Long] = dimAt match {
        case Some(at) =>
          var pins = at
          var last: Option[Long] = None
          var ok = true
          for (h <- d.joins.indices if ok && at(h) != dimNow(h)) {
            dimDelta(lake, d, from, Some(pins(h)), dimNow(h),
              pins.patch(h, Nil, 1), hop = h) match {
              case Some(s) => pins = pins.updated(h, dimNow(h)); last = Some(s)
              case None => ok = false
            }
          }
          if (ok) last else None
        case _ => None
      }
      delta match {
        case Some(snap) =>
          writeDimWatermark(lake, d.view, dimNow)
          lake.writeMviewRefreshNote(d.view, "incremental",
            "dim movement applied subtractively")
          if (from == to) return snap
          // fall through: the fact interval advances below against the
          // new dim pin, its own exactly-once leg
        case None =>
          // recompute against the new dim pins (covers the fact interval
          // too). The fact watermark may be UNMOVED (batchId `to`
          // already committed) — replaceOnce would no-op and strand the
          // view, so that case commits an unkeyed replace; its replay
          // after a crash rebuilds identical content (one spurious
          // snapshot, never a wrong view). The PENDING marker lands
          // first: a crash between the commit and the final aux write
          // must not leave a stale NUMERIC watermark that would feed a
          // later dimDelta an interval this recompute already folded in.
          markDimRecompute(lake, d.view, dimNow)
          // the LOUD decline: min/max dim churn now applies
          // incrementally via extremum survivorship (r16), so this
          // recompute fires only for structurally un-applicable
          // intervals — the note names the remaining causes
          lake.writeMviewRefreshNote(d.view, "recompute",
            "dim interval not incrementally applicable (no watermark, " +
              "rollback, or non-append dim history)")
          val rows = joined(lake, lake.readSnapshot(d.src, to), d.joins, dimNow)
          val snap =
            if (lake.committedBatches(d.view).contains(to))
              lake.createOrReplace(aggOf(rows, d), d.view)
            else lake.replaceOnce(aggOf(rows, d), d.view, batchId = to)
          writeDimWatermark(lake, d.view, dimNow)
          return snap
      }
    }
    def enrich(rows: DataFrame): DataFrame =
      if (d.joins.isEmpty) rows else joined(lake, rows, d.joins, dimNow)
    def recompute(): Long = {
      lake.writeMviewRefreshNote(d.view, "recompute",
        "source interval not incrementally applicable (rewrite or expired)")
      lake.replaceOnce(aggOf(enrich(lake.readSnapshot(d.src, to)), d),
        d.view, batchId = to)
    }
    val delta: Option[Either[DataFrame, DataFrame]] =
      try Some(Left(lake.readChanges(d.src, from, to)))
      catch {
        case _: IllegalArgumentException =>
          // the interval is not append-only. MoR TOMBSTONES still
          // decompose into row deltas (r17): the CDC changelog
          // restates the interval NET — appended rows as inserts, the
          // tombstone-matched rows' old images as deletes — so a fact
          // MoR delete/update applies SUBTRACTIVELY instead of
          // re-aggregating the fact. The whole mergeable family
          // applies: sum/count subtract, MIN/MAX merge via extremum
          // survivorship (a retraction that reaches a stored extremum
          // re-derives that group alone against snapshot `to` — the
          // exact state the view must equal). Needs a count(*)
          // witness; true rewrites (replace/CoW/compaction) and an
          // expired `from` still refuse into the recompute.
          if (d.aggs.forall(a =>
              a.isInstanceOf[SumCol] || a.isInstanceOf[CountAll] ||
              a.isInstanceOf[MinCol] || a.isInstanceOf[MaxCol]) &&
            d.aggs.exists(_.isInstanceOf[CountAll]))
            try Some(Right(lake.readChangesCdc(d.src, from, to)))
            catch { case _: IllegalArgumentException => None }
          else None
      }
    delta match {
      case None => recompute()
      case Some(Left(rows)) =>
        lake.writeMviewRefreshNote(d.view, "incremental",
          "append interval merged into touched groups")
        val da = deltaOf(enrich(rows), d)
        val t = lake.read(d.view)
        val viewSchema = t.schema
        // untouched groups carry as-is; touched ones merge through the
        // null-safe group key (a left-join view's unmatched bucket is
        // a NULL group — plain-column joins would strand it).
        // Pin merged agg types to the stored schema: decimal sums widen
        // one digit per addition, and an unpinned type would drift the
        // view schema on every refresh.
        val (untouched, merged) = mergeSplit(d, t, da)
        def stable(df: DataFrame) = df.select(viewSchema.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        if (nullFreeGroups(viewSchema, d))
          // no null group can exist: the keyed upsert applies, and a
          // future partition-scoped view carries untouched groups by
          // reference instead of rewriting them
          lake.upsertOnce(stable(merged), d.view, d.groupCols, batchId = to,
            sourceKeyUnique = true) // merged = one row per group key
        else lake.replaceOnce(stable(untouched.unionByName(merged)),
          d.view, batchId = to)
      case Some(Right(changes)) =>
        // SUBTRACTIVE fact maintenance (r17): net per-group delta =
        // insert-side partials minus delete-side partials (min/max
        // carry BOTH partials for the survivorship merge), merged into
        // the touched groups; a group whose rows all left VANISHES via
        // commitMerged's delete leg. Enrichment runs at the CURRENT
        // dim pins on BOTH legs — the dim-delta pass above already
        // aligned the stored view to them, so a deleted row's
        // subtracted contribution equals what the view holds for it.
        val countAlias = d.aggs.collectFirst { case CountAll(a) => a }.get
        val minmaxAggs = d.aggs.filter(a =>
          a.isInstanceOf[MinCol] || a.isInstanceOf[MaxCol])
        val ins = changes.where(col("_change_type") === "insert")
          .drop("_change_type")
        val del = changes.where(col("_change_type") === "delete")
          .drop("_change_type")
        val plus = deltaOf(enrich(ins), d)
        val minus = deltaOf(enrich(del), d).select(col("__gk") +:
          d.aggs.map(a => col("__d_" + a.alias).as("__m_" + a.alias)): _*)
        val da = plus.join(minus, Seq("__gk"), "full_outer")
          .select(col("__gk") +: d.aggs.flatMap {
            case a if a.isInstanceOf[SumCol] || a.isInstanceOf[CountAll] =>
              Seq((coalesce(col("__d_" + a.alias), lit(0)) -
                coalesce(col("__m_" + a.alias), lit(0))).as("__d_" + a.alias))
            case a =>
              Seq(col("__d_" + a.alias).as("__p_" + a.alias),
                col("__m_" + a.alias))
          }: _*)
        val t = lake.read(d.view)
        val (untouched, merged0, vanishedMm) =
          if (minmaxAggs.isEmpty) {
            val (u, m) = mergeSplit(d, t, da); (u, m, None)
          } else survivorMerge(lake, d, t, da, minmaxAggs,
            lake.readSnapshot(d.src, to).schema,
            pred => enrich(pred match {
              case Some(p) => lake.readWhere(p, d.src, atSnapshot = Some(to))
              case None => lake.readSnapshot(d.src, to)
            }))
        lake.writeMviewRefreshNote(d.view, "incremental",
          "MoR interval applied subtractively (CDC changelog)")
        commitMerged(lake, d, t.schema, untouched, merged0,
          vanishedMm, countAlias, batchId = to, advanceOnEmpty = true)
          .getOrElse(recompute())
    }
  }

  /** Can this view never hold a NULL group? Group columns declared
    * non-nullable in the stored schema can't produce one (the values
    * flow from those same columns), so the equality-keyed upsert is
    * safe and keeps its carry-by-reference economics; any nullable
    * group column routes to the explicit untouched ∪ merged replace —
    * SQL equality would strand null keys on both upsert legs. */
  private def nullFreeGroups(viewSchema: org.apache.spark.sql.types.StructType,
      d: ViewDef): Boolean =
    !viewSchema.exists(f => d.groupCols.contains(f.name) && f.nullable)
}

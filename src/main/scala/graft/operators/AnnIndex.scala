package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Lakehouse

/** PERSISTED, INCREMENTALLY-MAINTAINED ANN INDEX over a lakehouse
  * embeddings table — the index-lifecycle companion of the in-session
  * IVF family ([[Similarity.annIvfTrained]]): at 100 TB the coarse
  * quantizer trains once and the corpus is assigned once; every later
  * ingest must extend the index by assigning ONLY the new vectors to
  * the EXISTING centroids (FAISS's add-after-train contract), never
  * re-encoding the corpus.
  *
  * Three lakehouse tables per source `src`:
  *  - `<src>_ann_centroids` (cell, cv) — the trained coarse quantizer,
  *    a bounded √n-row offline artifact; APPEND-ONLY after create:
  *    existing rows never change (a drifted corpus retrains by
  *    re-running [[create]]), but [[rebalance]] may append CHILD
  *    centroids that split a hot cell in place.
  *  - `<src>_ann_vectors` (vec_id, v, nsq) — quantized vectors +
  *    squared norms, the scoring-side state.
  *  - `<src>_ann_assign` (vec_id, cell) — the 2-nearest-cell corpus
  *    assignment ([[Similarity.assignCells2]]'s SOAR shape), descended
  *    through the split tree where [[rebalance]] has split cells.
  *  - `<src>_ann_splits` (parent, child, gen) — the split ledger:
  *    which frozen parents descended into which children, and under
  *    which rebalance generation (the healing key).
  *
  * [[refresh]] reads the source rows appended since each index
  * table's own watermark ([[Lakehouse.readChanges]]), quantizes and
  * assigns just that delta map-side, and APPENDS — O(delta) compute,
  * O(delta) new files, untouched index dirs carry by reference.
  * EXACTLY-ONCE exactly like [[graft.sources.MaterializedView]]: each
  * index commit carries the source snapshot it advanced to as its
  * idempotency batch id, so the index tables' own commit metadata are
  * the watermarks and crash-replays no-op; a crash BETWEEN the two
  * table commits heals on the next refresh because each table derives
  * its delta from its own watermark. A rewritten source interval
  * (CoW delete/compaction) re-assigns from scratch — against the SAME
  * centroids, so results stay comparable.
  *
  * [[query]] never touches the source: probe the persisted centroids
  * (|Q|·√n driver-side-bounded work), equi-join probed cells against
  * the assignment table, score candidates from the vectors table,
  * bounded-heap top-k ([[Similarity.topkPerQuery]]).
  *
  * Operating assumption (same as [[graft.sources.MaterializedView]]):
  * one refresher per index at a time — the scheduled-job shape.
  * Replays and same-snapshot races no-op on the batch ledger;
  * refreshers racing toward different source snapshots are not
  * coordinated.
  */
object AnnIndex {

  def centroidsTable(src: String): String = s"${src}_ann_centroids"
  def vectorsTable(src: String): String = s"${src}_ann_vectors"
  def assignTable(src: String): String = s"${src}_ann_assign"
  def splitsTable(src: String): String = s"${src}_ann_splits"

  /** Quantized (vec_id, v, nsq, <metadata…>) of any (vec_id,
    * embedding, …) relation — the shared fixed-point family, with
    * every NON-embedding column carried through into the vectors
    * table so index queries can filter on source metadata without
    * ever joining back to the source. */
  private def quantize(df: DataFrame): DataFrame = {
    val meta = df.columns.filterNot(c => c == "vec_id" || c == "embedding").map(col)
    df.select(col("vec_id") +: VectorFunctions.quantize(col("embedding")).as("v") +: meta: _*)
      .withColumn("nsq", VectorFunctions.normSqQ(col("v")))
  }

  /** Build (or rebuild) the index at the source's current snapshot:
    * train the coarse quantizer, assign and store the full corpus.
    * Idempotent per source snapshot (batch-id-keyed replaces). */
  def create(lake: Lakehouse, src: String, nCells: Int = 0): Seq[(Long, Array[Long])] = {
    val s0 = lake.currentSnapshot(src).getOrElse(
      throw new IllegalArgumentException(s"no such source table: $src"))
    val e = quantize(lake.read(src))
    val cents = Similarity.trainCodebook(e, nCells)
    lake.replaceOnce(
      e.sparkSession.createDataFrame(cents.map { case (i, cv) => (i, cv.toSeq) })
        .toDF("cell", "cv"),
      centroidsTable(src), batchId = s0)
    lake.replaceOnce(e, vectorsTable(src), batchId = s0)
    lake.replaceOnce(Similarity.assignCells2(e, cents), assignTable(src), batchId = s0)
    // a REBUILD resets the split tree: the fresh codebook's cells are
    // all leaves again (old splits referenced retrained-away parents)
    if (lake.currentSnapshot(splitsTable(src)).isDefined)
      lake.replaceOnce(
        e.sparkSession.createDataFrame(Seq.empty[(Long, Long, Long)])
          .toDF("parent", "child", "gen"),
        splitsTable(src), batchId = s0)
    cents
  }

  /** The trained coarse quantizer, loaded driver-side — a bounded
    * offline artifact (≤ √n rows), the same class as every codebook
    * fetch in the ANN family. */
  def centroids(lake: Lakehouse, src: String): Seq[(Long, Array[Long])] =
    lake.read(centroidsTable(src)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)

  /** cell → centroid vector, driver-side (bounded: ≤ √n + splits). */
  private[graft] def centroidMap(lake: Lakehouse, src: String): Map[Long, Array[Long]] =
    centroids(lake, src).toMap

  /** The split ledger: (parent, child, gen) rows, empty if the index
    * was never rebalanced. Bounded like the codebook itself. */
  private[graft] def splits(lake: Lakehouse, src: String): Seq[(Long, Long, Long)] =
    if (lake.currentSnapshot(splitsTable(src)).isEmpty) Nil
    else lake.read(splitsTable(src)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  /** Deterministic child cell ids: injective in (parent, idx) so a
    * crash-replayed split re-derives the SAME ids (never read-modify-
    * write a max over the centroids table — a torn earlier attempt
    * would shift every id). Root cells are < 1e6 (≤ ⌈√n⌉ k-means
    * cells); children land above 1e6 and nest for multi-level splits. */
  private def childId(parent: Long, idx: Int): Long =
    1000000L + parent * 1024L + idx

  /** One level of tree descent: rows whose `cell` is a split parent
    * move to the nearest child (quantized L2, ties to the smaller
    * child id — [[Similarity.assignCells]]' exact tie rule); all other
    * rows pass through. Pure map-side `when`-chain over the bounded
    * split set — no shuffle, no Window, same class as root assignment. */
  private def descendOnce(rows: DataFrame,
      kids: Map[Long, Seq[(Long, Array[Long])]]): DataFrame = {
    import org.apache.spark.sql.Column
    val newCell = kids.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (p, ch)) =>
        val structs = ch.map { case (id, cv) =>
          val cn = cv.map(x => x * x).sum
          struct(
            (col("nsq") + lit(cn) - lit(2L) * graft.functions.VectorFunctions
              .dotQ(col("v"), typedlit(cv.toSeq))).as("d2"),
            lit(id).as("cent_id"))
        }
        val branch = least(structs: _*).getField("cent_id")
        Some(acc match {
          case None => when(col("cell") === p, branch)
          case Some(w) => w.when(col("cell") === p, branch)
        })
    }.map(_.otherwise(col("cell"))).getOrElse(col("cell"))
    rows.withColumn("cell", newCell)
  }

  /** Longest parent→child chain in the split tree (driver-side). */
  private def chainDepth(kids: Map[Long, Seq[(Long, Array[Long])]]): Int = {
    val memo = scala.collection.mutable.Map[Long, Int]()
    def d(cell: Long): Int = memo.getOrElseUpdate(cell,
      kids.get(cell).map(ch => 1 + ch.map(c => d(c._1)).max).getOrElse(0))
    if (kids.isEmpty) 0 else kids.keys.map(d).max
  }

  private def kidsOf(lake: Lakehouse, src: String): Map[Long, Seq[(Long, Array[Long])]] = {
    val cv = centroidMap(lake, src)
    splits(lake, src).groupBy(_._1).map { case (p, rs) =>
      p -> rs.map(r => (r._2, cv(r._2))).sortBy(_._1)
    }
  }

  /** Assign (vec_id, v, nsq) rows through the SPLIT TREE: 2-nearest
    * over the frozen ROOT centroids (create-time codebook), then each
    * row descends split parents to its nearest child until it sits at
    * a leaf. The tree path — not a flat 2-nearest over all leaves — is
    * what keeps the incremental contract exact: a delta assigned after
    * a split lands exactly where a from-scratch replay of
    * (root-assign → descend) puts it, so the oracle can restate the
    * whole index from two bounded literal tables. */
  private[graft] def assignTree(lake: Lakehouse, src: String,
      vectors: DataFrame): DataFrame = {
    val kids = kidsOf(lake, src)
    val childIds = kids.valuesIterator.flatten.map(_._1).toSet
    val roots = centroids(lake, src).filterNot(c => childIds.contains(c._1))
    val full = Similarity.assignCells2Full(vectors, roots)
    (1 to chainDepth(kids)).foldLeft(full)((df, _) => descendOnce(df, kids))
      .select("vec_id", "cell")
  }

  private def watermarkOf(lake: Lakehouse, table: String): Long = {
    val b = lake.committedBatches(table)
    require(b.nonEmpty, s"$table carries no index watermark; AnnIndex.create first")
    b.max
  }

  /** Advance both index tables to the source's current snapshot.
    * Append-only source movement costs O(delta); a rewritten interval
    * re-assigns the corpus against the EXISTING centroids. */
  def refresh(lake: Lakehouse, src: String): Unit = {
    val cur = lake.currentSnapshot(src).getOrElse(
      throw new IllegalArgumentException(s"no such source table: $src"))
    def advance(table: String)(rowsOf: DataFrame => DataFrame): Unit = {
      val wm = watermarkOf(lake, table)
      if (wm != cur) {
        val delta =
          try Some(lake.readChanges(src, wm, cur))
          catch { case _: IllegalArgumentException => None }
        delta match {
          case Some(rows) => lake.appendOnce(rowsOf(quantize(rows)), table, batchId = cur)
          case None => lake.replaceOnce(rowsOf(quantize(lake.read(src))), table, batchId = cur)
        }
      }
    }
    advance(vectorsTable(src))(identity)
    // deltas assign through the split tree (root 2-nearest + descent),
    // so however many increments and rebalances built the index, its
    // end state equals one from-scratch (assign → descend) replay
    advance(assignTable(src))(assignTree(lake, src, _))
  }

  /** REBALANCE: split HOT cells against their frozen parents. An IVF
    * cell that accretes far more vectors than its peers (skewed
    * corpus growth after [[create]]) degrades every probe that hits
    * it — probe cost is cell population. Retraining the codebook
    * would re-encode the corpus (the O(n) non-starter at 100 TB);
    * instead the FAISS/ScaNN-style split: train a SMALL k-means over
    * the hot cell's own vectors, append the children as new centroid
    * rows (parents stay in the table, frozen — ids never change, un-
    * split cells never move), re-assign ONLY the hot cells' rows to
    * their nearest child, delete the parent rows. O(hot) compute,
    * untouched index dirs carry by reference.
    *
    * Cells whose load exceeds `maxLoad` × the mean leaf load split
    * into ⌈load/mean⌉ (2..`maxChildren`) children; `forceTop` > 0
    * additionally splits the N most-loaded leaves unconditionally
    * (the deterministic-lifecycle knob). Returns (parent → children)
    * for the cells split this call; Nil when the index is balanced.
    *
    * CRASH-SAFE in the mview/torn-refresh style: all four commits
    * (children centroids, split ledger, descended assignments, parent
    * row delete) are idempotent — the appends by a generation batch id
    * derived from the pre-rebalance assignment snapshot, child ids by
    * the deterministic [[childId]] scheme, the delete naturally. A
    * crash between commits heals on the next call ([[heal]]): split
    * parents still carrying assignment rows get their descent
    * replayed under the ledger's own generation id (no-op if the
    * append landed) and the delete re-runs. A parent+child overlap
    * window is QUERY-SAFE meanwhile: candidates dedup on
    * (q_id, vec_id), so double-listed vectors only cost a little
    * extra scoring, never wrong results. */
  def rebalance(lake: Lakehouse, src: String, maxLoad: Double = 2.0,
      forceTop: Int = 0, maxChildren: Int = 16): Seq[(Long, Seq[Long])] = {
    heal(lake, src)
    val assignT = assignTable(src)
    // generation id: the assignment snapshot this decision was computed
    // against, negated into its own namespace (source snapshots occupy
    // the positive batch-id space on these tables)
    val gen = -(lake.currentSnapshot(assignT).getOrElse(
      throw new IllegalArgumentException(
        s"no index over $src; AnnIndex.create first")) + 1L)
    val sp = splits(lake, src)
    val parents = sp.map(_._1).toSet
    val leaves = centroidMap(lake, src).keySet -- parents
    // per-cell load: bounded aggregate (≤ #cells rows reach the driver)
    val counts = lake.read(assignT).groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mean = counts.values.sum.toDouble / math.max(1, leaves.size)
    val hotNatural = leaves.filter(c => counts.getOrElse(c, 0L) > maxLoad * mean)
    val forced = leaves.toSeq.sortBy(c => (-counts.getOrElse(c, 0L), c)).take(forceTop)
    val hot = (hotNatural ++ forced).toSeq.distinct
      .filter(c => counts.getOrElse(c, 0L) >= 4L).sorted
    if (hot.isEmpty) return Nil
    val vecs = lake.read(vectorsTable(src)).select("vec_id", "v", "nsq")
    val assign = lake.read(assignT)
    val trained: Seq[(Long, Seq[(Long, Array[Long])])] = hot.map { p =>
      val subset = assign.where(col("cell") === p).select("vec_id").join(vecs, "vec_id")
      val kCh = math.min(maxChildren,
        math.max(2, math.ceil(counts(p) / math.max(mean, 1.0)).toInt))
      val kids = Similarity.trainCodebook(subset, kCh).zipWithIndex.map {
        case ((_, cv), i) => (childId(p, i), cv)
      }
      (p, kids)
    }
    val spark = vecs.sparkSession
    lake.appendOnce(
      spark.createDataFrame(trained.flatMap(_._2).map { case (id, cv) => (id, cv.toSeq) })
        .toDF("cell", "cv"),
      centroidsTable(src), batchId = gen)
    lake.appendOnce(
      spark.createDataFrame(trained.flatMap { case (p, kids) =>
        kids.map { case (id, _) => (p, id, gen) } }).toDF("parent", "child", "gen"),
      splitsTable(src), batchId = gen)
    rewriteParents(lake, src, trained.toMap, gen)
    trained.map { case (p, kids) => (p, kids.map(_._1)) }
  }

  /** Descend the assignment rows of the given split parents to their
    * nearest child (append, idempotent per gen), then drop the parent
    * rows (CoW delete, idempotent by content). */
  private def rewriteParents(lake: Lakehouse, src: String,
      kids: Map[Long, Seq[(Long, Array[Long])]], gen: Long): Unit = {
    if (kids.isEmpty) return
    val parents = kids.keys.toSeq.sorted
    val rows = lake.read(assignTable(src))
      .where(col("cell").isin(parents: _*))
      .join(lake.read(vectorsTable(src)).select("vec_id", "v", "nsq"), "vec_id")
    lake.appendOnce(descendOnce(rows, kids).select("vec_id", "cell"),
      assignTable(src), batchId = gen)
    lake.deleteWhere(col("cell").isin(parents: _*), assignTable(src))
  }

  /** Finish any torn rebalance generation: a split parent that still
    * carries assignment rows means the descent append and/or the
    * parent delete didn't land — replay both under the generation id
    * the split ledger recorded (the append no-ops if it committed). */
  private def heal(lake: Lakehouse, src: String): Unit = {
    val sp = splits(lake, src)
    if (sp.isEmpty) return
    val parents = sp.map(_._1).distinct
    val present = lake.read(assignTable(src))
      .where(col("cell").isin(parents: _*))
      .select("cell").distinct().collect().map(_.getLong(0)).toSet
    if (present.isEmpty) return
    val cv = centroidMap(lake, src)
    sp.filter(s => present.contains(s._1)).groupBy(_._3).toSeq.sortBy(_._1)
      .foreach { case (gen, rowsOfGen) =>
        val kids = rowsOfGen.groupBy(_._1).map { case (p, rs) =>
          p -> rs.map(r => (r._2, cv(r._2))).sortBy(_._1)
        }
        rewriteParents(lake, src, kids, gen)
      }
  }

  /** Top-k quantized-cosine neighbors for each (vec_id, embedding)
    * query row, served ENTIRELY from the persisted index tables.
    *
    * `filter` restricts candidates by the METADATA columns the
    * vectors table carried from the source (e.g. `col("label") === 3`)
    * — applied BEFORE scoring, so k fills from the matching pool, and
    * pushed at the vectors-table scan (stat-pruned like any lakehouse
    * read). The usual IVF caveat applies: candidates still come from
    * the probed cells, so a highly selective filter wants more
    * `probes` (recall-vs-cost, same dial as unfiltered). */
  def query(lake: Lakehouse, src: String, queries: DataFrame,
      k: Int = 10, probes: Int = 0,
      filter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // probe LEAF cells only — split parents are frozen history with no
    // assignment rows; probing them would spend probe budget on cells
    // that can no longer yield candidates. |Q| × leaves work, cheap.
    val parents = splits(lake, src).map(_._1).toSet
    val cents = centroids(lake, src).filterNot(c => parents.contains(c._1))
    val nProbes = if (probes > 0) probes else Similarity.trainedProbes(cents.length)
    val q = quantize(queries)
    val probed = Similarity.probeCells(
        q.select("vec_id", "v", "nsq"),
        Similarity.centsDf(queries.sparkSession, cents), nProbes)
      .withColumnRenamed("vec_id", "q_id")
    val cand = probed.join(lake.read(assignTable(src)), "cell")
      .select("q_id", "vec_id").dropDuplicates("q_id", "vec_id")
    val vecs0 = lake.read(vectorsTable(src))
    val vecs = filter.map(vecs0.where).getOrElse(vecs0)
    val scored = cand
      .join(broadcast(q.select(col("vec_id").as("q_id"),
        col("v").as("qv"), col("nsq").as("qnsq"))), "q_id")
      .join(vecs.select("vec_id", "v", "nsq"), "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(Similarity.cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6)
          .as("cosine"))
    Similarity.topkPerQuery(scored, k)
  }
}

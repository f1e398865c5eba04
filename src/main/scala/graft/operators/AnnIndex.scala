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
  *    a bounded √n-row offline artifact; IMMUTABLE after create (a
  *    drifted corpus retrains by re-running [[create]]).
  *  - `<src>_ann_vectors` (vec_id, v, nsq) — quantized vectors +
  *    squared norms, the scoring-side state.
  *  - `<src>_ann_assign` (vec_id, cell) — the 2-nearest-cell corpus
  *    assignment ([[Similarity.assignCells2]]'s SOAR shape).
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
    cents
  }

  /** The trained coarse quantizer, loaded driver-side — a bounded
    * offline artifact (≤ √n rows), the same class as every codebook
    * fetch in the ANN family. */
  def centroids(lake: Lakehouse, src: String): Seq[(Long, Array[Long])] =
    lake.read(centroidsTable(src)).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)

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
    val cents = centroids(lake, src)
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
    advance(assignTable(src))(Similarity.assignCells2(_, cents))
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
    val cents = centroids(lake, src)
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

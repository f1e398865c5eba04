package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashImpl, VectorFunctions}
import graft.sources.{Memo, SessionIds, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * - [[annCosineTopk]]: brute-force baseline — broadcast the (small)
  *   query set against the corpus; per-partition scoring + global
  *   top-k. The corpus is never shuffled: the only movement is the
  *   broadcast and the final TakeOrdered.
  * - [[annLshTopk]]: the 100 TB path — random-hyperplane LSH with L
  *   hash tables of P planes. Candidates come from an equi-join on
  *   (table, bucket), so scored pairs shrink from |Q|·n to
  *   |Q|·n/2^P per table.
  *
  * Hyperplane signs are md5-derived (same [[HashImpl]] bytes the
  * DuckDB oracle recomputes via `md5_number_lower`), pre-materialized
  * driver-side into a literal sign matrix: per-row work is then pure
  * integer HOF arithmetic inside whole-stage codegen.
  */
object Similarity {

  val LshTables = 4
  val LshPlanes = 6
  val Dims = 64

  /** ±1 hyperplane sign matrix, flat [table][plane][dim], derived from
    * h62("t_p_d") parity — identical to the oracle's
    * `(md5_number_lower(t||'_'||p||'_'||d) // 4 & 1) * 2 - 1`. */
  lazy val signMatrix: Seq[Long] =
    for {
      t <- 0 until LshTables
      p <- 0 until LshPlanes
      d <- 0 until Dims
    } yield (((HashImpl.md5Lower64(s"${t}_${p}_$d".getBytes("UTF-8")) >>> 2) & 1L) * 2L - 1L)

  /** One ±1 hyperplane as a literal long array (for native dotQ). */
  private def plane(t: Int, p: Int): Column =
    typedlit(signMatrix.slice((t * LshPlanes + p) * Dims, (t * LshPlanes + p + 1) * Dims))

  /** LSH bucket ids (one per table) for a quantized vector `v`:
    * 24 native [[VectorFunctions.dotQ]] calls against literal plane
    * vectors, combined with straight-line when/sum columns — no
    * interpreted HOF lambdas in the per-row hot path (the nested
    * `aggregate` formulation was CodegenFallback, the exact pitfall
    * [[graft.functions.ArrayDotLong]] exists to avoid). */
  private[graft] def buckets(v: Column): Column =
    array((0 until LshTables).map { t =>
      (0 until LshPlanes).map { p =>
        when(VectorFunctions.dotQ(v, plane(t, p)) >= 0L, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** Quantized vectors + squared norms, persisted ONCE per (session,
    * dir) via [[Memo]]: referenced up to 4× per ANN query (bucketing,
    * query side, both scoring joins) and shared with
    * [[Dedup.dedupEmbedding]]; an un-cached plan would recompute
    * quantization per reference. */
  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    Memo.persisted(spark, s"similarity.quantized|$dir") {
      Tables.parallel(spark, Tables.embeddings(spark, dir))
        .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("v"))
        .withColumn("nsq", VectorFunctions.normSqQ(col("v")))
    }

  /** Pairwise quantized cosine with precomputed squared norms. */
  private[graft] def cosinePre(qv: Column, qn: Column, v: Column, n: Column): Column =
    VectorFunctions.dotQ(qv, v).cast("double") / sqrt((qn * n).cast("double"))

  /** Scale-safe top-k tail shared by every ANN variant: ONE groupBy on
    * q_id with the native bounded-heap aggregate
    * [[graft.functions.TopKByScore]].
    *
    * The naive tails both fail at 100 TB: `row_number() OVER
    * (PARTITION BY q_id)` ships every scored row to one reducer per
    * query (the classic hot-partition killer), and `collect_list` does
    * not reduce at the partial stage, so its shuffle still carries the
    * whole corpus's scores. The TypedImperativeAggregate's PARTIAL
    * state is the k-bounded heap itself — map-side combine caps memory
    * and shuffle at k rows per query per input partition — and unlike
    * round 2's typed `mapPartitions` heap it reads scored rows straight
    * from unsafe format (no Dataset-encoder boundary at the hottest
    * point of the brute-force path).
    *
    * Ordering matches the oracles exactly: cosine DESC, vec_id ASC,
    * total and deterministic because (q_id, vec_id) pairs are unique. */
  private[graft] def topkPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("q_id")
      .agg(graft.functions.TopKAgg.topK(
        col("cosine").cast("double"), col("vec_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(
        col("q_id"), col("col.vec_id").as("vec_id"),
        (col("pos") + 1).as("rnk"), col("col.cosine").as("cosine"))
      .orderBy("q_id", "rnk")

  /** `ann_cosine_topk` — exact top-10 by quantized cosine for each
    * query vector (vec_id < 5), brute force with a broadcast query
    * side. */
  def annCosineTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq"))
    val scored = e.crossJoin(broadcast(q))
      .select(
        col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  val IvfCells = 8
  val IvfProbes = 2

  /** CORPUS-side cell assignment: nearest coarse centroid by exact
    * integer quantized L2 (‖v‖² + ‖c‖² − 2·v·c), computed as a pure
    * MAP-SIDE ARGMIN projection — `least` over one (d2, cent_id)
    * struct per centroid, each d2 a native [[VectorFunctions.dotQ]]
    * against a literal centroid array. Zero shuffle, zero Window: the
    * round-3 formulation (crossJoin + `row_number` over a per-vector
    * Window) shuffled n × nCells rows just to rank them — invisible at
    * 8 cells locally, the plan's only unforced shuffle at √n cells ×
    * 100 TB. Struct comparison orders by (d2, cent_id), so ties break
    * to the smaller centroid id — identical to the window ranking the
    * oracle restates. */
  private[graft] def assignCells(vectors: DataFrame,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    val structs = cents.map { case (id, cv) =>
      val cn = cv.map(x => x * x).sum
      struct(
        (col("nsq") + lit(cn) - lit(2L) * VectorFunctions.dotQ(col("v"), typedlit(cv.toSeq)))
          .as("d2"),
        lit(id).as("cent_id"))
    }
    vectors.select(col("vec_id"), least(structs: _*).getField("cent_id").as("cell"))
  }

  /** Two-nearest-cell corpus assignment (IVF multi-assignment / SOAR
    * shape): each corpus vector is indexed under its nearest AND
    * second-nearest centroid, which rescues the boundary vectors a
    * single Voronoi cell cuts off from their neighbors — the standard
    * recall lever when the corpus has weak cluster structure. Still a
    * pure map-side projection: a second `least` pass with the winner's
    * cent_id masked to MaxValue, then a 2-row explode. No shuffle, no
    * Window; index size doubles (the explicit space-for-recall trade). */
  private[graft] def assignCells2(vectors: DataFrame,
      cents: Seq[(Long, Array[Long])]): DataFrame =
    assignCells2Full(vectors, cents).select("vec_id", "cell")

  /** [[assignCells2]] keeping `v`/`nsq` on every exploded assignment
    * row — the shape tree-descent re-assignment ([[AnnIndex]]) needs:
    * after a hot cell splits, each row assigned to a split parent
    * descends to its nearest CHILD, which requires the vector payload
    * alongside the cell id. Still a pure map-side projection. */
  private[graft] def assignCells2Full(vectors: DataFrame,
      cents: Seq[(Long, Array[Long])]): DataFrame = {
    def structsOf(mask: Option[Column]) = cents.map { case (id, cv) =>
      val cn = cv.map(x => x * x).sum
      val d2 = col("nsq") + lit(cn) - lit(2L) * VectorFunctions.dotQ(col("v"), typedlit(cv.toSeq))
      val d2m = mask match {
        case Some(m) => when(m === id, lit(Long.MaxValue)).otherwise(d2)
        case None => d2
      }
      struct(d2m.as("d2"), lit(id).as("cent_id"))
    }
    vectors
      .select(col("vec_id"), col("v"), col("nsq"),
        least(structsOf(None): _*).getField("cent_id").as("c1"))
      .select(col("vec_id"), col("v"), col("nsq"), col("c1"),
        least(structsOf(Some(col("c1"))): _*).getField("cent_id").as("c2"))
      .select(col("vec_id"), col("v"), col("nsq"),
        explode(array(col("c1"), col("c2"))).as("cell"))
  }

  /** QUERY-side multi-probe ranking: the `probes` nearest cells per
    * query vector. Input is the handful of query vectors, so the
    * crossJoin × Window here is over |Q| × nCells rows — the Window
    * stays banned from the corpus-side assignment ([[assignCells]]). */
  private[graft] def probeCells(vectors: DataFrame, cents: DataFrame, probes: Int): DataFrame = {
    val d2 = (col("nsq") + col("cn") - lit(2L) * VectorFunctions.dotQ(col("v"), col("cv")))
    vectors.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nsq"), col("cent_id"), d2.as("d2"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cent_id"))))
      .where(col("crk") <= probes)
      .select(col("vec_id"), col("cent_id").as("cell"))
  }

  /** Centroid DataFrame (broadcastable) from a driver-side codebook. */
  private[graft] def centsDf(spark: SparkSession, cents: Seq[(Long, Array[Long])]): DataFrame =
    broadcast(spark.createDataFrame(cents.map { case (i, cv) => (i, cv.toSeq) })
      .toDF("cent_id", "cv")
      .withColumn("cn", VectorFunctions.dotQ(col("cv"), col("cv"))))

  /** Deterministic stand-in codebook: the first [[IvfCells]] quantized
    * vectors, fetched driver-side once per (session, dir) — a codebook
    * is an offline artifact like the trained one, so the one-time
    * driver fetch is the same class as k-means centroid extraction. */
  private val stubCodebooks =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[(Long, Array[Long])]]()

  private[graft] def stubCodebook(spark: SparkSession, dir: String): Seq[(Long, Array[Long])] =
    stubCodebooks.computeIfAbsent((SessionIds.idOf(spark), dir), _ =>
      quantized(spark, dir).where(col("vec_id") < IvfCells)
        .select(col("vec_id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1).toSeq)

  /** `ann_ivf_topk` — inverted-file ANN: corpus vectors live in their
    * nearest-centroid cell (map-side argmin, no shuffle); a query
    * scores only the vectors of its [[IvfProbes]] nearest cells.
    * Candidate generation is an equi-join on cell id — the coarse
    * quantizer bounds scored pairs by cell population, the IVF
    * property that matters at 100 TB. */
  def annIvfTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val cb = stubCodebook(spark, dir)
    val assign = assignCells(e, cb)
    val probes = probeCells(e.where(col("vec_id") < 5), centsDf(spark, cb), IvfProbes)
      .withColumnRenamed("vec_id", "q_id")
    val cand = probes.join(assign, "cell")
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
    val scored = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(
        col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** Banded (vec_id, table, bucket) LSH index over the quantized
    * corpus, memoized per (session, dir): ONE bucket table shared by
    * both LSH ANN variants and embedding dedup — at scale this is the
    * materialized index table every consumer reads. */
  private[graft] def bandedTable(spark: SparkSession, dir: String): DataFrame =
    Memo.persisted(spark, s"similarity.banded|$dir") {
      quantized(spark, dir)
        .select(col("vec_id"), posexplode(buckets(col("v"))))
        .withColumnRenamed("pos", "t")
        .withColumnRenamed("col", "bucket")
    }

  /** `ann_lsh_multiprobe` — multi-probe LSH: each query probes its own
    * bucket PLUS every 1-bit-flip neighbor per table (the vectors most
    * likely separated by a single near-orthogonal hyperplane), lifting
    * recall for free query-side — corpus state and shuffle shape are
    * unchanged, only the tiny probe set grows ×(P+1). */
  /** Candidate set of the multi-probe LSH variant (factored out so the
    * recall spec can compare candidate BUDGETS across ANN variants). */
  private[graft] def multiprobeCandidates(spark: SparkSession, dir: String): DataFrame = {
    val banded = bandedTable(spark, dir)
    val qProbes = banded.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("t"),
        explode(array(col("bucket") +: (0 until LshPlanes).map(p =>
          col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    qProbes.join(banded, Seq("t", "bucket"))
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
  }

  def annLshMultiprobe(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val cand = multiprobeCandidates(spark, dir)
    val scored = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(
        col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** `ann_ivf_trained` — IVF over a TRAINED coarse codebook: k-means
    * (fixed seed, MLlib) replaces the deterministic stand-in
    * centroids; assignment/probing/scoring reuse the exact cell plan
    * of [[annIvfTopk]]. Spec-only (k-means iterations aren't
    * SQL-restatable): the driver records a rows-only check and the
    * spec measures recall vs brute force. */
  /** Rounded centroids of the most recent [[annIvfTrained]] run —
    * captured so the DuckDB oracle can restate the exact trained
    * codebook as a literal VALUES table (training itself isn't
    * SQL-restatable, but assignment/probing/scoring over the trained
    * centroids is; Verify dumps `oracleSql` AFTER running the queries,
    * so the captured centroids are the run's own). */
  /** Holds ONLY the most recent run's artifacts (inherently bounded —
    * no per-dir map to evict): Verify/Bench run all queries against
    * ONE dir and dump oracles afterwards, so "the latest run" is
    * exactly whose centroids the oracle must restate — a multi-scale
    * JVM (e.g. the bench crossing sf dirs) must not leak another
    * dir's codebook into the dump. */
  @volatile private var lastTrained: Option[(Seq[(Long, Seq[Long])], Int)] = None

  /** DuckDB restatement of the last trained-IVF run: the captured
    * centroids as literal VALUES feeding the same assignment/probe/
    * score/topk pipeline as the `ann_ivf_topk` oracle. None until
    * [[annIvfTrained]] has run in this process. */
  def trainedOracleSql: Option[String] = ivfOracleFor(lastTrained)

  /** The IVF replay oracle for ANY (centroid literals, probe count)
    * artifact pair: 2-nearest assignment of every embedding, probed
    * candidate join, exact cosine, top-10 — shared by the in-session
    * trained variant and the persisted incremental index (whose END
    * STATE must be exactly this assignment, however many increments
    * built it). */
  private def ivfOracleFor(
      artifact: Option[(Seq[(Long, Seq[Long])], Int)]): Option[String] = {
    artifact.map { case (cents, probes) =>
      val values = cents.map { case (id, cv) =>
        s"($id, [${cv.mkString(",")}])"
      }.mkString(", ")
      s"""WITH q AS (SELECT vec_id,
           |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
           |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
           |cents AS (SELECT cent_id, cv, list_sum(list_transform(cv, x -> x*x)) cn
           |  FROM (VALUES $values) c(cent_id, cv)),
           |da AS (SELECT e.vec_id, c.cent_id,
           |  CAST(e.nsq + c.cn - 2 * list_sum(list_transform(list_zip(e.v, c.cv), z -> z[1]*z[2])) AS BIGINT) d2
           |  FROM qn e CROSS JOIN cents c),
           |ranked AS (SELECT vec_id, cent_id,
           |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) crk FROM da),
           |assign AS (SELECT vec_id, cent_id cell FROM ranked WHERE crk <= 2),
           |probes AS (SELECT vec_id q_id, cent_id cell FROM ranked WHERE crk <= $probes AND vec_id < 5),
           |cand AS (SELECT DISTINCT q_id, assign.vec_id FROM probes JOIN assign ON probes.cell = assign.cell),
           |s AS (SELECT q_id, cand.vec_id,
           |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
           |    / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
           |  FROM cand JOIN qn qv ON cand.q_id = qv.vec_id JOIN qn ev ON cand.vec_id = ev.vec_id),
           |r AS (SELECT q_id, vec_id, cosine,
           |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
           |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
           |ORDER BY q_id, rnk""".stripMargin
    }
  }

  /** Trained k-means codebooks per (session, dir): a coarse quantizer
    * is an OFFLINE artifact — trained once, reused by every query
    * against the corpus (retraining per query would be as wrong at
    * scale as re-bucketing the corpus per query). Deterministic:
    * fixed seed, fixed iteration count. */
  private val codebooks =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Int), Seq[(Long, Array[Long])]]()

  /** Query-side probe count for a k-cell codebook: grows with the
    * codebook (nprobe ≈ k/8) so recall holds as cells shrink — the
    * fixed [[IvfProbes]] that suits 8 coarse cells would starve a
    * √n-cell codebook. */
  private[graft] def trainedProbes(nCells: Int): Int =
    math.max(IvfProbes, math.ceil(nCells / 6.0).toInt)

  /** HONEST trained codebook size: k = max(8, ⌈√n⌉) cells over the
    * corpus — the classical IVF sizing (cell population ≈ √n, probe
    * cost ≈ probes·√n). `nCells = 0` (the default) selects it. */
  /** Train a k-means codebook over any quantized relation (vec_id, v,
    * nsq) — the shared offline-artifact trainer (deterministic: fixed
    * seed, fixed iteration count). `nCells = 0` selects the classical
    * IVF sizing k = max(8, ⌈√n⌉). */
  private[graft] def trainCodebook(e: DataFrame, nCells: Int = 0): Seq[(Long, Array[Long])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val kCells =
      if (nCells > 0) nCells
      else math.max(IvfCells, math.ceil(math.sqrt(e.count().toDouble)).toInt)
    val feat = e.select(col("vec_id"),
      array_to_vector(col("v").cast("array<double>")).as("features"))
    val model = new KMeans().setK(kCells).setSeed(42L).setMaxIter(20).fit(feat)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.map(x => math.round(x)))
    }.toSeq
  }

  /** Train (or fetch the memoized) k-means codebook for `dir`. */
  private[graft] def trainedCodebook(spark: SparkSession, dir: String,
      nCells: Int = 0): Seq[(Long, Array[Long])] =
    codebooks.computeIfAbsent((SessionIds.idOf(spark), dir, nCells), _ =>
      trainCodebook(quantized(spark, dir), nCells))

  /** Candidate set of the trained-IVF variant: probe the query's
    * nearest cells, equi-join against the map-side cell assignment. */
  private[graft] def trainedCandidates(spark: SparkSession, dir: String): DataFrame = {
    val cents = trainedCodebook(spark, dir)
    trainedCandidatesFor(quantized(spark, dir), cents, trainedProbes(cents.length), spark)
  }

  private def trainedCandidatesFor(e: DataFrame, cents: Seq[(Long, Array[Long])],
      nProbes: Int, spark: SparkSession): DataFrame = {
    val assign = assignCells2(e, cents)
    val probes = probeCells(e.where(col("vec_id") < 5), centsDf(spark, cents), nProbes)
      .withColumnRenamed("vec_id", "q_id")
    probes.join(assign, "cell")
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
  }

  def annIvfTrained(spark: SparkSession, dir: String, k: Int = 10,
      nCells: Int = 0): DataFrame = {
    val e = quantized(spark, dir)
    val cents = trainedCodebook(spark, dir, nCells)
    val nProbes = trainedProbes(cents.length)
    lastTrained = Some((cents.map { case (i, cv) => (i, cv.toSeq) }, nProbes))
    val cand = trainedCandidatesFor(e, cents, nProbes, spark)
    val scored = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(
        col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** `ann_filtered_topk` — metadata-FILTERED vector search (the
    * production shape every vector store exposes: top-k among the
    * vectors satisfying a structured predicate — here, the query's
    * own `label`): the filter composes INTO the scoring join as an
    * equi-key, so each query scores only its label's vectors, never
    * post-filtering a global top-k (which silently under-fills k when
    * the predicate is selective — the classic filtered-ANN bug).
    *
    * Plan: the handful of query vectors broadcast; the corpus joins
    * on `label` (map-side, no corpus shuffle) and candidates stream
    * through the shared bounded-heap top-k. At selectivity s the scan
    * does s·|corpus| dot products per query — and the same label-key
    * composes with any bucketed variant when s·|corpus| itself gets
    * big. */
  def annFilteredTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Tables.parallel(spark, Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"),
        VectorFunctions.quantize(col("embedding")).as("v"))
      .withColumn("nsq", VectorFunctions.normSqQ(col("v")))
    val q = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("label"),
        col("v").as("qv"), col("nsq").as("qnsq"))
    val scored = e.join(broadcast(q), Seq("label"))
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  // artifact slot for the persisted-index driver query (same
  // latest-run-wins contract as [[lastTrained]])
  @volatile private var lastIndexed: Option[(Seq[(Long, Seq[Long])], Int)] = None

  def annIndexOracleSql: Option[String] = ivfOracleFor(lastIndexed)

  /** `ann_index_incremental` — the PERSISTED-index lifecycle
    * ([[AnnIndex]]): half the embeddings land in a lakehouse table
    * and the IVF index builds over them (train + assign + store);
    * the other half appends and [[AnnIndex.refresh]] extends the
    * index by assigning ONLY the delta to the existing centroids;
    * queries then run entirely off the persisted tables. The ORACLE
    * replays train-time centroids as literals and assigns ALL
    * embeddings in one pass — hash-equality proves the incrementally
    * built index is bit-identical to a from-scratch assignment, the
    * FAISS add-after-train contract. */
  def annIndexIncremental(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import graft.sources.Lakehouse
    val root = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    val lake = new Lakehouse(spark, root)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    lake.createOrReplace(emb.where(col("vec_id") % 2 === 0), "emb")
    AnnIndex.create(lake, "emb")
    lake.append(emb.where(col("vec_id") % 2 === 1), "emb")
    AnnIndex.refresh(lake, "emb")
    val cents = AnnIndex.centroids(lake, "emb")
    lastIndexed = Some((cents.map { case (i, cv) => (i, cv.toSeq) },
      trainedProbes(cents.length)))
    AnnIndex.query(lake, "emb", emb.where(col("vec_id") < 5), k)
  }

  // artifact slot for the rebalanced-index driver query: (root
  // centroids, (parent, child, child-centroid) split rows, probes)
  @volatile private var lastRebalanced:
    Option[(Seq[(Long, Seq[Long])], Seq[(Long, Long, Seq[Long])], Int)] = None

  /** DuckDB restatement of the last rebalanced-index run: root
    * centroids AND the split ledger as literal VALUES; assignment =
    * 2-nearest over roots then descend split parents to the nearest
    * child; probing ranks the LEAF cells. Hash-equality proves the
    * split-in-place index equals a from-scratch replay of the same
    * tree — the rebalance never silently moved an un-split cell. */
  def annIndexRebalancedOracleSql: Option[String] =
    lastRebalanced.map { case (roots, kids, probes) =>
      val rootVals = roots.map { case (id, cv) =>
        s"($id, [${cv.mkString(",")}])"
      }.mkString(", ")
      val kidVals = kids.map { case (p, c, cv) =>
        s"($p, $c, [${cv.mkString(",")}])"
      }.mkString(", ")
      s"""WITH q AS (SELECT vec_id,
         |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
         |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
         |roots AS (SELECT cell, cv, list_sum(list_transform(cv, x -> x*x)) cn
         |  FROM (VALUES $rootVals) r(cell, cv)),
         |kids AS (SELECT parent, child, cv, list_sum(list_transform(cv, x -> x*x)) cn
         |  FROM (VALUES $kidVals) k(parent, child, cv)),
         |dr AS (SELECT e.vec_id, r.cell,
         |  CAST(e.nsq + r.cn - 2 * list_sum(list_transform(list_zip(e.v, r.cv), z -> z[1]*z[2])) AS BIGINT) d2
         |  FROM qn e CROSS JOIN roots r),
         |rr AS (SELECT vec_id, cell,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) crk FROM dr),
         |a0 AS (SELECT vec_id, cell FROM rr WHERE crk <= 2),
         |dk AS (SELECT a0.vec_id, a0.cell parent, k.child,
         |  CAST(e.nsq + k.cn - 2 * list_sum(list_transform(list_zip(e.v, k.cv), z -> z[1]*z[2])) AS BIGINT) d2
         |  FROM a0 JOIN kids k ON a0.cell = k.parent JOIN qn e ON e.vec_id = a0.vec_id),
         |dkb AS (SELECT vec_id, parent, child,
         |  row_number() OVER (PARTITION BY vec_id, parent ORDER BY d2, child) rk FROM dk),
         |assign AS (SELECT a0.vec_id, coalesce(b.child, a0.cell) cell
         |  FROM a0 LEFT JOIN (SELECT vec_id, parent, child FROM dkb WHERE rk = 1) b
         |  ON a0.vec_id = b.vec_id AND a0.cell = b.parent),
         |leaves AS (SELECT cell, cv, cn FROM roots WHERE cell NOT IN (SELECT parent FROM kids)
         |  UNION ALL SELECT child, cv, cn FROM kids),
         |dl AS (SELECT e.vec_id, l.cell,
         |  CAST(e.nsq + l.cn - 2 * list_sum(list_transform(list_zip(e.v, l.cv), z -> z[1]*z[2])) AS BIGINT) d2
         |  FROM qn e CROSS JOIN leaves l WHERE e.vec_id < 5),
         |probes AS (SELECT vec_id q_id, cell FROM (SELECT vec_id, cell,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) crk FROM dl) WHERE crk <= $probes),
         |cand AS (SELECT DISTINCT q_id, assign.vec_id FROM probes JOIN assign ON probes.cell = assign.cell),
         |s AS (SELECT q_id, cand.vec_id,
         |  round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
         |    / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
         |  FROM cand JOIN qn qv ON cand.q_id = qv.vec_id JOIN qn ev ON cand.vec_id = ev.vec_id),
         |r AS (SELECT q_id, vec_id, cosine,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM s)
         |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin
    }

  /** `ann_index_rebalanced` — the HOT-CELL SPLIT lifecycle
    * ([[AnnIndex.rebalance]]): the index builds DELIBERATELY coarse
    * (8 cells over the whole corpus — every cell is overloaded, the
    * skewed-growth state a production index reaches), then rebalance
    * splits the two most-loaded cells in place — children trained on
    * the hot cells' own vectors, parents frozen, only the hot rows
    * re-assigned — and the query runs against the leaf cells. The
    * oracle replays roots + split ledger as literals: hash-equality
    * proves split-in-place ≡ from-scratch tree assignment. */
  def annIndexRebalanced(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import graft.sources.Lakehouse
    val root = java.nio.file.Files.createTempDirectory("graft-annreb").toString
    val lake = new Lakehouse(spark, root)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    lake.createOrReplace(emb, "emb")
    AnnIndex.create(lake, "emb", nCells = 8)
    AnnIndex.rebalance(lake, "emb", maxLoad = 1.25, forceTop = 2)
    val cv = AnnIndex.centroidMap(lake, "emb")
    val sp = AnnIndex.splits(lake, "emb")
    val childIds = sp.map(_._2).toSet
    val parents = sp.map(_._1).toSet
    val roots = cv.filterNot { case (id, _) => childIds.contains(id) }
      .toSeq.sortBy(_._1).map { case (id, a) => (id, a.toSeq) }
    val kids = sp.map { case (p, c, _) => (p, c, cv(c).toSeq) }
    val probes = trainedProbes(cv.size - parents.size)
    lastRebalanced = Some((roots, kids, probes))
    AnnIndex.query(lake, "emb", emb.where(col("vec_id") < 5), k)
  }

  // ---- product quantization (PQ) ------------------------------------------

  val PqSubs = 4
  val PqSubDim: Int = Dims / PqSubs
  val PqCents = 16

  /** Per-subspace PQ codebooks, trained ONCE per (session, dir) —
    * like [[trainedCodebook]], an offline artifact: [sub][cent] →
    * centroid (sub-dimension longs, quantized scale). Deterministic:
    * fixed per-subspace seed, fixed iteration count. */
  private val pqBooks = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[Seq[Array[Long]]]]()

  // deterministic release path for the trained offline artifacts:
  // SessionIds.release(spark) drops a retired session's codebooks (the
  // weak string keys already guarantee the maps never PIN a session —
  // this reclaims the artifact payloads too)
  SessionIds.onRelease { id =>
    stubCodebooks.keySet.removeIf(k => k._1 == id)
    codebooks.keySet.removeIf(k => k._1 == id)
    pqBooks.keySet.removeIf(k => k._1 == id)
  }

  private[graft] def pqCodebook(spark: SparkSession, dir: String): Seq[Seq[Array[Long]]] =
    pqBooks.computeIfAbsent((SessionIds.idOf(spark), dir), _ => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val e = quantized(spark, dir)
      (0 until PqSubs).map { i =>
        val feat = e.select(array_to_vector(
          slice(col("v"), i * PqSubDim + 1, PqSubDim).cast("array<double>")).as("features"))
        val model = new KMeans().setK(PqCents).setSeed(42L + i).setMaxIter(10).fit(feat)
        model.clusterCenters.map(_.toArray.map(x => math.round(x)).toArray).toSeq
      }
    })

  /** CORPUS-side PQ encoding — each vector compresses to [[PqSubs]]
    * codes (nearest sub-centroid per subspace, ties to the lowest
    * cent id). Entirely MAP-SIDE: the codebook rides as literals, the
    * argmin is an `array_position(d2s, array_min(d2s))` projection —
    * no shuffle, no window, no UDF. At 100 TB this is the pass that
    * turns a 256-byte embedding into 4 bytes of codes. */
  private[graft] def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val cb = pqCodebook(spark, dir)
    val e = quantized(spark, dir)
    val codeCols = (0 until PqSubs).map { i =>
      val sub = slice(col("v"), i * PqSubDim + 1, PqSubDim)
      val d2s = array(cb(i).map { c =>
        val cn = c.map(x => x * x).sum
        lit(cn) - lit(2L) * VectorFunctions.dotQ(sub, typedlit(c.toSeq))
      }: _*)
      (array_position(d2s, array_min(d2s)) - 1).cast("int").as(s"c$i")
    }
    e.select(col("vec_id") +: codeCols: _*)
  }

  // most-recent-run PQ codebook for the oracle dump — a single slot,
  // inherently bounded (see [[lastTrained]] for why latest-run-wins is
  // exactly the contract Verify/Bench need)
  @volatile private var lastPq: Option[Seq[Seq[Seq[Long]]]] = None

  /** `ann_pq_topk` — top-k by ASYMMETRIC distance over PQ codes: the
    * corpus is scanned in the COMPRESSED domain (per row·query: 4 LUT
    * lookups + 3 adds — never a full-dimension dot), which is what
    * makes PQ the 100 TB scan path. The query-side LUT (query·sub →
    * 16 partial dots) is a per-query offline artifact built from a
    * BOUNDED collect of the 5 query vectors (same precedent as the
    * trained-codebook fetch); approximate cosine = LUT-sum /
    * sqrt(|q|² · reconstructed |x|²); the tail is the shared
    * bounded-heap top-k. */
  /** Query-side PQ artifacts: the broadcastable (q_id, qnsq, q_pos)
    * relation plus the ADC expressions (LUT-sum dot and reconstructed
    * norm) over a row carrying q_pos and the c0..c3 code columns. The
    * LUT comes from a BOUNDED collect of the 5 query vectors — a
    * per-query offline artifact, same precedent as the trained-
    * codebook fetch. */
  private def pqQuerySide(spark: SparkSession, dir: String,
      cb: Seq[Seq[Array[Long]]]): (DataFrame, Column, Column) = {
    val qs = quantized(spark, dir).where(col("vec_id") < 5)
      .select("vec_id", "v", "nsq")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    // lutSub(i)(qPos)(cent) = dot(query subvector i, centroid)
    val lutSub: Seq[Seq[Seq[Long]]] = (0 until PqSubs).map { i =>
      qs.toSeq.map { case (_, qv, _) =>
        cb(i).map(c =>
          (0 until PqSubDim).map(d => qv(i * PqSubDim + d) * c(d)).sum)
      }
    }
    val cn2: Seq[Seq[Long]] = (0 until PqSubs).map(i => cb(i).map(c => c.map(x => x * x).sum))
    val qDf = spark.createDataFrame(
      qs.toSeq.zipWithIndex.map { case ((id, _, n), p) => (id, n, p) })
      .toDF("q_id", "qnsq", "q_pos")
    val adot = (0 until PqSubs).map(i =>
      element_at(element_at(typedlit(lutSub(i)), col("q_pos") + 1), col(s"c$i") + 1))
      .reduce(_ + _)
    val rn2 = (0 until PqSubs).map(i =>
      element_at(typedlit(cn2(i)), col(s"c$i") + 1)).reduce(_ + _)
    (qDf, adot, rn2)
  }

  private def adcCosine(adot: Column, rn2: Column): Column =
    round(adot.cast("double") / sqrt((col("qnsq") * rn2).cast("double")), 6)

  def annPqTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val cb = pqCodebook(spark, dir)
    lastPq = Some(cb.map(_.map(_.toSeq)))
    val (qDf, adot, rn2) = pqQuerySide(spark, dir, cb)
    val scored = pqCodes(spark, dir).crossJoin(broadcast(qDf))
      .select(col("q_id"), col("vec_id"), adcCosine(adot, rn2).as("cosine"))
    topkPerQuery(scored, k)
  }

  // most-recent-run IVF-PQ artifacts for the oracle dump — single
  // bounded slot, latest-run-wins (see [[lastTrained]])
  @volatile private var lastIvfPq:
    Option[(Seq[(Long, Seq[Long])], Int, Seq[Seq[Seq[Long]]])] = None

  /** `ann_ivfpq_topk` — the composed billion-scale index (FAISS
    * IVF-PQ): the trained coarse quantizer prunes the corpus to the
    * probed cells' members, and ONLY those candidates are scored — in
    * the COMPRESSED domain via the PQ LUT. Per query the work is
    * probes·(n/√n) LUT lookups instead of a full scan of anything;
    * both index artifacts (coarse centroids, PQ codebooks) are
    * offline-trained and deterministic, and the oracle replays the
    * whole composition from their literal VALUES. */
  def annIvfPqTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val cents = trainedCodebook(spark, dir)
    val nProbes = trainedProbes(cents.length)
    val cb = pqCodebook(spark, dir)
    lastIvfPq = Some((cents.map { case (i, cv) => (i, cv.toSeq) }, nProbes,
      cb.map(_.map(_.toSeq))))
    val (qDf, adot, rn2) = pqQuerySide(spark, dir, cb)
    val cand = trainedCandidatesFor(e, cents, nProbes, spark)
    val scored = cand
      .join(pqCodes(spark, dir), "vec_id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("vec_id"), adcCosine(adot, rn2).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** `ann_ivfpq_rerank` — IVF-PQ with an EXACT re-rank tail: ADC
    * shortlists the top-`c` per query in the compressed domain, then
    * only those c rows re-join their FULL vectors for exact cosine —
    * the standard accuracy-recovery stage (recall approaches plain
    * trained-IVF while the corpus-side work stays LUT lookups; the
    * exact pass touches c·|queries| vectors, never the corpus). */
  def annIvfPqRerank(spark: SparkSession, dir: String, k: Int = 10, c: Int = 50): DataFrame = {
    val e = quantized(spark, dir)
    val cents = trainedCodebook(spark, dir)
    val nProbes = trainedProbes(cents.length)
    val cb = pqCodebook(spark, dir)
    lastIvfPq = Some((cents.map { case (i, cv) => (i, cv.toSeq) }, nProbes,
      cb.map(_.map(_.toSeq))))
    val (qDf, adot, rn2) = pqQuerySide(spark, dir, cb)
    val adc = trainedCandidatesFor(e, cents, nProbes, spark)
      .join(pqCodes(spark, dir), "vec_id")
      .join(broadcast(qDf), "q_id")
      .select(col("q_id"), col("vec_id"), adcCosine(adot, rn2).as("cosine"))
    val shortlist = topkPerQuery(adc, c).select("q_id", "vec_id")
    val scored = shortlist
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** BINARY-QUANTIZATION code: one 64-bit word per vector, bit d set
    * iff dimension d is non-negative — sign quantization over the
    * engine's canonical fixed-point vectors (the FAISS
    * IndexBinaryFlat / BQ shape). 1 bit per dimension means the whole
    * corpus rides in 8 bytes/vector: the compressed scan is one
    * xor + popcount per row, ~500× less arithmetic than a 64-dim dot
    * product, which is what makes an exhaustive shortlist pass viable
    * at billion scale before the bounded exact re-rank. Straight-line
    * when/bitwiseOR columns — no interpreted HOF in the per-row path. */
  private def bqCode(v: Column): Column =
    (0 until Dims).map { d =>
      when(element_at(v, d + 1) >= 0L, lit(1L << d)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** `ann_bq_rerank` — binary quantization with an exact re-rank
    * tail: Hamming distance over the 64-bit sign codes shortlists the
    * top-`c` per query (smallest distance, vec_id tie-break — the
    * same deterministic order the oracle replays), then ONLY those c
    * rows join their full vectors for exact cosine. Corpus-side state
    * is one long per vector; the shortlist heap bounds shuffle at c
    * rows/query/partition ([[topkPerQuery]]). */
  def annBqRerank(spark: SparkSession, dir: String, k: Int = 10, c: Int = 50): DataFrame = {
    val e = quantized(spark, dir)
    val codes = e.select(col("vec_id"), bqCode(col("v")).as("code"))
    val q = codes.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("code").as("qcode"))
    // negated Hamming reuses the (score DESC, vec_id ASC) heap order
    val ham = codes.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        negate(bit_count(col("code").bitwiseXOR(col("qcode"))).cast("double")).as("cosine"))
    val shortlist = topkPerQuery(ham, c).select("q_id", "vec_id")
    val scored = shortlist
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  /** DuckDB oracle for [[annIvfPqRerank]]: the IVF-PQ composition plus
    * the ADC-top-`c` shortlist re-scored with exact quantized cosine. */
  def ivfpqRerankOracleSql: Option[String] = {
    lastIvfPq.map { case (cents, probes, cb) =>
      val base = ivfpqBaseCtes(cents, probes, cb)
      s"""$base,
         |ark AS (SELECT q_id, vec_id, cosine,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) ark FROM sc),
         |short AS (SELECT q_id, vec_id FROM ark WHERE ark <= 50),
         |ex AS (SELECT s.q_id, s.vec_id,
         |    round(CAST(list_sum(list_transform(list_zip(qv.v, ev.v), z -> z[1]*z[2])) AS DOUBLE)
         |      / sqrt(CAST(qv.nsq * ev.nsq AS DOUBLE)), 6) cosine
         |  FROM short s JOIN qn qv ON s.q_id = qv.vec_id JOIN qn ev ON s.vec_id = ev.vec_id),
         |r AS (SELECT q_id, vec_id, cosine,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM ex)
         |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin
    }
  }

  /** Shared IVF-PQ oracle CTE chain, through `sc` (per-candidate ADC
    * cosine): coarse assignment + probed candidates + PQ encode/LUT. */
  private def ivfpqBaseCtes(cents: Seq[(Long, Seq[Long])], probes: Int,
      cb: Seq[Seq[Seq[Long]]]): String = {
    val centValues = cents.map { case (id, cv) =>
      s"($id, [${cv.mkString(",")}])"
    }.mkString(", ")
    val cbValues = (for {
      i <- 0 until PqSubs
      (cv, ci) <- cb(i).zipWithIndex
    } yield s"($i, $ci, [${cv.mkString(",")}], ${cv.map(x => x * x).sum})")
      .mkString(", ")
    s"""WITH q AS (SELECT vec_id,
       |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
       |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
       |cents AS (SELECT cent_id, cv, list_sum(list_transform(cv, x -> x*x)) cn
       |  FROM (VALUES $centValues) c(cent_id, cv)),
       |da AS (SELECT e.vec_id, c.cent_id,
       |  CAST(e.nsq + c.cn - 2 * list_sum(list_transform(list_zip(e.v, c.cv), z -> z[1]*z[2])) AS BIGINT) d2
       |  FROM qn e CROSS JOIN cents c),
       |ranked AS (SELECT vec_id, cent_id,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) crk FROM da),
       |assign AS (SELECT vec_id, cent_id cell FROM ranked WHERE crk <= 2),
       |probes AS (SELECT vec_id q_id, cent_id cell FROM ranked WHERE crk <= $probes AND vec_id < 5),
       |cand AS (SELECT DISTINCT q_id, assign.vec_id FROM probes JOIN assign ON probes.cell = assign.cell),
       |cb AS (SELECT * FROM (VALUES $cbValues) c(sub, cent, cv, cn)),
       |enc AS (SELECT e.vec_id, c.sub, c.cent, c.cn - 2 * list_sum(list_transform(
       |    list_zip(e.v[(c.sub*${PqSubDim}+1):(c.sub*${PqSubDim}+${PqSubDim})], c.cv),
       |    z -> z[1]*z[2])) d2
       |  FROM qn e CROSS JOIN cb c),
       |codes AS (SELECT vec_id, sub, cent FROM (
       |    SELECT vec_id, sub, cent,
       |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cent) rk FROM enc)
       |  WHERE rk = 1),
       |lut AS (SELECT qv.vec_id q_id, c.sub, c.cent, c.cn,
       |    list_sum(list_transform(
       |      list_zip(qv.v[(c.sub*${PqSubDim}+1):(c.sub*${PqSubDim}+${PqSubDim})], c.cv),
       |      z -> z[1]*z[2])) pdot
       |  FROM qn qv CROSS JOIN cb c WHERE qv.vec_id < 5),
       |s AS (SELECT l.q_id, co.vec_id, sum(l.pdot) adot, sum(l.cn) rn2
       |  FROM cand JOIN codes co ON cand.vec_id = co.vec_id
       |  JOIN lut l ON co.sub = l.sub AND co.cent = l.cent AND l.q_id = cand.q_id
       |  GROUP BY l.q_id, co.vec_id),
       |sc AS (SELECT s.q_id, s.vec_id,
       |    round(CAST(adot AS DOUBLE) / sqrt(CAST(qq.nsq * rn2 AS DOUBLE)), 6) cosine
       |  FROM s JOIN qn qq ON s.q_id = qq.vec_id)""".stripMargin
  }

  /** DuckDB oracle for [[annIvfPqTopk]]: coarse-centroid candidate
    * generation (same CTEs as the trained-IVF oracle) composed with
    * PQ encode/LUT/ADC scoring restricted to the candidates. */
  def ivfpqOracleSql: Option[String] = {
    lastIvfPq.map { case (cents, probes, cb) =>
      s"""${ivfpqBaseCtes(cents, probes, cb)},
         |r AS (SELECT q_id, vec_id, cosine,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM sc)
         |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin
    }
  }

  /** DuckDB oracle for [[annPqTopk]]: the trained codebooks ride as
    * VALUES, encode/LUT/ADC replicate in SQL (same argmin tie-break,
    * same rounding). */
  def pqOracleSql: Option[String] = {
    lastPq.map { cb =>
      val values = (for {
        i <- 0 until PqSubs
        (cv, ci) <- cb(i).zipWithIndex
      } yield s"($i, $ci, [${cv.mkString(",")}], ${cv.map(x => x * x).sum})")
        .mkString(", ")
      s"""WITH q AS (SELECT vec_id,
         |  [CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) for x in embedding] v FROM embeddings),
         |qn AS (SELECT vec_id, v, list_sum(list_transform(v, x -> x*x)) nsq FROM q),
         |cb AS (SELECT * FROM (VALUES $values) c(sub, cent, cv, cn)),
         |enc AS (SELECT e.vec_id, c.sub, c.cent, c.cn - 2 * list_sum(list_transform(
         |    list_zip(e.v[(c.sub*${PqSubDim}+1):(c.sub*${PqSubDim}+${PqSubDim})], c.cv),
         |    z -> z[1]*z[2])) d2
         |  FROM qn e CROSS JOIN cb c),
         |codes AS (SELECT vec_id, sub, cent FROM (
         |    SELECT vec_id, sub, cent,
         |      row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cent) rk FROM enc)
         |  WHERE rk = 1),
         |lut AS (SELECT qv.vec_id q_id, c.sub, c.cent, c.cn,
         |    list_sum(list_transform(
         |      list_zip(qv.v[(c.sub*${PqSubDim}+1):(c.sub*${PqSubDim}+${PqSubDim})], c.cv),
         |      z -> z[1]*z[2])) pdot
         |  FROM qn qv CROSS JOIN cb c WHERE qv.vec_id < 5),
         |s AS (SELECT l.q_id, co.vec_id, sum(l.pdot) adot, sum(l.cn) rn2
         |  FROM codes co JOIN lut l ON co.sub = l.sub AND co.cent = l.cent
         |  GROUP BY l.q_id, co.vec_id),
         |sc AS (SELECT s.q_id, s.vec_id,
         |    round(CAST(adot AS DOUBLE) / sqrt(CAST(qq.nsq * rn2 AS DOUBLE)), 6) cosine
         |  FROM s JOIN qn qq ON s.q_id = qq.vec_id),
         |r AS (SELECT q_id, vec_id, cosine,
         |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) rnk FROM sc)
         |SELECT q_id, vec_id, rnk, cosine FROM r WHERE rnk <= 10
         |ORDER BY q_id, rnk""".stripMargin
    }
  }

  /** `ann_lsh_bucketed` — LSH-pruned top-k: candidates are corpus
    * vectors sharing any (table, bucket) with the query; exact
    * quantized cosine ranks within candidates. Ids-only shuffle for
    * candidate generation; vectors re-join after dedup. */
  def annLshTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = quantized(spark, dir)
    val banded = bandedTable(spark, dir)
    val qb = banded.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("t"), col("bucket"))
    val cand = qb.join(banded, Seq("t", "bucket"))
      .select("q_id", "vec_id")
      .dropDuplicates("q_id", "vec_id")
    val scored = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq")), "q_id")
      .join(e, "vec_id")
      .select(
        col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    topkPerQuery(scored, k)
  }

  // ---- hybrid retrieval: text + vector, reciprocal rank fusion ----

  val RrfC = 60

  /** `hybrid_search_rrf` — HYBRID RETRIEVAL (the RAG-stack shape
    * every production search system converged on): a keyword ranking
    * and a vector ranking, fused by RECIPROCAL RANK FUSION —
    * score(d) = Σ_lists 1/(C + rank_list(d)), C = 60 from the
    * original RRF paper; absent-from-a-list contributes 0. RRF is
    * the standard fusion precisely because it needs NO score
    * calibration between BM25-ish integers and cosines — only ranks.
    *
    * Both legs are the repo's existing scale shapes: keyword score =
    * |distinct-token overlap| (integer-exact, broadcast query side,
    * non-matching docs never ranked), vector leg = the quantized
    * cosine scan, both through the bounded-heap top-k tail at pool
    * size 20 — so the fusion input is 2·20 rows per query however
    * large the corpus, and the fused top-10 is a bounded-heap pass
    * over THAT. Ranks and tie-breaks are id-deterministic end to
    * end; the whole pipeline (tokenize → rank → fuse) restates in
    * DuckDB and hash-matches. */
  def hybridSearchRrf(spark: SparkSession, dir: String, k: Int = 10,
      poolK: Int = 20): DataFrame = {
    val toks = Tables.parallel(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), array_distinct(TextAnalysis.tokens(col("text"))).as("dt"))
    val qt = toks.where(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("dt").as("qt"))
    val tscored = toks.crossJoin(broadcast(qt))
      .select(col("q_id"), col("doc_id").as("vec_id"),
        size(array_intersect(col("dt"), col("qt"))).cast("double").as("cosine"))
      .where(col("cosine") > 0)
    val trank = topkPerQuery(tscored, poolK)
      .select(col("q_id"), col("vec_id"), col("rnk").as("rt"))
    val e = quantized(spark, dir)
    val qv = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq"))
    val vscored = e.crossJoin(broadcast(qv))
      .select(col("q_id"), col("vec_id"),
        round(cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("cosine"))
    val vrank = topkPerQuery(vscored, poolK)
      .select(col("q_id"), col("vec_id"), col("rnk").as("rv"))
    val fused = trank.join(vrank, Seq("q_id", "vec_id"), "full_outer")
      .select(col("q_id"), col("vec_id"),
        round(
          coalesce(lit(1.0) / (lit(RrfC) + col("rt")), lit(0.0))
            + coalesce(lit(1.0) / (lit(RrfC) + col("rv")), lit(0.0)), 6).as("cosine"))
    topkPerQuery(fused, k).withColumnRenamed("cosine", "rrf")
  }

  // ---- graph ANN: per-shard navigable small world ----

  /** `ann_nsw_topk` — GRAPH-BASED ANN (the HNSW index family,
    * restated shard-parallel): the corpus is hash-sharded by vec_id,
    * each shard builds an in-memory HIERARCHICAL navigable-small-world
    * graph over its own vectors inside ONE `mapPartitions` pass, then
    * answers every query by descending the layer stack — greedy hops
    * through the sparse upper layers land the beam in the right
    * neighborhood before the ef-wide layer-0 search runs — and the
    * global answer is the bounded-heap top-k merge of per-shard
    * candidates. This is exactly how disk-scale graph indexes deploy
    * (shard-per-machine, search all shards, merge) — the shard is the
    * unit that must fit one executor's memory, and the constant (8
    * here) is sized to the corpus, not the shape.
    *
    * HNSW layering (vs the flat NSW of earlier rounds): each node
    * draws a LEVEL from the geometric distribution — here
    * deterministically, as the trailing-zero count of a mixed hash of
    * its vec_id, so the whole hierarchy is a pure function of the
    * data — and appears in every layer up to it. Layer ℓ holds ~n/2^ℓ
    * nodes, so the descent reaches a query's neighborhood in
    * O(log n) hops where a flat graph's beam must walk there at full
    * density; that entry-point quality is the standard recall/cost
    * upgrade (spec floor raised 0.8 → 0.9 at the same ef).
    *
    * Search cost per shard is O(ef · degree · d) dot products versus
    * the brute scan's O(n_shard · d) — the win at 100 TB scale where
    * n_shard is millions. Per-row arithmetic is exact integer
    * (quantized dots; cosine = long-dot / sqrt(long·long)), the
    * insert order, level draws and every tie-break are
    * id-deterministic, and the partition contents are a pure hash of
    * vec_id — so the whole index and every answer are bit-reproducible
    * across runs and cluster layouts (spec-pinned; the driver oracle
    * restates the sf0.01 answer as VALUES).
    *
    * Like every graph index, recall is approximate by design: a beam
    * can stall in a local neighborhood. The spec MEASURES recall@10
    * against the exact scan rather than assuming it. */
  def annNswTopk(spark: SparkSession, dir: String, k: Int = 10,
      shards: Int = 8, m: Int = 8, ef: Int = 32): DataFrame = {
    import spark.implicits._
    val e = quantized(spark, dir)
    // query set: a bounded driver-side artifact (5 vectors), same
    // class as the broadcast query side of the brute baseline
    val queries: Seq[(Long, Array[Long], Long)] = e.where(col("vec_id") < 5)
      .select(col("vec_id"), col("v"), col("nsq"))
      .as[(Long, Seq[Long], Long)].collect().toSeq
      .map { case (id, v, n) => (id, v.toArray, n) }.sortBy(_._1)
    val cands = e.select(col("vec_id"), col("v"), col("nsq"))
      .withColumn("shard", pmod(col("vec_id"), lit(shards)).cast("int"))
      .as[(Long, Seq[Long], Long, Int)]
      .repartition(shards, col("shard"))
      .sortWithinPartitions("vec_id")
      .mapPartitions { it =>
        val nodes = it.map { case (id, v, nsq, _) => (id, v.toArray, nsq) }.toArray
        if (nodes.isEmpty) Iterator.empty
        else {
          def cos(a: Array[Long], an: Long, b: Array[Long], bn: Long): Double = {
            var s = 0L; var i = 0
            while (i < a.length) { s += a(i) * b(i); i += 1 }
            s.toDouble / math.sqrt(an.toDouble * bn.toDouble)
          }
          // deterministic HNSW level draw: geometric(1/2) as the
          // trailing-zero count of a mixed hash of vec_id (capped) —
          // the hierarchy is a pure function of the data, never of
          // run order or RNG state
          def levelOf(id: Long): Int = {
            var h = id * 0x9E3779B97F4A7C15L
            h ^= h >>> 32; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 27
            java.lang.Long.numberOfTrailingZeros(h | (1L << 16))
          }
          val level: Array[Int] = nodes.map(n => levelOf(n._1))
          // ragged per-layer adjacency: adj(i)(l) for l <= level(i)
          val adj: Array[Array[scala.collection.mutable.ArrayBuffer[Int]]] =
            level.map(l => Array.fill(l + 1)(scala.collection.mutable.ArrayBuffer.empty[Int]))
          implicit val byScore: Ordering[(Double, Int)] = new Ordering[(Double, Int)] {
            def compare(a: (Double, Int), b: (Double, Int)): Int = {
              val c = java.lang.Double.compare(a._1, b._1) // higher cos = bigger
              if (c != 0) c else Integer.compare(b._2, a._2) // lower id = bigger
            }
          }
          def scoreOf(qv: Array[Long], qn: Long, i: Int) = cos(qv, qn, nodes(i)._2, nodes(i)._3)
          // greedy descent hop at one layer: move to the best-improving
          // neighbor until none improves (tie → lower index)
          def greedy(qv: Array[Long], qn: Long, l: Int, from: Int): Int = {
            var cur = from
            var curScore = scoreOf(qv, qn, cur)
            var improved = true
            while (improved) {
              improved = false
              adj(cur)(l).foreach { nb =>
                val sc = scoreOf(qv, qn, nb)
                if (sc > curScore || (sc == curScore && nb < cur)) {
                  cur = nb; curScore = sc; improved = true
                }
              }
            }
            cur
          }
          // beam search at one layer: best-first by (cosine desc, id
          // asc), bounded frontier of `width`, seeded at `seed`
          def beam(qv: Array[Long], qn: Long, width: Int, l: Int,
              seed: Int): Seq[(Double, Int)] = {
            val seen = new java.util.BitSet(nodes.length)
            val frontier = scala.collection.mutable.PriorityQueue.empty[(Double, Int)]
            val results = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](byScore.reverse)
            seen.set(seed)
            val s0 = (scoreOf(qv, qn, seed), seed)
            frontier.enqueue(s0); results.enqueue(s0)
            while (frontier.nonEmpty &&
              (results.size < width || frontier.head._1 >= results.head._1)) {
              val (_, cu) = frontier.dequeue()
              adj(cu)(l).foreach { nb =>
                if (!seen.get(nb)) {
                  seen.set(nb)
                  val sc = (scoreOf(qv, qn, nb), nb)
                  if (results.size < width || byScore.gt(sc, results.head)) {
                    frontier.enqueue(sc); results.enqueue(sc)
                    if (results.size > width) results.dequeue()
                  }
                }
              }
            }
            results.toSeq.sorted(byScore.reverse)
          }
          def connect(i: Int, j: Int, l: Int): Unit = {
            if (i == j) return
            adj(i)(l) += j; adj(j)(l) += i
            // degree cap with SYMMETRIC pruning: an edge leaves both
            // lists or neither, so "x lists y" always means "y lists
            // x" — every node with an edge is findable through its own
            // neighborhood (one-sided eviction left early hubs with
            // out-edges nobody reciprocated: present in the graph,
            // unreachable by any beam). Worst edges (lowest cosine,
            // tie → higher id) go first, and an edge whose removal
            // would isolate the peer at this layer is skipped — a soft
            // cap beats a stranded node.
            val cap = if (l == 0) 2 * m else m
            Seq(i, j).foreach { x =>
              if (adj(x)(l).length > cap) {
                val worstFirst = adj(x)(l).map(y =>
                  (cos(nodes(x)._2, nodes(x)._3, nodes(y)._2, nodes(y)._3), y))
                  .sortBy { case (c, y) => (c, -y) }
                var excess = adj(x)(l).length - cap
                var w = 0
                while (excess > 0 && w < worstFirst.length) {
                  val y = worstFirst(w)._2
                  if (adj(y)(l).length > 1 && adj(x)(l).length > 1) {
                    adj(x)(l) -= y
                    adj(y)(l) -= x
                    excess -= 1
                  }
                  w += 1
                }
              }
            }
          }
          // incremental HNSW insert in id order: greedy-descend the
          // layers above the node's level, then beam + connect at each
          // layer from min(level, top) down to 0
          var entry = 0
          var top = level(0)
          var i = 1
          while (i < nodes.length) {
            val li = level(i)
            var cur = entry
            var l = top
            while (l > li) { cur = greedy(nodes(i)._2, nodes(i)._3, l, cur); l -= 1 }
            var lc = math.min(li, top)
            while (lc >= 0) {
              val near = beam(nodes(i)._2, nodes(i)._3, ef, lc, cur)
              near.take(m).foreach { case (_, j) => connect(i, j, lc) }
              cur = near.head._2
              lc -= 1
            }
            if (li > top) { entry = i; top = li }
            i += 1
          }
          // query: descend to layer 1 greedily, ef-wide beam at layer 0
          queries.iterator.flatMap { case (qid, qv, qn) =>
            var cur = entry
            var l = top
            while (l > 0) { cur = greedy(qv, qn, l, cur); l -= 1 }
            beam(qv, qn, math.max(ef, k), 0, cur).take(k).map { case (c, idx) =>
              (qid, nodes(idx)._1, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          }
        }
      }.toDF("q_id", "vec_id", "cosine")
    topkPerQuery(cands, k)
  }
}

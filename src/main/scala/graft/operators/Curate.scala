package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the flagship composition of the
  * text-analysis and dedup families into one declarative pipeline —
  * what an LLM-data team actually runs over a 100 TB crawl:
  *
  *   1. quality gate  (composite score ≥ 0.5)
  *   2. language gate (rule-based langid == 'en')
  *   3. near-dup drop (3-shingle Jaccard ≥ 0.5 → keep the earlier doc)
  *
  * Stays one Catalyst plan end-to-end: the gates are map-side column
  * predicates fused into the scan side, and the dedup drop-list is the
  * bucketize-expand pair pipeline reduced to a distinct doc_b set,
  * removed with a left-anti join (no row ever widens, no collect).
  * Drop-rule is "survivor = not the later element of any qualifying
  * pair": deterministic, order-free, and exactly restatable in SQL.
  */
object Curate {

  /** Quality score + language ID from ONE scan + one tokenize pass —
    * a plain DataFrame→DataFrame transform over (doc_id, text), so the
    * SAME projection runs on a batch scan or a streaming source
    * unchanged (stateless, codegen-side — StreamingSpec pins the
    * batch/stream equivalence). Expressions are identical to
    * textQuality/textLangid, so composed oracles are still the
    * per-family oracles chained. */
  def gates(docs: DataFrame): DataFrame = {
    import TextAnalysis._
    val toks = docs
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        tokens(col("text")).as("toks"),
        // codegen-side counts from the raw text (no HOF lambda —
        // see TextAnalysis.textQuality)
        stopCount(col("text")).as("n_stop"),
        size(regexp_extract_all(col("text"), lit("([^a-z0-9 ])"), lit(1))).as("n_punct"))
    toks.select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      {
        val nTokens = size(col("toks")).cast("double")
        val nStop = col("n_stop").cast("double")
        round(
          lit(0.4) * least(lit(1.0), nTokens / 100.0)
            + lit(0.3) * (lit(1.0) - least(lit(1.0), try_divide(lit(10.0) * col("n_punct").cast("double"), col("n_chars"))))
            + lit(0.3) * least(lit(1.0), try_divide(lit(5.0) * nStop, nTokens)),
          6).as("quality")
      }, {
        val dt = array_distinct(col("toks"))
        def score(ws: Seq[String]) = size(array_intersect(dt, array(ws.map(lit): _*)))
        val (sEn, sEs, sFr, sDe) = (score(StopEn), score(StopEs), score(StopFr), score(StopDe))
        when(sEn >= sEs && sEn >= sFr && sEn >= sDe && sEn > 0, "en")
          .when(sEs >= sFr && sEs >= sDe && sEs > 0, "es")
          .when(sFr >= sDe && sFr > 0, "fr")
          .when(sDe > 0, "de")
          .otherwise("und").as("pred_lang")
      })
  }

  /** Memoized gate scores for the corpus at `dir` — shared by
    * pipeline_curate and pipeline_train_mix (one scan + regex pass,
    * many consumers; the signature-table pattern of SURVEY §4). */
  private[operators] def scoredDocs(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Memo.persisted(spark, s"curate.scored|$dir") {
      gates(graft.sources.Tables.parallel(spark, graft.sources.Tables.documents(spark, dir)))
    }

  def pipelineCurate(spark: SparkSession, dir: String): DataFrame = {
    val scored = scoredDocs(spark, dir)
    val dupLater = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    scored
      .where(col("quality") >= 0.5 && col("pred_lang") === "en")
      .join(dupLater, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality"), col("pred_lang"))
      .orderBy("doc_id")
  }

  /** `pipeline_sample` — deterministic hash-stratified sampling: the
    * standard rebalance step of a training mix (downsample the
    * dominant language, keep the rest). Selection is a pure hash
    * gate — keep iff h62("sample|" + doc_id) mod 1000 < rate(lang) —
    * so the sample is reproducible run-to-run, independent of
    * partitioning and row order, needs NO driver-side RNG state, and
    * is exactly restatable in SQL (seeded `sample()` clauses never
    * agree across engines; a salted hash always does). At 100 TB this
    * is a map-only filter fused into the scan — no shuffle at all
    * before the output sort. */
  /** `pipeline_curate_cc` — curation with the CLUSTER-ACCURATE dedup
    * drop: among gate-passing docs, keep exactly one representative
    * (the min doc_id) per connected near-dup component
    * ([[Dedup.dedupComponents]]). The pair-based drop of
    * [[pipelineCurate]] keeps a doc iff it is never the LARGER side of
    * a pair — on a chain-shaped cluster a–b, b–c that keeps only a,
    * but on b–c, c–d (b smallest in all its pairs, yet not alone) both
    * rules agree only by luck; components make "one survivor per
    * cluster" exact. Shape: the memoized component LABEL table joins
    * the gated docs (broadcast-size), then keep-one-per-cluster is a
    * keyed window MIN (doc survives iff it is its cluster's smallest
    * id) — one window shuffle, no groupBy + semi-join diamond that
    * would recompute the joined relation on both sides. */
  def pipelineCurateCc(spark: SparkSession, dir: String): DataFrame = {
    val scored = scoredDocs(spark, dir)
      .where(col("quality") >= 0.5 && col("pred_lang") === "en")
    val labels = Dedup.componentLabels(spark, dir)
    scored.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("rep_id"), col("doc_id")))
      .withColumn("keep_id",
        min(col("doc_id")).over(Window.partitionBy(col("cluster"))))
      .where(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("quality"), col("pred_lang"))
      .orderBy("doc_id")
  }

  /** (doc_id, pred_lang) for the corpus — the language projection
    * shared by the sampling/mixing operators (identical arithmetic to
    * textLangid, so composed oracles chain the langid CTEs). */
  private def langedDocs(spark: SparkSession, dir: String): DataFrame = {
    import TextAnalysis._
    graft.sources.Tables.parallel(
        spark, graft.sources.Tables.documents(spark, dir))
      .select(col("doc_id"), array_distinct(tokens(col("text"))).as("dt"))
      .select(
        col("doc_id"), {
          def score(ws: Seq[String]) = size(array_intersect(col("dt"), array(ws.map(lit): _*)))
          val (sEn, sEs, sFr, sDe) = (score(StopEn), score(StopEs), score(StopFr), score(StopDe))
          when(sEn >= sEs && sEn >= sFr && sEn >= sDe && sEn > 0, "en")
            .when(sEs >= sFr && sEs >= sDe && sEs > 0, "es")
            .when(sFr >= sDe && sFr > 0, "fr")
            .when(sDe > 0, "de")
            .otherwise("und").as("pred_lang")
        })
  }

  def pipelineSample(spark: SparkSession, dir: String): DataFrame =
    langedDocs(spark, dir)
      .withColumn("gate", graft.functions.HashFunctions.h62(
        concat(lit("sample|"), col("doc_id").cast("string"))) % 1000)
      .where(col("gate") < when(col("pred_lang") === "en", 250).otherwise(1000))
      .select("doc_id", "pred_lang")
      .orderBy("doc_id")

  /** `pipeline_split` — deterministic train/val/test assignment (the
    * holdout carve every training pipeline needs BEFORE any model
    * sees the corpus): the same salted h62 hash gate as the samplers
    * buckets each doc into 1000 slots — 900 train / 50 val / 50 test —
    * so membership is reproducible, partition/order-independent,
    * stable under corpus growth (a doc's split never changes when
    * neighbors arrive), and disjoint by construction. Map-only until
    * the per-split rollup; report = per-split doc count + mean quality
    * (drift in per-split quality reveals a biased hash or leak). */
  def pipelineSplit(spark: SparkSession, dir: String): DataFrame =
    gates(graft.sources.Tables.parallel(spark, graft.sources.Tables.documents(spark, dir)))
      .withColumn("slot", graft.functions.HashFunctions.h62(
        concat(lit("split|"), col("doc_id").cast("string"))) % 1000)
      .withColumn("split",
        when(col("slot") < 900, "train").when(col("slot") < 950, "val").otherwise("test"))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        // decimal-summed mean (§3): float avg is partition-order
        // dependent, decimal addition is associative
        round(sum(col("quality").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_quality"))
      .orderBy("split")

  /** `pipeline_token_budget` — token-budgeted corpus selection: keep
    * the highest-quality documents whose cumulative token count fits
    * the training budget (the compute-bound "how much of the corpus
    * do we afford" cut every pretraining run makes after curation).
    * Semantics: documents ordered by (quality DESC, doc_id) are taken
    * while the running token sum stays ≤ budget — exactly a global
    * running-sum window.
    *
    * Scale shape: the global window is NOT run over the corpus (a
    * single-partition sort of every document — the one shape that
    * cannot survive 100 TB). Quality is 6-dp rounded, so bucketing by
    * `round(quality·10⁶)` is exact and the histogram is BOUNDED at
    * ≤ 10⁶+1 rows however large the corpus grows: the running sum
    * runs over that bounded histogram, whole buckets above the
    * boundary join back map-side (keyed join on the bucket id), and
    * only the single boundary bucket — documents tied at one exact
    * quality value — pays a per-document prefix sum. Corpus-side
    * work is one map-side-combinable aggregate plus one keyed join;
    * nothing corpus-sized is ever globally sorted. */
  def pipelineTokenBudget(spark: SparkSession, dir: String,
      budget: Long = 25000L): DataFrame = {
    val d = scoredDocs(spark, dir)
      .where(col("quality").isNotNull)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
      .withColumn("qb", round(col("quality") * 1e6, 0).cast("long"))
    val hist = d.groupBy("qb").agg(sum(col("n_tokens")).as("btok"))
    // bounded relation (≤ 10⁶+1 rows), prefix-summed SHARD-PARALLEL:
    // no stage ever pulls the histogram through one task (r11 —
    // BoundedHist replaced the last unpartitioned window here)
    val cum = BoundedHist.cumSum(hist, Nil, "qb", "btok", "cum", descending = true)
      .withColumn("prev", col("cum") - col("btok"))
    // the histogram caps at ~10⁶ rows (~tens of MB) — above the default
    // autoBroadcast threshold at full width, so say broadcast explicitly:
    // without it this becomes the corpus-wide shuffle the operator exists
    // to avoid
    val joined = d.join(broadcast(cum), Seq("qb"))
    val full = joined.where(col("cum") <= budget)
    // ≤ one boundary bucket: per-doc prefix sum within that bucket only
    val wB = Window.partitionBy("qb").orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined
      .where(col("prev") < budget && col("cum") > budget)
      .withColumn("c2", sum(col("n_tokens")).over(wB))
      .where(col("prev") + col("c2") <= budget)
    full.select("doc_id", "quality", "n_tokens")
      .unionByName(boundary.select("doc_id", "quality", "n_tokens"))
      .orderBy("doc_id")
  }

  /** `pipeline_domain_cap` — per-source document cap by quality rank
    * (domain balancing: no single crawl domain may contribute more
    * than `cap` documents, and each domain sends its BEST ones — the
    * anti-domination rule every web-scale mix applies before
    * temperature mixing). Semantics: within each source, documents
    * ranked by (quality DESC, doc_id) keep ranks 1..cap — exactly a
    * per-source row_number window.
    *
    * Scale shape: the rank window is NOT run over the corpus (a
    * skewed source would sort its whole partition — the hot-domain
    * case is precisely where the cap matters most). As in
    * [[pipelineTokenBudget]], 6-dp quality makes `round(q·10⁶)`
    * bucketing exact, so the per-(source, bucket) COUNT histogram is
    * bounded at |sources|·10⁶ rows regardless of corpus size; the
    * running count runs over that bounded relation, whole buckets
    * above the boundary keep by a broadcast keyed join, and only each
    * source's single boundary bucket — its docs tied at one exact
    * quality — pays a per-doc rank. Corpus-side: one map-side
    * combinable count agg + one broadcast join; the giant domain
    * never gets sorted. */
  def pipelineDomainCap(spark: SparkSession, dir: String,
      cap: Int = 20): DataFrame = {
    val src = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val d = scoredDocs(spark, dir)
      .where(col("quality").isNotNull)
      .select(col("doc_id"), col("quality"))
      .join(src, Seq("doc_id"))
      .withColumn("qb", round(col("quality") * 1e6, 0).cast("long"))
    val hist = d.groupBy("source", "qb").agg(count(lit(1)).as("bn"))
    // bounded histogram: the only window whose partition is a whole source
    val wS = Window.partitionBy("source").orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("bn")).over(wS))
      .withColumn("prev", col("cum") - col("bn"))
    val joined = d.join(broadcast(cum), Seq("source", "qb"))
    val full = joined.where(col("cum") <= cap)
    // per-doc rank only inside each source's boundary bucket
    val wB = Window.partitionBy("source", "qb").orderBy(col("doc_id"))
    val boundary = joined
      .where(col("prev") < cap && col("cum") > cap)
      .withColumn("rk", row_number().over(wB))
      .where(col("prev") + col("rk") <= cap)
    full.select("doc_id", "source", "quality")
      .unionByName(boundary.select("doc_id", "source", "quality"))
      .orderBy("doc_id")
  }

  /** `pipeline_perplexity_filter` — perplexity-band curation (the
    * CCNet middle-keep: drop the lowest-scoring tail — boilerplate,
    * all high-frequency tokens — and the highest tail — lexical
    * noise — of the corpus-LM score, keep the middle band). Thresholds
    * are the P10/P90 of [[TextAnalysis.unigramScored]]'s `mean_nll`,
    * computed at 0.01-nll bucket granularity: a doc is kept iff its
    * score bucket lies strictly above the P10 bucket and at or below
    * the P90 bucket.
    *
    * Scale shape: the percentile is NOT a corpus-wide sort or a
    * per-doc rank window. `floor(mean_nll·100)` buckets are BOUNDED by
    * the score's range (mean_nll ≤ log2(corpus tokens) < 64 ⇒ ≤ ~6 400
    * buckets however large the corpus), the cumulative count runs over
    * that bounded histogram, and the two 1-row thresholds broadcast
    * back into a map-only filter. Bucketed thresholds trade ≤ 0.01 nll
    * of threshold precision for a plan with no corpus-sized sort —
    * and stay deterministic and engine-exact (IEEE doubles both
    * sides), unlike sampled approx-percentiles which no oracle can
    * restate. */
  def pipelinePerplexityFilter(spark: SparkSession, dir: String,
      pLo: Double = 0.10, pHi: Double = 0.90): DataFrame = {
    val s = TextAnalysis.unigramScored(spark, dir)
      .withColumn("cb", floor(col("mean_nll") * 100).cast("long"))
    val hist = s.groupBy("cb").agg(count(lit(1)).as("c"))
    // bounded relation (≤ ~6 400 rows), prefix-summed shard-parallel
    // through the same [[BoundedHist]] rollup as the token budget
    val cum = BoundedHist.cumSum(hist, Nil, "cb", "c", "cum", descending = false)
    val n = s.agg(count(lit(1)).as("n"))
    val withN = cum.crossJoin(broadcast(n))
    val lo = withN.where(col("cum") >= col("n") * pLo).agg(min(col("cb")).as("lo"))
    val hi = withN.where(col("cum") >= col("n") * pHi).agg(min(col("cb")).as("hi"))
    s.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .where(col("cb") > col("lo") && col("cb") <= col("hi"))
      .select(col("doc_id"), col("n_tokens"), col("mean_nll"))
      .orderBy("doc_id")
  }

  /** `pipeline_mix_temperature` — temperature-based mixture
    * rebalancing (the multilingual-corpus sampling rule of the GPT-3/
    * PaLM data recipes): with language share s_l, the target mix is
    * ∝ s_l^(1/T), realized downsample-only with keep probability
    * keep_l = (s_min / s_l)^(1 − 1/T) — the rarest language keeps
    * everything, dominant languages shed mass, and the kept corpus's
    * language proportions are exactly the temperature mix. T = 1 is a
    * no-op, T → ∞ approaches a uniform mix.
    *
    * Selection is the same deterministic hash gate as
    * [[pipelineSample]] (keep iff h62("mix|"+doc_id) mod 10⁶ < the
    * micro-threshold), so the sample is reproducible, partition/
    * order-independent, and exactly SQL-restatable. Scale shape: one
    * language-count aggregate (map-side combined, |langs| rows
    * broadcast back) and a map-only filter fused into the scan. */
  def pipelineMixTemperature(spark: SparkSession, dir: String,
      temperature: Double = 2.0): DataFrame = {
    val langed = langedDocs(spark, dir)
    val counts = langed.groupBy("pred_lang").agg(count(lit(1)).as("c"))
    val minC = counts.agg(min(col("c")).as("cmin"))
    val thresholds = counts.crossJoin(broadcast(minC))
      .select(
        col("pred_lang"),
        round(pow(col("cmin").cast("double") / col("c").cast("double"),
          1.0 - 1.0 / temperature) * 1000000.0, 0).cast("long").as("kth"))
    langed.join(broadcast(thresholds), "pred_lang")
      .where(graft.functions.HashFunctions.h62(
        concat(lit("mix|"), col("doc_id").cast("string"))) % 1000000 < col("kth"))
      .select("doc_id", "pred_lang")
      .orderBy("doc_id")
  }

  /** `pipeline_train_mix` — the full training-data flow as ONE
    * declarative plan: quality gate → language gate → near-dup drop
    * ([[pipelineCurate]]) → 25% hash-stratified sample
    * ([[pipelineSample]]'s gate) → sequence packing occupancy
    * ([[pipelinePack]]'s block-local windows). What actually runs
    * before a pretraining job; every stage reuses the exact arithmetic
    * of its standalone query, so the oracle is the standalone oracles
    * chained as CTEs. Catalyst fuses the gates into the scan side and
    * the only shuffles are the dedup pipeline's keyed ones, the
    * sample-join, and one block-partitioned window. */
  def pipelineTrainMix(spark: SparkSession, dir: String,
      ctxTokens: Int = 4096, blockDocs: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sampled = pipelineCurate(spark, dir)
      .where(graft.functions.HashFunctions.h62(
        concat(lit("sample|"), col("doc_id").cast("string"))) % 1000 < 250)
      .select("doc_id")
    val toks = graft.sources.Tables.parallel(
        spark, graft.sources.Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        regexp_count(lower(col("text")), lit(TextAnalysis.TokenPattern)).as("n_tok"))
      .join(sampled, "doc_id")
      .withColumn("blk", floor(col("doc_id") / blockDocs))
    toks
      .withColumn("cum",
        sum(col("n_tok")).over(
          Window.partitionBy("blk").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("win", floor((col("cum") - col("n_tok")) / lit(ctxTokens.toDouble)))
      .groupBy("blk", "win")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .orderBy("blk", "win")
  }

  /** `pipeline_pack` — sequence packing for pretraining batches:
    * documents are concatenated in doc_id order and chunked into
    * fixed token windows (the GPT-style concat-then-chunk pipeline);
    * a doc belongs to the window its first token lands in. Output is
    * per-window occupancy (doc count + token sum).
    *
    * Scale shape: packing is inherently sequential, so a single
    * global cumulative sum would serialize the corpus through one
    * window partition — the classic 100 TB killer. Instead docs pack
    * within fixed BLOCKS of 1000 ids: each block's running sum is an
    * independent window partition (parallel, bounded), and window ids
    * are (block, window-within-block). Cost: at most one partially
    * filled window per block — the standard bounded-waste trade of
    * distributed packing. */
  def pipelinePack(spark: SparkSession, dir: String,
      ctxTokens: Int = 4096, blockDocs: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = graft.sources.Tables.parallel(
        spark, graft.sources.Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        regexp_count(lower(col("text")), lit(TextAnalysis.TokenPattern)).as("n_tok"))
      .withColumn("blk", floor(col("doc_id") / blockDocs))
    val cum = t.withColumn("cum",
      sum(col("n_tok")).over(
        Window.partitionBy("blk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .withColumn("win", floor((col("cum") - col("n_tok")) / lit(ctxTokens.toDouble)))
      .groupBy("blk", "win")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .orderBy("blk", "win")
  }

  /** `pipeline_shuffle` — deterministic GLOBAL SHUFFLE of the corpus
    * (the last step before training: batches must sample the mixture,
    * not replay crawl order, and the permutation must be reproducible
    * so a resumed run reads the same sequence). Shuffle key =
    * salted h62 of the doc id — stable, order-free, restatable in SQL.
    *
    * Scale shape: the global position is NOT a corpus-wide
    * `row_number` (a single-partition sort — the one shape that
    * cannot survive 100 TB). The hash's TOP bits range-shard the key
    * space (top-6 → 64 shards here; more bits at larger scale — the
    * constant, not the shape): shard order IS key order, so
    * position = shard offset + rank-within-shard, where ranks come
    * from 64 independent bounded window partitions and offsets from a
    * 64-row rollup. Equals the global ordering exactly — the spec
    * pins it against the one-window restatement, and positions are a
    * permutation of 1..n by construction. */
  def pipelineShuffle(spark: SparkSession, dir: String): DataFrame =
    saltedPermutation(spark, dir, "shuffle|").orderBy("pos")

  /** The range-sharded position assignment under one salt — shared by
    * the single shuffle and the per-epoch schedules. */
  private def saltedPermutation(spark: SparkSession, dir: String, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = graft.sources.Tables.parallel(
        spark, graft.sources.Tables.documents(spark, dir))
      .select(col("doc_id"))
      .withColumn("k", graft.functions.HashFunctions.h62(
        concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("shard", shiftrightunsigned(col("k"), 56))
    val within = keyed.withColumn("r", row_number().over(
      Window.partitionBy("shard").orderBy(col("k"), col("doc_id"))))
    // 64-row shard histogram → exclusive prefix offsets (bounded
    // single-partition window over shard COUNTS, never over rows)
    val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "off")
    within.join(broadcast(offsets), "shard")
      .select((col("off") + col("r")).as("pos"), col("doc_id"))
  }

  /** `pipeline_epochs` — MULTI-EPOCH training schedules: epoch e's
    * permutation derives from its own salt (`epoch<e>|`), so every
    * epoch reads the corpus in a DIFFERENT order (the regularization
    * multi-epoch training needs) while each order stays individually
    * reproducible for resume — a restart mid-epoch re-derives exactly
    * the sequence it was reading. Same range-sharded assignment as
    * [[pipelineShuffle]]: no corpus-wide window, per-epoch cost is
    * one bounded-window pass, epochs are independent (at scale:
    * schedule epochs lazily, never materialize all of them). */
  def pipelineEpochs(spark: SparkSession, dir: String, epochs: Int = 2): DataFrame =
    (0 until epochs).map(e =>
      saltedPermutation(spark, dir, s"epoch$e|")
        .select(lit(e).as("epoch"), col("pos"), col("doc_id")))
      .reduce(_.unionByName(_))
      .orderBy("epoch", "pos")
}

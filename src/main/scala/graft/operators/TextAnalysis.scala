package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions
import graft.sources.Tables

/** Text-analysis operators over the `documents` table: language ID,
  * quality scoring, token counting, fingerprinting.
  *
  * Everything is a declarative column expression (regex extraction +
  * array higher-order functions) — no UDFs, no shuffle except the
  * final presentation sort. At 100 TB these are pure map-side per-row
  * CPU; throughput scales linearly with executors and the parquet scan
  * prunes to (doc_id, text) only.
  *
  * Cross-engine determinism (SURVEY.md §3): token/shingle definitions
  * are shared with the DuckDB oracles verbatim; all ratios are doubles
  * computed from exact integer counts with identical expression trees,
  * then round(…, 6).
  */
object TextAnalysis {

  /** Tokenizer shared by every text operator AND every oracle:
    * lowercase, extract runs of [a-z0-9]. */
  val TokenPattern = "([a-z0-9]+)"

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(1))

  /** Distinct n-token shingles ("w1 w2 w3") of a token array, as the
    * native [[graft.functions.Shingles]] expression (the interpreted
    * HOF chain dominated dedup runtime). Empty for fewer than n
    * tokens. DuckDB twin: `[array_to_string(t[i:i+n-1], ' ') for i in
    * range(1, len(t)-n+2)]` (list_distinct'ed). */
  def shingles(toks: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.functions.Shingles(org.apache.spark.sql.GraftShim.expression(toks), n))

  /** Normalized text: tokens re-joined with single spaces — the
    * canonical form used by exact dedup and fingerprinting. */
  def normText(text: Column): Column = array_join(tokens(text), " ")

  // Stopword lists for rule-based language ID. Deliberately tiny and
  // hard-coded: the scoring must be a closed deterministic function so
  // the DuckDB oracle can restate it exactly.
  val StopEn = Seq("the", "and", "of", "to", "a", "in", "is", "you", "that", "it")
  val StopEs = Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no")
  val StopFr = Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une")
  val StopDe = Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich")

  private def stopLit(words: Seq[String]): Column = array(words.map(lit): _*)

  /** Regex matching one whole token equal to an EN stopword: the
    * lookarounds pin both token boundaries (tokens are maximal
    * [a-z0-9]+ runs), so `regexp_count` over the raw text equals
    * `len(list_filter(toks, in set))` — without materializing the
    * token array or running an interpreted HOF lambda (`filter`/
    * `aggregate`/`transform` are CodegenFallback; regex expressions
    * code-generate). Alternation order is safe under backtracking. */
  val StopEnPattern: String = "(?<![a-z0-9])(?:" + StopEn.mkString("|") + ")(?![a-z0-9])"

  /** Count of EN-stopword tokens, computed codegen-side from text. */
  def stopCount(text: Column): Column = regexp_count(lower(text), lit(StopEnPattern))

  /** Distinct-stopword-hit score for one language. */
  private def langScore(toks: Column, words: Seq[String]): Column =
    size(array_intersect(array_distinct(toks), stopLit(words)))

  /** `text_langid` — rule-based language ID: score = number of
    * DISTINCT stopwords of each language present; argmax with fixed
    * priority en > es > fr > de on ties; 'und' when all zero. */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        langScore(col("toks"), StopEn).as("s_en"),
        langScore(col("toks"), StopEs).as("s_es"),
        langScore(col("toks"), StopFr).as("s_fr"),
        langScore(col("toks"), StopDe).as("s_de"))
    t.withColumn(
        "pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr")
          && col("s_en") >= col("s_de") && col("s_en") > 0, "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de")
            && col("s_es") > 0, "es")
          .when(col("s_fr") >= col("s_de") && col("s_fr") > 0, "fr")
          .when(col("s_de") > 0, "de")
          .otherwise("und"))
      .orderBy("doc_id")
  }

  /** `text_quality` — length / punctuation / stopword / token-shape
    * heuristics plus a composite score, all from exact integer counts.
    *
    * Every count is a regex expression over the raw text — no token
    * array is materialized and no higher-order lambda runs (HOFs are
    * CodegenFallback; these stay inside whole-stage codegen):
    * `n_tokens` counts token runs, `n_stop` counts whole-token
    * stopword matches ([[StopEnPattern]]), and `tok_chars` (sum of
    * token lengths) is the length of the text with every non-token
    * char removed. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val punctPattern = "([^a-z0-9 ])"
    val d = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(regexp_extract_all(col("text"), lit(punctPattern), lit(1))).as("n_punct"),
        regexp_count(lower(col("text")), lit(TokenPattern)).as("n_tokens"),
        stopCount(col("text")).as("n_stop"),
        length(regexp_replace(lower(col("text")), lit("[^a-z0-9]"), lit(""))).as("tok_chars"))
    d.select(
        col("doc_id"), col("n_chars"), col("n_tokens"),
        round(try_divide(col("n_punct").cast("double"), col("n_chars")), 6).as("punct_ratio"),
        round(try_divide(col("n_stop").cast("double"), col("n_tokens")), 6).as("stop_ratio"),
        round(try_divide(col("tok_chars").cast("double"), col("n_tokens")), 6).as("mean_tok_len"),
        round(
          lit(0.4) * least(lit(1.0), col("n_tokens").cast("double") / 100.0)
            + lit(0.3) * (lit(1.0) - least(lit(1.0), try_divide(lit(10.0) * col("n_punct").cast("double"), col("n_chars"))))
            + lit(0.3) * least(lit(1.0), try_divide(lit(5.0) * col("n_stop").cast("double"), col("n_tokens"))),
          6).as("quality"))
      .orderBy("doc_id")
  }

  /** `text_tokens` — token counts under three tokenizers: whitespace,
    * word/[a-z0-9]-run, and a BPE-ish regex (letter runs, single
    * digits, single punctuation marks). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        octet_length(col("text")).as("n_bytes"),
        size(regexp_extract_all(col("text"), lit("(\\S+)"), lit(1))).as("ws_tokens"),
        size(tokens(col("text"))).as("word_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("([a-z]+|[0-9]|[^a-z0-9\\s])"), lit(1)))
          .as("bpe_tokens"))
      .orderBy("doc_id")

  /** `text_top_ngrams` — corpus vocabulary analysis: the 50 most
    * document-frequent 3-shingles. Shuffle carries (shingle, 1) pairs
    * with map-side combine; the top-k is a TakeOrdered, not a full
    * sort. The everyday corpus-inspection query of a training-data
    * pipeline (boilerplate detection, contamination screening). */
  def textTopNgrams(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.parallel(spark, Tables.documents(spark, dir))
      .select(explode(shingles(tokens(col("text")))).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("shingle"))
      .limit(k)

  /** `text_fingerprint` — md5 + 62-bit hash of the normalized text,
    * plus the distinct 3-shingle count (the dedup signature inputs). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), normText(col("text")).as("nt"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        md5(col("nt")).as("fp_md5"),
        HashFunctions.h62(col("nt")).as("fp_h62"),
        size(shingles(col("toks"))).as("n_shingles"))
      .orderBy("doc_id")

  /** `text_unigram_logprob` — corpus-LM quality proxy (the CCNet-style
    * language-model filter restated as a unigram model): score each
    * document by the mean negative log2-probability of its tokens
    * under the corpus's own unigram distribution. Boilerplate-heavy
    * docs (all high-frequency tokens) score LOW, lexically unusual
    * docs score HIGH — the standard perplexity-bucketing signal for
    * training-mix curation.
    *
    * Scale shape: the frequency table is vocabulary-sized (Zipf —
    * optimizer broadcasts it when small; a keyed equi-join on the
    * token otherwise), both aggregations map-side combine, and the
    * grand total rides a 1-row broadcast cross join. No window, no
    * driver loop. */
  def textUnigramLogprob(spark: SparkSession, dir: String): DataFrame =
    unigramScored(spark, dir).orderBy("doc_id")

  /** `text_tfidf_keywords` — per-document TOP-5 KEYWORDS by TF·IDF
    * (the summarization/labeling readout: which tokens characterize
    * THIS doc against the corpus): tf = in-doc occurrences, idf =
    * log2(N / df) over document frequency, score rounded 6 dp, ties
    * to the lexicographically smaller token. Scale shape: document
    * frequency is one distinct-explode + combined count (vocab-sized
    * relation, broadcast back), per-doc tf is map-side, and the only
    * window partitions by doc_id over each doc's DISTINCT tokens — a
    * bounded partition (≤ doc length) whatever the corpus size, the
    * benign window class (unlike a corpus- or segment-wide rank).
    * log2 over exact integer ratios matches DuckDB bit-for-bit — the
    * unigram_logprob precedent. */
  def textTfidfKeywords(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = Tables.parallel(spark, Tables.documents(spark, dir))
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        round(col("tf").cast("double")
          * log2(col("n_docs").cast("double") / col("df").cast("double")), 6).as("score"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))))
      .where(col("rnk") <= k)
      .select("doc_id", "rnk", "tok", "score")
      .orderBy("doc_id", "rnk")
  }

  /** (doc_id, n_tokens, mean_nll) for every document, un-ordered — the
    * shared core of [[textUnigramLogprob]] and the perplexity-band
    * curation gate ([[Curate.pipelinePerplexityFilter]]). Memo'd: the
    * perplexity filter references this relation three times in one
    * plan (histogram, count, final filter) and Catalyst does not share
    * common subplans across joins — without persistence the corpus
    * would be tokenized and frequency-joined three times. */
  private[operators] def unigramScored(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Memo.persisted(spark, s"text.unigramScored|$dir") {
      unigramScoredPlan(spark, dir)
    }

  private def unigramScoredPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = freq.agg(sum(col("tf")).as("tt"))
    val scored = toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log2(col("tf").cast("double") / col("tt").cast("double"))), 6)
          .as("mean_nll"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("mean_nll"), lit(0.0)).as("mean_nll"))
  }

  // PII patterns shared verbatim with the DuckDB oracle. Conservative
  // regex subset: no lookarounds (RE2 has none), no backreferences, so
  // Java regex (Spark, backtracking leftmost-first) and RE2 (DuckDB,
  // leftmost-first for non-POSIX) match the same spans.
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** `text_pii` — PII scrubbing (the redaction pass every pretraining
    * pipeline runs before anything else): detect and mask emails,
    * phone numbers, and IPv4 addresses; report per-doc counts and the
    * fingerprint of the redacted text.
    *
    * The synthetic corpus contains no PII, so the driver query weaves
    * a deterministic PII suffix (email / phone / IP derived from
    * doc_id) into each document first — the redaction genuinely fires
    * on every row and the md5 of the redacted text is oracle-compared,
    * proving the regex semantics match across engines rather than
    * hashing an untouched string. Redaction order is fixed
    * email → IPv4 → phone (the patterns are mutually exclusive on any
    * one span: '@' vs dots vs dashes).
    *
    * Scale shape: pure map-side regex codegen over (doc_id, text) —
    * no shuffle before the output sort, linear in bytes scanned. */
  def textPii(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or call "),
          (col("doc_id") % 900 + 100).cast("string"),
          lit("-555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(" from "),
          (col("doc_id") % 223 + 1).cast("string"), lit("."),
          (col("doc_id") % 256).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"), lit("."),
          (col("doc_id") % 100 + 1).cast("string")).as("pii_text"))
    d.select(
        col("doc_id") +: piiCounts(col("pii_text")) :+
          md5(redactPii(col("pii_text"))).as("red_md5"): _*)
      .orderBy("doc_id")
  }

  /** `text_rep_ngrams` — within-document repetition scoring (the
    * Gopher "fraction of duplicate n-grams" quality filter): a doc
    * whose 3-grams are mostly repeats of each other is boilerplate /
    * spam, even when the doc as a whole is corpus-unique. Entirely
    * map-only — the native distinct-[[shingles]] expression and the
    * token count come from ONE projection per row, no explode, no
    * shuffle before the output sort. The complement of [[graft
    * .operators.Dedup.dedupSpans]]: that catches repetition ACROSS
    * docs, this catches it INSIDE one. */
  def textRepNgrams(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        greatest(size(col("toks")) - 2, lit(0)).cast("long").as("n_ngrams"),
        size(shingles(col("toks"))).cast("long").as("n_distinct"))
      .where(col("n_ngrams") > 0)
      .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 6)
          .as("rep_ratio"))
      .orderBy("doc_id")

  /** `text_chunk` — overlapping-window document chunking, the
    * retrieval/RAG prep step (and the context-window packer's
    * upstream): each document becomes fixed `window`-token chunks
    * advancing by `stride` tokens (`window - stride` tokens of
    * overlap), so a fact straddling a boundary appears whole in the
    * next chunk. A chunk exists only if it CONTRIBUTES tokens beyond
    * the previous chunk's end — chunk count = 1 + ⌈max(0, n−W)/S⌉,
    * in integer arithmetic so both engines agree exactly; the final
    * chunk may be short (`n_chunk_tokens = min(W, n − no·S)`).
    *
    * Output is one row per chunk: (doc_id, chunk_no, n_chunk_tokens,
    * chunk_md5) — the md5 of the space-joined token window pins the
    * exact chunk text cross-engine without shipping the text itself.
    *
    * Scale shape: pure map-side `sequence` + `posexplode` + `slice` +
    * `array_join` (the same straight-line codegen family as
    * [[graft.operators.Dedup.dedupSpans]] segmentation) — ZERO
    * shuffles before the output sort; at 100 TB this is one scan,
    * linear in bytes, embarrassingly parallel. Reference analog: the
    * reference's document feed is consumed whole
    * (spark_jobs/mongo_to_iceberg.py:64); chunking is the step a
    * retrieval deployment of the same corpus inserts before
    * embedding. */
  def textChunk(spark: SparkSession, dir: String,
      window: Int = 16, stride: Int = 12): DataFrame = {
    require(stride > 0 && window >= stride,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val n = size(col("ts")).cast("long")
    // 1 + ceil(max(0, n - W) / S). Column./ is double division in
    // Spark; floor() of it is still exact here (token counts are
    // far below 2^53) and DuckDB's `//` computes the same value.
    val nChunks = lit(1L) +
      floor((greatest(n - window, lit(0L)) + (stride - 1)) / stride).cast("long")
    Tables.parallel(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"), n.as("n"),
        posexplode(sequence(lit(0L), nChunks - 1)))
      .select(col("doc_id"), col("col").as("chunk_no"),
        least(lit(window.toLong), col("n") - col("col") * stride)
          .as("n_chunk_tokens"),
        md5(array_join(
          slice(col("ts"), (col("col") * stride + 1).cast("int"), lit(window)), " "))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_no")
  }

  /** `text_collocations` — corpus collocation mining by document-
    * frequency LIFT: bigrams that co-occur in far more documents than
    * their parts' document frequencies predict (lift =
    * df(ab)·N / (df(a)·df(b))) are multiword expressions / named
    * entities / boilerplate phrases — the vocabulary readout that
    * feeds tokenizer merges and template detection. Document
    * frequency (distinct per doc) rather than raw occurrence counts:
    * robust to within-doc repetition (the [[textRepNgrams]] failure
    * mode) and expressible with the native distinct-[[shingles]]
    * expression — no interpreted HOF in the per-row path. Lift stays
    * hash-exact cross-engine: one multiply chain over exact integer
    * counts, rounded at 6 dp (ratios-from-exact-counts, §3); top-k
    * ordered (lift DESC, bigram) with a `min_df` support floor.
    *
    * Scale shape: two map-side-combinable count shuffles (distinct
    * bigrams, distinct tokens per doc), then joins keyed on the
    * vocab-bounded count relations, TakeOrdered tail — nothing
    * corpus-sized is sorted or broadcast. */
  def textCollocations(spark: SparkSession, dir: String,
      minDf: Int = 5, k: Int = 50): DataFrame = {
    val docs = Tables.parallel(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val bigrams = docs
      .select(explode(shingles(col("ts"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("df_ab"))
      .where(col("df_ab") >= minDf)
    val unigrams = docs
      .select(explode(array_distinct(col("ts"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("df_w"))
    bigrams
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(unigrams.select(col("w").as("w1"), col("df_w").as("df_a")), "w1")
      .join(unigrams.select(col("w").as("w2"), col("df_w").as("df_b")), "w2")
      .crossJoin(broadcast(nDocs))
      .select(col("bigram"), col("df_ab"), col("df_a"), col("df_b"),
        round(col("df_ab").cast("double") * col("n_docs").cast("double")
          / (col("df_a").cast("double") * col("df_b").cast("double")), 6).as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
  }

  /** Mask every email / IPv4 / phone with a typed placeholder — the
    * fixed order [[textPii]] documents. Map-only codegen'd
    * `regexp_replace` chain, reusable on any string column. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailPattern), lit("<EMAIL>")),
        lit(Ipv4Pattern), lit("<IP>")),
      lit(PhonePattern), lit("<PHONE>"))

  /** Non-overlapping match counts per PII class, as one projection. */
  def piiCounts(c: Column): Seq[Column] = Seq(
    regexp_count(c, lit(EmailPattern)).cast("long").as("n_emails"),
    regexp_count(c, lit(PhonePattern)).cast("long").as("n_phones"),
    regexp_count(c, lit(Ipv4Pattern)).cast("long").as("n_ipv4"))
}

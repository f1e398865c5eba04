package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, SketchAgg}
import graft.sources.Tables

/** Corpus-statistics SKETCHES — bounded-state summaries a 100 TB
  * pipeline computes where exact answers would shuffle the corpus.
  *
  * The family rides [[graft.functions.KMinValues]], a native KMV
  * (k-minimum-values) distinct-count sketch over the engine's shared
  * md5-derived h62 hash. KMV beats HLL here for one reason that
  * matters in THIS repo: it is EXACTLY deterministic cross-engine
  * (the k smallest distinct hashes of a set don't depend on order or
  * partitioning), so the DuckDB oracle reproduces estimates
  * bit-for-bit and the driver's hash-compare gate applies to a
  * sketch the same as to any exact query. approx_count_distinct's
  * HLL would need a weaker rows-only check.
  */
object Sketches {

  val KmvK = 128
  /** 2^62 — the h62 hash range; double-exact (a power of two). */
  val HashRange: Double = 4611686018427387904.0

  /** `sketch_distinct_ngrams` — per-source distinct 3-gram cardinality
    * via KMV: the per-source "content diversity" readout that decides
    * mixing weights and flags template-heavy sources (a source whose
    * n-gram cardinality is far below its token volume is boilerplate).
    *
    * Estimate: exact |mins| when a source holds fewer than k distinct
    * 3-grams; (k-1)·2^62/h_k otherwise. Scale shape: per-doc distinct
    * shingles from the native expression (map-side), ONE keyed shuffle
    * whose rows are capped at k values per source per partition by the
    * aggregate's bounded partial state — the corpus never moves. */
  def sketchDistinctNgrams(spark: SparkSession, dir: String, k: Int = KmvK): DataFrame = {
    import graft.operators.TextAnalysis.{shingles, tokens}
    val grams = Tables.parallel(spark, Tables.documents(spark, dir))
      .select(col("source"), explode(shingles(tokens(col("text")))).as("g"))
      .select(col("source"), HashFunctions.h62(col("g")).as("h"))
    grams.groupBy("source")
      .agg(SketchAgg.kMin(col("h"), k).as("mins"))
      .select(
        col("source"),
        size(col("mins")).cast("long").as("n_mins"),
        when(size(col("mins")) < k, size(col("mins")).cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(HashRange) /
              element_at(col("mins"), k).cast("double"), 3))
          .as("est_distinct"))
      .orderBy("source")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, VectorFunctions}
import graft.sources.Tables
import graft.operators.TextAnalysis.{normText, shingles, tokens}

/** Deduplication operators over `documents` (text) and `embeddings`
  * (vectors): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (SURVEY.md §4): no operator ever enumerates O(n²)
  * pairs. Candidate generation is always an equi-join on a derived
  * key — normalized-text hash (exact), shingle hash posting lists
  * (Jaccard), LSH band buckets (MinHash), 12-bit Hamming bands
  * (SimHash), label blocks (embedding) — so shuffle volume is
  * O(rows × keys-per-row), and every join is a plain shuffled
  * hash-join Catalyst/AQE can re-plan for skew. Signatures are
  * computed with higher-order functions inside whole-stage codegen
  * (map-side, no explode for the signature itself).
  *
  * All hashes are [[graft.functions.Md5Lower64]]-derived (h62), so the
  * DuckDB oracles restate the exact same pipeline value-for-value.
  */
object Dedup {

  /** Distinct 3-shingle sets per doc, with set size — the base relation
    * for Jaccard and MinHash dedup. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(tokens(col("text"))).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("n_sh", size(col("sh")))

  /** `dedup_exact` — canonical-id assignment by normalized-text md5.
    * One shuffle on the 128-bit group hash; min(doc_id) per group is
    * the canonical survivor. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("gh"))
    d.withColumn("canonical_id", min("doc_id").over(Window.partitionBy("gh")))
      .select(
        col("doc_id"),
        col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
  }

  /** `dedup_ngram_jaccard` — all pairs with 3-shingle Jaccard ≥ 0.5,
    * found via an inverted index on the 62-bit shingle hash: postings
    * self-join counts the intersection per pair directly, so work is
    * bounded by posting-list sizes, never by n². */
  def dedupNgramJaccard(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val s = shingleSets(spark, dir)
    val postings = s.select(
      col("doc_id"),
      explode(col("sh")).as("g0")).select(col("doc_id"), HashFunctions.h62(col("g0")).as("g"))
    val common = postings.as("a")
      .join(postings.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(s.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .where(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val MinhashSeeds = 16
  val MinhashBands = 4 // 4 bands × 4 rows

  /** Per-doc MinHash signature (16 seeded h62 minima) and LSH band
    * keys — computed entirely with HOFs in one codegen'd projection:
    * zero shuffle until the band-bucket join. */
  private def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val rows = MinhashSeeds / MinhashBands
    val sig = shingleSets(spark, dir).withColumn(
      "sig",
      transform(
        sequence(lit(0), lit(MinhashSeeds - 1)),
        i => array_min(transform(col("sh"), sh => HashFunctions.h62Seeded(i, sh)))))
    sig.select(
      col("doc_id"), col("sh"), col("n_sh"),
      posexplode(transform(
        sequence(lit(0), lit(MinhashBands - 1)),
        b => md5(array_join(
          transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string")),
          ",")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bkey")
  }

  /** `dedup_minhash_lsh` — banded-LSH candidate pairs, verified with
    * exact Jaccard ≥ 0.5. The band join shuffles O(n · bands) rows; the
    * exact check runs per-candidate on the carried shingle arrays. */
  def dedupMinhashLsh(spark: SparkSession, dir: String, tau: Double = 0.5): DataFrame = {
    val b = minhashBands(spark, dir)
    val a = b.select(col("doc_id").as("doc_a"), col("band"), col("bkey"),
      col("sh").as("sha"), col("n_sh").as("na"))
    val c = b.select(col("doc_id").as("doc_b"), col("band"), col("bkey"),
      col("sh").as("shb"), col("n_sh").as("nb"))
    a.join(c, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sha", "shb", "na", "nb")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .where(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val SimhashBits = 48
  val SimhashBands = 4 // 12 bits each → complete for Hamming ≤ 3

  /** Per-doc 48-bit SimHash over token counts, as one codegen'd
    * projection: distinct tokens with counts via HOFs, then a
    * bit-majority fold. Ties (sum == 0) set the bit. */
  private def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn(
        "entries",
        transform(
          array_distinct(col("toks")),
          t => struct(
            HashFunctions.h62(t).as("h"),
            size(filter(col("toks"), x => x === t)).cast("long").as("c"))))
      .withColumn(
        "sim",
        aggregate(
          sequence(lit(0), lit(SimhashBits - 1)),
          lit(0L),
          (acc, b) => acc + when(
            aggregate(
              col("entries"),
              lit(0L),
              (a2, e) => a2 + e("c") * when(
                call_function("shiftright", e("h"), b).bitwiseAND(lit(1L)) === 1L,
                lit(1L)).otherwise(lit(-1L))) >= 0L,
            call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))))
      .select("doc_id", "sim")

  /** `dedup_simhash` — pairs at Hamming distance ≤ 3 in 48-bit SimHash
    * space, via 4 × 12-bit band buckets (pigeonhole: distance ≤ 3 ⇒ at
    * least one identical band, so the join is complete, never O(n²)). */
  def dedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val s = simhash(spark, dir)
    val bits = SimhashBits / SimhashBands
    val banded = s.select(
      col("doc_id"), col("sim"),
      posexplode(transform(
        sequence(lit(0), lit(SimhashBands - 1)),
        k => call_function("shiftright", col("sim"), k * bits)
          .bitwiseAND(lit((1L << bits) - 1)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bval")
    val a = banded.select(col("doc_id").as("doc_a"), col("band"), col("bval"),
      col("sim").as("sim_a"))
    val b = banded.select(col("doc_id").as("doc_b"), col("band"), col("bval"),
      col("sim").as("sim_b"))
    a.join(b, Seq("band", "bval"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b")
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming",
        call_function("bit_count", col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** `dedup_embedding` — embedding near-dup pairs: quantized cosine
    * ≥ 0.4 within `label` blocks. Blocking turns the O(n²) pair space
    * into per-label partitions (at 100 TB: cluster/label assignment is
    * the standard pre-partitioning; swap in LSH buckets from
    * [[Similarity]] for unlabeled corpora). */
  def dedupEmbedding(spark: SparkSession, dir: String, tau: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), VectorFunctions.quantize(col("embedding")).as("v"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(VectorFunctions.cosineQ(col("a.v"), col("b.v")), 6).as("cosine"))
      .where(col("cosine") >= tau)
      .orderBy("vec_a", "vec_b")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def pipelineCurate(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.textQuality(spark, dir)
      .select(col("doc_id"), col("quality"))
    val lang = TextAnalysis.textLangid(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
    val dupLater = Dedup.dedupNgramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    quality
      .join(lang, "doc_id")
      .where(col("quality") >= 0.5 && col("pred_lang") === "en")
      .join(dupLater, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), round(col("quality"), 6).as("quality"), col("pred_lang"))
      .orderBy("doc_id")
  }
}

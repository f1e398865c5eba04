package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTED prefix sums over bounded histograms.
  *
  * The corpus-order statistics (token budget, perplexity band,
  * per-source quantiles) all reduce the corpus to a value-quantized
  * histogram — bounded at ≤ 10⁶+1 rows however large the corpus — and
  * then need a cumulative sum in key order. Earlier rounds ran that as
  * ONE unpartitioned window: bounded, but ~10⁶ rows through a single
  * task is a real constant at the 100 TB edge (and a hot source in the
  * per-source variant concentrates its whole histogram on one core).
  *
  * [[cumSum]] removes the single-partition stage with the same
  * shard-rollup shape `pipeline_shuffle` uses for its permutation:
  * keys map to FIXED-WIDTH shards (a pure function of the key — no
  * sampling, no range partitioner, bit-deterministic), shard TOTALS
  * roll up to ≤ (key-domain / width) + 1 rows whose running sum is the
  * only ordered pass over a single partition, and each shard then adds
  * its broadcast offset to a within-shard running sum — parallel
  * windows of ≤ `shardWidth` rows each. Cost: two small shuffles of
  * the bounded histogram; nothing ever serializes through one task
  * beyond the ≤65-row shard summary.
  */
object BoundedHist {

  /** Add `cumCol` = running sum of `valueCol` over `keyCol` order
    * (ascending or descending) within each `partCols` group, computed
    * shard-parallel. REQUIRES one row per (partCols, keyCol) — the
    * histogram contract; ties would make the within-shard order
    * ambiguous. Integral key domain; shards are `floorDiv(key, width)`
    * so negative keys shard correctly. */
  def cumSum(hist: DataFrame, partCols: Seq[String], keyCol: String,
      valueCol: String, cumCol: String, descending: Boolean,
      shardWidth: Long = 16384L): DataFrame = {
    def ord(c: Column): Column = if (descending) c.desc else c.asc
    val part: Seq[Column] = partCols.map(col)
    // exact integral floorDiv: `div` truncates toward zero, so shift
    // negative non-multiples down one. Double division would misplace
    // keys beyond 2^53 into the neighboring shard, breaking the
    // cross-shard order the prefix sum depends on.
    val wc = lit(shardWidth)
    val q = call_function("div", col(keyCol), wc)
    val withShard = hist.withColumn("_bh_shard",
      when(col(keyCol) < 0 && pmod(col(keyCol), wc) =!= 0, q - 1).otherwise(q))
    // shard totals: the ONLY ordered single-partition pass runs over
    // these ≤ (domain/width)+1 rows per group, never the histogram
    val offsets = withShard
      .groupBy((part :+ col("_bh_shard")): _*)
      .agg(sum(col(valueCol)).as("_bh_tot"))
      .withColumn("_bh_off", coalesce(
        sum(col("_bh_tot")).over(
          Window.partitionBy(part: _*).orderBy(ord(col("_bh_shard")))
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("_bh_tot")
    // within-shard running sums are parallel (≤ shardWidth rows each);
    // offsets are shard-summary-sized: broadcast
    val joined = withShard.join(broadcast(offsets),
      partCols :+ "_bh_shard")
    joined.withColumn(cumCol,
      col("_bh_off") + sum(col(valueCol)).over(
        Window.partitionBy((part :+ col("_bh_shard")): _*).orderBy(ord(col(keyCol)))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_bh_shard", "_bh_off")
  }
}

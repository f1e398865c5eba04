package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

import graft.operators.{Dedup, Multimodal, Relational, Similarity, TextAnalysis}

/** Physical-plan audit: asserts the plan PROPERTIES the 100 TB design
  * depends on — pushdown, pruning, broadcast placement, codegen spans,
  * no accidental cartesian products — so a regression in plan shape
  * fails CI even while results stay correct. */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("brute-force ANN broadcasts the query side, never the corpus") {
    val p = plan(Similarity.annCosineTopk(spark, sf))
    assert(p.contains("BroadcastExchange"), "query side must broadcast")
  }

  test("ANN top-k tail is partial-aggregated, never a per-query Window over the corpus") {
    // row_number() OVER (PARTITION BY q_id) funnels every scored row
    // through ONE task per query — at 100 TB a single reducer receives
    // the whole corpus's scores. The tail must instead be the native
    // bounded-heap aggregate (TopKByScore): partial state ≤ k rows per
    // query per partition, ObjectHashAggregate partial/final pair, no
    // Window anywhere — and no Dataset-encoder boundary (the round-2
    // mapPartitions heap deserialized every scored row out of
    // Tungsten).
    Seq(
      Similarity.annCosineTopk(spark, sf),
      Similarity.annLshTopk(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Window"), "scored rows still rank through a per-query Window")
      assert(p.contains("ObjectHashAggregate"),
        "expected the TypedImperativeAggregate top-k (ObjectHashAggregate)")
      assert(p.contains("topk_by_score"), "expected the native bounded-heap aggregate")
      assert(!p.contains("DeserializeToObject") && !p.contains("SerializeFromObject"),
        "an encoder boundary is back in the ANN hot path")
    }
  }

  test("binary-quantization shortlist scans one code word per row, heap-tailed, no Window") {
    // the BQ pass exists to make the exhaustive shortlist CHEAP: one
    // xor+popcount per corpus row against a broadcast query side, then
    // the same bounded-heap tail as every other variant — a Window or
    // an unbroadcast query side would forfeit both properties
    val p = plan(Similarity.annBqRerank(spark, sf))
    assert(p.contains("BroadcastExchange"), "query codes must broadcast")
    assert(!p.contains("Window"), "shortlist/rerank must not rank through a Window")
    assert(p.contains("topk_by_score"), "expected the native bounded-heap tail")
  }

  test("IVF cell assignment is a map-side argmin: no Window, no Exchange over the corpus") {
    // round 3 ranked cells with row_number() over a per-vector Window
    // after a crossJoin — shuffling n × nCells rows for an argmin a
    // projection computes in place. At √n cells × 100 TB that Window
    // was the plan's only unforced shuffle; only the tiny QUERY side
    // may still rank its probes through a Window.
    val e = Similarity.quantized(spark, sf)
    Seq(
      Similarity.assignCells(e, Similarity.stubCodebook(spark, sf)),
      Similarity.assignCells2(e, Similarity.trainedCodebook(spark, sf))).foreach { assign =>
      // audit the assignment subplan ABOVE the memoized quantized-
      // vector cache (the cache's own build plan legitimately contains
      // the one-time narrow-scan repartition)
      val p = plan(assign).split("InMemoryRelation").head
      assert(!p.contains("Window"), "corpus cell assignment ranks through a Window again")
      assert(!p.contains("Exchange"), "corpus cell assignment shuffles")
    }
  }

  test("PQ encode is map-side; PQ scoring never ranks through a Window") {
    // the codebook rides as literals: encoding must be a pure
    // projection over the memoized quantized cache (no Exchange, no
    // Window), and the ADC scan's tail must be the bounded-heap
    // aggregate, same as every other ANN variant
    val enc = plan(Similarity.pqCodes(spark, sf)).split("InMemoryRelation").head
    assert(!enc.contains("Exchange"), "PQ encoding shuffles")
    assert(!enc.contains("Window"), "PQ encoding ranks through a Window")
    val p = plan(Similarity.annPqTopk(spark, sf))
    assert(!p.contains("Window"), "PQ top-k ranks through a per-query Window")
    assert(p.contains("topk_by_score"), "expected the native bounded-heap aggregate")
  }

  test("KMV sketch aggregates with bounded partial state, never a Window") {
    // the sketch's one shuffle must carry at most k values per source
    // per partition — i.e. the kmin aggregate plans as an
    // ObjectHashAggregate partial/final pair; a row_number-over-hash
    // formulation (Window) would sort EVERY distinct value per source
    val p = plan(graft.operators.Sketches.sketchDistinctNgrams(spark, sf))
    assert(p.contains("kmin_values"), "expected the native bounded KMV aggregate")
    assert(!p.contains("Window"), "KMV sketch ranks hashes through a Window")
    // the overlap readout self-joins the sketch relation: both aliases
    // must read the MEMOIZED sketch, not re-scan the corpus per side
    val po = plan(graft.operators.Sketches.sketchSourceOverlap(spark, sf))
    val scansAboveCache = po.split("InMemoryRelation").head
      .split("documents\\.parquet").length - 1
    assert(scansAboveCache === 0,
      "sketch self-join re-scans the corpus instead of reading the persisted sketch")
  }

  test("sketch_algebra reads ONLY the persisted sketch table, never the corpus") {
    // the whole point of the persisted `_sketch` artifact: set-algebra
    // readouts cost |sources|²·k regardless of corpus size — a
    // documents scan anywhere in the plan would break that contract
    val p = plan(graft.operators.Sketches.sketchAlgebra(spark, sf))
    val corpusScans = p.split("InMemoryRelation").head
      .split("documents\\.parquet").length - 1
    assert(corpusScans === 0,
      s"sketch algebra re-scans the corpus:\n${p.take(600)}")
  }

  test("dedup candidate generation never plans a cartesian product") {
    Seq(
      Dedup.dedupNgramJaccard(spark, sf),
      Dedup.dedupMinhashLsh(spark, sf),
      Dedup.dedupSimhash(spark, sf),
      Dedup.dedupEmbedding(spark, sf),
      Dedup.pipelineDecontaminate(spark, sf)).foreach { df =>
      assert(!plan(df).contains("CartesianProduct"), "O(n²) pair enumeration leaked in")
    }
  }

  test("text quality scoring has no interpreted HOF lambdas in the plan") {
    // transform/aggregate/filter lambdas are CodegenFallback — per-row
    // hot paths must stay inside whole-stage codegen (regex + length
    // expressions code-generate; lambdafunction nodes do not)
    val p = plan(TextAnalysis.textQuality(spark, sf))
    assert(!p.toLowerCase.contains("lambdafunction"),
      "interpreted higher-order function leaked into the quality hot path")
  }

  test("text pipelines prune the document scan to (doc_id, text)") {
    val p = plan(TextAnalysis.textTokens(spark, sf))
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"unneeded columns read: $readSchema")
  }

  test("unigram-logprob and temperature-mix prune the documents scan to (doc_id, text)") {
    Seq(
      TextAnalysis.textUnigramLogprob(spark, sf),
      graft.operators.Curate.pipelineMixTemperature(spark, sf)).foreach { df =>
      val p = plan(df)
      val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(p).toSeq
      assert(readSchemas.nonEmpty && readSchemas.exists(_.contains("text")),
        s"expected a (doc_id, text) scan: $readSchemas")
      // EVERY scan is pruned to at most (doc_id, text) — no other column
      readSchemas.foreach(rs =>
        assert(!rs.contains("source") && !rs.contains("lang"),
          s"unneeded columns read: $rs"))
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("multimodal features prune to (doc_id, text)") {
    val readSchema = "ReadSchema: [^\n]*".r
      .findFirstIn(plan(Multimodal.multimodalFeatures(spark, sf))).getOrElse("")
    assert(!readSchema.contains("n_chars"), s"unneeded columns read: $readSchema")
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan(Relational.qTopkOrders(spark, sf)).contains("TakeOrderedAndProject"))
  }

  test("simhash aggregation runs as map-side partial + final aggregate pairs") {
    val p = plan(Dedup.dedupSimhash(spark, sf))
    // each logical groupBy must plan as a partial/final HashAggregate
    // pair around its exchange — that's what bounds the shuffle to
    // per-doc rows instead of the token stream
    assert("HashAggregate".r.findAllIn(p).length >= 4, "expected partial+final aggregate pairs")
    assert(!p.contains("CartesianProduct"))
  }

  test("range join plans as an equi-join on (user, bucket), not a nested loop") {
    val p = plan(Relational.qRangeJoin(spark, sf))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "time-bucketing failed: inequality join fell back to a per-row loop")
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    import graft.sources.{Bucketed, Tables}
    val root = java.nio.file.Files.createTempDirectory("graft-bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bucketed.write(Tables.orders(spark, sf), "orders_bkt", Seq("o_custkey"), 8, s"$root/o")
      Bucketed.write(Tables.customer(spark, sf), "customer_bkt", Seq("c_custkey"), 8, s"$root/c")
      // disable broadcast so the planner must choose between a shuffled
      // and a bucket-local merge join — the co-location is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt").join(
        spark.table("customer_bkt"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n${p.take(600)}")
      assert(p.contains("Bucketed: true"), s"bucketing not used:\n${p.take(600)}")
      assert(joined.count() === Tables.orders(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  test("filter + projection reach the parquet scan on the fact table") {
    val p = plan(Relational.qFilterPushdown(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("part-dimension star joins broadcast the dimension; Q14 pushes the month filter to the fact scan") {
    Seq(
      Relational.q14PromoEffect(spark, sf),
      Relational.q19DiscountedRevenue(spark, sf),
      Relational.q17SmallQuantity(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), "part dimension must broadcast")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    }
    val q14 = plan(Relational.q14PromoEffect(spark, sf))
    assert(q14.contains("PushedFilters") && q14.contains("l_shipdate"),
      "the ship-month range must reach the parquet reader")
  }

  test("round-5 TPC-H shapes scan each fact table exactly ONCE (no diamond recompute)") {
    // q2/q11/q15/q20/q21 have a correlated-aggregate diamond (per-group
    // MIN/SUM/MAX joined back to the detail). Spark gives no subtree
    // reuse across a self-join, so an agg + join-back scans the fact
    // TWICE; these plans must instead carry the correlate as a keyed
    // (or post-agg global) window — one scan, exact types inside the
    // window. q22's customer double-scan is the deliberate exception:
    // its scalar rides a broadcast, because windowing RAW customer rows
    // would single-partition them.
    val diamonds = Seq(
      "q2" -> Relational.q2MinCostSupplier(spark, sf),
      "q11" -> Relational.q11ImportantStock(spark, sf),
      "q15" -> Relational.q15TopSupplier(spark, sf),
      "q20" -> Relational.q20PartPromotion(spark, sf),
      "q21" -> Relational.q21WaitingSuppliers(spark, sf))
    diamonds.foreach { case (name, df) =>
      val p = plan(df)
      assert(p.split("lineitem\\.parquet").length - 1 === 1,
        s"$name scans lineitem more than once (diamond recompute is back)")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
    // q21's order join must also stay single-scan
    val q21 = plan(Relational.q21WaitingSuppliers(spark, sf))
    assert(q21.split("orders\\.parquet").length - 1 === 1)
  }

  test("q2 filters the fact below the rollup: semi-joins against the dims feed the aggregate") {
    // the (part, supplier) rollup must only see lineitem rows that
    // survive the very selective part/region filters — Catalyst can't
    // push an inner join below an aggregation, so the operator has to
    // place the broadcast LEFT SEMI joins under the groupBy itself.
    // At 100 TB the difference is shuffling ~1% of the fact's group
    // cardinality instead of all of it.
    val p = plan(Relational.q2MinCostSupplier(spark, sf))
    val semis = "LeftSemi".r.findAllIn(p).length
    assert(semis >= 2, s"expected two broadcast semi-joins below the rollup, saw $semis")
    // tree preorder prints parents first: the rollup's partial
    // aggregate must be ABOVE (printed before) the semi-joins it feeds
    // from — i.e. the semi-joins sit in the aggregate's subtree.
    val aggAt = p.indexOf("HashAggregate")
    val semiAt = p.indexOf("LeftSemi")
    assert(aggAt >= 0 && semiAt > aggAt,
      "semi-joins must sit below the (l_partkey, l_suppkey) rollup, not above it")
  }

  test("text_chunk is shuffle-free before its output sort") {
    // chunking is sequence/posexplode/slice straight-line codegen; the
    // ONLY exchange allowed is the final presentation orderBy (range
    // partitioning). A hash Exchange here would mean the explode
    // leaked into a shuffle — at 100 TB the op must stay one scan.
    val p = plan(TextAnalysis.textChunk(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      "chunking must not hash-shuffle; it is a pure map-side explode")
    assert(!p.contains("Window"), "no rank/window machinery belongs in chunking")
  }

  test("domain cap broadcasts the bounded histogram and ranks only boundary buckets") {
    val p = plan(graft.operators.Curate.pipelineDomainCap(spark, sf))
    assert(p.contains("BroadcastExchange"),
      "the per-(source,bucket) histogram must broadcast back to the corpus side")
    // the only Windows allowed partition by source (histogram cumsum)
    // or (source, qb) (boundary-bucket rank) — never an unpartitioned
    // global ordering of corpus rows
    assert(!p.linesIterator.exists(l => l.contains("Window") && l.contains("SinglePartition")),
      "no corpus-wide single-partition Window in the domain cap")
  }

  test("round-5 scan-heavy shapes push their predicates to the parquet reader") {
    val q6 = plan(Relational.q6ForecastRevenue(spark, sf))
    assert(q6.contains("PushedFilters") && q6.contains("l_shipdate")
      && q6.contains("l_discount") && q6.contains("l_quantity"),
      "q6's date/discount/quantity filters must all reach the scan")
    Seq(
      Relational.q4OrderPriority(spark, sf),
      Relational.q8MarketShare(spark, sf),
      Relational.q9ProductProfit(spark, sf),
      Relational.q12ShippingClasses(spark, sf),
      Relational.q16PartsSuppliers(spark, sf)).foreach { df =>
      assert(!plan(df).contains("CartesianProduct"))
    }
  }
}

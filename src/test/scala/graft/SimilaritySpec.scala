package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("brute-force ANN: rank 1 is the query itself at cosine 1.0, k rows per query") {
    val rows = Similarity.annCosineTopk(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQuery.size === 5)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length === 10, s"query $q")
      val first = rs.minBy(_.getAs[Int]("rnk"))
      assert(first.getAs[Long]("vec_id") === q)
      assert(first.getAs[Double]("cosine") === 1.0)
      // ranks are by non-increasing cosine
      val sorted = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN finds the query itself and measures recall vs brute force") {
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Similarity.annLshTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // self-match always lands in the same buckets
    (0L until 5L).foreach(q => assert(lsh.contains((q, q)), s"query $q lost itself"))
    val recall = (lsh intersect brute).size.toDouble / brute.size
    info(f"LSH recall@10 vs brute force: $recall%.2f")
    assert(recall > 0.0)
  }

  test("multi-probe LSH recall is at least single-probe recall") {
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val single = Similarity.annLshTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val multi = Similarity.annLshMultiprobe(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val rs = (single intersect brute).size.toDouble / brute.size
    val rm = (multi intersect brute).size.toDouble / brute.size
    info(f"recall single=$rs%.2f multi=$rm%.2f")
    assert(rm >= rs, s"multi-probe recall $rm below single-probe $rs")
  }

  test("trained-codebook IVF finds each query and returns ranked results") {
    val rows = Similarity.annIvfTrained(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQuery.size === 5)
    byQuery.foreach { case (q, rs) =>
      val first = rs.minBy(_.getAs[Int]("rnk"))
      assert(first.getAs[Long]("vec_id") === q, s"query $q must find itself")
      assert(first.getAs[Double]("cosine") === 1.0)
    }
  }

  test("trained-IVF codebook is honest: sqrt-n cells, and recall@10 beats multi-probe LSH near its candidate budget") {
    // the codebook must be the real sizing, not a smoke-test k
    val n = Similarity.quantized(spark, sf).count()
    val cents = Similarity.trainedCodebook(spark, sf)
    assert(cents.length === math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt),
      s"codebook has ${cents.length} cells for a $n-vector corpus")
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val trained = Similarity.annIvfTrained(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val multi = Similarity.annLshMultiprobe(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val rTrained = (trained intersect brute).size.toDouble / brute.size
    val rMulti = (multi intersect brute).size.toDouble / brute.size
    // candidate budgets: the comparison is only honest if trained IVF
    // isn't buying recall with a silently larger scored-pair bill
    val candTrained = Similarity.trainedCandidates(spark, sf).count()
    val candMulti = Similarity.multiprobeCandidates(spark, sf).count()
    info(f"recall trained=$rTrained%.2f multi=$rMulti%.2f " +
      f"candidates trained=$candTrained multi=$candMulti")
    assert(rTrained >= rMulti,
      f"trained-IVF recall $rTrained%.2f fell below multi-probe LSH $rMulti%.2f")
    assert(rTrained >= 0.7, f"trained-IVF recall@10 floor: $rTrained%.2f < 0.7")
    assert(candTrained <= (candMulti * 3) / 2,
      s"trained-IVF candidate budget $candTrained exceeds 1.5x multi-probe's $candMulti")
  }

  test("PQ ranks in the compressed domain: codes bounded, self found, recall beats chance") {
    val rows = Similarity.annPqTopk(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQuery.size === 5)
    // real compression: one code per subspace, every code in [0, 16)
    val codes = Similarity.pqCodes(spark, sf)
    assert(codes.columns.toSeq === Seq("vec_id", "c0", "c1", "c2", "c3"))
    import org.apache.spark.sql.functions.{min => smin, max => smax, col}
    val rng = codes.agg(
      smin(col("c0")), smax(col("c0")), smin(col("c3")), smax(col("c3"))).head()
    assert(rng.getInt(0) >= 0 && rng.getInt(1) < Similarity.PqCents)
    assert(rng.getInt(2) >= 0 && rng.getInt(3) < Similarity.PqCents)
    // every query's own vector must survive ADC into its top-10 —
    // the reconstruction of q's own codes is by construction among
    // the nearest reconstructions
    val pq = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    (0L until 5L).foreach(q => assert(pq.contains((q, q)), s"query $q lost itself"))
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    info(f"PQ recall@10 vs brute force: $recall%.2f")
    assert(recall >= 0.2, f"PQ recall@10 collapsed to chance: $recall%.2f")
  }

  test("IVF-PQ scores only coarse-quantizer candidates, in the compressed domain") {
    val rows = Similarity.annIvfPqTopk(spark, sf).collect()
    assert(rows.groupBy(_.getAs[Long]("q_id")).size === 5)
    val ivfpq = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    // every returned pair MUST be an IVF candidate — the composed
    // index never scores outside the probed cells
    val cands = Similarity.trainedCandidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    ivfpq.foreach(p => assert(cands.contains(p), s"$p scored outside the probed cells"))
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (ivfpq intersect brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@10 vs brute force: $recall%.2f")
    assert(recall >= 0.2, f"IVF-PQ recall collapsed to chance: $recall%.2f")
  }

  test("IVF-PQ exact re-rank recovers recall over raw ADC ranking") {
    val brute = Similarity.annCosineTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val adc = Similarity.annIvfPqTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val rr = Similarity.annIvfPqRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val rAdc = (adc intersect brute).size.toDouble / brute.size
    val rRr = (rr intersect brute).size.toDouble / brute.size
    info(f"recall adc=$rAdc%.2f rerank=$rRr%.2f")
    assert(rRr >= rAdc, f"exact re-rank recall $rRr%.2f fell below raw ADC $rAdc%.2f")
    assert(rRr >= 0.5, f"re-ranked recall floor: $rRr%.2f < 0.5")
  }

  test("sign matrix is deterministic and balanced-ish") {
    val m = Similarity.signMatrix
    assert(m.length === 4 * 6 * 64)
    assert(m.forall(s => s == 1L || s == -1L))
    val pos = m.count(_ == 1L)
    assert(pos > m.length / 4 && pos < 3 * m.length / 4, s"degenerate sign matrix: $pos positive")
  }

  test("filtered ANN: results respect the predicate and fill k from the filtered pool only") {
    import org.apache.spark.sql.functions._
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.annFilteredTopk(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getAs[Long]("q_id"); val v = r.getAs[Long]("vec_id")
      assert(labels(v) === labels(q), s"query $q (label ${labels(q)}) matched label ${labels(v)}")
    }
    // every query fills all 10 slots from its own label's pool and
    // ranks itself first — post-filtering a global top-k would not
    got.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length === 10, s"query $q under-filled k from a selective predicate")
      val first = rs.minBy(_.getAs[Int]("rnk"))
      assert(first.getAs[Long]("vec_id") === q && first.getAs[Double]("cosine") === 1.0)
    }
  }

  test("SessionIds.release drops codebooks and memos; queries rebuild identically") {
    val before = Similarity.annPqTopk(spark, sf).collect().toSeq
    graft.sources.SessionIds.release(spark)
    val after = Similarity.annPqTopk(spark, sf).collect().toSeq
    assert(before === after,
      "PQ results diverged after a cache release — retraining must be deterministic")
  }

  test("hybrid_search_rrf equals the literal window restatement of both legs + fusion") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = Similarity.hybridSearchRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // reference: row_number windows instead of the bounded-heap tail
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(
        graft.operators.TextAnalysis.tokens(col("text"))).as("dt"))
    val qt = toks.where(col("doc_id") < 5)
      .select(col("doc_id").as("q_id"), col("dt").as("qt"))
    val trank = toks.crossJoin(broadcast(qt))
      .select(col("q_id"), col("doc_id"),
        size(array_intersect(col("dt"), col("qt"))).as("s"))
      .where(col("s") > 0)
      .withColumn("rt", row_number().over(
        Window.partitionBy("q_id").orderBy(col("s").desc, col("doc_id"))))
      .where(col("rt") <= 20).select("q_id", "doc_id", "rt")
    val e = Similarity.quantized(spark, sf)
    val qv = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nsq").as("qnsq"))
    val vrank = e.crossJoin(broadcast(qv))
      .select(col("q_id"), col("vec_id").as("doc_id"),
        round(Similarity.cosinePre(col("qv"), col("qnsq"), col("v"), col("nsq")), 6).as("c"))
      .withColumn("rv", row_number().over(
        Window.partitionBy("q_id").orderBy(col("c").desc, col("doc_id"))))
      .where(col("rv") <= 20).select("q_id", "doc_id", "rv")
    val want = trank.join(vrank, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        round(coalesce(lit(1.0) / (lit(60) + col("rt")), lit(0.0))
          + coalesce(lit(1.0) / (lit(60) + col("rv")), lit(0.0)), 6).as("rrf"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("rrf").desc, col("doc_id"))))
      .where(col("rnk") <= 10)
      .select("q_id", "doc_id", "rnk", "rrf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(got.sorted === want.sorted)
    // fusion really mixes: single-leg rows (score < 1/61 + 1/80 means
    // one leg absent or deep) and both-leg rows coexist in the top-10
    assert(got.exists(_._4 >= 1.0 / 61 + 1.0 / 80), "no strongly-fused row in the top-10")
    assert(got.forall(r => r._4 > 0))
  }
}

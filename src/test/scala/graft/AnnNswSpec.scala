package graft

import graft.operators.Similarity

/** Graph-index ANN (per-shard navigable small world): recall is
  * approximate BY DESIGN, so the spec measures it against the exact
  * scan instead of assuming it, and separately pins the properties
  * that must be exact — bit-reproducibility (quantized integer dots,
  * id-deterministic build order and tie-breaks) and self-retrieval. */
class AnnNswSpec extends SparkSpec {

  private def runs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq

  test("recall@10 vs the exact scan is high; every query retrieves itself at rank 1") {
    val approx = runs(Similarity.annNswTopk(spark, sf))
    val exact = runs(Similarity.annCosineTopk(spark, sf))
    assert(approx.nonEmpty && exact.nonEmpty)
    val byQ = approx.groupBy(_._1); val exQ = exact.groupBy(_._1)
    assert(byQ.keySet === exQ.keySet)
    var hit = 0; var total = 0
    byQ.foreach { case (q, rows) =>
      val a = rows.map(_._2).toSet
      val e = exQ(q).map(_._2).toSet
      hit += a.intersect(e).size; total += e.size
      // rank 1 is the query itself (it is in the corpus, cosine 1)
      assert(rows.minBy(_._3)._2 === q)
    }
    val recall = hit.toDouble / total
    // floor raised 0.8 → 0.9 with HNSW layering (greedy descent
    // through the sparse upper layers lands the layer-0 beam in the
    // right neighborhood; measured 1.0 at these constants)
    assert(recall >= 0.9, s"recall@10 = $recall — the beam is stalling in local minima")
  }

  test("the whole index + answers are bit-reproducible across runs") {
    val a = runs(Similarity.annNswTopk(spark, sf))
    val b = runs(Similarity.annNswTopk(spark, sf))
    assert(a === b)
  }

  test("shard/beam constants move recall, not correctness of the shape") {
    // a narrower beam may lose recall — including, at ef=8 over
    // near-random vectors, a query's own node (the flat-NSW era
    // "always self-retrieves" held only because the beam SEEDED at
    // index 0, which happened to be the query; HNSW seeds at the
    // descended entry point, so tiny beams carry no such guarantee) —
    // but determinism and score EXACTNESS must survive any constants:
    // the failure mode is missing neighbors, never wrong scores
    val narrow = runs(Similarity.annNswTopk(spark, sf, k = 5, shards = 4, m = 4, ef = 8))
    val narrow2 = runs(Similarity.annNswTopk(spark, sf, k = 5, shards = 4, m = 4, ef = 8))
    assert(narrow === narrow2, "narrow constants must stay bit-reproducible")
    val exact = runs(Similarity.annCosineTopk(spark, sf, k = 5))
      .map { case (q, v, r, c) => (q, v) -> c }.toMap
    assert(narrow.nonEmpty)
    narrow.groupBy(_._1).foreach { case (_, rows) =>
      rows.foreach { case (qq, v, _, c) =>
        // any returned (q, v) pair that the exact top-5 also contains
        // must carry the identical rounded cosine
        exact.get((qq, v)).foreach(ec => assert(ec === c))
      }
    }
    // at the DEFAULT constants the hierarchy must find the query's own
    // vector at rank 1 (cosine 1.0 is unbeatable — missing it means
    // the descent is broken, not merely imprecise)
    runs(Similarity.annNswTopk(spark, sf)).groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.minBy(_._3)._2 === q)
    }
  }
}

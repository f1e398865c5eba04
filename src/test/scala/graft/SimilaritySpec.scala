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

  test("sign matrix is deterministic and balanced-ish") {
    val m = Similarity.signMatrix
    assert(m.length === 4 * 6 * 64)
    assert(m.forall(s => s == 1L || s == -1L))
    val pos = m.count(_ == 1L)
    assert(pos > m.length / 4 && pos < 3 * m.length / 4, s"degenerate sign matrix: $pos positive")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  test("dedup_exact covers every document exactly once") {
    val df = Dedup.dedupExact(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(df.count() === docs)
    // canonical ids are self-or-earlier
    assert(df.where(col("canonical_id") > col("doc_id")).count() === 0)
  }

  test("ngram jaccard finds the planted near-duplicate pairs, ordered and thresholded") {
    val rows = Dedup.dedupNgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty, "expected planted near-dups at sf0.001")
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("minhash-LSH output is a subset of exact ngram-jaccard output (verified candidates)") {
    val exact = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted unverified pairs: ${lsh -- exact}")
    assert(lsh.nonEmpty, "LSH should recall at least one planted near-dup")
    val recall = lsh.size.toDouble / exact.size
    info(f"minhash-LSH recall vs exact jaccard: $recall%.2f (${lsh.size}/${exact.size})")
  }

  test("simhash pairs respect the hamming bound") {
    val rows = Dedup.dedupSimhash(spark, sf).collect()
    assert(rows.forall(_.getAs[Int]("hamming") <= 3))
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("capped ngram jaccard only prunes pairs — surviving scores stay exact") {
    val full = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard")).toMap
    val capped = Dedup.dedupNgramJaccard(spark, sf, maxBucket = 4).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard")).toMap
    capped.foreach { case (pair, jac) =>
      assert(full.get(pair).contains(jac),
        s"capped pair $pair has deflated/extra score $jac vs ${full.get(pair)}")
    }
  }

  test("expandPairs emits all in-bucket pairs and the skew cap drops hot buckets") {
    import spark.implicits._
    val buckets = Seq(
      Seq(1L, 2L, 3L), // 3 pairs
      Seq(4L, 5L),     // 1 pair
      Seq.empty[Long], // none
      (100L to 120L)   // hot bucket: 21 docs, capped away
    ).toDF("ds")
    val uncapped = Dedup.expandPairs(buckets, col("ds")).count()
    assert(uncapped === 3 + 1 + (21 * 20) / 2)
    val capped = Dedup.expandPairs(buckets, col("ds"), maxBucket = 10).count()
    assert(capped === 4, "hot bucket must be dropped, small buckets kept")
  }

  test("embedding near-dup pairs stay within label blocks and over threshold") {
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
    val pairs = Dedup.dedupEmbedding(spark, sf, tau = 0.3)
    val withLabels = pairs
      .join(e.select(col("vec_id").as("vec_a"), col("label").as("la")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("label").as("lb")), "vec_b")
    assert(withLabels.where(col("la") =!= col("lb")).count() === 0)
    assert(pairs.collect().forall(_.getAs[Double]("cosine") >= 0.3))
  }
}

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

  test("embedding near-dup pairs are exact-precision against brute force; recall reported") {
    import graft.functions.VectorFunctions
    val q = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), VectorFunctions.quantize(col("embedding")).as("v"))
      .withColumn("nsq", VectorFunctions.normSqQ(col("v")))
    // brute-force ground truth at the same τ (test-only O(n²) join)
    val tau = 0.4
    val brute = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(VectorFunctions.dotQ(col("a.v"), col("b.v")).cast("double")
          / sqrt((col("a.nsq") * col("b.nsq")).cast("double")), 6).as("cosine"))
      .where(col("cosine") >= tau)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val lsh = Dedup.dedupEmbedding(spark, sf, tau)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh.subsetOf(brute), s"LSH emitted pairs below τ: ${lsh -- brute}")
    assert(lsh.nonEmpty, "expected near-dup embedding pairs at sf0.001")
    info(f"embedding LSH-block recall vs brute force: ${lsh.size.toDouble / brute.size}%.2f (${lsh.size}/${brute.size})")
  }

  test("prefix filtering starves a hot boilerplate shingle's bucket without losing true pairs") {
    import spark.implicits._
    val boiler = (1L to 300L).map { i =>
      (i, ((1 to 8).map(j => s"u$i" + ('a' + j - 1).toChar) :+ "common boiler plate").mkString(" "))
    }
    val planted = Seq(
      (9001L, (1 to 12).map(j => s"w$j").mkString(" ")),
      (9002L, ((1 to 11).map(j => s"w$j") :+ "x12").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-hotshingle").toString
    try {
      (boiler ++ planted).toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      // Every boilerplate doc shares the shingle "common boiler plate"
      // (df=300) but nothing rare: an unpruned inverted index would
      // expand 300·299/2 = 44,850 candidate pairs from that bucket.
      // The prefix keeps only each doc's 5 rarest of 9 shingles, so
      // the hot shingle indexes nothing, and the only candidate left
      // is the planted rare-shingle pair — which prefix filtering must
      // keep (completeness) and verification must score exactly.
      val cands = Dedup.jaccardCandidates(spark, dir, tau = 0.5, maxBucket = Dedup.DefaultMaxBucket)
        .collect().map(r => (r.getAs[Long]("ga"), r.getAs[Long]("gb"))).toSet
      assert(cands === Set((9001L, 9002L)),
        s"expected exactly the planted candidate, got ${cands.size} candidates")
      val pairs = Dedup.dedupNgramJaccard(spark, dir).collect()
      assert(pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
        === Seq((9001L, 9002L)))
      assert(math.abs(pairs.head.getAs[Double]("jaccard") - 9.0 / 11.0) < 1e-5)
    } finally {
      graft.sources.Memo.release(spark)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("connected components: chains collapse through pointer jumping, cliques stay separate") {
    import spark.implicits._
    // a 12-node CHAIN (worst case for plain propagation: diameter 11,
    // pointer jumping must converge well under the round cap), plus a
    // separate triangle and an isolated pair
    val chain = (100L until 111L).map(i => (i, i + 1))
    val pairs = (chain ++ Seq((1L, 2L), (2L, 3L), (1L, 3L), (50L, 51L)))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    (100L to 111L).foreach(v => assert(comp(v) === 100L, s"chain node $v"))
    Seq(1L, 2L, 3L).foreach(v => assert(comp(v) === 1L))
    assert(comp(50L) === 50L && comp(51L) === 50L)
    assert(comp.size === 17)
  }

  test("dedup_components groups every jaccard pair under one representative") {
    val pairs = Dedup.dedupNgramJaccard(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comp = Dedup.dedupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rep = comp.map(c => c._1 -> c._2).toMap
    // both ends of every near-dup pair share a component
    pairs.foreach { case (a, b) => assert(rep(a) === rep(b), s"pair ($a,$b) split") }
    // representatives are component minima and members count up
    comp.groupBy(_._2).foreach { case (r, ms) =>
      assert(ms.map(_._1).min === r, s"rep $r is not the min of its cluster")
      assert(ms.head._3 === ms.length, s"cluster $r size mismatch")
    }
  }

  test("skew-cap drops are observable: the listener records capped buckets") {
    import spark.implicits._
    // one bucket of 3 docs against maxBucket=2: dropped, and loudly so
    val buckets = Seq((1L, Seq(10L, 11L, 12L)), (2L, Seq(20L, 21L)))
      .toDF("key", "ds")
    val before = Dedup.CapDropListener.dropEvents.get()
    val pairs = Dedup.expandPairs(buckets, col("ds"), maxBucket = 2).collect()
    // the capped bucket contributes no pairs; the small one survives
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((20L, 21L)))
    // observed metrics arrive via the async listener bus
    val deadline = System.currentTimeMillis() + 10000
    while (Dedup.CapDropListener.dropEvents.get() <= before
        && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(Dedup.CapDropListener.dropEvents.get() > before,
      "a dropped bucket must surface through the cap-drop listener")
  }

  test("span dedup keeps each distinct span exactly once corpus-wide") {
    import graft.operators.TextAnalysis.tokens
    val rep = Dedup.dedupSpans(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .where(size(tokens(col("text"))) > 0).count()
    assert(rep.length.toLong === docs, "one report row per non-empty doc")
    rep.foreach { r =>
      // an exact-duplicate doc later in id order legitimately keeps 0
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segs"))
      val ratio = r.getAs[Double]("kept_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // the minimum doc_id owes nothing to earlier docs: it keeps every
    // span that isn't an internal repeat, so at least one
    val first = rep.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_kept") >= 1L)
    // global invariant: total kept spans == distinct span hashes
    val segs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .where(size(col("ts")) > 0)
      .select(posexplode(sequence(lit(0L), ((size(col("ts")) - 1) / 8).cast("long"))),
        col("ts"))
      .select(array_join(slice(col("ts"), col("col").cast("int") * 8 + 1, lit(8)), " ").as("seg"))
    val distinctSpans = segs.select(graft.functions.HashFunctions.h62(col("seg"))).distinct().count()
    assert(rep.map(_.getAs[Long]("n_kept")).sum === distinctSpans)
  }

  test("semantic decontamination drops exactly the cosine-contaminated train vectors") {
    import graft.operators.{Dedup, Similarity}
    val survivors = Dedup.pipelineDecontaminateSemantic(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // reference: brute-force max cosine of every train vector vs the holdout
    val q = Similarity.quantized(spark, sf)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Long](1).toArray, r.getLong(2)))
    val (hold, train) = q.partition(_._1 % 97 == 0)
    assert(hold.nonEmpty && train.nonEmpty)
    def cos(a: (Long, Array[Long], Long), b: (Long, Array[Long], Long)): Double = {
      val dot = a._2.zip(b._2).map { case (x, y) => x * y }.sum
      val d = dot.toDouble / math.sqrt((a._3 * b._3).toDouble)
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = train.filterNot(t => hold.exists(h => cos(t, h) >= 0.35))
      .map(_._1).toSet
    assert(survivors === expected)
    assert(expected.size < train.length, "threshold must actually drop something at sf0.001")
    // holdout never appears in the output
    assert(survivors.forall(_ % 97 != 0))
  }

  test("dedup_containment equals brute directional recomputation; genuinely asymmetric") {
    import graft.operators.TextAnalysis
    import graft.functions.HashFunctions
    val got = Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute reference: per-doc distinct shingle-hash sets, all
    // directional pairs, |sub ∩ super| / |sub| ≥ 0.9
    val sets = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        transform(TextAnalysis.shingles(TextAnalysis.tokens(col("text"))),
          s => HashFunctions.h62(s)).as("hs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = sa.intersect(sb).size.toDouble / sa.size if c >= 0.9 - 1e-12
    } yield (a, b, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got === want)
    assert(got.nonEmpty, "sf0.001 corpus should contain containment pairs")
    // asymmetry is real: some pair qualifies one way only
    val dirs = got.map(p => (p._1, p._2))
    assert(got.exists(p => p._3 < 1.0) ||
      dirs.exists(p => !dirs.contains((p._2, p._1))),
      "expected at least one non-mutual or non-exact containment")
  }
}

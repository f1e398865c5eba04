package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, HashImpl, VectorFunctions}

/** Hash + vector function kernels.
  *
  * Md5Lower64 vectors are cross-checked against DuckDB:
  * `md5_number_lower(s)` equals the unsigned little-endian int64 of
  * md5 bytes [8..16); the signed two's-complement views below were
  * produced by `select md5_number_lower(...)` on DuckDB v1.0.0.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  val vectors: Seq[(String, Long, Long)] = Seq(
    // (input, signed md5Lower64, h62 = unsigned >>> 2)
    ("abc", 8250560606382298838L, 2062640151595574709L),
    ("", 9098107892288553193L, 2274526973072138298L),
    ("hello world", -4337711292721476717L, 3527258195247018724L),
    ("graft", 4229648949381425444L, 1057412237345356361L))

  test("HashImpl.md5Lower64 matches DuckDB md5_number_lower vectors") {
    vectors.foreach { case (s, signed, _) =>
      assert(HashImpl.md5Lower64(s.getBytes("UTF-8")) === signed, s"input=$s")
    }
  }

  test("Md5Lower64 expression (codegen path) matches the kernel") {
    val df = vectors.map(_._1).toDF("s")
      .select(col("s"), HashFunctions.md5Lower64(col("s")).as("h"),
        HashFunctions.h62(col("s")).as("h62"))
    val rows = df.collect()
    vectors.foreach { case (s, signed, h62) =>
      val r = rows.find(_.getString(0) == s).get
      assert(r.getLong(1) === signed, s"md5Lower64($s)")
      assert(r.getLong(2) === h62, s"h62($s)")
    }
  }

  test("h62 is non-negative (fits signed BIGINT in both engines)") {
    val df = (1 to 1000).map(i => s"probe-$i").toDF("s")
      .select(HashFunctions.h62(col("s")).as("h"))
    assert(df.where(col("h") < 0).count() === 0)
  }

  test("ArrayDotLong computes exact integer dot products") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), 32L),
      (Seq.empty[Long], Seq.empty[Long], 0L),
      (Seq(-5L, 7L), Seq(3L, -2L), -29L))
      .toDF("a", "b", "want")
    val bad = df.select(VectorFunctions.dotQ(col("a"), col("b")).as("got"), col("want"))
      .where(col("got") =!= col("want")).count()
    assert(bad === 0)
  }

  test("quantized cosine: self-similarity is exactly 1.0 after round") {
    val df = Seq(Seq(0.25f, -0.5f, 0.125f)).toDF("v")
      .select(VectorFunctions.quantize(col("v")).as("q"))
      .select(round(
        VectorFunctions.dotQ(col("q"), col("q")).cast("double")
          / sqrt((VectorFunctions.normSqQ(col("q")) * VectorFunctions.normSqQ(col("q"))).cast("double")),
        6).as("c"))
    assert(df.head().getDouble(0) === 1.0)
  }

  test("extensions expose native expressions to SQL") {
    val h = spark.sql("SELECT md5lower64('abc') AS h").head().getLong(0)
    assert(h === 8250560606382298838L)
    val d = spark.sql("SELECT array_dot_long(array(1L,2L,3L), array(4L,5L,6L)) AS d")
      .head().getLong(0)
    assert(d === 32L)
  }

  test("double-precision cosine agrees with quantized cosine to ~1e-3") {
    val e = graft.sources.Tables.embeddings(spark, sf).limit(20)
      .select(col("vec_id"), col("embedding"))
    val both = e.as("a").crossJoin(e.as("b"))
      .select(
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("cd"),
        {
          val qa = VectorFunctions.quantize(col("a.embedding"))
          val qb = VectorFunctions.quantize(col("b.embedding"))
          (VectorFunctions.dotQ(qa, qb).cast("double")
            / sqrt((VectorFunctions.normSqQ(qa) * VectorFunctions.normSqQ(qb)).cast("double"))).as("cq")
        })
    val maxDiff = both.select(max(abs(col("cd") - col("cq")))).head().getDouble(0)
    assert(maxDiff < 1e-2, s"quantization error too large: $maxDiff")
  }

  test("kmin_values keeps the k smallest DISTINCT values across partitions") {
    import spark.implicits._
    // pseudo-random longs WITH duplicates (every value appears twice),
    // spread over 8 partitions so the partial-merge path runs
    val vals = (0 until 2000).map(i => (i.toLong * 2654435761L) % 100000L)
    val df = (vals ++ vals).toDF("h").repartition(8)
    val got = df.agg(graft.functions.SketchAgg.kMin(col("h"), 16).as("m"))
      .head.getSeq[Long](0)
    val want = vals.distinct.sorted.take(16)
    assert(got === want)
    // fewer distincts than k: the sketch IS the exact distinct set
    val small = Seq(5L, 3L, 5L, 9L, 3L).toDF("h").repartition(3)
      .agg(graft.functions.SketchAgg.kMin(col("h"), 16).as("m"))
      .head.getSeq[Long](0)
    assert(small === Seq(3L, 5L, 9L))
  }

  test("KMV estimate lands near the exact distinct 3-gram count per source") {
    import graft.operators.TextAnalysis.{shingles, tokens}
    val est = graft.operators.Sketches.sketchDistinctNgrams(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), explode(shingles(tokens(col("text")))).as("g"))
      .distinct().groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (s, c) =>
      val (nMins, e) = est(s)
      if (c < 128) assert(e === c.toDouble, s"source $s below k must report exactly")
      else {
        assert(nMins === 128L)
        val ratio = e / c
        assert(ratio > 0.6 && ratio < 1.67,
          f"source $s: KMV estimate $e%.0f vs exact $c (ratio $ratio%.2f)")
      }
    }
  }

  test("KMV overlap estimate tracks exact cross-source Jaccard") {
    import graft.operators.TextAnalysis.{shingles, tokens}
    val est = graft.operators.Sketches.sketchSourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val grams = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), explode(shingles(tokens(col("text")))).as("g"))
      .distinct()
    val sizes = grams.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inter = grams.alias("a")
      .join(grams.alias("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.size === sizes.size * (sizes.size - 1) / 2, "missing source pairs")
    var worst = 0.0
    est.foreach { case ((sa, sb), e) =>
      val i = inter.getOrElse((sa, sb), 0L).toDouble
      val exact = i / (sizes(sa) + sizes(sb) - i)
      worst = math.max(worst, math.abs(e - exact))
      assert(math.abs(e - exact) <= 0.15,
        f"pair ($sa,$sb): KMV jaccard $e%.3f vs exact $exact%.3f")
    }
    info(f"worst |est-exact| over ${est.size} pairs: $worst%.3f")
  }

  test("KMV sketch algebra: union/inter/diff estimates from the persisted sketch table") {
    import graft.operators.TextAnalysis.{shingles, tokens}
    val alg = graft.operators.Sketches.sketchAlgebra(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val grams = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), explode(shingles(tokens(col("text")))).as("g"))
      .distinct()
    val sizes = grams.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inter = grams.alias("a")
      .join(grams.alias("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(alg.size === sizes.size * (sizes.size - 1) / 2, "missing source pairs")
    alg.foreach { case ((sa, sb), (eu, ei, dab, dba)) =>
      // internal identities the algebra must respect
      assert(ei <= eu + 1e-9, s"($sa,$sb): intersection exceeds union")
      assert(dab >= 0.0 && dba >= 0.0)
      // estimates track exact set sizes within KMV error
      val i = inter.getOrElse((sa, sb), 0L).toDouble
      val u = sizes(sa) + sizes(sb) - i
      assert(eu / u > 0.6 && eu / u < 1.67,
        f"($sa,$sb): union est $eu%.0f vs exact $u%.0f")
      assert(math.abs(ei - i) <= 0.25 * u,
        f"($sa,$sb): inter est $ei%.0f vs exact $i%.0f (union $u%.0f)")
    }
  }

  test("incremental KMV sketch refresh is bit-identical to a from-scratch rebuild") {
    import graft.operators.Sketches
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 =!= 0)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // pure merge property: k-min(k-min(A) ∪ k-min(B)) ≡ k-min(A∪B)
    val full = asMap(Sketches.docSketches(docs))
    val merged = asMap(Sketches.mergeSketches(
      Sketches.docSketches(a), Sketches.docSketches(b)))
    assert(merged === full, "KMV merge diverged from the combined-corpus sketch")
    // lifecycle op: persist half A, refresh with delta B, read back —
    // the historical corpus (A) is never re-read
    val path = java.nio.file.Files.createTempDirectory("graft-sketch-refresh")
      .toString + "/sk.parquet"
    Sketches.docSketches(a).write.parquet(path)
    Sketches.refreshSketchTable(spark, path, b)
    assert(asMap(spark.read.parquet(path)) === full,
      "refreshed sketch table diverged from a from-scratch rebuild")
  }
}

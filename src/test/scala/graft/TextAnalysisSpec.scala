package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding windows, distinct, guarded under n tokens") {
    val df = Seq("a b c d", "a b", "x y x y x y").toDF("text")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("text"))).as("sh"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq("x y x", "y x y")) // distinct collapses repeats
  }

  test("langid: every doc gets a prediction from the closed label set") {
    val rows = TextAnalysis.textLangid(spark, sf).collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    val labels = Set("en", "es", "fr", "de", "und")
    assert(rows.forall(r => labels.contains(r.getAs[String]("pred_lang"))))
  }

  test("quality: ratios bounded, composite score in [0, 1]") {
    val rows = TextAnalysis.textQuality(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
      assert(r.getAs[Double]("stop_ratio") >= 0 && r.getAs[Double]("stop_ratio") <= 1)
      assert(r.getAs[Double]("quality") >= 0 && r.getAs[Double]("quality") <= 1)
      assert(r.getAs[Double]("mean_tok_len") > 0)
    }
  }

  test("token counts: bpe >= word tokenization, bytes == chars on ascii corpus") {
    val rows = TextAnalysis.textTokens(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("bpe_tokens") >= r.getAs[Int]("word_tokens"))
      assert(r.getAs[Int]("n_bytes") === r.getAs[Int]("n_chars"))
    }
  }

  test("fingerprint: md5 shape and h62 range") {
    val rows = TextAnalysis.textFingerprint(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("fp_md5").matches("[0-9a-f]{32}"))
      assert(r.getAs[Long]("fp_h62") >= 0)
    }
    // identical normalized text ⇒ identical fingerprint, and distinct docs mostly distinct
    assert(rows.map(_.getAs[Long]("fp_h62")).distinct.length > rows.length / 2)
  }

  test("unigram logprob: consistent token counts, scores bounded by corpus information content") {
    val nll = TextAnalysis.textUnigramLogprob(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_nll")))
      .toMap
    val counts = TextAnalysis.textTokens(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("word_tokens")).toMap
    assert(nll.keySet === counts.keySet)
    val totalTokens = counts.values.map(_.toLong).sum
    val maxInfo = math.log(totalTokens.toDouble) / math.log(2.0) // rarest token: tf = 1
    nll.foreach { case (id, (n, score)) =>
      assert(n === counts(id).toLong, s"doc $id token count")
      if (n == 0) assert(score === 0.0)
      else assert(score > 0.0 && score <= maxInfo + 1e-6,
        s"doc $id mean_nll $score outside (0, log2(total)]")
    }
    // the signal separates documents (not a constant)
    assert(nll.values.map(_._2).toSet.size > 1)
  }

  test("temperature mix: rarest language keeps everything, dominant languages shed toward the T=2 mix") {
    val all = TextAnalysis.textLangid(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pred_lang")))
    val mixed = graft.operators.Curate.pipelineMixTemperature(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(mixed.map(_._1).toSet.subsetOf(all.map(_._1).toSet))
    val c = all.groupBy(_._2).view.mapValues(_.length).toMap
    val k = mixed.groupBy(_._2).view.mapValues(_.length).toMap
    val cmin = c.values.min
    // every minimal-share language is kept in full (keep prob 1)
    c.filter(_._2 == cmin).keys.foreach(lang =>
      assert(k.getOrElse(lang, 0) === cmin, s"rarest language $lang must keep everything"))
    // kept counts track n * sqrt(cmin/n) within hash-gate noise
    c.foreach { case (lang, n) =>
      val expected = n * math.sqrt(cmin.toDouble / n)
      val tol = math.max(3.0, 4 * math.sqrt(expected))
      assert(math.abs(k.getOrElse(lang, 0) - expected) <= tol,
        s"$lang kept ${k.getOrElse(lang, 0)} of $n, expected ~$expected")
    }
  }

  test("repetition scorer: bounds hold, and a synthetic loop scores maximally repetitive") {
    import org.apache.spark.sql.functions._
    val rep = TextAnalysis.textRepNgrams(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_distinct") >= 1L)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_ngrams"))
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
    // synthetic sanity on the same expressions: "x y x y x y …" has
    // only 2 distinct 3-grams however long it runs
    import graft.operators.TextAnalysis.{shingles, tokens}
    val loop = Seq(Seq.fill(50)("x y").mkString(" ")).toDF("text")
      .select(size(shingles(tokens(col("text")))).as("nd"),
        (size(tokens(col("text"))) - 2).as("total"))
      .head()
    assert(loop.getInt(0) === 2 && loop.getInt(1) === 98)
  }

  test("PII redaction masks emails, phones, and IPs; counts match; clean text untouched") {
    import org.apache.spark.sql.functions._
    val fixtures = Seq(
      ("mail a.b-c_1@sub.example.org or 555-123-4567 at 10.0.0.1 done",
        "mail <EMAIL> or <PHONE> at <IP> done", 1L, 1L, 1L),
      ("two mails x@y.io and zz@qq.museum", "two mails <EMAIL> and <EMAIL>", 2L, 0L, 0L),
      ("no pii here, just words and 42", "no pii here, just words and 42", 0L, 0L, 0L),
      ("ip 192.168.255.7 vs version 1.2 only", "ip <IP> vs version 1.2 only", 0L, 0L, 1L))
      .toDF("s", "want", "we", "wp", "wi")
    val got = fixtures.select(
      TextAnalysis.redactPii(col("s")).as("red"),
      col("s"), col("want"), col("we"), col("wp"), col("wi"),
      struct(TextAnalysis.piiCounts(col("s")): _*).as("c")).collect()
    got.foreach { r =>
      assert(r.getAs[String]("red") === r.getAs[String]("want"))
      val c = r.getStruct(r.fieldIndex("c"))
      assert(c.getLong(0) === r.getAs[Long]("we"), s"emails in: ${r.getAs[String]("s")}")
      assert(c.getLong(1) === r.getAs[Long]("wp"), s"phones in: ${r.getAs[String]("s")}")
      assert(c.getLong(2) === r.getAs[Long]("wi"), s"ips in: ${r.getAs[String]("s")}")
    }
    // corpus report: the seeded suffix fires every class exactly once
    // per doc, and the redacted fingerprint never equals the raw one
    val rep = TextAnalysis.textPii(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getAs[Long]("n_emails") === 1L)
      assert(r.getAs[Long]("n_phones") === 1L)
      assert(r.getAs[Long]("n_ipv4") === 1L)
      assert(r.getAs[String]("red_md5").length === 32)
    }
  }

  test("token-budget selection equals the global running-sum reference at every budget") {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.operators.Curate.pipelineTokenBudget(spark, sf, Long.MaxValue)
    val all = scored.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    for (budget <- Seq(0L, 500L, 9000L, 40000L, Long.MaxValue)) {
      val got = graft.operators.Curate.pipelineTokenBudget(spark, sf, budget)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      // reference: the literal single-window semantics over the corpus
      val ref = scored
        .withColumn("cum", sum(col("n_tokens")).over(
          Window.orderBy(col("quality").desc, col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("cum") <= budget)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(got.toSeq === ref.toSeq, s"budget=$budget")
      // best-quality prefix: every kept doc's quality >= every dropped
      // doc's (ties broken by doc_id inside one exact quality value)
      if (got.nonEmpty) {
        val keptMin = got.map(_._2).min
        val dropped = all.filterNot(d => got.exists(_._1 == d._1))
        assert(dropped.forall(_._2 <= keptMin + 1e-9), s"budget=$budget")
      }
      if (budget != Long.MaxValue) assert(got.map(_._3).sum <= budget)
    }
    // the mid budgets select non-trivial strict subsets
    val mid = graft.operators.Curate.pipelineTokenBudget(spark, sf, 9000L).count()
    assert(mid > 0 && mid < all.length)
  }

  test("perplexity band keeps the middle and drops both score tails") {
    val all = graft.operators.TextAnalysis.textUnigramLogprob(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val kept = graft.operators.Curate.pipelinePerplexityFilter(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(kept.nonEmpty && kept.length < all.length)
    // band property at bucket granularity: every dropped doc's bucket
    // lies outside [min kept bucket, max kept bucket]
    def cb(x: Double) = math.floor(x * 100).toLong
    val keptB = kept.map(d => cb(d._2))
    val (bLo, bHi) = (keptB.min, keptB.max)
    val dropped = all.filterNot(d => kept.exists(_._1 == d._1))
    assert(dropped.forall(d => cb(d._2) < bLo || cb(d._2) > bHi))
    // both tails actually shed mass (P10 below, P90 above)
    assert(dropped.exists(d => cb(d._2) < bLo) && dropped.exists(d => cb(d._2) > bHi))
    // coverage is ~80% of the corpus (bucket rounding moves a little)
    val frac = kept.length.toDouble / all.length
    assert(frac > 0.6 && frac < 0.95, s"kept fraction $frac")
  }

  test("token budget larger than the corpus keeps every scored doc") {
    val all = graft.operators.Curate.pipelineTokenBudget(spark, sf, Long.MaxValue).count()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(all === docs) // every sf0.001 doc has non-null quality
  }

  test("domain cap equals the per-source rank-window reference at several caps") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    for (cap <- Seq(1, 7, 20, 1000)) {
      val got = graft.operators.Curate.pipelineDomainCap(spark, sf, cap)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      // literal semantics: row_number per source over (quality DESC, doc_id)
      val ref = graft.operators.Curate.gates(graft.sources.Tables.documents(spark, sf))
        .where(col("quality").isNotNull)
        .join(docs, Seq("doc_id"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))))
        .where(col("rk") <= cap)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(got === ref, s"cap=$cap: bucketed plan must equal the window reference")
    }
    // the cap binds: each source keeps exactly 7 at cap=7 on this fixture
    val kept = graft.operators.Curate.pipelineDomainCap(spark, sf, 7)
      .groupBy("source").count().collect()
    assert(kept.forall(_.getAs[Long]("count") === 7L))
  }

  test("collocations: top-50 lift list equals a literal document-frequency reference") {
    val got = graft.operators.TextAnalysis.textCollocations(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 50)
    // literal reference: doc-frequency sets computed driver-side
    val tok = "[a-z0-9]+".r
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(r => tok.findAllIn(r.getString(0).toLowerCase).toSeq)
      .filter(_.nonEmpty)
    val n = docs.length.toDouble
    val dfW = scala.collection.mutable.Map.empty[String, Long]
    val dfB = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { ts =>
      ts.distinct.foreach(w => dfW(w) = dfW.getOrElse(w, 0L) + 1)
      ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq.distinct
        .foreach(b => dfB(b) = dfB.getOrElse(b, 0L) + 1)
    }
    val ref = dfB.toSeq.filter(_._2 >= 5).map { case (b, ab) =>
      val Array(w1, w2) = b.split(" ")
      (b, ab, ab * n / (dfW(w1) * dfW(w2)))
    }.sortBy { case (b, _, l) => (-l, b) }.take(50)
    assert(got.map(_.getAs[String]("bigram")).toSeq === ref.map(_._1),
      "top-50 membership/order must match the literal reference")
    got.zip(ref).foreach { case (r, (_, ab, l)) =>
      assert(r.getAs[Long]("df_ab") === ab)
      assert(math.abs(r.getAs[Double]("lift") - l) < 1e-6)
    }
  }

  test("text_chunk: windows tile with overlap, tails are short, chunks reconstruct the doc") {
    val rows = TextAnalysis.textChunk(spark, sf, window = 16, stride = 12).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val nTokens = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, cs) =>
      val n = nTokens(doc)
      val sorted = cs.sortBy(_.getAs[Long]("chunk_no"))
      // chunk numbering is dense from 0; count matches the closed form
      assert(sorted.map(_.getAs[Long]("chunk_no")).toSeq === sorted.indices.map(_.toLong))
      val expect = 1L + math.ceil(math.max(0L, n - 16) / 12.0).toLong
      assert(sorted.length.toLong === expect, s"doc $doc: $n tokens")
      // every chunk is full-width except possibly the last, which still
      // contributes at least one new token past the previous window
      sorted.init.foreach(c => assert(c.getAs[Long]("n_chunk_tokens") === 16L))
      val last = sorted.last.getAs[Long]("n_chunk_tokens")
      assert(last >= 1L && last <= 16L)
      assert((sorted.length - 1) * 12L + last === n, s"doc $doc covers all tokens")
    }
    // overlap really happens: a 2-chunk doc shares window-stride tokens
    assert(byDoc.exists(_._2.length > 1), "fixture corpus should produce multi-chunk docs")
  }

  test("sketch_quantiles equals the literal sorted-order statistic per source") {
    val got = graft.operators.Sketches.sketchQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // reference: collect per-source qualities, sort, index the type-1
    // quantile directly
    val src = graft.sources.Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byteSrc = graft.operators.TextAnalysis.textQuality(spark, sf)
      .select("doc_id", "quality").collect()
      .filter(!_.isNullAt(1))
      .map(r => (src(r.getLong(0)), r.getDouble(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted.toIndexedSeq }
    assert(byteSrc.nonEmpty)
    byteSrc.foreach { case (s, qs) =>
      for (p <- Seq(25, 50, 75, 90)) {
        val idx = math.ceil(p * qs.length / 100.0).toInt - 1
        // bucketing is lossless at 6 dp, so the histogram quantile must
        // hit the sorted value exactly
        assert(math.abs(got((s, p)) - qs(idx)) < 1e-9,
          s"source $s p$p: got ${got((s, p))}, want ${qs(idx)}")
      }
      // monotone across p by construction
      assert(got((s, 25)) <= got((s, 50)) && got((s, 50)) <= got((s, 75)) &&
        got((s, 75)) <= got((s, 90)))
    }
  }

  test("pipeline_shuffle: a permutation of 1..n, equal to the one-window global order") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.Curate.pipelineShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = graft.sources.Tables.documents(spark, sf).count()
    // permutation: every position 1..n exactly once, every doc once
    assert(got.length.toLong === n)
    assert(got.map(_._1).sorted.toSeq === (1L to n).toSeq)
    assert(got.map(_._2).distinct.length.toLong === n)
    // the sharded assignment equals the literal corpus-wide window
    val ref = graft.sources.Tables.documents(spark, sf).select(col("doc_id"))
      .withColumn("k", graft.functions.HashFunctions.h62(
        concat(lit("shuffle|"), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .select("pos", "doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === ref.sorted.toSeq)
    // deterministic: a second run reproduces the permutation bit-exactly
    val again = graft.operators.Curate.pipelineShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq === got.toSeq)
  }

  test("pipeline_epochs: each epoch a distinct reproducible permutation") {
    val rows = graft.operators.Curate.pipelineEpochs(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = graft.sources.Tables.documents(spark, sf).count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1))
    byEpoch.values.foreach { es =>
      assert(es.map(_._2).sorted.toSeq === (1L to n))
      assert(es.map(_._3).distinct.length.toLong === n)
    }
    // the two epochs genuinely reorder: the doc at each position differs somewhere
    val e0 = byEpoch(0).sortBy(_._2).map(_._3).toSeq
    val e1 = byEpoch(1).sortBy(_._2).map(_._3).toSeq
    assert(e0 !== e1, "epoch salts must produce different orders")
  }
}

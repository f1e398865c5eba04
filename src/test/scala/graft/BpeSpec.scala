package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Distributed BPE training/encoding vs an INDEPENDENT in-memory
  * reference: the reference re-tokenizes the collected corpus with
  * plain Java regex, counts pairs in Scala maps, and applies merges
  * with a recursive rewrite — none of the Spark code path. Agreement
  * pins the distributed pair-count shuffle, the argmax tie-break, and
  * the greedy non-overlapping merge semantics. */
class BpeSpec extends SparkSpec {

  // ---- reference implementation (deliberately different style) ----
  private def refTokens(text: String): Seq[String] =
    "([a-z0-9]+)".r.findAllMatchIn(text.toLowerCase).map(_.group(1)).toSeq

  private def refApply(s: List[String], l: String, r: String): List[String] = s match {
    case a :: b :: rest if a == l && b == r => (l + r) :: refApply(rest, l, r)
    case a :: rest => a :: refApply(rest, l, r)
    case Nil => Nil
  }

  private def refTrain(wordCounts: Map[String, Long], k: Int,
      minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var cur: Seq[(List[String], Long)] =
      wordCounts.toSeq.map { case (w, n) => (w.toList.map(_.toString), n) }
    val out = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < k) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      cur.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + n)
      }
      if (pc.isEmpty) return out.toSeq
      val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      if (c < minCount) return out.toSeq
      out += ((rank, l, r, c))
      cur = cur.map { case (syms, n) => (refApply(syms, l, r), n) }
      rank += 1
    }
    out.toSeq
  }

  private lazy val refWordCounts: Map[String, Long] =
    graft.sources.Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => refTokens(r.getString(0)))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }

  test("applyRule: greedy non-overlapping left-to-right") {
    assert(Bpe.applyRule(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
    assert(Bpe.applyRule(Vector("a", "a", "a", "a"), "a", "a") === Vector("aa", "aa"))
    assert(Bpe.applyRule(Vector("x", "a", "a", "y"), "a", "a") === Vector("x", "aa", "y"))
    assert(Bpe.applyRule(Vector("a", "b"), "b", "a") === Vector("a", "b"))
    assert(Bpe.applyRule(Vector("q"), "a", "a") === Vector("q"))
  }

  test("distributed training equals the in-memory reference, rule for rule") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = Bpe.train(spark, docs, numMerges = 24)
    val want = refTrain(refWordCounts, 24)
    assert(got === want)
    assert(got.length === 24, "sf0.001 corpus should support 24 merges")
    // counts strictly useful: every learned pair occurred at least twice
    assert(got.forall(_._4 >= 2L))
  }

  test("training is deterministic across runs (no memo involved)") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = Bpe.train(spark, docs, numMerges = 12)
    val b = Bpe.train(spark, docs, numMerges = 12)
    assert(a === b)
  }

  test("encodeStats equals the reference encode over the collected corpus") {
    val k = 16
    val rules = refTrain(refWordCounts, k).map(r => (r._2, r._3))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), refTokens(r.getString(1))))
    val wordLen: Map[String, Long] = refWordCounts.keysIterator
      .map(w => w -> rules.foldLeft(w.toList.map(_.toString)) {
        case (s, (l, r)) => refApply(s, l, r)
      }.length.toLong).toMap
    val withTok = docs.filter(_._2.nonEmpty)
    val wantDocs = withTok.length.toLong
    val wantTokens = withTok.map(_._2.length.toLong).sum
    val wantBpe = withTok.map(_._2.map(wordLen).sum).sum
    val row = Bpe.encodeStats(spark, sf, numMerges = k).head()
    assert(row.getLong(0) === wantDocs)
    assert(row.getLong(1) === wantTokens)
    assert(row.getLong(2) === wantBpe)
    // compression is real: merges shrink the symbol stream below chars
    val chars = withTok.map(_._2.map(_.length.toLong).sum).sum
    assert(wantBpe < chars && wantBpe >= wantTokens)
  }
}

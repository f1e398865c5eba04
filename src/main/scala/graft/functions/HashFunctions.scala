package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[Md5Lower64]]: the little-endian signed 64-bit read of
  * md5-digest bytes [8..16). This is bit-identical (modulo two's
  * complement) to DuckDB's `md5_number_lower`, which is the oracle twin
  * used by every hash-bearing query (SURVEY.md §3).
  *
  * Kept as a plain object with no companion class so scalac emits a
  * static forwarder — generated Java (whole-stage codegen) calls
  * `graft.functions.HashImpl.md5Lower64(bytes)` directly.
  */
object HashImpl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Lower64(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }
}

/** Native Catalyst expression: 64-bit hash of a string via md5.
  *
  * Value = signed little-endian int64 of md5 bytes [8..16), i.e. the
  * two's-complement view of DuckDB `md5_number_lower`. A native
  * `Expression` with `doGenCode` (not a UDF) so it inlines into
  * whole-stage codegen — at 100 TB the hash sits in the per-row hot
  * path of dedup/minhash/LSH and must not break the codegen span.
  */
case class Md5Lower64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5lower64"

  override protected def nullSafeEval(input: Any): Any =
    HashImpl.md5Lower64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.md5Lower64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Lower64 =
    copy(child = newChild)
}

/** Native codegen'd integer dot product of two `array<long>` columns.
  *
  * Spark's `aggregate`/`zip_with` HOFs are CodegenFallback (interpreted
  * per row); for pairwise similarity the dot product is THE hot path —
  * at 100 TB it runs once per candidate pair. This expression compiles
  * to a tight Java loop inside whole-stage codegen. Arrays must be
  * non-null element-wise (quantized embeddings always are); extra
  * elements of the longer array are ignored.
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

/** Native distinct n-token shingling of a string array.
  *
  * Replaces a `transform(sequence…) → array_join(slice…) →
  * array_distinct` HOF chain that runs interpreted (~1 ms/doc — it was
  * the dominant cost of every shingle-based dedup pipeline). One
  * compiled loop with a linked hash set: first-occurrence order,
  * string-equality distinct — semantics identical to the HOF chain and
  * to the DuckDB comprehension oracle. Evaluation is a single native
  * call (CodegenFallback), which profiles ~50× faster than the
  * interpreted lambda tree. */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val m = arr.numElements()
    if (m < n) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val sep = UTF8String.fromString(" ")
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, window: _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

/** Native codegen'd intersection count of two SORTED `array<long>`
  * columns — a tight two-pointer merge, no per-element allocation.
  *
  * This is the Jaccard VERIFICATION hot path: with candidate pairs
  * already pruned (prefix + positional filters), counting |a∩b| per
  * pair via this expression replaces a double equi-join of the full
  * posting lists + groupBy — millions of exploded rows and an extra
  * shuffle become one codegen'd loop per pair over two small sorted
  * arrays riding the existing candidate shuffle. Inputs MUST be
  * sorted ascending and duplicate-free (postings are: distinct
  * shingle hashes through `sort_array`). */
case class ArraySortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "array_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |int $n = $a.numElements(), $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) $i++;
         |  else $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Column builders over [[Md5Lower64]]. */
object HashFunctions {

  /** Intersection count of two sorted duplicate-free long arrays
    * (native [[ArraySortedIntersectCount]]). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftShim.column(ArraySortedIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** Signed 64-bit md5-derived hash (two's-complement of DuckDB
    * `md5_number_lower`). */
  def md5Lower64(c: Column): Column =
    GraftShim.column(Md5Lower64(GraftShim.expression(c)))

  /** 62-bit non-negative hash: unsigned(md5Lower64) >>> 2.
    *
    * Both engines stay inside signed BIGINT range, so min/compare/modulo
    * agree everywhere. DuckDB twin: `CAST(md5_number_lower(x) // 4 AS
    * BIGINT)`.
    */
  def h62(c: Column): Column = shiftrightunsigned(md5Lower64(c), 2)

  /** Mersenne prime 2³¹−1: the modulus of the affine minhash family. */
  val MixP: Long = 2147483647L

  /** Seeded affine-mix constants, themselves md5-derived so the DuckDB
    * oracle can regenerate them:
    * aᵢ = h62("minhash-a|i") % (p−1) + 1 (never 0), bᵢ = h62("minhash-b|i") % p. */
  def mixA(i: Int): Long =
    ((HashImpl.md5Lower64(s"minhash-a|$i".getBytes("UTF-8")) >>> 2) % (MixP - 1)) + 1
  def mixB(i: Int): Long =
    (HashImpl.md5Lower64(s"minhash-b|$i".getBytes("UTF-8")) >>> 2) % MixP

  /** One md5 per value, k cheap 2-universal mixes: gᵢ(x) =
    * (aᵢ·(h62(x) mod p) + bᵢ) mod p, p = 2³¹−1. aᵢ·hp < 2⁶² so the
    * arithmetic never overflows signed 64-bit — the same expression
    * evaluates identically in DuckDB BIGINT SQL. ~16× fewer md5 calls
    * than seeded-concat hashing on a 16-seed signature. */
  def affineMix(hp: Column, i: Int): Column =
    (lit(mixA(i)) * hp + lit(mixB(i))) % MixP
}

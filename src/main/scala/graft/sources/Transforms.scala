package graft.sources

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HIDDEN PARTITIONING — Iceberg-style partition transforms.
  *
  * A lakehouse partition spec entry is either a plain column name
  * (identity — the only shape supported before this module) or a
  * transform over a source column:
  *
  *   - `days(ts)` / `months(ts)` / `years(ts)` — UTC calendar
  *     buckets of a DATE or TIMESTAMP column
  *   - `hours(ts)` — UTC hour buckets of a TIMESTAMP column
  *   - `bucket(N, c)` — hash bucket in [0, N) of any string/integral/
  *     date column (engine hash = [[graft.functions.HashFunctions.h62]])
  *   - `truncate(W, c)` — numeric floor-to-multiple-of-W, or string
  *     prefix of length W
  *
  * The derived value is MATERIALIZED as an internal `_p_…` column
  * only in the written layout (Hive `k=v` path segments); readers
  * never see it — [[Lakehouse]] drops `_p_…` on every open, so the
  * table's USER schema stays exactly what was written, which is the
  * "hidden" in hidden partitioning (Iceberg spec §Partitioning: the
  * reference's catalog tables get this from Iceberg itself, e.g. the
  * daily layouts behind mongo_to_iceberg.py:140).
  *
  * Pruning: a predicate on the SOURCE column maps to a conjunct on
  * the derived column ([[PTransform.derivedConjunct]]) — monotone
  * transforms map ranges (`ts >= X` ⇒ `days(ts) >= days(X)`), bucket
  * maps equality only. The mapping feeds the same `_stats.jsonl`
  * skipping machinery as identity partitions, so `WHERE ts BETWEEN …`
  * opens only the day-leaves that can match — without the user ever
  * referencing (or knowing about) the partition column. At 100 TB
  * this is the difference between a day's files and a full scan for
  * every time-ranged query, with zero query rewrites.
  *
  * Transform values are TIMEZONE-FIXED (UTC epoch arithmetic, never
  * session/JVM-local calendar fields): two writers in different
  * sessions must derive identical partition values or pruning reads
  * wrong files.
  */
private[graft] object Transforms {

  /** Internal wrappers for date/timestamp predicate literals
    * (Catalyst internal forms: days / micros since epoch, UTC). */
  case class DateDays(days: Int)
  case class TsMicros(micros: Long)

  private val epoch0 = java.sql.Date.valueOf("1970-01-01")
  private val DayMicros = 86400000000L
  private val HourMicros = 3600000000L

  sealed trait PTransform {
    /** Canonical spec string (no whitespace), e.g. `days(ts)`. */
    def spec: String
    /** Source column the transform reads. */
    def source: String
    /** Physical derived column name (`_p_…`); = [[source]] for identity. */
    def phys: String
    /** Derived-value expression over `df` (identity: the column itself). */
    def expr(df: DataFrame): Column
    /** Map a predicate conjunct on [[source]] to one on [[phys]], or
      * None when the (op, literal) pair can't be mapped soundly. */
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)]
  }

  case class Identity(source: String) extends PTransform {
    def spec: String = source
    def phys: String = source
    def expr(df: DataFrame): Column = df(source)
    // identity partition values already carry source-column stats
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] = None
  }

  /** Exact `Math.floorDiv` of a LONG column by a positive constant,
    * entirely in the long domain: truncating integral divide, minus
    * one when the remainder is negative. The earlier double-division
    * form (`floor(m / unit.toDouble)`) misbuckets micros within
    * ~half an ulp of a bucket boundary once |epoch| leaves the
    * double-exact window (|m| ≳ 2^53, i.e. |epoch hours| ≥ 2^22 for
    * hours() — before ~1492 / after ~2448): a 9999-12-31
    * 23:59:59.999999 sentinel rounded into the NEXT hour's dir, and
    * a claimed aligned-range bound adjacent to the misplaced dir
    * would silently include/exclude that row. Must agree bit-for-bit
    * with the literal side's `Math.floorDiv` in [[litEpochDays]] /
    * Hours.derivedConjunct and with the claim arithmetic in
    * SpjScanBuilderClaims. */
  private def floorDivLong(m: Column, unit: Long): Column = {
    val t = org.apache.spark.sql.GraftShim.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftShim.expression(m),
        org.apache.spark.sql.GraftShim.expression(lit(unit))))
    // remainder sign probe via m - t*unit (never overflows: |t*unit| <= |m|)
    when(m - t * lit(unit) < 0, t - lit(1L)).otherwise(t)
  }

  /** Epoch day of a DATE/TIMESTAMP column (UTC). `datediff` on dates
    * is calendar-free; timestamps floor their epoch micros with an
    * exact long floorDiv ([[floorDivLong]]) — correct over the whole
    * timestamp domain, sentinel values included. */
  private def epochDays(df: DataFrame, source: String): Column =
    df.schema(source).dataType match {
      case DateType => datediff(df(source), lit(epoch0)).cast(LongType)
      case TimestampType => floorDivLong(unix_micros(df(source)), DayMicros)
      case t => throw new IllegalArgumentException(
        s"time partition transform needs a DATE/TIMESTAMP column; $source is ${t.simpleString}")
    }

  private def litEpochDays(v: Any): Option[Long] = v match {
    case DateDays(d) => Some(d.toLong)
    case TsMicros(m) => Some(Math.floorDiv(m, DayMicros))
    case _ => None
  }

  /** Monotone range mapping shared by every order-preserving
    * transform: `c = v` ⇒ `T(c) = T(v)`; `c > v` and `c >= v` both
    * imply `T(c) >= T(v)` (T is non-decreasing but lossy — rows below
    * v inside v's bucket still pass, the residual predicate removes
    * them); `c < v` / `c <= v` ⇒ `T(c) <= T(v)`. */
  private def monotone(phys: String, op: String, tv: Any): Option[(String, String, Any)] =
    op match {
      case "=" => Some((phys, "=", tv))
      case ">" | ">=" => Some((phys, ">=", tv))
      case "<" | "<=" => Some((phys, "<=", tv))
      case _ => None
    }

  case class Days(source: String) extends PTransform {
    def spec = s"days($source)"
    def phys = s"_p_days_$source"
    def expr(df: DataFrame): Column = epochDays(df, source)
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] =
      litEpochDays(v).flatMap(d => monotone(phys, op, d))
  }

  case class Months(source: String) extends PTransform {
    def spec = s"months($source)"
    def phys = s"_p_months_$source"
    def expr(df: DataFrame): Column = {
      // months since 1970-01 of the UTC calendar date — computed off
      // epoch days through DATE functions (timezone-free), never
      // session-TZ year()/month() on the raw timestamp
      val d = date_add(lit(epoch0), epochDays(df, source).cast(IntegerType))
      ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast(LongType)
    }
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] =
      litEpochDays(v).flatMap { d =>
        val ld = LocalDate.ofEpochDay(d)
        monotone(phys, op, ((ld.getYear - 1970) * 12 + ld.getMonthValue - 1).toLong)
      }
  }

  case class Years(source: String) extends PTransform {
    def spec = s"years($source)"
    def phys = s"_p_years_$source"
    def expr(df: DataFrame): Column = {
      val d = date_add(lit(epoch0), epochDays(df, source).cast(IntegerType))
      (year(d) - lit(1970)).cast(LongType)
    }
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] =
      litEpochDays(v).flatMap(d =>
        monotone(phys, op, (LocalDate.ofEpochDay(d).getYear - 1970).toLong))
  }

  case class Hours(source: String) extends PTransform {
    def spec = s"hours($source)"
    def phys = s"_p_hours_$source"
    def expr(df: DataFrame): Column = df.schema(source).dataType match {
      case TimestampType => floorDivLong(unix_micros(df(source)), HourMicros)
      case t => throw new IllegalArgumentException(
        s"hours() needs a TIMESTAMP column; $source is ${t.simpleString}")
    }
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] = v match {
      case TsMicros(m) => monotone(phys, op, Math.floorDiv(m, HourMicros))
      case _ => None
    }
  }

  /** Hash bucket in [0, n): `h62(cast(c AS STRING)) mod n`, the same
    * engine hash the bloom ledger canonicalizes with — the literal
    * side reproduces Spark's cast-to-string for strings, integrals
    * and dates exactly; anything else maps no conjunct (writes stay
    * correct, point lookups just don't prune). NOT order-preserving:
    * only `=` maps. */
  case class Bucket(n: Int, source: String) extends PTransform {
    require(n > 0, s"bucket(n, $source): n must be positive, got $n")
    def spec = s"bucket($n,$source)"
    def phys = s"_p_bucket_${n}_$source"
    def expr(df: DataFrame): Column = df.schema(source).dataType match {
      // only types whose cast-to-string is session-independent may
      // feed the bucket hash: a TIMESTAMP's string form follows the
      // session timezone, so two writers could derive different
      // buckets for the same row and partitionedUpsert's
      // supersede-by-leaf logic would duplicate rows
      case StringType | ByteType | ShortType | IntegerType | LongType | DateType =>
        pmod(graft.functions.HashFunctions.h62(df(source).cast(StringType)), lit(n.toLong))
      case t => throw new IllegalArgumentException(
        s"bucket() needs a string, integral or date column; $source is ${t.simpleString}" +
          " (timestamp and other types cast to session-dependent strings)")
    }
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] = {
      if (op != "=") return None
      val canonical = v match {
        case s: String => Some(s)
        case i: Byte => Some(i.toString)
        case i: Short => Some(i.toString)
        case i: Int => Some(i.toString)
        case i: Long => Some(i.toString)
        case DateDays(d) => Some(LocalDate.ofEpochDay(d.toLong).toString)
        case _ => None
      }
      canonical.map { s =>
        val h = graft.functions.HashImpl.md5Lower64(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 2
        (phys, "=", h % n)
      }
    }
  }

  /** Width-W truncation: integrals floor to the nearest multiple of W
    * (`c - (c mod W)`, floored mod so negatives bucket downward);
    * strings take the length-W prefix. Both are order-preserving, so
    * ranges map like the time transforms. */
  case class Trunc(w: Int, source: String) extends PTransform {
    require(w > 0, s"truncate(w, $source): w must be positive, got $w")
    def spec = s"truncate($w,$source)"
    def phys = s"_p_trunc_${w}_$source"
    def expr(df: DataFrame): Column = df.schema(source).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (df(source).cast(LongType) - pmod(df(source).cast(LongType), lit(w.toLong)))
      case StringType => substring(df(source), 1, w)
      case t => throw new IllegalArgumentException(
        s"truncate() needs an integral or string column; $source is ${t.simpleString}")
    }
    def derivedConjunct(op: String, v: Any): Option[(String, String, Any)] = v match {
      // prefix by CODE POINTS to match Spark's substring (and
      // Iceberg's truncate): s.take(w) counts UTF-16 units, which
      // disagrees past a supplementary character and could prune a
      // leaf that holds matching rows
      case s: String =>
        val cp = s.offsetByCodePoints(0, math.min(w, s.codePointCount(0, s.length)))
        monotone(phys, op, s.substring(0, cp))
      case i: Byte => num(op, i.toLong)
      case i: Short => num(op, i.toLong)
      case i: Int => num(op, i.toLong)
      case i: Long => num(op, i)
      case _ => None
    }
    private def num(op: String, v: Long) =
      monotone(phys, op, v - Math.floorMod(v, w.toLong))
  }

  private val TimeRe = """(days|months|years|hours)\(([^)]+)\)""".r
  private val BucketRe = """bucket\((\d+),([^)]+)\)""".r
  private val TruncRe = """truncate\((\d+),([^)]+)\)""".r
  private val PhysTimeRe = """_p_(days|months|years|hours)_(.+)""".r
  private val PhysBucketRe = """_p_bucket_(\d+)_(.+)""".r
  private val PhysTruncRe = """_p_trunc_(\d+)_(.+)""".r

  /** Canonical spec form: whitespace-free (so `bucket(16, c)` and
    * `bucket(16,c)` are the same layout everywhere specs compare). */
  def canon(spec: Seq[String]): Seq[String] = spec.map(_.replaceAll("\\s+", ""))

  def parse(spec: String): PTransform = spec.replaceAll("\\s+", "") match {
    case TimeRe("days", c) => Days(c)
    case TimeRe("months", c) => Months(c)
    case TimeRe("years", c) => Years(c)
    case TimeRe("hours", c) => Hours(c)
    case BucketRe(n, c) => Bucket(n.toInt, c)
    case TruncRe(w, c) => Trunc(w.toInt, c)
    case s if !s.contains("(") => Identity(s)
    case s => throw new IllegalArgumentException(
      s"unknown partition transform: $s (supported: days/months/years/hours/bucket/truncate)")
  }

  /** Spec string a PHYSICAL layout column round-trips to — how
    * [[Lakehouse.dirLayout]] reports a transform dir's layout in the
    * same vocabulary the API takes. Plain names map to themselves.
    * (Source columns must not start with a digit-underscore pattern
    * that mimics the encodings; SQL identifiers don't.) */
  def specOfPhys(phys: String): String = phys match {
    case PhysTimeRe(unit, c) => s"$unit($c)"
    case PhysBucketRe(n, c) => s"bucket($n,$c)"
    case PhysTruncRe(w, c) => s"truncate($w,$c)"
    case c => c
  }

  /** Parse a PHYSICAL layout column into its transform; Identity for
    * plain names. */
  def parsePhys(phys: String): PTransform = parse(specOfPhys(phys))

  /** Materialize the derived columns a spec needs for a partitioned
    * write (no-op for identity entries). */
  def withDerived(df: DataFrame, ts: Seq[PTransform]): DataFrame =
    ts.foldLeft(df) {
      case (d, _: Identity) => d
      case (d, t) => d.withColumn(t.phys, t.expr(d))
    }

  /** Drop the internal derived columns from a read — the "hidden" in
    * hidden partitioning. */
  def dropDerived(df: DataFrame): DataFrame = {
    val hidden = df.columns.filter(_.startsWith("_p_"))
    if (hidden.isEmpty) df else df.drop(hidden.toIndexedSeq: _*)
  }

  /** Expand predicate conjuncts with their derived-column images for
    * every non-identity transform in `physLayouts` (the union of the
    * snapshot's dir layouts, physical names). Extra conjuncts are
    * sound by construction: stats for a `_p_…` column exist only in
    * dirs written under that exact transform, and absence of stats
    * never prunes. */
  def derivedConjuncts(conjuncts: Seq[(String, String, Any)],
      physLayouts: Seq[String]): Seq[(String, String, Any)] = {
    val transforms = physLayouts.distinct.map(parsePhys).filter {
      case _: Identity => false
      case _ => true
    }
    conjuncts ++ transforms.flatMap(t =>
      conjuncts.filter(_._1 == t.source)
        .flatMap {
          // IN maps value-wise: every element must map (a partial
          // mapping would narrow the disjunction — unsound)
          case (_, "in", vs: Seq[_]) =>
            val mapped = vs.map(t.derivedConjunct("=", _))
            if (mapped.nonEmpty && mapped.forall(_.isDefined))
              Seq((t.phys, "in", mapped.flatten.map(_._3)))
            else Seq.empty
          case (_, op, v) => t.derivedConjunct(op, v)
        })
  }
}

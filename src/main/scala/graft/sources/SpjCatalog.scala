package graft.sources.spj

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.sources.{Lakehouse, SpjFile, SpjLayout}

/** STORAGE-PARTITIONED JOINS over hidden `bucket(n,k)` lakehouse
  * layouts — the Iceberg-SPJ analog, done the way Iceberg does it: a
  * DSv2 catalog whose scans report [[KeyGroupedPartitioning]] keyed by
  * the bucket transform, with the transform's hash exposed as a
  * catalog V2 function. When two tables share the transform and the
  * join keys cover the bucket column, Spark's `EnsureRequirements`
  * proves both sides are already co-located bucket-by-bucket and
  * plans the join with NO Exchange — at 100 TB that deletes the
  * dominant shuffle of every fact-fact equi-join that the layout
  * already paid for at write time, without the separate
  * Spark-native-bucketed companion copy ([[Lakehouse.writeBucketed]])
  * this repo used before.
  *
  * Register once per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_spj", classOf[GraftSpjCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft_spj.root", lakeRoot)
  *   spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  *   spark.table("graft_spj.t1").join(spark.table("graft_spj.t2"), ...)
  * }}}
  *
  * The scan serves the table's CURRENT main-branch snapshot, resolved
  * at `loadTable` time (plan-time pinning: concurrent commits never
  * shift a running query). File lists come from the snapshot ledger
  * grouped by bucket-dir value — one metadata walk, zero data opens at
  * plan time — and EVERY bucket in [0, n) is emitted (empty buckets
  * as empty partitions) so the two sides' partition-value sets always
  * align position-for-position. Reference analog: the silver layer's
  * enrichment join (silver_transformation.py) re-shuffles both sides
  * every run; a bucket-layout table pays that shuffle once at write.
  */
class GraftSpjCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null,
      s"catalog $name needs option 'root' (spark.sql.catalog.$name.root = <lakehouse root>)")
  }
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = Array.empty

  override def loadTable(ident: Identifier): Table = {
    val lake = new Lakehouse(SparkSession.active, root)
    // `graft_spj.<table>` reads main; `graft_spj.<branch>.<table>`
    // reads a branch (namespace = branch name, Iceberg-style)
    val branch = ident.namespace() match {
      case Array() => "main"
      case Array(b) => b
      case _ => throw new NoSuchTableException(ident)
    }
    val layout =
      try lake.spjLayout(ident.name(), branch)
      catch {
        case e: IllegalArgumentException if e.getMessage.startsWith("no such table") =>
          throw new NoSuchTableException(ident)
      }
    new GraftSpjTable(ident.name(), layout, root)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft SPJ catalog is a read facade — write through the Lakehouse API")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only catalog")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only catalog")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name().equalsIgnoreCase("bucket")) GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}

/** One lakehouse snapshot presented as a DSv2 table partitioned by
  * `bucket(n, keyCol)`. Reads serve the snapshot pinned at load;
  * writes route through the Lakehouse writer UNDER THE SAME LAYOUT
  * (the V1Write escape hatch Spark provides for exactly this), so
  * `INSERT INTO cat.t` / `df.writeTo(cat.t).append()` land as
  * ordinary hidden-bucket commits — optimistic concurrency, stats,
  * time travel and SPJ planning all keep working, and the next read
  * re-resolves the table at its new snapshot. */
private[spj] class GraftSpjTable(tableName: String, layout: SpjLayout, root: String)
  extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = layout.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(layout.nBuckets, layout.keyCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(layout)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSpjWriteBuilder(root, tableName, layout.keyCol, layout.nBuckets)
}

/** Appends and truncating overwrites, routed to the Lakehouse writer
  * with the table's own bucket spec — one commit per insert, same
  * layout, so the write needs no DSv2 DataWriter machinery of its
  * own and inherits the writer's conflict retries and ledgers. */
private[spj] class GraftSpjWriteBuilder(root: String, tableName: String,
    keyCol: String, nBuckets: Int) extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
      (data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], ow: Boolean) => {
        val lake = new Lakehouse(SparkSession.active, root)
        val spec = Seq(s"bucket($nBuckets,$keyCol)")
        if (overwrite || ow) lake.createOrReplace(data.toDF(), tableName, spec)
        else lake.append(data.toDF(), tableName, spec)
        ()
      }
  }
}

/** Column pruning AND filter pushdown reach the scan. Filters do
  * triple duty, every leg conservative:
  *  - FILE pruning against each file's stats-ledger bounds (may-match
  *    ranges — a file is dropped only when its recorded [lo, hi]
  *    PROVES no row can satisfy a conjunct);
  *  - BUCKET pruning: an equality/IN on the bucket column maps through
  *    the layout hash to the only buckets that can hold matches (the
  *    partition STRUCTURE is kept — pruned buckets plan as empty
  *    partitions, so SPJ alignment with the other side is untouched);
  *  - ROW-GROUP skipping: the accepted filters ride into the parquet
  *    reader, which skips row groups by footer stats.
  * Every filter is ALSO returned as residual — pruning is may-match,
  * so Spark keeps the exact predicate on top; a wrong-but-fast
  * pushdown is the one bug class this surface must never have. */
private[spj] class GraftSpjScanBuilder(layout: SpjLayout)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  import org.apache.spark.sql.sources.Filter

  private var required: StructType = layout.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SpjPruning.usable)
    filters // ALL filters stay residual: pruning is may-match only
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = {
    val allowed = SpjPruning.allowedBuckets(layout.keyCol, layout.nBuckets, pushed.toSeq)
    val pruned = layout.files.map { case (b, fs) =>
      b -> (if (allowed.exists(a => !a.contains(b))) Seq.empty[SpjFile]
      else fs.filter(f => pushed.forall(SpjPruning.mayMatch(f.stats, _))))
    }
    new GraftSpjScan(layout.schema, required, layout.keyCol, layout.nBuckets, pruned, pushed.toSeq)
  }
}

private[spj] class GraftSpjScan(dataSchema: StructType, required: StructType,
    keyCol: String, nBuckets: Int, files: Map[Int, Seq[SpjFile]],
    pushed: Seq[org.apache.spark.sql.sources.Filter])
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSpj bucket($nBuckets,$keyCol) ${files.valuesIterator.map(_.size).sum} files" +
      (if (pushed.isEmpty) "" else s" PushedFilters: [${pushed.mkString(", ")}]")

  /** The contract that deletes the Exchange: each scan partition IS
    * one bucket, keyed by the transform over the join column. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.bucket(nBuckets, keyCol)), nBuckets)

  /** All n buckets, in bucket order, EMPTY buckets included — both
    * join sides must present identical partition-value sets or the
    * planner falls back to a shuffle. */
  override def planInputPartitions(): Array[InputPartition] =
    (0 until nBuckets).map { b =>
      GraftBucketPartition(b, files.getOrElse(b, Seq.empty).toArray)
    }.toArray

  /** The reader function is Spark's own parquet reader, built ONCE on
    * the driver (it broadcasts the hadoop conf internally and is
    * designed to ship to executors — the same mechanism FileSourceScan
    * uses), so per-file reading gets predicate-free footer decode,
    * column pruning and the vectorized path for free. */
  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val conf: Configuration = spark.sessionState.newHadoopConf()
    val readerFn = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, dataSchema, new StructType(), required, pushed,
      // row-returning contract: this scan's PartitionReader hands rows
      // to DataSourceRDD (vectorized decode still happens inside the
      // reader; only the hand-off is row-shaped)
      Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
      conf)
    new GraftSpjReaderFactory(readerFn)
  }
}

private[graft] case class GraftBucketPartition(bucket: Int, files: Array[SpjFile])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

private[spj] class GraftSpjReaderFactory(
    readerFn: PartitionedFile => Iterator[InternalRow])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketPartition]
    // the vectorized reader hands back ColumnarBatch under an
    // InternalRow-typed iterator (the FileScanRDD convention) —
    // flatten batches to their row view, exactly as ColumnarToRow does
    val rows: Iterator[InternalRow] = p.files.iterator.flatMap { f =>
      readerFn(PartitionedFile(InternalRow.empty, SparkPath.fromPathString(f.path),
        0L, f.length, Array.empty[String], 0L, f.length, Map.empty))
        .asInstanceOf[Iterator[Any]]
        .flatMap {
          case b: ColumnarBatch => b.rowIterator().asScala
          case r: InternalRow => Iterator.single(r)
        }
    }
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = rows.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

/** The bucket transform as a catalog V2 function — what lets Spark
  * resolve the `bucket(n,k)` in [[KeyGroupedPartitioning]] to a
  * concrete, comparable expression: two scans are co-partitioned iff
  * their transforms carry the same `canonicalName` and bucket count.
  * The hash is the ENGINE's bucket hash ([[graft.sources.Transforms]]
  * Bucket: `pmod(h62(cast(k AS STRING)), n)`), so `produceResult`
  * agrees bit-for-bit with the directory layout the writer produced —
  * that identity is what makes partially-clustered SPJ correct when
  * Spark evaluates the function on join-key values. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(md5_lower64(cast(col AS STRING)) >>> 2, n) — the graft layout hash"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, col), got ${inputType.simpleString}")
    inputType.fields(1).dataType match {
      // the same type whitelist as the write-side transform: only
      // session-independent cast-to-string types may feed the hash
      case t @ (StringType | ByteType | ShortType | IntegerType | LongType | DateType) =>
        GraftBucketBound(t)
      case t => throw new UnsupportedOperationException(
        s"bucket() needs a string, integral or date column; got ${t.simpleString}")
    }
  }
}

private[spj] case class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val s = keyType match {
      case StringType => input.getUTF8String(1).toString
      case LongType => input.getLong(1).toString
      case IntegerType => input.getInt(1).toString
      case ShortType => input.getShort(1).toString
      case ByteType => input.getByte(1).toString
      case DateType => java.time.LocalDate.ofEpochDay(input.getInt(1).toLong).toString
      case t => throw new IllegalStateException(s"unbindable key type $t")
    }
    val h = graft.functions.HashImpl.md5Lower64(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 2
    (h % n).toInt
  }
}

/** Conservative plan-time pruning against pushed V1 filters. The only
  * permitted error direction is KEEPING a file that holds no matches —
  * dropping one that might is the silent-wrong-results bug class, so
  * every unknown (missing stat, unmapped type, unparseable bound,
  * unsupported filter shape) answers "may match". */
private[spj] object SpjPruning {
  import org.apache.spark.sql.sources._

  /** Filters safe to carry: stats-comparable scalar shapes. These also
    * ride into the parquet reader for row-group skipping. */
  def usable(f: Filter): Boolean = f match {
    case EqualTo(_, v) => scalar(v)
    case GreaterThan(_, v) => scalar(v)
    case GreaterThanOrEqual(_, v) => scalar(v)
    case LessThan(_, v) => scalar(v)
    case LessThanOrEqual(_, v) => scalar(v)
    case In(_, vs) => vs.nonEmpty && vs.forall(scalar)
    case And(l, r) => usable(l) && usable(r)
    case _ => false
  }

  private def scalar(v: Any): Boolean = v match {
    case null => false
    case _: String | _: Long | _: Int | _: Short | _: Byte | _: Double | _: Float => true
    case _ => false
  }

  /** Compare a recorded stat bound to a filter value under the stat's
    * type tag; None = not comparable (degrade to may-match). */
  private def cmp(t: String, bound: String, v: Any): Option[Int] = t match {
    case "string" => v match {
      case s: String => Some(bound.compareTo(s))
      case _ => None
    }
    case "long" | "double" => v match {
      case _: Long | _: Int | _: Short | _: Byte | _: Double | _: Float =>
        scala.util.Try(BigDecimal(bound).compare(BigDecimal(v.toString))).toOption
      case _ => None
    }
    case _ => None
  }

  /** May ANY row of a file with these recorded bounds satisfy `f`? */
  def mayMatch(stats: Map[String, (String, String, String)], f: Filter): Boolean = f match {
    case And(l, r) => mayMatch(stats, l) && mayMatch(stats, r)
    case EqualTo(c, v) => stats.get(c).forall { case (t, lo, hi) =>
      (for { a <- cmp(t, lo, v); b <- cmp(t, hi, v) } yield a <= 0 && b >= 0).getOrElse(true)
    }
    case GreaterThan(c, v) => stats.get(c).forall { case (t, _, hi) =>
      cmp(t, hi, v).forall(_ > 0)
    }
    case GreaterThanOrEqual(c, v) => stats.get(c).forall { case (t, _, hi) =>
      cmp(t, hi, v).forall(_ >= 0)
    }
    case LessThan(c, v) => stats.get(c).forall { case (t, lo, _) =>
      cmp(t, lo, v).forall(_ < 0)
    }
    case LessThanOrEqual(c, v) => stats.get(c).forall { case (t, lo, _) =>
      cmp(t, lo, v).forall(_ <= 0)
    }
    case In(c, vs) => vs.isEmpty || vs.exists(v => mayMatch(stats, EqualTo(c, v)))
    case _ => true
  }

  /** Buckets an equality/IN on the bucket column can reach through the
    * layout hash; None = no usable bucket-column conjunct (all
    * buckets). Conjuncts intersect. */
  def allowedBuckets(keyCol: String, n: Int, fs: Seq[Filter]): Option[Set[Int]] = {
    def flat(f: Filter): Seq[Filter] = f match {
      case And(l, r) => flat(l) ++ flat(r)
      case other => Seq(other)
    }
    val sets = fs.flatMap(flat).flatMap {
      case EqualTo(c, v) if c == keyCol =>
        canonical(v).map(s => Set(bucketOf(s, n)))
      case In(c, vs) if c == keyCol && vs.nonEmpty =>
        val cs = vs.toSeq.map(canonical)
        if (cs.forall(_.isDefined)) Some(cs.flatten.map(bucketOf(_, n)).toSet) else None
      case _ => None
    }
    sets.reduceOption(_ intersect _)
  }

  /** The write-side transform's cast-to-string canonical form — only
    * session-independent types map (same whitelist as Transforms). */
  private def canonical(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case i: Long => Some(i.toString)
    case i: Int => Some(i.toString)
    case i: Short => Some(i.toString)
    case i: Byte => Some(i.toString)
    case _ => None
  }

  private def bucketOf(s: String, n: Int): Int =
    ((graft.functions.HashImpl.md5Lower64(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)) >>> 2) % n).toInt
}

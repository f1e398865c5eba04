package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Medallion
import graft.sources.{Lakehouse, Tables}
import graft.sources.spj.GraftSpjCatalog

/** Storage-partitioned joins over hidden `bucket(n,k)` layouts
  * ([[graft.sources.spj.GraftSpjCatalog]]): two lakehouse tables
  * sharing the bucket transform join with NO Exchange, results
  * bit-equal to the plain shuffled join. */
class SpjSpec extends SparkSpec {

  // one catalog name per root: Spark caches catalog instances by name
  // with the options seen at FIRST use, so re-pointing `.root` on a
  // used name would silently keep serving the old lakehouse
  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val prevBucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      prevBucketing match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("join of two bucket(8,k) hidden-layout tables plans no Exchange and matches the shuffled join") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    lake.createOrReplace(orders, "spj_o", Seq("bucket(8,o_custkey)"))
    // second table built from TWO commits: the scan must union dirs
    lake.createOrReplace(cust.where(col("c_custkey") % 2 === 0), "spj_c",
      Seq("bucket(8,c_custkey)"))
    lake.append(cust.where(col("c_custkey") % 2 =!= 0), "spj_c",
      Seq("bucket(8,c_custkey)"))
    withSpj(root, "spj_t1") {
      val a = spark.table("spj_t1.spj_o")
      val b = spark.table("spj_t1.spj_c")
      val joined = a.join(b, col("o_custkey") === col("c_custkey"))
      assert(!Medallion.plansShuffle(joined),
        "co-bucketed SPJ join must not shuffle:\n" + joined.queryExecution.executedPlan)
      val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      assert(sortedRows(joined) === sortedRows(plain))
      assert(joined.count() > 0)
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join (negative control)") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-n").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    lake.createOrReplace(orders, "spj_o8", Seq("bucket(8,o_custkey)"))
    lake.createOrReplace(cust, "spj_c16", Seq("bucket(16,c_custkey)"))
    withSpj(root, "spj_t2") {
      val joined = spark.table("spj_t2.spj_o8")
        .join(spark.table("spj_t2.spj_c16"), col("o_custkey") === col("c_custkey"))
      assert(Medallion.plansShuffle(joined),
        "8-vs-16 buckets cannot be co-located — the planner must shuffle")
      val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      assert(sortedRows(joined) === sortedRows(plain))
    }
  }

  test("column pruning reaches the SPJ scan; empty buckets plan as empty partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-p").toString
    val lake = new Lakehouse(spark, root)
    // two keys only -> at most 2 of 8 buckets non-empty, the other
    // partitions must still exist (both sides align) and read empty
    import spark.implicits._
    val few = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k2", "w")
    lake.createOrReplace(few, "spj_few", Seq("bucket(8,k)"))
    lake.createOrReplace(dim, "spj_dim", Seq("bucket(8,k2)"))
    withSpj(root, "spj_t3") {
      val t = spark.table("spj_t3.spj_few")
      val joined = t.join(spark.table("spj_t3.spj_dim"), col("k") === col("k2"))
        .select(col("k"), col("v"), col("w"))
      assert(!Medallion.plansShuffle(joined))
      assert(sortedRows(joined) === Seq("1|a|10.0", "2|b|20.0"))
      // pruning: a single-column projection must not read the rest
      val pruned = t.select(col("v"))
      val scanDesc = pruned.queryExecution.executedPlan.toString
      assert(!scanDesc.contains("k#") || scanDesc.contains("GraftSpj"),
        "scan should describe the SPJ source")
      assert(pruned.queryExecution.executedPlan.toString.contains("GraftSpj"))
      assert(sortedRows(pruned) === Seq("a", "b"))
    }
  }

  test("aggregation on the bucket column is Exchange-free too") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-a").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    lake.createOrReplace(orders, "spj_ag", Seq("bucket(8,o_custkey)"))
    withSpj(root, "spj_t5") {
      // KeyGroupedPartitioning satisfies the aggregation's clustering
      // requirement: per-custkey counts reduce inside each bucket
      // partition, no shuffle (at 100 TB the same layout that deletes
      // the join shuffle deletes the final-aggregate exchange)
      val agg = spark.table("spj_t5.spj_ag")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      assert(!Medallion.plansShuffle(agg), "bucket-keyed aggregation must not shuffle")
      val want = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      assert(sortedRows(agg) === sortedRows(want))
    }
  }

  test("pushed filters prune files by ledger stats and buckets by the layout hash") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftBucketPartition
    def filesOf(df: DataFrame): Int = {
      def walk(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: BatchScanExec => s.inputPartitions.iterator.map {
          case g: GraftBucketPartition => g.files.length
          case _ => 0
        }.foldLeft(0)(_ + _)
        case other => other.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    val root = java.nio.file.Files.createTempDirectory("graft-spj-f").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val b = orders.agg(max(col("o_orderkey"))).head().getLong(0) / 2
    // two key-range-disjoint commits, one file per (commit, bucket):
    // o_orderkey stats separate the commits, the bucket dir separates
    // the custkeys
    lake.createOrReplace(orders.where(col("o_orderkey") <= b).repartition(1),
      "spj_pr", Seq("bucket(4,o_custkey)"))
    lake.append(orders.where(col("o_orderkey") > b).repartition(1),
      "spj_pr", Seq("bucket(4,o_custkey)"))
    withSpj(root, "spj_t4") {
      val t = spark.table("spj_t4.spj_pr")
      val total = filesOf(t)
      assert(total == 8, s"expected 2 commits x 4 buckets = 8 files, got $total")
      // stats pruning: the range filter can only match commit-1 files
      val ranged = t.where(col("o_orderkey") <= b)
      assert(filesOf(ranged) == 4, "commit-2 files must be pruned by o_orderkey stats")
      assert(ranged.count() === orders.where(col("o_orderkey") <= b).count())
      // bucket pruning: equality on the bucket column reaches one
      // bucket (<= 2 files, one per commit), rows stay exact
      val someKey = orders.select(col("o_custkey")).head().getLong(0)
      val eq = t.where(col("o_custkey") === someKey)
      assert(filesOf(eq) <= 2, s"expected at most one bucket's files, got ${filesOf(eq)}")
      assert(eq.count() === orders.where(col("o_custkey") === someKey).count())
      // combined: range + equality composes both prunings
      val both = t.where(col("o_custkey") === someKey && col("o_orderkey") <= b)
      assert(filesOf(both) <= 1)
      assert(both.count() ===
        orders.where(col("o_custkey") === someKey && col("o_orderkey") <= b).count())
      // a filter the pruner can't use (function of a column) keeps
      // every file and stays correct
      val opaque = t.where(abs(col("o_orderkey")) <= b)
      assert(filesOf(opaque) == 8)
      assert(opaque.count() === orders.where(abs(col("o_orderkey")) <= b).count())
    }
  }

  test("writes through the SPJ catalog land in the bucket layout and keep SPJ valid") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-w").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val dim = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (100L, 99.0)).toDF("k2", "w")
    lake.createOrReplace(base, "spj_w", Seq("bucket(8,k)"))
    lake.createOrReplace(dim, "spj_wd", Seq("bucket(8,k2)"))
    withSpj(root, "spj_t6") {
      // SQL INSERT INTO routes through the Lakehouse writer
      spark.sql("INSERT INTO spj_t6.spj_w VALUES (100, 'z')")
      assert(sortedRows(spark.table("spj_t6.spj_w")) ===
        Seq("100|z", "1|a", "2|b", "3|c").sorted)
      // the appended commit kept the uniform bucket layout...
      assert(lake.spjLayout("spj_w").nBuckets === 8)
      // ...so the join over the grown table still plans Exchange-free
      val joined = spark.table("spj_t6.spj_w")
        .join(spark.table("spj_t6.spj_wd"), col("k") === col("k2"))
      assert(!Medallion.plansShuffle(joined))
      assert(joined.count() === 4)
      // DataFrame writeTo append works the same way
      Seq((200L, "y")).toDF("k", "v").writeTo("spj_t6.spj_w").append()
      assert(spark.table("spj_t6.spj_w").count() === 5)
      // INSERT OVERWRITE truncates into a fresh snapshot, same layout
      spark.sql("INSERT OVERWRITE spj_t6.spj_w VALUES (7, 'q'), (8, 'r')")
      assert(sortedRows(spark.table("spj_t6.spj_w")) === Seq("7|q", "8|r"))
      assert(lake.spjLayout("spj_w").nBuckets === 8)
      // history survives: the pre-overwrite snapshot is still readable
      assert(lake.snapshots("spj_w").size >= 3)
    }
  }

  test("partially-clustered SPJ handles a skewed hot bucket, still Exchange-free") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-sk").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    // fact: key 1 is hot (10k rows across many files), the rest tiny —
    // the shape where plain SPJ would serialize the hot bucket through
    // one task; Spark's partially-clustered distribution may split the
    // big side's bucket into file groups while replicating the other
    // side's group, and our HasPartitionKey partitions must compose
    // with that re-plan without losing correctness or gaining a shuffle
    val fact = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (2 to 20).flatMap(k => (1 to 10).map(i => (k.toLong, i.toLong)))).toDF("k", "x")
    val dim = (1 to 20).map(k => (k.toLong, s"d$k")).toDF("k2", "name")
    lake.createOrReplace(fact.repartition(8), "sk_f", Seq("bucket(4,k)"))
    lake.createOrReplace(dim, "sk_d", Seq("bucket(4,k2)"))
    withSpj(root, "spj_t7") {
      val prev = spark.conf.getOption(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
      try {
        val j = spark.table("spj_t7.sk_f")
          .join(spark.table("spj_t7.sk_d"), col("k") === col("k2"))
        assert(!Medallion.plansShuffle(j))
        assert(j.count() === 10000 + 19 * 10)
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
      }
    }
  }

  test("the V2 bucket function agrees with the write-side layout hash") {
    import graft.sources.spj.GraftBucketFunction
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val boundLong = GraftBucketFunction.bind(
      StructType(Seq(StructField("n", IntegerType), StructField("k", LongType))))
    val boundStr = GraftBucketFunction.bind(
      StructType(Seq(StructField("n", IntegerType), StructField("k", StringType))))
    // engine side: the same hash the writer used to route rows
    val engine = spark.range(0, 200).toDF("k")
      .withColumn("b", pmod(graft.functions.HashFunctions.h62(col("k").cast("string")), lit(8L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 200L).foreach { k =>
      val viaLong = boundLong.asInstanceOf[
        org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
        .produceResult(InternalRow(8, k))
      val viaStr = boundStr.asInstanceOf[
        org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
        .produceResult(InternalRow(8, UTF8String.fromString(k.toString)))
      assert(viaLong.toInt === engine(k).toInt, s"long key $k")
      assert(viaStr.toInt === engine(k).toInt, s"string key $k")
    }
  }

  // the shared AQE-aware plan walker (QueryStageExec subtrees included)
  private def collectPlan[T](df: DataFrame)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] =
    Medallion.collectExec(df)(pf)

  test("global aggregates answer from the ledgers: one driver-local row, no scan") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-ma").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("price_d"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("prio_n"))
    // sums are OPT-IN per table (declared before the write, like the
    // Iceberg compute_table_stats flow) — the pushdown rides them
    lake.declareSumColumns("spj_ma", Seq("o_orderkey", "price_d"))
    lake.createOrReplace(orders.where(col("o_orderkey") % 2 === 0), "spj_ma",
      Seq("bucket(8,o_custkey)"))
    lake.append(orders.where(col("o_orderkey") % 2 =!= 0), "spj_ma",
      Seq("bucket(8,o_custkey)"))
    withSpj(root, "spj_t8") {
      val q = spark.sql("""SELECT count(*) AS cnt, count(prio_n) AS cnt_nn,
          min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
          min(o_orderstatus) AS min_s, max(prio_n) AS max_p,
          sum(o_orderkey) AS sum_k, sum(price_d) AS sum_p
        FROM spj_t8.spj_ma""")
      val want = orders.agg(count(lit(1)).as("cnt"), count(col("prio_n")).as("cnt_nn"),
        min("o_orderkey").as("min_k"), max("o_orderkey").as("max_k"),
        min("o_orderstatus").as("min_s"), max("prio_n").as("max_p"),
        sum("o_orderkey").as("sum_k"), sum("price_d").as("sum_p"))
      assert(sortedRows(q) === sortedRows(want))
      assert(collectPlan(q) { case l: LocalTableScanExec => l }.nonEmpty,
        "metadata-answered aggregate should plan a driver-local scan:\n" +
          q.queryExecution.executedPlan)
      assert(collectPlan(q) { case b: BatchScanExec => b }.isEmpty,
        "no file scan may remain under a complete agg pushdown")

      // declines fall back to the real scan, bit-equal either way:
      // DISTINCT aggregates and filtered aggregates are not provable
      // from the ledgers
      val dq = spark.sql(
        "SELECT count(DISTINCT o_orderstatus) AS c FROM spj_t8.spj_ma")
      val fq = spark.sql(
        "SELECT count(*) AS c FROM spj_t8.spj_ma WHERE o_custkey = 1")
      assert(fq.collect().map(_.getLong(0)).head ===
        orders.where(col("o_custkey") === 1).count())
      assert(collectPlan(fq) { case b: BatchScanExec => b }.nonEmpty,
        "a filtered aggregate must NOT answer from unfiltered ledgers")
      assert(dq.collect().map(_.getLong(0)).head ===
        orders.select("o_orderstatus").distinct().count())
      assert(collectPlan(dq) { case b: BatchScanExec => b }.nonEmpty,
        "a DISTINCT aggregate must NOT answer from the ledgers")
    }
  }

  test("runtime filtering: a dim-filtered join prunes fact files at execution") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-rf").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    lake.createOrReplace(orders, "spj_rf", Seq("bucket(16,o_custkey)"))
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .where(col("c_custkey") < 3)
    // broadcast stays ENABLED here: DPP reuses the dim's broadcast
    spark.conf.set("spark.sql.catalog.spj_t9", classOf[GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj_t9.root", root)
    val fact = spark.table("spj_t9.spj_rf")
    val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
    val want = sortedRows(orders.join(dim, col("o_custkey") === col("c_custkey")))
    assert(sortedRows(joined) === want)
    val scans = collectPlan(joined) { case b: BatchScanExec => b }
    val spj = scans.map(_.scan).collectFirst { case s: GraftSpjScan => s }
    assert(spj.isDefined, "fact side should be the SPJ scan:\n" +
      joined.queryExecution.executedPlan)
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "expected a DPP runtime filter on the fact scan:\n" +
        joined.queryExecution.executedPlan)
    val total = lake.spjLayout("spj_rf").files.valuesIterator.map(_.size).sum
    assert(spj.get.plannedFileCount < total,
      s"2 dim keys over 16 buckets must prune: kept ${spj.get.plannedFileCount} of $total")
  }

  test("LIMIT pushdown plans just enough files to cover the limit") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-l").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    (0 until 4).foreach { i =>
      val slice = orders.where(col("o_orderkey") % 4 === i)
      if (i == 0) lake.createOrReplace(slice, "spj_l", Seq("bucket(4,o_custkey)"))
      else lake.append(slice, "spj_l", Seq("bucket(4,o_custkey)"))
    }
    withSpj(root, "spj_t10") {
      val df = spark.table("spj_t10.spj_l").limit(7)
      val got = df.collect()
      assert(got.length === 7)
      val full = sortedRows(lake.read("spj_l")).toSet
      got.foreach { r =>
        assert(full.contains(r.toSeq.map(String.valueOf).mkString("|")))
      }
      val spj = collectPlan(df) { case b: BatchScanExec => b }
        .map(_.scan).collectFirst { case s: GraftSpjScan => s }
      assert(spj.isDefined)
      assert(spj.get.description().contains("PushedLimit"))
      val total = lake.spjLayout("spj_l").files.valuesIterator.map(_.size).sum
      assert(spj.get.plannedFileCount < total,
        s"limit 7 should cap files: kept ${spj.get.plannedFileCount} of $total")
    }
  }

  test("TopN pushdown prunes files whose bounds cannot reach the k-th row") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-tn").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val maxK = orders.agg(max("o_orderkey")).head().getLong(0)
    // four RANGE-sliced commits: per-file key bounds are disjoint, so
    // an ORDER BY o_orderkey LIMIT k needs only the edge slice's files
    (0 until 4).foreach { i =>
      val slice = orders.where(col("o_orderkey") > lit(i * maxK / 4) &&
        col("o_orderkey") <= lit((i + 1) * maxK / 4))
      if (i == 0) lake.createOrReplace(slice, "spj_tn", Seq("bucket(4,o_custkey)"))
      else lake.append(slice, "spj_tn", Seq("bucket(4,o_custkey)"))
    }
    withSpj(root, "spj_t12") {
      def run(sorted: DataFrame, wantHead: Seq[String]): GraftSpjScan = {
        val got = sorted.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
        assert(got === wantHead)
        val spj = collectPlan(sorted) { case b: BatchScanExec => b }
          .map(_.scan).collectFirst { case s: GraftSpjScan => s }
        assert(spj.isDefined)
        assert(spj.get.description().contains("PushedTopN"))
        spj.get
      }
      val plain = lake.read("spj_tn")
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
      val byKey = plain.sortBy(_.split('|').head.toLong)
      val total = lake.spjLayout("spj_tn").files.valuesIterator.map(_.size).sum
      val ascScan = run(
        spark.table("spj_t12.spj_tn").orderBy(col("o_orderkey").asc).limit(25),
        byKey.take(25))
      assert(ascScan.plannedFileCount < total,
        s"ASC top-25 kept ${ascScan.plannedFileCount} of $total files")
      val descScan = run(
        spark.table("spj_t12.spj_tn").orderBy(col("o_orderkey").desc).limit(25),
        byKey.takeRight(25).reverse)
      assert(descScan.plannedFileCount < total,
        s"DESC top-25 kept ${descScan.plannedFileCount} of $total files")
    }
  }

  test("multi-column TopN prunes past lead-value ties via the lexicographic prefix cap") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-tn2").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    // 8 commits: one (g, ts-slice) each — every file's g bound is a
    // single value, so `ORDER BY g, ts LIMIT k` can split the g=1 tie
    // on ts, where the leading-key cap must keep ALL g=1 files
    var first = true
    for (g <- 1L to 2L; slice <- 0 until 4) {
      val rows = (0L until 50L)
        .map(i => (slice * 50L + i, g, slice * 1000L + i)).toDF("k", "g", "ts")
      if (first) { lake.createOrReplace(rows, "spj_tn2", Seq("bucket(2,k)")); first = false }
      else lake.append(rows, "spj_tn2", Seq("bucket(2,k)"))
    }
    withSpj(root, "spj_t17") {
      val want = lake.read("spj_tn2").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
        .sortBy(t => (t._1, t._2)).take(10)
        .map(t => s"${t._1}|${t._2}|${t._3}")
      val q = spark.table("spj_t17.spj_tn2")
        .orderBy(col("g").asc, col("ts").asc)
        .select(col("g"), col("ts"), col("k")).limit(10)
      assert(q.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
        === want.toSeq)
      val spj = collectPlan(q) { case b: BatchScanExec => b }
        .map(_.scan).collectFirst { case s: GraftSpjScan => s }
      assert(spj.isDefined)
      assert(spj.get.description().contains("PushedTopN"))
      assert(spj.get.description().contains("ts ASC"),
        "the pushed TopN must carry the full sort prefix: " + spj.get.description())
      val total = lake.spjLayout("spj_tn2").files.valuesIterator.map(_.size).sum
      val g1Files = total / 2 // half the commits hold g=1
      assert(spj.get.plannedFileCount < g1Files,
        s"the tuple cap must beat the lead-only cap's $g1Files g=1 files: " +
          s"kept ${spj.get.plannedFileCount} of $total")
    }
  }

  test("TopN with nulls: NULLS FIRST keeps null-bearing files, results exact") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-tnn").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    // values 1..40 in two range slices, nulls only in the second
    val df = (1L to 40L).map(k =>
      (k, if (k > 30 && k % 3 == 0) None else Some(k * 10))).toDF("k", "v")
    lake.createOrReplace(df.where(col("k") <= 20), "spj_tnn", Seq("bucket(2,k)"))
    lake.append(df.where(col("k") > 20), "spj_tnn", Seq("bucket(2,k)"))
    withSpj(root, "spj_t13") {
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      import graft.sources.spj.GraftSpjScan
      val t = spark.table("spj_t13.spj_tnn")
      def rowSet(d: DataFrame): Seq[String] =
        d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      // NULLS FIRST: the 3 nulls + the smallest value — null-bearing
      // files must survive the cap (multiset compare: null order is tied)
      val nf = t.orderBy(col("v").asc_nulls_first).limit(4)
      assert(rowSet(nf) === rowSet(df.orderBy(col("v").asc_nulls_first).limit(4)))
      // default ASC (nulls last): top-4 comes from slice 1 alone, and
      // the cap may drop slice 2 entirely — nulls can't reach the top
      val nl = t.orderBy(col("v")).limit(4)
      assert(rowSet(nl) === rowSet(df.orderBy(col("v")).limit(4)))
      val spj = collectPlan(nl) { case b: BatchScanExec => b }
        .map(_.scan).collectFirst { case s: GraftSpjScan => s }
      val total = lake.spjLayout("spj_tnn").files.valuesIterator.map(_.size).sum
      assert(spj.exists(_.plannedFileCount < total),
        s"nulls-last top-4 should drop the high slice: ${spj.map(_.plannedFileCount)} of $total")
    }
  }

  test("the scan reports exact ledger statistics; small SPJ tables auto-broadcast") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-st").toString
    val lake = new Lakehouse(spark, root)
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    lake.createOrReplace(cust, "spj_small", Seq("bucket(4,c_custkey)"))
    spark.conf.set("spark.sql.catalog.spj_t11", classOf[GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj_t11.root", root)
    val t = spark.table("spj_t11.spj_small")
    val layout = lake.spjLayout("spj_small")
    val stats = t.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes ===
      BigInt(layout.files.valuesIterator.flatten.map(_.length).sum))
    assert(stats.rowCount.contains(
      BigInt(layout.files.valuesIterator.flatten.map(_.rows.get).sum)))
    // honest sizing means the planner broadcasts the small side UNHINTED
    val big = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val j = big.join(t, col("o_custkey") === col("c_custkey"))
    j.collect()
    assert(collectPlan(j) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "exact v2 stats should let the small SPJ side broadcast:\n" +
        j.queryExecution.executedPlan)
  }

  test("identity layout: the scan restores the path-borne partition column, any projection order") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-id").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    lake.createOrReplace(orders, "spj_id", Seq("o_orderstatus"))
    withSpj(root, "spj_t20") {
      val t = spark.table("spj_t20.spj_id")
      // full read: the identity column comes off the dir path, typed
      assert(t.schema("o_orderstatus").dataType.typeName === "string")
      assert(sortedRows(t.select("o_orderkey", "o_orderstatus", "o_totalprice"))
        === sortedRows(orders))
      // key mid-projection (reader appends partitions LAST — the
      // reorder projection must restore Spark's requested order)
      assert(sortedRows(t.select("o_totalprice", "o_orderstatus", "o_orderkey"))
        === sortedRows(orders.select("o_totalprice", "o_orderstatus", "o_orderkey")))
      // key pruned away entirely / key alone
      assert(sortedRows(t.select("o_orderkey"))
        === sortedRows(orders.select("o_orderkey")))
      assert(sortedRows(t.select("o_orderstatus"))
        === sortedRows(orders.select("o_orderstatus")))
      // equality on the key statically prunes to that partition's files
      val f = t.where(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val planned = collectPlan(f) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.sources.spj.GraftSpjScan].plannedFileCount
      }.head
      val total = collectPlan(t.select(col("o_orderkey"))) {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[graft.sources.spj.GraftSpjScan].plannedFileCount
      }.head
      assert(planned < total, s"key-equality should prune dirs ($planned vs $total)")
      assert(sortedRows(f) ===
        sortedRows(orders.where(col("o_orderstatus") === "F").select("o_orderkey")))
    }
  }

  test("identity layout: grouped aggregates on the partition column answer from the ledgers") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-ga").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("price_d"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("prio_n"))
    lake.declareSumColumns("spj_ga", Seq("o_orderkey", "price_d"))
    lake.createOrReplace(orders.where(col("o_orderkey") % 2 === 0), "spj_ga",
      Seq("o_orderstatus"))
    lake.append(orders.where(col("o_orderkey") % 2 =!= 0), "spj_ga",
      Seq("o_orderstatus"))
    withSpj(root, "spj_t21") {
      val q = spark.sql("""SELECT o_orderstatus, count(*) AS cnt,
          count(prio_n) AS cnt_nn, min(o_orderkey) AS min_k,
          max(o_orderkey) AS max_k, min(o_orderstatus) AS min_s,
          sum(o_orderkey) AS sum_k, sum(price_d) AS sum_p
        FROM spj_t21.spj_ga GROUP BY o_orderstatus""")
      val want = orders.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        count(col("prio_n")).as("cnt_nn"), min("o_orderkey").as("min_k"),
        max("o_orderkey").as("max_k"), min("o_orderstatus").as("min_s"),
        sum("o_orderkey").as("sum_k"), sum("price_d").as("sum_p"))
      assert(sortedRows(q) === sortedRows(want))
      assert(collectPlan(q) { case l: LocalTableScanExec => l }.nonEmpty,
        "grouped metadata aggregate should plan driver-local rows:\n" +
          q.queryExecution.executedPlan)
      assert(collectPlan(q) { case b: BatchScanExec => b }.isEmpty,
        "no file scan may remain under a complete grouped pushdown")
      // grouping by a NON-partition column is unprovable → real scan
      val ng = spark.sql(
        "SELECT prio_n, count(*) AS c FROM spj_t21.spj_ga GROUP BY prio_n")
      assert(collectPlan(ng) { case b: BatchScanExec => b }.nonEmpty)
      assert(sortedRows(ng) ===
        sortedRows(orders.groupBy("prio_n").agg(count(lit(1)).as("c"))))
      // a filtered grouped aggregate is unprovable → real scan
      val fg = spark.sql("""SELECT o_orderstatus, count(*) AS c
        FROM spj_t21.spj_ga WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus""")
      assert(collectPlan(fg) { case b: BatchScanExec => b }.nonEmpty)
      assert(sortedRows(fg) === sortedRows(orders
        .where(col("o_orderkey") % 3 === 0)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("c"))))
    }
  }

  test("grouped pushdown beyond identity: per-file-constant group columns answer from the ledgers") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-gc").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
    // one status per commit on a PURE BUCKET layout (no identity
    // level): every file is single-valued on o_orderstatus, so the
    // ledgers prove the grouping; the third commit nulls the column
    // entirely (the NULL group keys from nulls == rows); `gen` is a
    // second per-commit constant for the multi-column leg
    val fpart = orders.where(col("o_orderstatus") === "F").withColumn("gen", lit(1L))
      .withColumn("sgn", col("o_orderkey") % 7 - 3)
    val opart = orders.where(col("o_orderstatus") === "O").withColumn("gen", lit(2L))
      .withColumn("sgn", col("o_orderkey") % 7 - 3)
    val npart = orders.where(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit(null).cast("string")).withColumn("gen", lit(3L))
      .withColumn("sgn", col("o_orderkey") % 7 - 3)
    val all = fpart.union(opart).union(npart)
    lake.declareSumColumns("spj_gc", Seq("o_orderkey"))
    lake.createOrReplace(fpart, "spj_gc", Seq("bucket(4,o_orderkey)"))
    lake.append(opart, "spj_gc", Seq("bucket(4,o_orderkey)"))
    lake.append(npart, "spj_gc", Seq("bucket(4,o_orderkey)"))
    // an IDENTITY layout over the same data: GROUP BY pairs the
    // path-borne identity key with the stat-proven constant
    lake.createOrReplace(fpart, "spj_gi", Seq("o_orderstatus"))
    lake.append(opart, "spj_gi", Seq("o_orderstatus"))
    lake.append(npart, "spj_gi", Seq("o_orderstatus"))
    withSpj(root, "spj_t31") {
      def metaOnly(df: DataFrame, clue: String): Unit = {
        assert(collectPlan(df) { case l: LocalTableScanExec => l }.nonEmpty,
          s"$clue should plan driver-local rows:\n" + df.queryExecution.executedPlan)
        assert(collectPlan(df) { case b: BatchScanExec => b }.isEmpty,
          s"no file scan may remain under a complete grouped pushdown ($clue)")
      }
      // single non-partition group column, NULL group included
      val q1 = spark.sql("""SELECT o_orderstatus, count(*) AS cnt,
          min(o_orderkey) AS mn, max(o_orderkey) AS mx, sum(o_orderkey) AS sm
        FROM spj_t31.spj_gc GROUP BY o_orderstatus""")
      metaOnly(q1, "stat-constant grouping")
      assert(sortedRows(q1) === sortedRows(all.groupBy("o_orderstatus").agg(
        count(lit(1)).as("cnt"), min("o_orderkey").as("mn"),
        max("o_orderkey").as("mx"), sum("o_orderkey").as("sm"))))
      // multi-column grouping: both columns per-file constant
      val q2 = spark.sql("""SELECT o_orderstatus, gen, count(*) AS cnt,
          max(o_orderkey) AS mx FROM spj_t31.spj_gc GROUP BY o_orderstatus, gen""")
      metaOnly(q2, "multi-column stat-constant grouping")
      assert(sortedRows(q2) === sortedRows(all.groupBy("o_orderstatus", "gen").agg(
        count(lit(1)).as("cnt"), max("o_orderkey").as("mx"))))
      // identity key × stat-constant column, null identity dir included
      val q3 = spark.sql("""SELECT o_orderstatus, gen, count(*) AS cnt,
          min(o_orderkey) AS mn FROM spj_t31.spj_gi GROUP BY o_orderstatus, gen""")
      metaOnly(q3, "identity x stat-constant grouping")
      assert(sortedRows(q3) === sortedRows(all.groupBy("o_orderstatus", "gen").agg(
        count(lit(1)).as("cnt"), min("o_orderkey").as("mn"))))
      // a genuinely multi-valued column keeps the real scan, rows exact
      val q4 = spark.sql("""SELECT o_orderkey, count(*) AS cnt
        FROM spj_t31.spj_gc GROUP BY o_orderkey""")
      assert(collectPlan(q4) { case b: BatchScanExec => b }.nonEmpty,
        "multi-valued grouping must decline to the scan")
      assert(sortedRows(q4) === sortedRows(
        all.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))))
      // SELECT DISTINCT pushes as a group-only aggregation (zero agg
      // legs): the answer is just the group tuples
      val q5 = spark.sql("SELECT DISTINCT o_orderstatus FROM spj_t31.spj_gc")
      metaOnly(q5, "DISTINCT on a stat-constant column")
      assert(sortedRows(q5) === sortedRows(all.select("o_orderstatus").distinct()))
      // avg over a provably NON-NEGATIVE integral column (every
      // file's recorded lo >= 0, exact total <= 2^53) answers as the
      // same IEEE sum/count division Spark performs; count(DISTINCT)
      // over per-file-constant columns counts the constants
      val q6 = spark.sql("""SELECT o_orderstatus, avg(o_orderkey) AS ak,
          count(DISTINCT gen) AS dg
        FROM spj_t31.spj_gc GROUP BY o_orderstatus""")
      metaOnly(q6, "grouped avg + count distinct")
      assert(sortedRows(q6) === sortedRows(all.groupBy("o_orderstatus").agg(
        avg("o_orderkey").as("ak"), countDistinct("gen").as("dg"))))
      val q7 = spark.sql("""SELECT avg(o_orderkey) AS ak,
          count(DISTINCT o_orderstatus) AS ds FROM spj_t31.spj_gc""")
      metaOnly(q7, "global avg + count distinct")
      assert(sortedRows(q7) === sortedRows(all.agg(
        avg("o_orderkey").as("ak"), countDistinct("o_orderstatus").as("ds"))))
      // count(DISTINCT) over a multi-valued column declines to the scan
      val q8 = spark.sql(
        "SELECT count(DISTINCT o_orderkey) AS dk FROM spj_t31.spj_gc")
      assert(collectPlan(q8) { case b: BatchScanExec => b }.nonEmpty,
        "count distinct over a multi-valued column must decline")
      assert(sortedRows(q8) === sortedRows(
        all.agg(countDistinct("o_orderkey").as("dk"))))
      // avg over a column with a negative recorded bound declines
      // (the double fold's order-independence proof needs lo >= 0)
      val q9 = spark.sql("SELECT avg(sgn) AS a FROM spj_t31.spj_gc")
      assert(collectPlan(q9) { case b: BatchScanExec => b }.nonEmpty,
        "avg over a mixed-sign column must decline to the scan")
      assert(sortedRows(q9) === sortedRows(all.agg(avg("sgn").as("a"))))
    }
  }

  test("calendar-grouped pushdown: GROUP BY year/month over the layout's transform reads the dirs' ledgers") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-cg").toString
    val lake = new Lakehouse(spark, root)
    // DATE source column (timezone-free on both sides), with a few
    // null dates for the Hive null dir -> NULL year group
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"),
      when(col("o_orderkey") % 11 === 0, lit(null).cast("date"))
        .otherwise(col("o_orderdate").cast("date")).as("d"))
    lake.createOrReplace(orders, "spj_cgy", Seq("years(d)", "bucket(4,o_custkey)"))
    lake.createOrReplace(orders, "spj_cgm", Seq("months(d)", "bucket(4,o_custkey)"))
    withSpj(root, "spj_t32") {
      def metaOnly(df: DataFrame, clue: String): Unit = {
        assert(collectPlan(df) { case l: LocalTableScanExec => l }.nonEmpty,
          s"$clue should plan driver-local rows:\n" + df.queryExecution.executedPlan)
        assert(collectPlan(df) { case b: BatchScanExec => b }.isEmpty,
          s"no file scan may remain under a complete grouped pushdown ($clue)")
      }
      // years(d) layout answers GROUP BY year(d) from the year dirs
      val q1 = spark.sql("""SELECT year(d) AS yr, count(*) AS cnt,
          min(o_orderkey) AS mn, max(o_orderkey) AS mx
        FROM spj_t32.spj_cgy GROUP BY year(d)""")
      metaOnly(q1, "years-transform grouping")
      assert(sortedRows(q1) === sortedRows(orders.groupBy(year(col("d")).as("yr"))
        .agg(count(lit(1)).as("cnt"), min("o_orderkey").as("mn"),
          max("o_orderkey").as("mx"))))
      // months(d) layout answers BOTH year(d) and month(d) -- the
      // month key determines each
      val q2 = spark.sql("""SELECT year(d) AS yr, month(d) AS mo, count(*) AS cnt
        FROM spj_t32.spj_cgm GROUP BY year(d), month(d)""")
      metaOnly(q2, "months-transform grouping")
      assert(sortedRows(q2) === sortedRows(orders
        .groupBy(year(col("d")).as("yr"), month(col("d")).as("mo"))
        .agg(count(lit(1)).as("cnt"))))
      // a years layout cannot prove month(d): the real scan answers
      val q3 = spark.sql("""SELECT month(d) AS mo, count(*) AS cnt
        FROM spj_t32.spj_cgy GROUP BY month(d)""")
      assert(collectPlan(q3) { case b: BatchScanExec => b }.nonEmpty,
        "month over a years layout must decline to the scan")
      assert(sortedRows(q3) === sortedRows(orders
        .groupBy(month(col("d")).as("mo")).agg(count(lit(1)).as("cnt"))))
      // trunc(d, fmt) groups by the period-start DATE the dir key
      // proves: YEAR on a years layout, MM and QUARTER on months
      val q4 = spark.sql("""SELECT trunc(d, 'YEAR') AS ys, count(*) AS cnt
        FROM spj_t32.spj_cgy GROUP BY trunc(d, 'YEAR')""")
      metaOnly(q4, "years trunc grouping")
      assert(sortedRows(q4) === sortedRows(orders
        .groupBy(trunc(col("d"), "year").as("ys")).agg(count(lit(1)).as("cnt"))))
      val q5 = spark.sql("""SELECT trunc(d, 'MM') AS ms,
          trunc(d, 'QUARTER') AS qs, count(*) AS cnt
        FROM spj_t32.spj_cgm GROUP BY trunc(d, 'MM'), trunc(d, 'QUARTER')""")
      metaOnly(q5, "months trunc grouping")
      assert(sortedRows(q5) === sortedRows(orders
        .groupBy(trunc(col("d"), "mm").as("ms"), trunc(col("d"), "quarter").as("qs"))
        .agg(count(lit(1)).as("cnt"))))
    }
  }

  test("claimed identity filters: dir-exact conjuncts vanish from the plan and compose with readouts") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-cf").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    // identity layout over a remapped segment column: an escaped key
    // ("A/B"), a plain key, and a NULL dir; `gen` is per-commit
    // constant so the filtered grouped readout stays provable
    def seg(v: String) = orders.where(col("o_orderstatus") === v)
    val p1 = seg("F").withColumn("seg", lit("A/B")).withColumn("gen", lit(1L)).drop("o_orderstatus")
    val p2 = seg("O").withColumn("seg", lit("W")).withColumn("gen", lit(2L)).drop("o_orderstatus")
    val p3 = seg("P").withColumn("seg", lit(null).cast("string")).withColumn("gen", lit(3L)).drop("o_orderstatus")
    lake.declareSumColumns("spj_cf", Seq("o_orderkey"))
    lake.createOrReplace(p1, "spj_cf", Seq("seg"))
    lake.append(p2, "spj_cf", Seq("seg"))
    lake.append(p3, "spj_cf", Seq("seg"))
    val all = p1.union(p2).union(p3)
    withSpj(root, "spj_t33") {
      def noFilterExec(df: DataFrame, clue: String): Unit =
        assert(collectPlan(df) { case f: FilterExec => f }.isEmpty,
          s"claimed conjuncts must vanish from the plan ($clue):\n" +
            df.queryExecution.executedPlan)
      // plain filtered scan: the = conjunct is fully handled by
      // identity-dir pruning, no residual Filter remains (escaped key)
      val q1 = spark.sql(
        "SELECT o_orderkey FROM spj_t33.spj_cf WHERE seg = 'A/B'")
      noFilterExec(q1, "equality on an escaped identity key")
      assert(sortedRows(q1) === sortedRows(
        all.where(col("seg") === "A/B").select("o_orderkey")))
      // IS NULL claims the Hive null dir exactly
      val q2 = spark.sql(
        "SELECT o_orderkey FROM spj_t33.spj_cf WHERE seg IS NULL")
      noFilterExec(q2, "IS NULL")
      assert(sortedRows(q2) === sortedRows(
        all.where(col("seg").isNull).select("o_orderkey")))
      // claimed filter + grouped readout = filtered rollup with zero
      // data opens (the r17 filtered-metadata composition)
      val q3 = spark.sql("""SELECT gen, count(*) AS cnt, sum(o_orderkey) AS sm
        FROM spj_t33.spj_cf WHERE seg IN ('A/B', 'W') GROUP BY gen""")
      assert(collectPlan(q3) { case l: LocalTableScanExec => l }.nonEmpty &&
        collectPlan(q3) { case b: BatchScanExec => b }.isEmpty,
        "claimed filter + grouped readout must stay metadata-only:\n" +
          q3.queryExecution.executedPlan)
      assert(sortedRows(q3) === sortedRows(all.where(col("seg").isin("A/B", "W"))
        .groupBy("gen").agg(count(lit(1)).as("cnt"), sum("o_orderkey").as("sm"))))
      // a residual conjunct keeps its Filter and declines the readout
      val q4 = spark.sql("""SELECT count(*) AS cnt FROM spj_t33.spj_cf
        WHERE seg = 'W' AND o_orderkey % 2 = 0""")
      assert(collectPlan(q4) { case b: BatchScanExec => b }.nonEmpty,
        "a residual conjunct must decline the metadata readout")
      assert(sortedRows(q4) === sortedRows(all
        .where(col("seg") === "W" && col("o_orderkey") % 2 === 0)
        .agg(count(lit(1)).as("cnt"))))
      // claimed filter + LIMIT: the file cap stays sound (kept files'
      // rows all match), rows come only from the claimed dir
      val q5 = spark.sql(
        "SELECT seg, o_orderkey FROM spj_t33.spj_cf WHERE seg = 'W' LIMIT 5")
      val got = q5.collect()
      assert(got.length == 5 && got.forall(_.getString(0) == "W"))
      // RANGE conjuncts on a NUMERIC identity column claim too (the
      // decoded keys order as longs); string identity ranges stay
      // residual (UTF8 vs UTF-16 ordering diverges outside ASCII)
      lake.createOrReplace(p1, "spj_cr", Seq("gen"))
      lake.append(p2, "spj_cr", Seq("gen"))
      lake.append(p3, "spj_cr", Seq("gen"))
      val q6 = spark.sql(
        "SELECT o_orderkey FROM spj_t33.spj_cr WHERE gen >= 2")
      noFilterExec(q6, "range on a numeric identity column")
      assert(sortedRows(q6) === sortedRows(
        all.where(col("gen") >= 2).select("o_orderkey")))
      val q7 = spark.sql("""SELECT count(*) AS n, min(o_orderkey) AS mn
        FROM spj_t33.spj_cr WHERE gen > 1 AND gen <= 2""")
      assert(collectPlan(q7) { case l: LocalTableScanExec => l }.nonEmpty,
        "identity range + readout must stay metadata-only:\n" +
          q7.queryExecution.executedPlan)
      assert(sortedRows(q7) === sortedRows(all
        .where(col("gen") > 1 && col("gen") <= 2)
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"))))
      val q8 = spark.sql("SELECT o_orderkey FROM spj_t33.spj_cf WHERE seg > 'A'")
      assert(collectPlan(q8) { case f: FilterExec => f }.nonEmpty,
        "string identity ranges must stay residual")
      assert(sortedRows(q8) === sortedRows(
        all.where(col("seg") > "A").select("o_orderkey")))
    }
  }

  test("claimed days(date) filters: time-range conjuncts vanish and window rollups stay metadata-only") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-dc").toString
    val lake = new Lakehouse(spark, root)
    // a two-month slice keeps the day-dir count spec-sized
    val orders = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01").select(
      col("o_orderkey"), col("o_custkey"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("date"))
        .otherwise(col("o_orderdate").cast("date")).as("d"))
    lake.declareSumColumns("spj_dc", Seq("o_orderkey"))
    lake.createOrReplace(orders, "spj_dc", Seq("days(d)", "bucket(4,o_custkey)"))
    // a TIMESTAMP-source days layout must never claim (rows inside a
    // day vary below day granularity)
    val ordersTs = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01").select(col("o_orderkey"),
      col("o_custkey"), col("o_orderdate").cast("timestamp").as("ts"))
    lake.createOrReplace(ordersTs, "spj_dt", Seq("days(ts)", "bucket(4,o_custkey)"))
    // a years(d) table over the full span (few year dirs) and an
    // hours(ts) table over a 10-day slice with a 4-hour spread
    val ordersY = Tables.orders(spark, sf).select(col("o_orderkey"),
      col("o_custkey"), col("o_orderdate").cast("date").as("d"))
    lake.createOrReplace(ordersY, "spj_yc", Seq("years(d)", "bucket(4,o_custkey)"))
    val ordersH = Tables.orders(spark, sf)
      .where(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-01-11")
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderdate").cast("timestamp") +
          expr("make_interval(0, 0, 0, 0, CAST(o_orderkey % 4 AS INT) * 4, 0, 0)")).as("ts"))
    lake.createOrReplace(ordersH, "spj_hc", Seq("hours(ts)", "bucket(2,o_custkey)"))
    withSpj(root, "spj_t34") {
      def noFilterExec(df: DataFrame, clue: String): Unit =
        assert(collectPlan(df) { case f: FilterExec => f }.isEmpty,
          s"claimed conjuncts must vanish ($clue):\n" +
            df.queryExecution.executedPlan)
      val lo = "1995-02-01"
      val hi = "1995-02-28"
      // a BETWEEN window vanishes from the plan, rows exact
      val q1 = spark.sql(s"""SELECT o_orderkey FROM spj_t34.spj_dc
        WHERE d BETWEEN DATE'$lo' AND DATE'$hi'""")
      noFilterExec(q1, "date BETWEEN")
      assert(sortedRows(q1) === sortedRows(orders
        .where(col("d").between(lo, hi)).select("o_orderkey")))
      // windowed rollup = metadata readout with the filter gone
      val q2 = spark.sql(s"""SELECT count(*) AS n, sum(o_orderkey) AS sk
        FROM spj_t34.spj_dc WHERE d >= DATE'$lo' AND d < DATE'1995-03-01'""")
      assert(collectPlan(q2) { case l: LocalTableScanExec => l }.nonEmpty &&
        collectPlan(q2) { case b: BatchScanExec => b }.isEmpty,
        "windowed rollup must stay metadata-only:\n" +
          q2.queryExecution.executedPlan)
      assert(sortedRows(q2) === sortedRows(orders
        .where(col("d") >= lo && col("d") < "1995-03-01")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("sk"))))
      // equality and IS NULL claim too
      val day0 = orders.where(col("d").isNotNull).agg(min("d")).head.getDate(0)
      val q3 = spark.sql(s"SELECT o_orderkey FROM spj_t34.spj_dc WHERE d = DATE'$day0'")
      noFilterExec(q3, "date equality")
      assert(sortedRows(q3) === sortedRows(orders
        .where(col("d") === lit(day0)).select("o_orderkey")))
      val q4 = spark.sql("SELECT o_orderkey FROM spj_t34.spj_dc WHERE d IS NULL")
      noFilterExec(q4, "date IS NULL")
      assert(sortedRows(q4) === sortedRows(orders
        .where(col("d").isNull).select("o_orderkey")))
      // windowed rollup composed with a derived calendar grouping
      val q5 = spark.sql(s"""SELECT year(d) AS yr, count(*) AS n
        FROM spj_t34.spj_dc WHERE d >= DATE'$lo' GROUP BY year(d)""")
      assert(collectPlan(q5) { case l: LocalTableScanExec => l }.nonEmpty,
        "window + calendar grouping must stay metadata-only:\n" +
          q5.queryExecution.executedPlan)
      assert(sortedRows(q5) === sortedRows(orders.where(col("d") >= lo)
        .groupBy(year(col("d")).as("yr")).agg(count(lit(1)).as("n"))))
      // timestamp-source days layout: the filter STAYS residual
      val q6 = spark.sql(s"""SELECT o_orderkey FROM spj_t34.spj_dt
        WHERE ts >= TIMESTAMP'1995-02-01 00:00:00'""")
      assert(collectPlan(q6) { case f: FilterExec => f }.nonEmpty,
        "timestamp days layouts must keep the filter residual")
      assert(sortedRows(q6) === sortedRows(ordersTs
        .where(col("ts") >= "1995-02-01 00:00:00").select("o_orderkey")))
      // years(d): a PERIOD-ALIGNED bound claims, an unaligned one
      // stays residual (it splits a year dir) — rows exact either way
      val q7 = spark.sql("""SELECT count(*) AS n FROM spj_t34.spj_yc
        WHERE d >= DATE'1996-01-01'""")
      assert(collectPlan(q7) { case f: FilterExec => f }.isEmpty &&
        collectPlan(q7) { case l: LocalTableScanExec => l }.nonEmpty,
        "aligned year bound must claim and stay metadata-only:\n" +
          q7.queryExecution.executedPlan)
      assert(sortedRows(q7) === sortedRows(ordersY
        .where(col("d") >= "1996-01-01").agg(count(lit(1)).as("n"))))
      val q8 = spark.sql("""SELECT o_orderkey FROM spj_t34.spj_yc
        WHERE d >= DATE'1996-03-15'""")
      assert(collectPlan(q8) { case f: FilterExec => f }.nonEmpty,
        "an unaligned year bound must stay residual")
      assert(sortedRows(q8) === sortedRows(ordersY
        .where(col("d") >= "1996-03-15").select("o_orderkey")))
      // hours(ts): hour-aligned bounds claim (UTC micros domain),
      // sub-hour bounds stay residual
      val q9 = spark.sql("""SELECT count(*) AS n FROM spj_t34.spj_hc
        WHERE ts >= TIMESTAMP'1995-01-05 04:00:00'
          AND ts < TIMESTAMP'1995-01-08 00:00:00'""")
      assert(collectPlan(q9) { case f: FilterExec => f }.isEmpty &&
        collectPlan(q9) { case l: LocalTableScanExec => l }.nonEmpty,
        "hour-aligned bounds must claim and stay metadata-only:\n" +
          q9.queryExecution.executedPlan)
      assert(sortedRows(q9) === sortedRows(ordersH
        .where(col("ts") >= "1995-01-05 04:00:00" && col("ts") < "1995-01-08 00:00:00")
        .agg(count(lit(1)).as("n"))))
      val q10 = spark.sql("""SELECT o_orderkey FROM spj_t34.spj_hc
        WHERE ts >= TIMESTAMP'1995-01-05 04:30:00'""")
      assert(collectPlan(q10) { case f: FilterExec => f }.nonEmpty,
        "a sub-hour bound must stay residual")
      assert(sortedRows(q10) === sortedRows(ordersH
        .where(col("ts") >= "1995-01-05 04:30:00").select("o_orderkey")))
      // claimed window + LIMIT: the file cap stays sound (kept dirs'
      // rows all match), every returned row is inside the window
      val q11 = spark.sql(s"""SELECT d, o_orderkey FROM spj_t34.spj_dc
        WHERE d BETWEEN DATE'$lo' AND DATE'$hi' LIMIT 5""")
      val got11 = q11.collect()
      assert(got11.length == 5 && got11.forall(r =>
        r.getDate(0).toString >= lo && r.getDate(0).toString <= hi),
        s"claimed window + LIMIT must return only window rows: " +
          got11.mkString(", "))
      // claimed window + TopN: unique sort key makes the row set
      // deterministic — must equal the mirror's exactly
      val q12 = spark.sql(s"""SELECT o_orderkey FROM spj_t34.spj_dc
        WHERE d >= DATE'$lo' ORDER BY o_orderkey LIMIT 3""")
      assert(q12.collect().map(_.getLong(0)).toSeq === orders
        .where(col("d") >= lo).select("o_orderkey")
        .orderBy("o_orderkey").limit(3).collect().map(_.getLong(0)).toSeq)
    }
  }

  test("identity SPJ: co-partitioned tables join with no Exchange") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-ij").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val sales = Seq(("AUTO", 1L, 10.0), ("AUTO", 2L, 5.0), ("WEB", 3L, 7.0),
      ("RETAIL", 4L, 2.0)).toDF("seg", "sid", "amt")
    val quota = Seq(("AUTO", 100.0), ("WEB", 50.0), ("RETAIL", 25.0))
      .toDF("qseg", "cap")
    lake.createOrReplace(sales, "spj_sales", Seq("seg"))
    lake.createOrReplace(quota, "spj_quota", Seq("qseg"))
    withSpj(root, "spj_t22") {
      val joined = spark.table("spj_t22.spj_sales")
        .join(spark.table("spj_t22.spj_quota"), col("seg") === col("qseg"))
        .select(col("seg"), col("sid"), col("amt"), col("cap"))
      assert(!Medallion.plansShuffle(joined),
        "identity co-partitioned join must not shuffle:\n" +
          joined.queryExecution.executedPlan)
      assert(sortedRows(joined) === sortedRows(
        sales.join(quota, col("seg") === col("qseg"))
          .select(col("seg"), col("sid"), col("amt"), col("cap"))))
      // the registry surfaces through SHOW TABLES (servable specs only)
      val shown = spark.sql("SHOW TABLES IN spj_t22")
        .collect().map(_.getString(1)).toSet
      assert(Set("spj_sales", "spj_quota").subsetOf(shown), shown.toString)
    }
  }

  test("identity layout: null and escaped partition values round-trip") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-nl").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val df = Seq(
      (Option.empty[String], 1L), (Some("plain"), 2L), (Some("plain"), 3L),
      (Some("has space"), 4L), (Some("a=b:c"), 5L)).toDF("k", "v")
    lake.declareSumColumns("spj_nl", Seq("v"))
    lake.createOrReplace(df, "spj_nl", Seq("k"))
    withSpj(root, "spj_t23") {
      val t = spark.table("spj_t23.spj_nl")
      assert(sortedRows(t) === sortedRows(df))
      // the null partition reads back as a NULL key, and escaped dir
      // names decode to the original values
      assert(sortedRows(t.where(col("k").isNull).select("v")) === Seq("1"))
      assert(sortedRows(t.where(col("k") === "has space").select("v")) === Seq("4"))
      assert(sortedRows(t.where(col("k") === "a=b:c").select("v")) === Seq("5"))
      // the grouped readout carries the null group and the escaped keys
      val g = spark.sql(
        "SELECT k, count(*) AS c, sum(v) AS s FROM spj_t23.spj_nl GROUP BY k")
      assert(collectPlan(g) { case l: LocalTableScanExec => l }.nonEmpty,
        "grouped pushdown should cover null/escaped partitions too")
      assert(sortedRows(g) === sortedRows(
        df.groupBy("k").agg(count(lit(1)).as("c"), sum("v").as("s"))))
    }
  }

  test("declared-sort layouts report per-partition ordering: merge join plans no Sort, no Exchange") {
    import org.apache.spark.sql.execution.SortExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-so").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val a = (1L to 400L).map(k => (k, s"a$k")).toDF("k", "va")
    val b = (1L to 400L).filter(_ % 2 == 0).map(k => (k, k * 2.0)).toDF("k2", "vb")
    lake.declareSortOrder("spj_soa", Seq("k"))
    lake.declareSortOrder("spj_sob", Seq("k2"))
    val prevDist = spark.conf.getOption("spark.graft.write-distribution")
    spark.conf.set("spark.graft.write-distribution", "range")
    try {
      lake.createOrReplace(a, "spj_soa", Seq("bucket(4,k)"))
      lake.createOrReplace(b, "spj_sob", Seq("bucket(4,k2)"))
    } finally prevDist match {
      case Some(v) => spark.conf.set("spark.graft.write-distribution", v)
      case None => spark.conf.unset("spark.graft.write-distribution")
    }
    withSpj(root, "spj_t24") {
      val j = spark.table("spj_t24.spj_soa")
        .join(spark.table("spj_t24.spj_sob"), col("k") === col("k2"))
        .select(col("k"), col("va"), col("vb"))
      assert(!Medallion.plansShuffle(j), "SPJ side: no Exchange")
      val sorts = collectPlan(j) { case s: SortExec => s }
      assert(sorts.isEmpty,
        "ledger-proven sorted layouts must satisfy the merge join's ordering:\n" +
          j.queryExecution.executedPlan)
      assert(sortedRows(j) === sortedRows(
        a.join(b, col("k") === col("k2")).select(col("k"), col("va"), col("vb"))))

      // an OVERLAPPING append poisons the disjointness proof: key 200
      // already lives inside an existing file's [lo, hi], so the new
      // single-point file ties the boundary — the claim must die
      // (SortExec comes back), results stay exact
      lake.append(Seq((200L, 3.0), (202L, 5.0)).toDF("k2", "vb"), "spj_sob",
        Seq("bucket(4,k2)"))
      val j2 = spark.table("spj_t24.spj_sob")
        .join(spark.table("spj_t24.spj_soa"), col("k") === col("k2"))
        .select(col("k"), col("va"), col("vb"))
      assert(collectPlan(j2) { case s: SortExec => s }.nonEmpty,
        "overlapping file ranges cannot claim ordering")
      val b2 = b.unionByName(Seq((200L, 3.0), (202L, 5.0)).toDF("k2", "vb"))
      assert(sortedRows(j2) === sortedRows(
        b2.join(a, col("k") === col("k2")).select(col("k"), col("va"), col("vb"))))

      // a sorted compaction under range distribution restores the
      // proof: one rewrite, the claim (and the Sort-free plan) revives
      spark.conf.set("spark.graft.write-distribution", "range")
      try lake.compact("spj_sob", Seq("bucket(4,k2)"))
      finally prevDist match {
        case Some(v) => spark.conf.set("spark.graft.write-distribution", v)
        case None => spark.conf.unset("spark.graft.write-distribution")
      }
      val j3 = spark.table("spj_t24.spj_sob")
        .join(spark.table("spj_t24.spj_soa"), col("k") === col("k2"))
        .select(col("k"), col("va"), col("vb"))
      assert(collectPlan(j3) { case s: SortExec => s }.isEmpty,
        "sorted compaction should revive the ordering claim:\n" +
          j3.queryExecution.executedPlan)
      assert(!Medallion.plansShuffle(j3))
      assert(sortedRows(j3) === sortedRows(
        b2.join(a, col("k") === col("k2")).select(col("k"), col("va"), col("vb"))))
    }
  }

  test("SQL DELETE through the SPJ catalog: CoW rewrite keeps the layout, history, SPJ validity") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-del").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val rows = (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
    val dim = (1L to 100L).map(k => (k, k * 1.5)).toDF("k2", "w")
    lake.createOrReplace(rows, "spj_del", Seq("bucket(8,k)"))
    lake.createOrReplace(dim, "spj_deld", Seq("bucket(8,k2)"))
    val before = lake.currentSnapshot("spj_del").get
    withSpj(root, "spj_t25") {
      spark.sql("DELETE FROM spj_t25.spj_del WHERE k <= 40 OR v = 'v99'")
      assert(sortedRows(spark.table("spj_t25.spj_del")) ===
        sortedRows(rows.where(!(col("k") <= 40 || col("v") === "v99"))))
      // the CoW rewrite kept the uniform bucket layout (no tombstones,
      // or the SPJ read itself would refuse) and the join stays
      // Exchange-free over the shrunk table
      assert(lake.spjLayout("spj_del").nBuckets === 8)
      val j = spark.table("spj_t25.spj_del")
        .join(spark.table("spj_t25.spj_deld"), col("k") === col("k2"))
      assert(!Medallion.plansShuffle(j))
      assert(j.count() === 59)
      // history time-travels to the pre-delete snapshot
      assert(lake.readSnapshot("spj_del", before).count() === 100)
      // a condition beyond the metadata filter algebra falls back to
      // the copy-on-write ROW-LEVEL path (SpjRowLevelSpec covers it in
      // depth) — the statement now succeeds instead of refusing
      spark.sql("DELETE FROM spj_t25.spj_del WHERE k % 2 = 0")
      assert(sortedRows(spark.table("spj_t25.spj_del")) === sortedRows(
        rows.where(!(col("k") <= 40 || col("v") === "v99") && col("k") % 2 =!= 0)))
    }
  }

  test("time travel through the SPJ catalog: VERSION AS OF / TIMESTAMP AS OF serve pinned layouts") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    val root = java.nio.file.Files.createTempDirectory("graft-spj-tt").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.declareSumColumns("spj_tt", Seq("v"))
    lake.createOrReplace((1L to 10L).map(k => (k, k * 10L)).toDF("k", "v"),
      "spj_tt", Seq("bucket(4,k)"))
    val snap1 = lake.currentSnapshot("spj_tt").get
    Thread.sleep(20)
    lake.append((11L to 20L).map(k => (k, k * 10L)).toDF("k", "v"),
      "spj_tt", Seq("bucket(4,k)"))
    val snap2 = lake.currentSnapshot("spj_tt").get
    val t2 = lake.snapshotTimes("spj_tt").toMap.apply(snap2)
    Thread.sleep(20)
    lake.deleteWhere(col("k") <= 5, "spj_tt", Seq("bucket(4,k)"))
    withSpj(root, "spj_t26") {
      // the head serves post-delete; pinned versions serve history
      assert(spark.table("spj_t26.spj_tt").count() === 15)
      val q1 = spark.sql(
        s"SELECT count(*) AS n, sum(v) AS s FROM spj_t26.spj_tt VERSION AS OF $snap1")
      assert(q1.collect().map(r => (r.getLong(0), r.getLong(1))).head ===
        ((10L, (1L to 10L).map(_ * 10L).sum)))
      // the metadata-aggregate pushdown works over HISTORY too: the
      // pinned layout carries that snapshot's ledgers
      assert(collectPlan(q1) { case l: LocalTableScanExec => l }.nonEmpty,
        "pinned-version aggregates should still answer from the ledgers")
      assert(spark.sql(
        s"SELECT * FROM spj_t26.spj_tt VERSION AS OF $snap2").count() === 20)
      // TIMESTAMP AS OF: at-or-before resolution (epoch-cast literal is
      // session-timezone-proof); snap2's commit instant serves snap2
      val q3 = spark.sql(s"SELECT count(*) AS n FROM spj_t26.spj_tt " +
        s"TIMESTAMP AS OF CAST(${t2 / 1000.0} AS TIMESTAMP)")
      assert(q3.collect().head.getLong(0) === 20L)
      // before the first commit: loud refusal
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM spj_t26.spj_tt TIMESTAMP AS OF CAST(0 AS TIMESTAMP)")
          .collect()
      }
      assert(e.getMessage.contains("no snapshot committed at or before") ||
        (e.getCause != null &&
          e.getCause.getMessage.contains("no snapshot committed at or before")),
        s"unexpected error: ${e.getMessage}")
    }
  }

  test("identity x bucket layouts: two-level SPJ join, grouped pushdown, per-level pruning") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-2l").toString
    val lake = new Lakehouse(spark, root)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(12,2)").as("price_d"))
    lake.declareSumColumns("spj_2l", Seq("o_orderkey", "price_d"))
    // the Iceberg fact canon: low-cardinality dimension over hash
    // buckets, two commits so multiple dirs must union
    lake.createOrReplace(orders.where(col("o_orderkey") % 2 === 0), "spj_2l",
      Seq("o_orderstatus", "bucket(4,o_custkey)"))
    lake.append(orders.where(col("o_orderkey") % 2 =!= 0), "spj_2l",
      Seq("o_orderstatus", "bucket(4,o_custkey)"))
    // a co-partitioned second fact, same two-level spec
    val pays = Tables.orders(spark, sf).select(
      col("o_orderkey").as("p_orderkey"), col("o_custkey").as("p_custkey"),
      col("o_orderstatus").as("p_status"),
      (col("o_totalprice") * 0.1).as("p_fee"))
    lake.createOrReplace(pays, "spj_2lp", Seq("p_status", "bucket(4,p_custkey)"))
    withSpj(root, "spj_t27") {
      val t = spark.table("spj_t27.spj_2l")
      // round-trip: the path-borne identity column re-attaches, typed
      assert(sortedRows(t.select("o_orderkey", "o_orderstatus", "price_d"))
        === sortedRows(orders.select("o_orderkey", "o_orderstatus", "price_d")))
      // two-level SPJ: join on BOTH partition dimensions is
      // Exchange-free (partition tuples align position-for-position)
      val j = t.join(spark.table("spj_t27.spj_2lp"),
        col("o_custkey") === col("p_custkey") &&
          col("o_orderstatus") === col("p_status"))
        .select(col("o_orderkey"), col("p_orderkey"), col("price_d"), col("p_fee"))
      assert(!Medallion.plansShuffle(j),
        "two-level co-partitioned join must not shuffle:\n" +
          j.queryExecution.executedPlan)
      assert(sortedRows(j) === sortedRows(
        orders.join(pays, col("o_custkey") === col("p_custkey") &&
          col("o_orderstatus") === col("p_status"))
          .select(col("o_orderkey"), col("p_orderkey"), col("price_d"), col("p_fee"))))
      // grouped pushdown by the OUTER identity column: groups union
      // their bucket partitions, still a driver-local readout
      val g = spark.sql("""SELECT o_orderstatus, count(*) AS n,
          min(o_orderkey) AS k_lo, sum(o_orderkey) AS s_k, sum(price_d) AS s_p
        FROM spj_t27.spj_2l GROUP BY o_orderstatus""")
      assert(sortedRows(g) === sortedRows(
        orders.groupBy("o_orderstatus").agg(count(lit(1)).as("n"),
          min("o_orderkey").as("k_lo"), sum("o_orderkey").as("s_k"),
          sum("price_d").as("s_p"))))
      assert(collectPlan(g) { case l: LocalTableScanExec => l }.nonEmpty,
        "two-level grouped pushdown should answer from the ledgers:\n" +
          g.queryExecution.executedPlan)
      assert(collectPlan(g) { case b: BatchScanExec => b }.isEmpty)
      // per-level static pruning composes: identity equality × bucket
      // equality keeps only that (status, bucket) cell's files
      def planned(df: DataFrame): Int = collectPlan(df) {
        case b: BatchScanExec => b.scan.asInstanceOf[GraftSpjScan].plannedFileCount
      }.head
      val total = planned(t.select(col("o_orderkey")))
      val byId = planned(t.where(col("o_orderstatus") === "F").select(col("o_orderkey")))
      val byBoth = planned(t.where(col("o_orderstatus") === "F" &&
        col("o_custkey") === 1).select(col("o_orderkey")))
      assert(byId < total, s"identity pruning ($byId vs $total)")
      assert(byBoth < byId, s"bucket pruning should compose ($byBoth vs $byId)")
      assert(sortedRows(t.where(col("o_orderstatus") === "F" && col("o_custkey") === 1)
        .select(col("o_orderkey"))) ===
        sortedRows(orders.where(col("o_orderstatus") === "F" && col("o_custkey") === 1)
          .select(col("o_orderkey"))))
    }
  }

  test("two-level SPJ with join keys a SUBSET of the partition keys (the daily-fact join shape)") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-ss").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val a = (1L to 200L).map(k => (k, if (k % 3 == 0) "A" else "B", k * 1.0))
      .toDF("k", "seg", "x")
    val b = (1L to 200L).filter(_ % 2 == 0)
      .map(k => (k, if (k % 5 == 0) "A" else "B", k * 2.0)).toDF("k2", "seg2", "y")
    lake.createOrReplace(a, "spj_ssa", Seq("seg", "bucket(4,k)"))
    lake.createOrReplace(b, "spj_ssb", Seq("seg2", "bucket(4,k2)"))
    withSpj(root, "spj_t29") {
      val prev = Seq(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
        // default-true: would force the join to cluster on ALL
        // partition keys, defeating the subset grouping
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
        .map { case (c, v) => (c, v, spark.conf.getOption(c)) }
      try {
        prev.foreach { case (c, v, _) => spark.conf.set(c, v) }
        // join on the BUCKET key alone — the everyday shape over
        // (status/day, bucket(id)) facts: Spark groups both sides'
        // partition tuples by the subset key and still co-locates
        val j = spark.table("spj_t29.spj_ssa")
          .join(spark.table("spj_t29.spj_ssb"), col("k") === col("k2"))
          .select(col("k"), col("seg"), col("seg2"), col("x"), col("y"))
        assert(!Medallion.plansShuffle(j),
          "subset-join-keys SPJ must not shuffle:\n" +
            j.queryExecution.executedPlan)
        assert(sortedRows(j) === sortedRows(
          a.join(b, col("k") === col("k2"))
            .select(col("k"), col("seg"), col("seg2"), col("x"), col("y"))))
      } finally prev.foreach {
        case (c, _, Some(v)) => spark.conf.set(c, v)
        case (c, _, None) => spark.conf.unset(c)
      }
    }
  }

  test("days(ts) x bucket layouts: the daily-fact canon joins on the id alone, Exchange-free") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import graft.sources.spj.GraftSpjScan
    val root = java.nio.file.Files.createTempDirectory("graft-spj-dy").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.from(java.time.Instant.parse(
        f"2024-03-${day}%02dT$h%02d:30:00Z"))
    val a = (1L to 120L).map(k =>
      (k, ts((k % 5 + 1).toInt, (k % 20).toInt), k * 1.0)).toDF("k", "ev_ts", "x")
    val b = (1L to 120L).filter(_ % 3 == 0).map(k =>
      (k, ts((k % 4 + 2).toInt, (k % 18).toInt), k * 2.0)).toDF("k2", "ts2", "y")
    lake.createOrReplace(a, "spj_dya", Seq("days(ev_ts)", "bucket(4,k)"))
    lake.createOrReplace(b, "spj_dyb", Seq("days(ts2)", "bucket(4,k2)"))
    withSpj(root, "spj_t30") {
      val t = spark.table("spj_t30.spj_dya")
      // round-trip: the source timestamp column lives IN the files
      // (the derived day is path-only) — values exact
      assert(sortedRows(t) === sortedRows(a))
      // the daily-fact join: on the id alone, with subset join keys —
      // partition tuples (day, bucket) group by bucket and co-locate
      val prev = Seq(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
        .map { case (c, v) => (c, v, spark.conf.getOption(c)) }
      try {
        prev.foreach { case (c, v, _) => spark.conf.set(c, v) }
        val j = t.join(spark.table("spj_t30.spj_dyb"), col("k") === col("k2"))
          .select(col("k"), col("ev_ts"), col("ts2"), col("x"), col("y"))
        assert(!Medallion.plansShuffle(j),
          "daily-fact subset-key SPJ must not shuffle:\n" +
            j.queryExecution.executedPlan)
        assert(sortedRows(j) === sortedRows(
          a.join(b, col("k") === col("k2"))
            .select(col("k"), col("ev_ts"), col("ts2"), col("x"), col("y"))))
      } finally prev.foreach {
        case (c, _, Some(v)) => spark.conf.set(c, v)
        case (c, _, None) => spark.conf.unset(c)
      }
      // a time-range predicate prunes FILES through the per-file ts
      // stats (day dirs are single-day, so whole days drop)
      def planned(df: DataFrame): Int = collectPlan(df) {
        case s: BatchScanExec => s.scan.asInstanceOf[GraftSpjScan].plannedFileCount
      }.head
      val total = planned(t.select(col("k")))
      val dayQ = t.where(col("ev_ts") >= "2024-03-05 00:00:00" &&
        col("ev_ts") < "2024-03-06 00:00:00")
      assert(planned(dayQ.select(col("k"))) < total,
        "a one-day range should prune the other days' files")
      assert(sortedRows(dayQ) === sortedRows(
        a.where(col("ev_ts") >= "2024-03-05 00:00:00" &&
          col("ev_ts") < "2024-03-06 00:00:00")))
    }
  }

  test("branch scoping: DML through the catalog commits to the loaded branch; as-of stays on it") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-br").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    lake.createOrReplace((1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      "spj_br", Seq("bucket(4,k)"))
    val mainHead = lake.currentSnapshot("spj_br").get
    lake.createBranch("spj_br", "dev", mainHead)
    withSpj(root, "spj_t28") {
      // INSERT into the branch table moves dev, never main
      spark.sql("INSERT INTO spj_t28.dev.spj_br VALUES (11, 'z')")
      assert(spark.table("spj_t28.dev.spj_br").count() === 11)
      assert(spark.table("spj_t28.spj_br").count() === 10)
      assert(lake.currentSnapshot("spj_br").get === mainHead)
      // DELETE on the branch table rewrites dev, never main
      spark.sql("DELETE FROM spj_t28.dev.spj_br WHERE k <= 5")
      assert(spark.table("spj_t28.dev.spj_br").count() === 6)
      assert(spark.table("spj_t28.spj_br").count() === 10)
      assert(lake.currentSnapshot("spj_br").get === mainHead)
      // TIMESTAMP AS OF on MAIN never serves dev's newer commits: the
      // resolution caps at the branch head (and matches readAsOf)
      val nowQ = spark.sql(
        "SELECT count(*) AS n FROM spj_t28.spj_br TIMESTAMP AS OF current_timestamp()")
      assert(nowQ.collect().head.getLong(0) === 10L)
      assert(lake.readAsOf("spj_br", System.currentTimeMillis()).count() === 10L)
      // and on DEV it serves dev's head
      assert(spark.sql(
        "SELECT count(*) AS n FROM spj_t28.dev.spj_br TIMESTAMP AS OF current_timestamp()")
        .collect().head.getLong(0) === 6L)
    }
  }

  test("strictness: tombstoned, derived-mixed AND identity-mixed tables all SERVE (r14)") {
    val root = java.nio.file.Files.createTempDirectory("graft-spj-s").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    // round 13 lifted the tombstone refusal: the layout loads and
    // carries the tombstones for the reader's per-file anti-filter
    // (SpjMorEvolutionSpec proves the read; here just that it loads)
    lake.createOrReplace(df, "spj_mor", Seq("bucket(4,k)"))
    lake.deleteWhereMor(col("k") === 2L, "spj_mor")
    assert(lake.spjLayout("spj_mor").tombstoned)

    // derived-mixed layouts (bucket + unpartitioned) DEGRADE to the
    // claim-free flat scan instead of refusing (SpjMorEvolutionSpec
    // proves the read path; here the layout shape)
    lake.createOrReplace(df, "spj_mix", Seq("bucket(4,k)"))
    lake.append(df, "spj_mix") // unpartitioned second dir
    val flat = lake.spjLayout("spj_mix")
    assert(flat.flatGroups && flat.bucketLevel.isEmpty && flat.identityCol.isEmpty)

    // an IDENTITY dir strips its column from the files — but its value
    // is right there in the path segment, so since r14 the mix DEGRADES
    // to the flat scan with per-file injection instead of refusing
    // (SpjMorEvolutionSpec proves the read; here the layout shape)
    lake.createOrReplace(df, "spj_mixid", Seq("bucket(4,k)"))
    lake.append(df, "spj_mixid", Seq("v")) // identity second dir
    val flatId = lake.spjLayout("spj_mixid")
    assert(flatId.flatGroups && flatId.dirStrips.nonEmpty,
      "an identity-mixed table must degrade to the flat scan with strip injection")
  }
}

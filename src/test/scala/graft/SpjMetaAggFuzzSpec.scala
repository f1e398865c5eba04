package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Lakehouse, Tables}
import graft.sources.spj.GraftSpjCatalog

/** Property fuzz for the grouped metadata readout
  * ([[graft.sources.spj]]'s SpjMetaAgg): seeded random WRITE-CLUSTERED
  * layouts — each commit constant on its cluster columns, the pattern
  * the per-file-constant proof serves — crossed with random grouped
  * aggregate queries. Every answer must be row-equal to the scan
  * recompute, and because every commit is constant on the clustered
  * columns, every grouped query over them must plan DRIVER-LOCAL
  * (LocalTableScan, no file scan) — a silent decline would surface
  * here as a plan assertion failure, a wrong readout as a row diff. */
class SpjMetaAggFuzzSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def collectPlan[T](df: DataFrame)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    df.collect() // force execution so AQE finalizes
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).collect(pf)
  }

  test("grouped readouts equal the scan across random write-clustered layouts (3 seeds)") {
    import org.apache.spark.sql.execution.LocalTableScanExec
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val base = Tables.orders(spark, sf).select(
      col("o_orderkey").as("k"), col("o_custkey").as("ck"),
      col("o_orderdate").cast("date").as("d"))
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed * 7919)
      val root = java.nio.file.Files.createTempDirectory(s"graft-gafz$seed").toString
      val lake = new Lakehouse(spark, root)
      // layout: 0 = pure bucket, 1 = identity(seg), 2 = identity x
      // bucket, 3 = years(d) x bucket
      val shape = rng.nextInt(4)
      val spec = shape match {
        case 0 => Seq("bucket(4,k)")
        case 1 => Seq("seg")
        case 2 => Seq("seg", "bucket(4,ck)")
        case 3 => Seq("years(d)", "bucket(4,ck)")
      }
      lake.declareSumColumns("fz_ga", Seq("k")) // sum/avg legs need the ledger
      val segs = Seq("A", "B", "C", null)
      val nCommits = 2 + rng.nextInt(3)
      val parts = (0 until nCommits).map { c =>
        val seg = segs(rng.nextInt(segs.length))
        val gen = (rng.nextInt(3) + 1).toLong
        base.where(col("k") % nCommits === c)
          .withColumn("seg", lit(seg).cast("string"))
          .withColumn("gen", lit(gen))
      }
      lake.createOrReplace(parts.head, "fz_ga", spec)
      parts.tail.foreach(p => lake.append(p, "fz_ga", spec))
      val mirror = parts.reduce(_ union _)
      val cat = s"spj_fzga$seed"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      // grouped query algebra over the PROVABLE columns: clustered
      // seg/gen everywhere, year(d) when the layout derives it
      val groupings = Seq(Seq("seg"), Seq("gen"), Seq("seg", "gen")) ++
        (if (shape == 3) Seq(Seq("year(d)"), Seq("year(d)", "gen")) else Nil)
      val aggs = Seq(
        "count(*) AS cnt", "min(k) AS mn", "max(k) AS mx", "sum(k) AS sm",
        "avg(k) AS av", "count(seg) AS cs", "count(DISTINCT gen) AS dg")
      for (g <- groupings) {
        val picked = rng.shuffle(aggs).take(2 + rng.nextInt(3))
        val sql = s"SELECT ${g.mkString(", ")}, ${picked.mkString(", ")} " +
          s"FROM $cat.fz_ga GROUP BY ${g.mkString(", ")}"
        val got = spark.sql(sql)
        val aliases = g.indices.map(i => s"g_$i")
        val mirrorQ = {
          val gcols = g.zip(aliases).map { case (e, a) => expr(e).as(a) }
          mirror.groupBy(gcols: _*).agg(expr(picked.head),
            picked.tail.map(expr): _*)
        }
        assert(sortedRows(got) === sortedRows(mirrorQ),
          s"seed=$seed shape=$shape sql=$sql")
        assert(collectPlan(got) { case l: LocalTableScanExec => l }.nonEmpty &&
          collectPlan(got) { case b: BatchScanExec => b }.isEmpty,
          s"provable grouping must read metadata-only: seed=$seed sql=$sql\n" +
            got.queryExecution.executedPlan)
      }
      // one unprovable grouping per trial keeps the decline path honest
      val ng = spark.sql(s"SELECT ck, count(*) AS c FROM $cat.fz_ga GROUP BY ck")
      assert(collectPlan(ng) { case b: BatchScanExec => b }.nonEmpty,
        s"multi-valued grouping must decline to the scan (seed=$seed)")
      assert(sortedRows(ng) ===
        sortedRows(mirror.groupBy("ck").agg(count(lit(1)).as("c"))))
      // CLAIMED-FILTER fuzz: on identity shapes the seg conjuncts are
      // dir-exact (the Filter node must vanish and rows must equal the
      // mirror); elsewhere the same conjuncts must stay residual with
      // rows exact either way — the silent-wrongness class this guards
      // is a claimed conjunct whose pruning enforcement diverges from
      // row semantics
      import org.apache.spark.sql.execution.FilterExec
      val claimShapes: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        ("seg = 'A'", col("seg") === "A"),
        ("seg IN ('A', 'B')", col("seg").isin("A", "B")),
        ("seg IS NULL", col("seg").isNull),
        ("seg IS NOT NULL", col("seg").isNotNull))
      for ((sqlF, mirrorF) <- rng.shuffle(claimShapes).take(2)) {
        val q = spark.sql(s"SELECT k FROM $cat.fz_ga WHERE $sqlF")
        assert(sortedRows(q) === sortedRows(mirror.where(mirrorF).select("k")),
          s"seed=$seed shape=$shape claim=$sqlF")
        val identityShape = shape == 1 || shape == 2
        assert(collectPlan(q) { case f: FilterExec => f }.isEmpty == identityShape,
          s"claim residency wrong: seed=$seed shape=$shape claim=$sqlF\n" +
            q.queryExecution.executedPlan)
        // claimed (or residual) filter composed with a grouped readout
        val qa = spark.sql(
          s"SELECT gen, count(*) AS c, sum(k) AS sm FROM $cat.fz_ga " +
            s"WHERE $sqlF GROUP BY gen")
        assert(sortedRows(qa) === sortedRows(mirror.where(mirrorF)
          .groupBy("gen").agg(count(lit(1)).as("c"), sum("k").as("sm"))),
          s"seed=$seed shape=$shape claim-agg=$sqlF")
        // an empty-match claim legitimately declines the readout (no
        // groups to answer) and serves a zero-file scan instead
        if (identityShape && mirror.where(mirrorF).limit(1).count() > 0)
          assert(collectPlan(qa) { case l: LocalTableScanExec => l }.nonEmpty,
            s"claimed filter + readout must stay metadata-only: " +
              s"seed=$seed shape=$shape $sqlF\n" + qa.queryExecution.executedPlan)
      }
    }
  }
}

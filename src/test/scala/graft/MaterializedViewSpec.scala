package graft

import org.apache.spark.sql.functions._

import graft.sources.{Lakehouse, MaterializedView => MV}

/** Incrementally-maintained materialized aggregate views: refreshes
  * are delta-priced and merge-correct; rewrites fall back to full
  * recompute; the watermark rides the view's own commit metadata so
  * crash-replays no-op. */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val ViewDef = MV.ViewDef("sales_by_status", "orders_t",
    groupCols = Seq("status"),
    aggs = Seq(
      MV.SumCol("price", "total"), MV.CountAll("n"),
      MV.MinCol("price", "lo"), MV.MaxCol("price", "hi")))

  private def ordersDf(rows: (Long, String, java.math.BigDecimal)*) =
    rows.toDF("id", "status", "price")
      .select(col("id"), col("status"), col("price").cast("decimal(18,2)").as("price"))

  private def dec(v: String) = new java.math.BigDecimal(v)

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("status") ->
      ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n"),
        r.getAs[java.math.BigDecimal]("lo"), r.getAs[java.math.BigDecimal]("hi")))).toMap

  test("incremental refresh equals a from-scratch recompute, and only on new data") {
    val root = freshDir("graft-mview")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf(
      (1L, "O", dec("10.00")), (2L, "O", dec("20.00")), (3L, "F", dec("5.50"))), "orders_t")
    MV.create(lake, ViewDef)
    assert(asMap(lake.read("sales_by_status")) === Map(
      "O" -> ((dec("30.00"), 2L, dec("10.00"), dec("20.00"))),
      "F" -> ((dec("5.50"), 1L, dec("5.50"), dec("5.50")))))

    // two appends: one touches existing groups (new min for F), one adds a group
    lake.append(ordersDf((4L, "F", dec("1.25")), (5L, "O", dec("7.00"))), "orders_t")
    lake.append(ordersDf((6L, "P", dec("100.00"))), "orders_t")
    MV.refresh(lake, ViewDef)
    val got = asMap(lake.read("sales_by_status"))
    val full = asMap(MVTestAccess.aggOf(lake.read("orders_t")))
    assert(got === full, "incremental merge must equal the full recompute")
    assert(got("F") === ((dec("6.75"), 2L, dec("1.25"), dec("5.50"))), "min re-merges down")
    assert(got("P") === ((dec("100.00"), 1L, dec("100.00"), dec("100.00"))), "new group inserts")

    // no source movement: refresh commits nothing (same view snapshot)
    val snapBefore = lake.currentSnapshot("sales_by_status").get
    MV.refresh(lake, ViewDef)
    assert(lake.currentSnapshot("sales_by_status").get === snapBefore)
  }

  test("a replayed refresh is a no-op: the watermark commits atomically with the data") {
    val root = freshDir("graft-mview-replay")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf((1L, "O", dec("10.00"))), "orders_t")
    MV.create(lake, ViewDef)
    lake.append(ordersDf((2L, "O", dec("5.00"))), "orders_t")
    MV.refresh(lake, ViewDef)
    val snaps = lake.snapshots("sales_by_status").size
    // the crash-replay: a second refresh toward the same source snapshot
    // (e.g. the caller died before observing the first one's result)
    MV.refresh(lake, ViewDef)
    MV.refresh(lake, ViewDef)
    assert(lake.snapshots("sales_by_status").size === snaps,
      "replays must not commit (batch id = source snapshot already in the ledger)")
    assert(asMap(lake.read("sales_by_status"))("O") ===
      ((dec("15.00"), 2L, dec("5.00"), dec("10.00"))), "and must not double-count")
  }

  test("a FACT MoR delete applies subtractively (CDC changelog): equals recompute, vanishes emptied groups, replays as a no-op (r17)") {
    val root = freshDir("graft-mview-factmor")
    val lake = new Lakehouse(spark, root)
    val scDef = MV.ViewDef("sc_by_status", "orders_t",
      groupCols = Seq("status"),
      aggs = Seq(MV.SumCol("price", "total"), MV.CountAll("n")))
    def scMap() = lake.read("sc_by_status").collect().map(r =>
      r.getAs[String]("status") ->
        ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap
    def scFull() = lake.read("orders_t").groupBy("status")
      .agg(sum(col("price")).cast("decimal(18,2)").as("total"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("status") ->
        ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap
    lake.createOrReplace(ordersDf(
      (1L, "O", dec("10.00")), (2L, "O", dec("2.00")),
      (3L, "F", dec("8.00")), (4L, "P", dec("4.00"))), "orders_t")
    MV.create(lake, scDef); MV.persist(lake, scDef)
    // an interval with BOTH an append and a MoR delete: readChanges
    // refuses (tombstones), the CDC changelog restates it net
    lake.append(ordersDf((5L, "F", dec("3.00"))), "orders_t")
    lake.deleteWhereMor(col("id") === 2L, "orders_t")
    val viewSnaps0 = lake.snapshots("sc_by_status").length
    MV.refresh(lake, scDef)
    assert(scMap() === scFull())
    assert(scMap() === Map("O" -> ((dec("10.00"), 1L)),
      "F" -> ((dec("11.00"), 2L)), "P" -> ((dec("4.00"), 1L))))
    assert(lake.snapshots("sc_by_status").length === viewSnaps0 + 1,
      "the subtractive fact refresh must commit ONE snapshot")
    val meta = lake.mviewsDf("orders_t").where(col("mview") === "sc_by_status").head()
    assert(meta.getAs[String]("last_refresh") === "incremental",
      s"a fact MoR delete must stay incremental, note: ${meta.getAs[String]("refresh_note")}")
    assert(meta.getAs[String]("refresh_note").contains("subtractively"))
    // a MoR UPDATE nets as delete+insert: group totals move exactly
    lake.updateWhereMor(Seq("price" -> lit(dec("9.00")).cast("decimal(18,2)")),
      col("id") === 3L, "orders_t")
    MV.refresh(lake, scDef)
    assert(scMap() === scFull())
    assert(scMap()("F") === ((dec("12.00"), 2L)))
    // a MoR delete that empties a group: P vanishes, still incremental
    lake.deleteWhereMor(col("status") === "P", "orders_t")
    MV.refresh(lake, scDef)
    assert(scMap() === scFull())
    assert(!scMap().contains("P"), "the emptied group must vanish")
    assert(lake.mviewsDf("orders_t").where(col("mview") === "sc_by_status")
      .head().getAs[String]("last_refresh") === "incremental")
    // crash-REPLAY converges: a re-run refresh no-ops on the ledger
    val snaps = lake.snapshots("sc_by_status").length
    MV.refresh(lake, scDef)
    assert(lake.snapshots("sc_by_status").length === snaps)
    assert(scMap() === scFull())
    // a NET-EMPTY MoR interval (the delete matched nothing) still
    // ADVANCES the fact watermark: batchId=to must land so later
    // refreshes never re-read this interval's prefix
    lake.deleteWhereMor(col("id") === 99999L, "orders_t")
    MV.refresh(lake, scDef)
    assert(lake.committedBatches("sc_by_status")
      .contains(lake.currentSnapshot("orders_t").get),
      "a net-empty CDC interval must still record its watermark")
    assert(scMap() === scFull())
    // a LEFT-JOIN view under a fact MoR delete: the minus leg
    // re-enriches the deleted rows at the pinned dims — an UNMATCHED
    // deleted fact decrements the null group, a matched one its
    // segment — still subtractive, still one commit
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL")), "dimf_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")),
      (12L, 9L, dec("7.00")), (13L, 9L, dec("1.00"))), "factf_t")
    val jDef = MV.ViewDef("jf_sales", "factf_t", Seq("seg"),
      Seq(MV.SumCol("price", "total"), MV.CountAll("n")),
      joins = Seq(MV.JoinSpec("dimf_t", "cust", "cid", joinType = "left")))
    def jMap() = lake.read("jf_sales").collect().map(r =>
      Option(r.getAs[String]("seg")).getOrElse("NULL") ->
        ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap
    MV.create(lake, jDef); MV.persist(lake, jDef)
    assert(jMap() === Map("AUTO" -> ((dec("10.00"), 1L)),
      "RETAIL" -> ((dec("4.00"), 1L)), "NULL" -> ((dec("8.00"), 2L))))
    lake.deleteWhereMor(col("id") === 12L, "factf_t") // unmatched row leaves
    lake.deleteWhereMor(col("id") === 11L, "factf_t") // RETAIL's only row leaves
    MV.refresh(lake, jDef)
    assert(jMap() === Map("AUTO" -> ((dec("10.00"), 1L)),
      "NULL" -> ((dec("1.00"), 1L))),
      "null group must decrement and the emptied segment must vanish")
    assert(lake.mviewsDf("factf_t").where(col("mview") === "jf_sales")
      .head().getAs[String]("last_refresh") === "incremental")
    // a MIN/MAX view under the same fact retraction stays incremental
    // via extremum survivorship: an INSIDE-the-extrema retraction
    // merges purely; one that takes a stored extremum re-derives that
    // group alone against the target snapshot
    lake.createOrReplace(ordersDf(
      (1L, "O", dec("10.00")), (2L, "O", dec("2.00")), (3L, "O", dec("5.00")),
      (4L, "F", dec("8.00"))), "orders_t")
    MV.create(lake, ViewDef); MV.persist(lake, ViewDef)
    def mmNote() = lake.mviewsDf("orders_t")
      .where(col("mview") === "sales_by_status").head()
    lake.deleteWhereMor(col("id") === 3L, "orders_t") // strictly inside O's [2,10]
    MV.refresh(lake, ViewDef)
    assert(asMap(lake.read("sales_by_status")) ===
      asMap(MVTestAccess.aggOf(lake.read("orders_t"))))
    assert(mmNote().getAs[String]("last_refresh") === "incremental",
      s"an inside-the-extrema fact retraction must merge: ${mmNote().getAs[String]("refresh_note")}")
    lake.deleteWhereMor(col("id") === 1L, "orders_t") // O's max leaves: exhausted
    MV.refresh(lake, ViewDef)
    assert(asMap(lake.read("sales_by_status")) ===
      asMap(MVTestAccess.aggOf(lake.read("orders_t"))))
    assert(asMap(lake.read("sales_by_status"))("O") ===
      ((dec("2.00"), 1L, dec("2.00"), dec("2.00"))))
    assert(mmNote().getAs[String]("last_refresh") === "incremental",
      s"an exhausted extremum must re-derive scoped, not recompute: ${mmNote().getAs[String]("refresh_note")}")
    // the last O row leaves: the min/max group VANISHES on-path
    lake.deleteWhereMor(col("id") === 2L, "orders_t")
    MV.refresh(lake, ViewDef)
    assert(asMap(lake.read("sales_by_status")) ===
      asMap(MVTestAccess.aggOf(lake.read("orders_t"))))
    assert(!asMap(lake.read("sales_by_status")).contains("O"))
    assert(mmNote().getAs[String]("last_refresh") === "incremental")
  }

  test("a source rewrite falls back to full recompute instead of merging unsoundly") {
    val root = freshDir("graft-mview-rw")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf(
      (1L, "O", dec("10.00")), (2L, "O", dec("2.00")), (3L, "F", dec("8.00"))), "orders_t")
    MV.create(lake, ViewDef)
    // CoW delete rewrites history — the deleted row held group O's min,
    // which no mergeable algebra could retract incrementally
    lake.deleteWhere(col("id") === 2L, "orders_t")
    lake.append(ordersDf((4L, "F", dec("3.00"))), "orders_t")
    MV.refresh(lake, ViewDef)
    assert(asMap(lake.read("sales_by_status")) === Map(
      "O" -> ((dec("10.00"), 1L, dec("10.00"), dec("10.00"))),
      "F" -> ((dec("11.00"), 2L, dec("3.00"), dec("8.00")))))
  }

  test("SQL surface: CREATE MATERIALIZED VIEW with WHERE + CALL refresh_mview") {
    val root = freshDir("graft-mview-sql")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf(
      (1L, "O", dec("10.00")), (2L, "O", dec("1.00")), (3L, "F", dec("8.00"))), "sqlmv_src")
    lake.registerView("sqlmv_src")
    spark.sql(
      """CREATE MATERIALIZED VIEW sqlmv_v AS
        |SELECT status, sum(price) AS total, count(*) AS n
        |FROM sqlmv_src WHERE price > 2.00 GROUP BY status""".stripMargin)
    // the WHERE gate applied: O's 1.00 row is out
    assert(spark.table("sqlmv_v").collect().map(r =>
      (r.getAs[String]("status"), r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))
      .toSet === Set(("O", dec("10.00"), 1L), ("F", dec("8.00"), 1L)))
    lake.append(ordersDf((4L, "F", dec("3.00")), (5L, "F", dec("0.50"))), "sqlmv_src")
    val out = spark.sql("CALL system.refresh_mview('sqlmv_v')").collect()
    assert(out.length === 1 && out(0).getLong(1) === lake.currentSnapshot("sqlmv_src").get,
      "refresh reports the source snapshot it advanced to")
    // delta-merged through the same filter; 0.50 gated out
    assert(spark.table("sqlmv_v").collect().map(r =>
      (r.getAs[String]("status"), r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))
      .toSet === Set(("O", dec("10.00"), 1L), ("F", dec("11.00"), 2L)))
    // the definition is durable: a fresh handle loads it by name
    val d2 = MV.load(new Lakehouse(spark, root), "sqlmv_v")
    assert(d2.isDefined && d2.get.filter === Some("price > 2.00") &&
      d2.get.groupCols === Seq("status"))
    // replayed CALL against an unmoved source commits nothing
    val snaps = lake.snapshots("sqlmv_v").size
    spark.sql("CALL system.refresh_mview('sqlmv_v')").collect()
    assert(lake.snapshots("sqlmv_v").size === snaps)
    // t.mviews metadata relation: definition + freshness at a glance
    val meta = spark.sql("SELECT * FROM sqlmv_src.mviews").collect()
    assert(meta.length === 1)
    val r = meta(0)
    assert(r.getAs[String]("mview") === "sqlmv_v")
    assert(r.getAs[String]("where_clause") === "price > 2.00")
    assert(r.getAs[String]("aggs").contains("sum(price) AS total"))
    assert(r.getAs[Long]("watermark") === r.getAs[Long]("current_src_snapshot"),
      "after refresh the view reads as fresh")
  }

  test("streaming maintenance: the view follows source commits through the stream scheduler") {
    val root = freshDir("graft-mview-stream")
    val ck = freshDir("graft-mview-stream-ck")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf((1L, "O", dec("10.00"))), "orders_t")
    MV.create(lake, ViewDef)
    MV.persist(lake, ViewDef) // maintainMview loads the def by name
    lake.append(ordersDf((2L, "F", dec("4.00")), (3L, "O", dec("6.00"))), "orders_t")
    lake.append(ordersDf((4L, "F", dec("2.00"))), "orders_t")
    // drain the backlog: AvailableNow terminates at the pinned head
    val q = graft.streaming.EventStream.maintainMview(spark, root, "sales_by_status", ck)
    try q.awaitTermination(120000) finally q.stop()
    assert(asMap(lake.read("sales_by_status")) === asMap(MVTestAccess.aggOf(lake.read("orders_t"))))
    // a second maintenance run over an unmoved source commits nothing
    val snaps = lake.snapshots("sales_by_status").size
    val q2 = graft.streaming.EventStream.maintainMview(
      spark, root, "sales_by_status", freshDir("graft-mview-stream-ck2"))
    try q2.awaitTermination(120000) finally q2.stop()
    assert(lake.snapshots("sales_by_status").size === snaps)
    // a MoR delete arrives through the scheduler: the driven refresh
    // takes the SUBTRACTIVE CDC path (r17), not the recompute
    lake.deleteWhereMor(col("id") === 3L, "orders_t")
    val q3 = graft.streaming.EventStream.maintainMview(
      spark, root, "sales_by_status", freshDir("graft-mview-stream-ck3"))
    try q3.awaitTermination(120000) finally q3.stop()
    assert(asMap(lake.read("sales_by_status")) ===
      asMap(MVTestAccess.aggOf(lake.read("orders_t"))))
    assert(lake.mviewsDf("orders_t").where(col("mview") === "sales_by_status")
      .head().getAs[String]("last_refresh") === "incremental",
      "the scheduler-driven MoR refresh must stay subtractive")
  }

  test("view-over-view chain: refreshChain advances both hops to the source truth") {
    import spark.implicits._
    val root = freshDir("graft-mview-chain")
    val lake = new Lakehouse(spark, root)
    def src(rows: (Long, String, String, java.math.BigDecimal)*) =
      rows.toDF("id", "cat", "status", "price")
        .select(col("id"), col("cat"), col("status"),
          col("price").cast("decimal(18,2)").as("price"))
    lake.createOrReplace(src(
      (1L, "A", "O", dec("10.00")), (2L, "A", "F", dec("4.00")),
      (3L, "B", "O", dec("2.00"))), "orders_c")
    val v1 = MV.ViewDef("by_cat_status", "orders_c", Seq("cat", "status"),
      Seq(MV.SumCol("price", "total"), MV.CountAll("n")))
    val v2 = MV.ViewDef("by_cat", "by_cat_status", Seq("cat"),
      Seq(MV.SumCol("total", "cat_total"), MV.CountAll("n_statuses")))
    MV.create(lake, v1); MV.persist(lake, v1)
    MV.create(lake, v2); MV.persist(lake, v2)
    lake.append(src((4L, "B", "F", dec("7.50")), (5L, "A", "O", dec("1.00"))), "orders_c")
    MV.refreshChain(lake, "by_cat")
    // both hops reflect the appended rows
    val top = lake.read("by_cat").collect()
      .map(r => r.getAs[String]("cat") ->
        ((r.getAs[java.math.BigDecimal]("cat_total"), r.getAs[Long]("n_statuses")))).toMap
    assert(top === Map(
      "A" -> ((dec("15.00"), 2L)), // O=11.00 + F=4.00 across 2 status rows
      "B" -> ((dec("9.50"), 2L))))
    // idempotent: nothing moved, nothing commits on either hop
    val s1 = lake.snapshots("by_cat_status").size; val s2 = lake.snapshots("by_cat").size
    MV.refreshChain(lake, "by_cat")
    assert(lake.snapshots("by_cat_status").size === s1 &&
      lake.snapshots("by_cat").size === s2)
    // the SQL surface chains too: a view over a view parses and
    // CALL refresh_mview walks the chain bottom-up
    spark.sql(
      """CREATE MATERIALIZED VIEW by_cat_sql AS
        |SELECT cat, sum(total) AS cat_total, count(*) AS n_statuses
        |FROM by_cat_status GROUP BY cat""".stripMargin)
    lake.append(src((6L, "B", "P", dec("0.25"))), "orders_c")
    spark.sql("CALL system.refresh_mview('by_cat_sql')").collect()
    val sqlTop = spark.table("by_cat_sql").collect()
      .map(r => r.getAs[String]("cat") -> r.getAs[java.math.BigDecimal]("cat_total")).toMap
    assert(sqlTop("B") === dec("9.75"), "the SQL chain refreshed through its upstream view")
  }

  test("property: random append sequences always land on the full recompute") {
    // the merge algebra must be associative over ANY batch split — a
    // seeded pseudo-random corpus partitioned into 1..5 appends of
    // uneven sizes, refreshed after every commit, must equal the
    // one-shot aggregate at each step
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val root = freshDir(s"graft-mview-prop$trial")
      val lake = new Lakehouse(spark, root)
      val statuses = Array("O", "F", "P", "X")
      val rows = (1L to 60L).map { i =>
        (i, statuses(rnd.nextInt(statuses.length)),
          dec(f"${rnd.nextInt(10000)}%d.${rnd.nextInt(100)}%02d"))
      }
      val cuts = (Seq(0, rows.length) ++ Seq.fill(rnd.nextInt(4))(rnd.nextInt(rows.length)))
        .distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
      lake.createOrReplace(ordersDf(batches.head: _*), "orders_t")
      MV.create(lake, ViewDef)
      batches.tail.foreach { b =>
        lake.append(ordersDf(b: _*), "orders_t")
        MV.refresh(lake, ViewDef)
        assert(asMap(lake.read("sales_by_status")) ===
          asMap(MVTestAccess.aggOf(lake.read("orders_t"))),
          s"trial $trial diverged after a ${b.length}-row append")
      }
    }
  }

  test("property: random append/MoR-delete/MoR-update sequences stay incremental and equal the recompute at every step (r17)") {
    // the subtractive fact algebra (sum/count nets, min/max extremum
    // survivorship) must converge for ANY interleaving: seeded random
    // statement sequences over the full min/max-bearing ViewDef,
    // refreshed after every commit, compared to the one-shot aggregate
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val root = freshDir(s"graft-mview-morprop$trial")
      val lake = new Lakehouse(spark, root)
      val statuses = Array("O", "F", "P", "X")
      def randRows(n: Int, base: Long) = (1L to n).map { i =>
        (base + i, statuses(rnd.nextInt(statuses.length)),
          dec(f"${rnd.nextInt(1000)}%d.${rnd.nextInt(100)}%02d"))
      }
      lake.createOrReplace(ordersDf(randRows(30, 0): _*), "orders_t")
      MV.create(lake, ViewDef); MV.persist(lake, ViewDef)
      var nextBase = 1000L
      for (step <- 1 to 6) {
        rnd.nextInt(3) match {
          case 0 =>
            lake.append(ordersDf(randRows(5 + rnd.nextInt(10), nextBase): _*),
              "orders_t")
            nextBase += 1000L
          case 1 => // MoR delete: random slice (may empty groups, may no-op)
            val m = 2 + rnd.nextInt(4)
            lake.deleteWhereMor(pmod(col("id"), lit(m)) === rnd.nextInt(m),
              "orders_t")
          case 2 => // MoR update: a status re-label moves rows across groups
            val fromS = statuses(rnd.nextInt(statuses.length))
            val toS = statuses(rnd.nextInt(statuses.length))
            lake.updateWhereMor(Seq("status" -> lit(toS)),
              col("status") === fromS, "orders_t")
        }
        MV.refresh(lake, ViewDef)
        assert(asMap(lake.read("sales_by_status")) ===
          asMap(MVTestAccess.aggOf(lake.read("orders_t"))),
          s"trial $trial diverged at step $step")
        val note = lake.mviewsDf("orders_t")
          .where(col("mview") === "sales_by_status").head()
        assert(note.getAs[String]("last_refresh") === "incremental",
          s"trial $trial step $step must stay incremental: " +
            note.getAs[String]("refresh_note"))
      }
    }
  }

  test("refresh schema is stable across many refreshes (decimal sums do not widen)") {
    val root = freshDir("graft-mview-schema")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(ordersDf((1L, "O", dec("1.00"))), "orders_t")
    MV.create(lake, ViewDef)
    val schema0 = lake.read("sales_by_status").schema
    (2L to 5L).foreach { i =>
      lake.append(ordersDf((i, "O", dec("1.00"))), "orders_t")
      MV.refresh(lake, ViewDef)
    }
    assert(lake.read("sales_by_status").schema === schema0)
    assert(asMap(lake.read("sales_by_status"))("O") ===
      ((dec("5.00"), 5L, dec("1.00"), dec("1.00"))))
  }

  // ---- join-shaped views (fact ⋈ dim, the silver_enrich shape) ----

  private val JoinDef = MV.ViewDef("sales_by_seg", "fact_t",
    groupCols = Seq("seg"),
    aggs = Seq(MV.SumCol("price", "total"), MV.CountAll("n")),
    joins = Seq(MV.JoinSpec("dim_t", "cust", "cid")))

  private def factDf(rows: (Long, Long, java.math.BigDecimal)*) =
    rows.toDF("id", "cust", "price")
      .select(col("id"), col("cust"), col("price").cast("decimal(18,2)").as("price"))

  private def dimDf(rows: (Long, String)*) = rows.toDF("cid", "seg")

  private def joinRecompute(lake: Lakehouse) = {
    val j = lake.read("fact_t").join(lake.read("dim_t"),
      col("cust") === col("cid"))
    j.groupBy("seg").agg(sum(col("price")).as("total"), count(lit(1)).as("n"))
  }

  private def segMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("seg") ->
      ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap

  test("join view: fact-append refresh merges delta ⋈ dim, equals the recompute") {
    val root = freshDir("graft-mview-join")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 9L, dec("99.00"))), "fact_t")
    MV.create(lake, JoinDef)
    // cust 9 has no dim row: inner join drops it, in both paths
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "RETAIL" -> ((dec("4.00"), 1L))))
    lake.append(factDf((13L, 1L, dec("2.50")), (14L, 2L, dec("1.00"))), "fact_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg"))("AUTO") === ((dec("12.50"), 2L)))
  }

  test("join view: refresh reads the fact DELTA, not the fact history (O(delta) opens)") {
    val root = freshDir("graft-mview-joind")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL")), "dim_t")
    // eight fact dirs of history before the view exists
    lake.createOrReplace(factDf((0L, 1L, dec("1.00"))), "fact_t")
    (1L to 7L).foreach(i => lake.append(factDf((i, 1L + i % 2, dec("1.00"))), "fact_t"))
    MV.create(lake, JoinDef)
    lake.append(factDf((100L, 1L, dec("5.00"))), "fact_t")
    val before = Lakehouse.dataDirOpens.get()
    MV.refresh(lake, JoinDef)
    val opened = Lakehouse.dataDirOpens.get() - before
    // delta dir + dim + stored view (+ upsert rewrite) — NEVER the
    // eight historical fact dirs
    assert(opened <= 5, s"join-view refresh opened $opened dirs — the fact history leaked in")
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
  }

  test("join view: a replayed refresh is a no-op (fact watermark in the commit)") {
    val root = freshDir("graft-mview-joinr")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO")), "dim_t")
    lake.createOrReplace(factDf((10L, 1L, dec("10.00"))), "fact_t")
    MV.create(lake, JoinDef)
    lake.append(factDf((11L, 1L, dec("3.00"))), "fact_t")
    MV.refresh(lake, JoinDef)
    val snap = lake.currentSnapshot("sales_by_seg").get
    MV.refresh(lake, JoinDef) // crash-replay: same fact snapshot, same dim
    assert(lake.currentSnapshot("sales_by_seg").get === snap)
    assert(segMap(lake.read("sales_by_seg"))("AUTO") === ((dec("13.00"), 2L)))
  }

  test("join view: a dim change advances the view — even with the fact unmoved") {
    val root = freshDir("graft-mview-joindim")
    val lake = new Lakehouse(spark, root)
    // dim starts HALF-populated: cust 2's rows drop out of the inner join
    lake.createOrReplace(dimDf((1L, "AUTO")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00"))), "fact_t")
    MV.create(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === Map("AUTO" -> ((dec("10.00"), 1L))))
    // dim grows; fact does NOT move — the dim interval is append-only
    // and the aggs subtractable, so this lands on the DIM-DELTA path
    // (witnessed by the negative dim-keyed idempotency batch id)
    lake.append(dimDf((2L, "RETAIL")), "dim_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "RETAIL" -> ((dec("4.00"), 1L))))
    assert(lake.committedBatches("sales_by_seg").exists(_ < 0),
      "an append-only dim change with sum/count aggs should apply incrementally")
    // and the fact-delta path resumes afterwards at the new dim pin
    lake.append(factDf((12L, 2L, dec("6.00"))), "fact_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg"))("RETAIL") === ((dec("10.00"), 2L)))
  }

  test("join view: an MoR dim update re-labels groups incrementally, equals recompute") {
    val root = freshDir("graft-mview-joinud")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf(
      (1L, "AUTO"), (2L, "RETAIL"), (3L, "WEB"), (4L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 2L, dec("2.00")),
      (13L, 3L, dec("7.00")), (14L, 4L, dec("5.00"))), "fact_t")
    MV.create(lake, JoinDef)
    // MoR update: cust 2 moves RETAIL -> WEB (tombstone + append,
    // CDC-readable); RETAIL keeps cust 4's rows, so no group empties
    // and the SUBTRACTIVE path applies — priced at cust 2's rows
    lake.updateWhereMor(Seq("seg" -> lit("WEB")), col("cid") === 2L, "dim_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "WEB" -> ((dec("13.00"), 3L)),
      "RETAIL" -> ((dec("5.00"), 1L))))
    assert(lake.committedBatches("sales_by_seg").exists(_ < 0),
      "an MoR dim re-label with surviving groups should apply incrementally")
  }

  test("join view: a 5,000-key dim backfill applies incrementally (semi-join probe, no recompute cliff)") {
    val root = freshDir("graft-mview-bigdim")
    val lake = new Lakehouse(spark, root)
    val nKeys = 6000L
    lake.createOrReplace(
      (1L to nKeys).map(k => (k, if (k % 2 == 0) "EVEN" else "ODD")).toDF("cid", "seg"),
      "dim_t")
    lake.createOrReplace(
      (1L to 2 * nKeys).map(i => (i, (i % nKeys) + 1L)).toDF("id", "cust")
        .withColumn("price", lit(1).cast("decimal(18,2)")),
      "fact_t")
    MV.create(lake, JoinDef)
    // a 5,000-key MoR backfill — far above DimDeltaKeysCap, so the
    // fact probe runs as a semi-join against the changed-key set
    // instead of an IN list; the path must STAY incremental
    // (negative dim-keyed batch id) and equal the recompute
    lake.updateWhereMor(Seq("seg" -> lit("BACKFILLED")), col("cid") <= 5000L, "dim_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg"))("BACKFILLED")._2 === 10000L)
    assert(lake.committedBatches("sales_by_seg").exists(_ < 0),
      "a 5,000-key dim change must apply through the dim-delta path, not recompute")
  }

  test("join view: a dim delete that empties a group VANISHES it incrementally (delete leg, one commit)") {
    val root = freshDir("graft-mview-joindel")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00"))), "fact_t")
    MV.create(lake, JoinDef); MV.persist(lake, JoinDef)
    import spark.implicits._
    lake.deleteByKeyMor(Seq(2L).toDF("cid"), "dim_t")
    val viewSnaps = lake.snapshots("sales_by_seg").length
    MV.refresh(lake, JoinDef)
    // RETAIL must VANISH (not linger as a zero row) — since r17 the
    // subtractive path deletes it atomically with the upsert: one
    // commit, O(delta), last_refresh stays incremental
    assert(segMap(lake.read("sales_by_seg")) === Map("AUTO" -> ((dec("10.00"), 1L))))
    assert(lake.committedBatches("sales_by_seg").exists(_ < 0),
      "a group-emptying dim delete must take the subtractive path (r17)")
    assert(lake.snapshots("sales_by_seg").length === viewSnaps + 1,
      "the vanish must ride ONE snapshot commit, atomic with the upsert")
    assert(lake.mviewsDf("fact_t").where(col("mview") === "sales_by_seg")
      .head().getAs[String]("last_refresh") === "incremental")
    // crash-REPLAY converges: a re-run refresh no-ops on the ledger
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === Map("AUTO" -> ((dec("10.00"), 1L))))
    assert(lake.snapshots("sales_by_seg").length === viewSnaps + 1)
  }

  test("join view: min/max dim churn applies incrementally (extremum survivorship); vanish deletes in the same commit") {
    val root = freshDir("graft-mview-joinmm")
    val lake = new Lakehouse(spark, root)
    val mmDef = MV.ViewDef("peak_by_seg", "fact_t",
      groupCols = Seq("seg"),
      aggs = Seq(MV.MaxCol("price", "peak"), MV.MinCol("price", "low"),
        MV.CountAll("n")),
      joins = Seq(MV.JoinSpec("dim_t", "cust", "cid")))
    def mmMap() = lake.read("peak_by_seg").collect()
      .map(r => r.getAs[String]("seg") ->
        ((r.getAs[java.math.BigDecimal]("peak"),
          r.getAs[java.math.BigDecimal]("low"), r.getAs[Long]("n")))).toMap
    def mmRecompute() = lake.read("fact_t")
      .join(lake.read("dim_t"), col("cust") === col("cid"))
      .groupBy("seg").agg(max(col("price")).as("peak"),
        min(col("price")).as("low"), count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("seg") ->
        ((r.getAs[java.math.BigDecimal]("peak"),
          r.getAs[java.math.BigDecimal]("low"), r.getAs[Long]("n")))).toMap
    lake.createOrReplace(
      dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL"), (4L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")),
      (12L, 3L, dec("6.00")), (13L, 3L, dec("9.00")),
      (14L, 4L, dec("5.00"))), "fact_t")
    MV.create(lake, mmDef); MV.persist(lake, mmDef)
    assert(mmMap() === Map("AUTO" -> ((dec("10.00"), dec("10.00"), 1L)),
      "RETAIL" -> ((dec("9.00"), dec("4.00"), 4L))))
    // SURVIVOR churn: cust 4 (value 5.00, strictly inside RETAIL's
    // [4, 9]) re-labels — both extrema survive, the merge is purely
    // incremental (subtractive batch id present, zero fact re-reads
    // beyond the changed key's rows)
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 4L, "dim_t")
    MV.refresh(lake, mmDef)
    assert(mmMap() === mmRecompute())
    assert(mmMap() === Map("AUTO" -> ((dec("10.00"), dec("5.00"), 2L)),
      "RETAIL" -> ((dec("9.00"), dec("4.00"), 3L))))
    assert(lake.committedBatches("peak_by_seg").exists(_ < 0),
      "an inside-the-extrema dim churn must take the subtractive path")
    val meta = lake.mviewsDf("fact_t").where(col("mview") === "peak_by_seg").head()
    assert(meta.getAs[String]("last_refresh") === "incremental",
      s"min/max dim churn must be incremental, note: ${meta.getAs[String]("refresh_note")}")
    // EXHAUSTED churn: cust 3 carries RETAIL's max (9.00) — the minus
    // leg reaches the stored extremum, so THAT group re-derives scoped
    // while the result still lands through the subtractive commit
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 3L, "dim_t")
    MV.refresh(lake, mmDef)
    assert(mmMap() === mmRecompute())
    assert(mmMap() === Map("AUTO" -> ((dec("10.00"), dec("5.00"), 4L)),
      "RETAIL" -> ((dec("4.00"), dec("4.00"), 1L))))
    assert(lake.mviewsDf("fact_t").where(col("mview") === "peak_by_seg")
      .head().getAs[String]("last_refresh") === "incremental")
    // VANISH: the last RETAIL key leaves — since r17 the exhausted
    // group that re-derives to NOTHING rides the commit's keyed
    // delete leg: still incremental, still one commit
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    MV.refresh(lake, mmDef)
    assert(mmMap() === mmRecompute())
    assert(mmMap() === Map("AUTO" -> ((dec("10.00"), dec("4.00"), 5L))))
    val meta3 = lake.mviewsDf("fact_t").where(col("mview") === "peak_by_seg").head()
    assert(meta3.getAs[String]("last_refresh") === "incremental",
      s"a min/max vanish must stay incremental (r17), note: " +
        meta3.getAs[String]("refresh_note"))
    // a sum/count sibling over the same churn reads `incremental`
    lake.createOrReplace(
      dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL"), (4L, "RETAIL")), "dim_t")
    MV.create(lake, JoinDef); MV.persist(lake, JoinDef)
    // cust 4 re-labels (RETAIL keeps custs 2 and 3 — no group vanishes)
    lake.updateWhereMor(Seq("seg" -> lit("PROMO")), col("cid") === 4L, "dim_t")
    MV.refresh(lake, JoinDef)
    val meta2 = lake.mviewsDf("fact_t").where(col("mview") === "sales_by_seg").head()
    assert(meta2.getAs[String]("last_refresh") === "incremental",
      s"sum/count dim movement must stay subtractive, note: ${meta2.getAs[String]("refresh_note")}")
  }

  test("join view: a replayed dim-delta step is a no-op (dim-keyed batch id)") {
    val root = freshDir("graft-mview-joindr")
    val lake = new Lakehouse(spark, root)
    // RETAIL keeps cust 3 after the re-label, so no group empties
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00"))), "fact_t")
    MV.create(lake, JoinDef)
    val dimFrom = lake.currentSnapshot("dim_t").get
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    val dimTo = lake.currentSnapshot("dim_t").get
    val factAt = MV.watermark(lake, JoinDef)
    // the crash window: the delta COMMITTED but the aux dim watermark
    // was never written — the re-run must no-op into the committed
    // batch id, never double-apply the subtraction
    assert(MV.dimDelta(lake, JoinDef, factAt, Some(dimFrom), dimTo).isDefined)
    val afterOnce = segMap(lake.read("sales_by_seg"))
    assert(afterOnce === Map(
      "AUTO" -> ((dec("14.00"), 2L)), "RETAIL" -> ((dec("6.00"), 1L))))
    assert(MV.dimDelta(lake, JoinDef, factAt, Some(dimFrom), dimTo).isDefined)
    assert(segMap(lake.read("sales_by_seg")) === afterOnce)
    // and the ordinary refresh converges the aux watermark, no-op data
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === afterOnce)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
  }

  // ---- LEFT-outer join views (facts survive a lagging dim) ----

  private val LeftDef = MV.ViewDef("lsales_by_seg", "fact_t",
    groupCols = Seq("seg"),
    aggs = Seq(MV.SumCol("price", "total"), MV.CountAll("n")),
    joins = Seq(MV.JoinSpec("dim_t", "cust", "cid", joinType = "left")))

  private def leftRecompute(lake: Lakehouse) = {
    val j = lake.read("fact_t").join(lake.read("dim_t"),
      col("cust") === col("cid"), "left")
    j.groupBy("seg").agg(sum(col("price")).as("total"), count(lit(1)).as("n"))
  }

  private def leftMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => Option(r.getAs[String]("seg")).getOrElse("∅") ->
      ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap

  test("left-join view: unmatched facts keep a null group through fact deltas") {
    val root = freshDir("graft-mview-left")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00"))), "fact_t")
    MV.create(lake, LeftDef)
    assert(leftMap(lake.read("lsales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "∅" -> ((dec("4.00"), 1L))))
    lake.append(factDf((12L, 1L, dec("2.00")), (13L, 9L, dec("1.00"))), "fact_t")
    MV.refresh(lake, LeftDef)
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    assert(leftMap(lake.read("lsales_by_seg"))("∅") === ((dec("5.00"), 2L)))
  }

  test("left-join view: a dim insert converts null-extensions incrementally") {
    val root = freshDir("graft-mview-leftin")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO")), "dim_t")
    // custs 2 and 9 unmatched; 2 will gain a dim row, 9 keeps the
    // null group alive so no group empties
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")),
      (12L, 9L, dec("1.00"))), "fact_t")
    MV.create(lake, LeftDef)
    lake.append(dimDf((2L, "RETAIL")), "dim_t")
    MV.refresh(lake, LeftDef)
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    assert(leftMap(lake.read("lsales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "RETAIL" -> ((dec("4.00"), 1L)),
      "∅" -> ((dec("1.00"), 1L))))
    assert(lake.committedBatches("lsales_by_seg").exists(_ < 0),
      "a dim insert under a left view should apply incrementally")
  }

  test("left-join view: an added DUPLICATE of a matched key extends nothing") {
    val root = freshDir("graft-mview-leftdup")
    val lake = new Lakehouse(spark, root)
    // cust 2 already matched by one dim row; a second (duplicate-key)
    // dim row lands. The CDC alone can't distinguish this from a
    // first match — the match-existence probes must.
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")),
      (12L, 9L, dec("1.00"))), "fact_t")
    MV.create(lake, LeftDef)
    lake.append(dimDf((2L, "PROMO")), "dim_t") // duplicate key, new segment
    MV.refresh(lake, LeftDef)
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    // cust 2 now joins BOTH dim rows (multiplicity 2), and its old
    // null-extension must NOT have been subtracted a second time
    assert(leftMap(lake.read("lsales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "RETAIL" -> ((dec("4.00"), 1L)),
      "PROMO" -> ((dec("4.00"), 1L)), "∅" -> ((dec("1.00"), 1L))))
    assert(lake.committedBatches("lsales_by_seg").exists(_ < 0))
  }

  test("left-join view: a dim delete RETURNS rows to the null group incrementally") {
    val root = freshDir("graft-mview-leftdel")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00")),
      (13L, 9L, dec("1.00"))), "fact_t")
    MV.create(lake, LeftDef)
    import spark.implicits._
    lake.deleteByKeyMor(Seq(2L).toDF("cid"), "dim_t")
    MV.refresh(lake, LeftDef)
    // unlike the INNER view (whose RETAIL group would empty and force
    // a recompute), the LEFT view MOVES cust 2 into the null group —
    // both groups survive, so the subtractive path applies
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    assert(leftMap(lake.read("lsales_by_seg")) === Map(
      "AUTO" -> ((dec("10.00"), 1L)), "RETAIL" -> ((dec("6.00"), 1L)),
      "∅" -> ((dec("5.00"), 2L))))
    assert(lake.committedBatches("lsales_by_seg").exists(_ < 0))
  }

  test("join view: a committed-but-unrecorded dim delta never re-applies after MORE dim movement") {
    val root = freshDir("graft-mview-joindbl")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf(
      (1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL"),
      (8L, "WEB"), (9L, "WEB")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00")),
      (13L, 9L, dec("2.00")), (14L, 8L, dec("3.00"))), "fact_t")
    MV.create(lake, JoinDef)
    val dimFrom = lake.currentSnapshot("dim_t").get
    // step 1 commits via the direct call — the aux watermark is NEVER
    // written (the crash), and then the dim moves AGAIN
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    val dimMid = lake.currentSnapshot("dim_t").get
    assert(MV.dimDelta(lake, JoinDef, MV.watermark(lake, JoinDef),
      Some(dimFrom), dimMid).isDefined)
    lake.updateWhereMor(Seq("seg" -> lit("PROMO")), col("cid") === 9L, "dim_t")
    val dimEnd = lake.currentSnapshot("dim_t").get
    // the ordinary refresh sees the STALE aux (still dimFrom) but must
    // not re-apply (dimFrom, dimMid] — the ledger proves it landed
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("14.00"), 2L)), "RETAIL" -> ((dec("6.00"), 1L)),
      "PROMO" -> ((dec("2.00"), 1L)), "WEB" -> ((dec("3.00"), 1L))))
    // and the recovery itself stayed on the subtractive path
    assert(lake.committedBatches("sales_by_seg").contains(-dimEnd))
  }

  test("join view: a crashed dim recompute leaves a pending marker, never a stale watermark") {
    val root = freshDir("graft-mview-joinpend")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00"))), "fact_t")
    MV.create(lake, JoinDef)
    // the crash state the pending protocol leaves: marker written, no
    // final watermark — the next refresh must parse NO watermark and
    // take the idempotent recompute, not the subtractive path
    MV.markDimRecompute(lake, "sales_by_seg", Seq(999L))
    assert(MV.dimWatermarkOf(lake, "sales_by_seg", 1).isEmpty)
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("14.00"), 2L)), "RETAIL" -> ((dec("6.00"), 1L))))
    // and the recompute converged the watermark back to numeric
    assert(MV.dimWatermarkOf(lake, "sales_by_seg", 1)
      === lake.currentSnapshot("dim_t").map(Seq(_)))
  }

  test("join view: an expired fact watermark recomputes instead of crashing the dim delta") {
    val root = freshDir("graft-mview-joinex")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00"))), "fact_t")
    MV.create(lake, JoinDef)
    // fact history churns past the view's watermark, then expires —
    // the dim-delta probe can no longer time-travel to it
    lake.append(factDf((13L, 1L, dec("1.00"))), "fact_t")
    lake.compact("fact_t")
    lake.expireSnapshots("fact_t", keepLast = 1)
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    MV.refresh(lake, JoinDef)
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("15.00"), 3L)), "RETAIL" -> ((dec("6.00"), 1L))))
  }

  test("SQL surface: CREATE MATERIALIZED VIEW with LEFT JOIN; the dim stream drives refresh") {
    val root = freshDir("graft-mview-sqlj")
    val ck = freshDir("graft-mview-sqlj-ck")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00")),
      (13L, 9L, dec("1.00"))), "fact_t")
    lake.registerView("dim_t"); lake.registerView("fact_t")
    spark.sql(
      """CREATE MATERIALIZED VIEW lsales_by_seg AS
        |SELECT seg, sum(price) AS total, count(*) AS n
        |FROM fact_t LEFT JOIN dim_t ON cust = cid GROUP BY seg""".stripMargin)
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    assert(leftMap(lake.read("lsales_by_seg"))("∅") === ((dec("1.00"), 1L)))
    // the reloaded definition carries the join type
    assert(MV.load(lake, "lsales_by_seg").flatMap(_.join.map(_.joinType))
      === Some("left"))
    // a DIM-ONLY MoR change must drive the streaming scheduler — no
    // fact commit anywhere in this interval
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    val q = graft.streaming.EventStream.maintainMview(spark, root, "lsales_by_seg", ck)
    try q.awaitTermination(120000) finally q.stop()
    assert(leftMap(lake.read("lsales_by_seg")) === leftMap(leftRecompute(lake)))
    assert(leftMap(lake.read("lsales_by_seg")) === Map(
      "AUTO" -> ((dec("14.00"), 2L)), "RETAIL" -> ((dec("6.00"), 1L)),
      "∅" -> ((dec("1.00"), 1L))))
    assert(lake.committedBatches("lsales_by_seg").exists(_ < 0),
      "the dim-driven refresh should land on the subtractive path")
  }

  test("maintenance stream survives a watched-table rewrite (ticks carry no data)") {
    val root = freshDir("graft-mview-tick")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO"), (2L, "RETAIL"), (3L, "RETAIL")), "dim_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00"))), "fact_t")
    MV.create(lake, JoinDef)
    MV.persist(lake, JoinDef)
    val ck = freshDir("graft-mview-tick-ck")
    val q1 = graft.streaming.EventStream.maintainMview(spark, root, "sales_by_seg", ck)
    try q1.awaitTermination(120000) finally q1.stop()
    // the dim moves AND compacts — the checkpointed interval is now a
    // REWRITE; a data-carrying source would fail every restart from
    // this checkpoint and wedge maintenance permanently
    lake.updateWhereMor(Seq("seg" -> lit("AUTO")), col("cid") === 2L, "dim_t")
    lake.compact("dim_t")
    lake.append(factDf((13L, 3L, dec("1.00"))), "fact_t")
    lake.compact("fact_t")
    val q2 = graft.streaming.EventStream.maintainMview(spark, root, "sales_by_seg", ck)
    try q2.awaitTermination(120000) finally q2.stop()
    assert(segMap(lake.read("sales_by_seg")) === segMap(joinRecompute(lake)))
    assert(segMap(lake.read("sales_by_seg")) === Map(
      "AUTO" -> ((dec("14.00"), 2L)), "RETAIL" -> ((dec("7.00"), 2L))))
  }

  test("join view: the definition persists with its join spec and reloads by name") {
    val root = freshDir("graft-mview-joinp")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(dimDf((1L, "AUTO")), "dim_t")
    lake.createOrReplace(factDf((10L, 1L, dec("10.00"))), "fact_t")
    MV.create(lake, JoinDef)
    MV.persist(lake, JoinDef)
    assert(MV.load(lake, "sales_by_seg") === Some(JoinDef))
    // and CALL refresh_mview drives a join view through the loaded def
    lake.registerView("sales_by_seg")
    lake.append(factDf((11L, 1L, dec("1.00"))), "fact_t")
    spark.sql("CALL system.refresh_mview('sales_by_seg')").collect()
    assert(segMap(lake.read("sales_by_seg"))("AUTO") === ((dec("11.00"), 2L)))
  }

  // ---- multi-hop (snowflake) join chains: fact ⋈ dim ⋈ dim -------------

  private val StarDef = MV.ViewDef("sales_by_nation", "fact_t",
    groupCols = Seq("nname"),
    aggs = Seq(MV.SumCol("price", "total"), MV.CountAll("n")),
    // hop 2's factKey `nid` is a column INTRODUCED by hop 1's dim —
    // the snowflake shape (orders ⋈ customer ⋈ nation)
    joins = Seq(MV.JoinSpec("cust_t", "cust", "cid"),
      MV.JoinSpec("nat_t", "nid", "nid")))

  private def custDf(rows: (Long, Long)*) = rows.toDF("cid", "nid")
  private def natDf(rows: (Long, String)*) = rows.toDF("nid", "nname")

  private def starRecompute(lake: Lakehouse) =
    lake.read("fact_t")
      .join(lake.read("cust_t"), col("cust") === col("cid"))
      .join(lake.read("nat_t"), Seq("nid"))
      .groupBy("nname").agg(sum(col("price")).as("total"), count(lit(1)).as("n"))

  private def natMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("nname") ->
      ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap

  test("multi-hop join view: fact appends stay on the delta path through the pinned dim chain") {
    val root = freshDir("graft-mview-star")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(custDf((1L, 100L), (2L, 100L), (3L, 200L)), "cust_t")
    lake.createOrReplace(natDf((100L, "FR"), (200L, "DE")), "nat_t")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")), (12L, 3L, dec("6.00"))), "fact_t")
    MV.create(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === Map(
      "FR" -> ((dec("14.00"), 2L)), "DE" -> ((dec("6.00"), 1L))))
    lake.append(factDf((13L, 1L, dec("2.50")), (14L, 3L, dec("1.00"))), "fact_t")
    val before = Lakehouse.dataDirOpens.get()
    MV.refresh(lake, StarDef)
    val opened = Lakehouse.dataDirOpens.get() - before
    // delta dir + two dims + stored view (+ upsert rewrite) — never
    // the fact history
    assert(opened <= 6, s"multi-hop refresh opened $opened dirs")
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    assert(natMap(lake.read("sales_by_nation"))("FR") === ((dec("16.50"), 3L)))
    // the fact watermark advanced exactly-once on the fact snapshot id
    assert(MV.watermark(lake, StarDef) === lake.currentSnapshot("fact_t").get)
  }

  test("multi-hop join view: DEEP-hop movement applies subtractively; emptied groups vanish on-path") {
    val root = freshDir("graft-mview-stard")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(custDf((1L, 100L), (2L, 200L)), "cust_t")
    lake.createOrReplace(natDf((100L, "FR"), (200L, "DE")), "nat_t")
    lake.createOrReplace(factDf((10L, 1L, dec("10.00")), (11L, 2L, dec("4.00"))), "fact_t")
    MV.create(lake, StarDef)
    // hop-2 dim movement that EMPTIES a group: re-labeling the only FR
    // nation zeroes group FR and births FR2 — since r17 the
    // subtractive leg deletes the zeroed group and upserts the new
    // one in ONE commit, staying on the dim-delta path
    lake.updateWhereMor(Seq("nname" -> lit("FR2")), col("nid") === 100L, "nat_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    assert(natMap(lake.read("sales_by_nation")) === Map(
      "FR2" -> ((dec("10.00"), 1L)), "DE" -> ((dec("4.00"), 1L))))
    assert(lake.committedBatches("sales_by_nation").exists(_ < 0),
      "an emptying deep-hop change must stay on the dim-delta leg (r17)")
    // both dim watermarks converged to the new pins
    assert(MV.dimWatermarkOf(lake, "sales_by_nation", 2) ===
      Some(Seq(lake.currentSnapshot("cust_t").get, lake.currentSnapshot("nat_t").get)))
    // HEAD-hop movement (the enrichment-backfill shape: a customer
    // moves nation) applies SUBTRACTIVELY — the changed key's fact
    // rows re-enrich through the PINNED nat chain on both legs
    lake.updateWhereMor(Seq("nid" -> lit(200L)), col("cid") === 1L, "cust_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    assert(natMap(lake.read("sales_by_nation")) === Map(
      "DE" -> ((dec("14.00"), 2L)))) // FR2 emptied... so the delta fell back
    // a group emptied => the subtractive leg correctly fell back; do a
    // NON-emptying head-hop change and pin the negative batch id
    lake.append(custDf((3L, 100L)), "cust_t")
    lake.append(factDf((12L, 3L, dec("5.00"))), "fact_t")
    MV.refresh(lake, StarDef) // fact+dim advance (insert-only dim: no-op delta)
    lake.updateWhereMor(Seq("nid" -> lit(200L)), col("cid") === 2L, "cust_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    assert(lake.committedBatches("sales_by_nation").exists(_ < 0),
      "a non-emptying head-hop change must land through the subtractive leg")
    // hop-1 append + fact append: delta paths end-to-end
    lake.append(custDf((9L, 200L)), "cust_t")
    lake.append(factDf((13L, 9L, dec("3.00"))), "fact_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    // DEEP-hop movement that empties NO group applies SUBTRACTIVELY
    // (round 13): a second nation shares FR2's label; re-labeling it
    // moves only its own rows, both groups stay populated, and the
    // hop-2 delta lands under the hop-partitioned negative batch id
    // (−(1·2^40 + snap)) — never a recompute, never confused with a
    // head-hop id
    lake.append(natDf((300L, "FR2")), "nat_t")
    lake.append(custDf((5L, 300L)), "cust_t")
    lake.append(factDf((14L, 5L, dec("2.00"))), "fact_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    lake.updateWhereMor(Seq("nname" -> lit("XX")), col("nid") === 300L, "nat_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
    assert(natMap(lake.read("sales_by_nation"))("XX") === ((dec("2.00"), 1L)))
    assert(lake.committedBatches("sales_by_nation")
      .exists(b => b < 0 && -b >= (1L << 40)),
      "a non-emptying hop-2 change must land through the subtractive leg " +
        "in the hop-1 batch namespace")
    // and the fact path still advances cleanly afterwards
    lake.append(factDf((15L, 5L, dec("1.00"))), "fact_t")
    MV.refresh(lake, StarDef)
    assert(natMap(lake.read("sales_by_nation")) === natMap(starRecompute(lake)))
  }

  test("SQL surface: CREATE MATERIALIZED VIEW with a snowflake JOIN chain") {
    val root = freshDir("graft-mview-starsql")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(custDf((1L, 100L), (2L, 200L)), "sqlstar_cust")
    lake.createOrReplace(natDf((100L, "FR"), (200L, "DE")), "sqlstar_nat")
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00"))), "sqlstar_fact")
    Seq("sqlstar_cust", "sqlstar_nat", "sqlstar_fact").foreach(lake.registerView(_))
    spark.sql(
      """CREATE MATERIALIZED VIEW sqlstar_v AS
        |SELECT nname, sum(price) AS total, count(*) AS n
        |FROM sqlstar_fact
        |JOIN sqlstar_cust ON cust = cid
        |JOIN sqlstar_nat ON sqlstar_nat.nid = nid
        |GROUP BY nname""".stripMargin)
    assert(natMap(spark.table("sqlstar_v")) === Map(
      "FR" -> ((dec("10.00"), 1L)), "DE" -> ((dec("4.00"), 1L))))
    // the chain persisted: a fresh load sees two hops, then CALL
    // refresh advances through a fact append on the delta path
    val d2 = MV.load(lake, "sqlstar_v").get
    assert(d2.joins.map(_.dim) === Seq("sqlstar_cust", "sqlstar_nat"))
    lake.append(factDf((12L, 1L, dec("2.00"))), "sqlstar_fact")
    spark.sql("CALL system.refresh_mview('sqlstar_v')").collect()
    assert(natMap(spark.table("sqlstar_v"))("FR") === ((dec("12.00"), 2L)))
  }

  test("LEFT-hop movement in a 2-hop chain applies subtractively at either position (r14)") {
    val root = freshDir("graft-mview-lstar")
    val lake = new Lakehouse(spark, root)
    val LDef = MV.ViewDef("lsales_nat", "lfact_t",
      groupCols = Seq("nname"),
      aggs = Seq(MV.SumCol("price", "total"), MV.CountAll("n")),
      joins = Seq(MV.JoinSpec("lcust_t", "cust", "cid", joinType = "left"),
        MV.JoinSpec("lnat_t", "nid", "nid", joinType = "left")))
    def recompute() = lake.read("lfact_t")
      .join(lake.read("lcust_t"), col("cust") === col("cid"), "left")
      .join(lake.read("lnat_t"), Seq("nid"), "left")
      .groupBy("nname").agg(sum(col("price")).as("total"), count(lit(1)).as("n"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      Option(r.getAs[String]("nname")).getOrElse("∅") ->
        ((r.getAs[java.math.BigDecimal]("total"), r.getAs[Long]("n")))).toMap
    lake.createOrReplace(custDf((1L, 100L), (2L, 200L)).toDF("cid", "nid"), "lcust_t")
    lake.createOrReplace(natDf((100L, "FR"), (200L, "DE")), "lnat_t")
    // cust 9 NEVER matches: it keeps the null group populated so the
    // head-hop move below is non-emptying (the count-zero gate is its
    // own test elsewhere)
    lake.createOrReplace(factDf(
      (10L, 1L, dec("10.00")), (11L, 2L, dec("4.00")),
      (12L, 3L, dec("6.00")), (19L, 9L, dec("7.00"))), "lfact_t")
    MV.create(lake, LDef)
    // custs 3 and 9 match nothing at hop 0: their rows null-extend
    // straight through hop 1 into the null group
    assert(m(lake.read("lsales_nat")) === Map(
      "FR" -> ((dec("10.00"), 1L)), "DE" -> ((dec("4.00"), 1L)),
      "∅" -> ((dec("13.00"), 2L))))
    // MOVE THE LEFT HEAD HOP: cust 3 becomes matched — its rows leave
    // the null group into FR, subtractively (hop-0 negative batch id)
    lake.append(custDf((3L, 100L)).toDF("cid", "nid"), "lcust_t")
    MV.refresh(lake, LDef)
    assert(m(lake.read("lsales_nat")) === m(recompute()))
    assert(m(lake.read("lsales_nat")) === Map(
      "FR" -> ((dec("16.00"), 2L)), "DE" -> ((dec("4.00"), 1L)),
      "∅" -> ((dec("7.00"), 1L))))
    assert(lake.committedBatches("lsales_nat")
      .exists(b => b < 0 && -b < (1L << 40)),
      "a left HEAD-hop change must land through the subtractive leg")
    // MOVE THE LEFT SUFFIX HOP non-emptily: two nations share label XX;
    // MoR-deleting one sends only ITS rows to the (new) null group
    lake.append(natDf((300L, "XX"), (301L, "XX")), "lnat_t")
    lake.append(custDf((4L, 300L), (5L, 301L)).toDF("cid", "nid"), "lcust_t")
    lake.append(factDf((13L, 4L, dec("2.00")), (14L, 5L, dec("3.00"))), "lfact_t")
    MV.refresh(lake, LDef)
    assert(m(lake.read("lsales_nat")) === m(recompute()))
    val batchesBefore = lake.committedBatches("lsales_nat").toSet
    lake.deleteByKeyMor(Seq(300L).toDF("nid"), "lnat_t")
    MV.refresh(lake, LDef)
    assert(m(lake.read("lsales_nat")) === m(recompute()))
    assert(m(lake.read("lsales_nat"))("∅") === ((dec("9.00"), 2L)),
      "the deleted nation's rows must join the null group")
    assert(m(lake.read("lsales_nat"))("XX") === ((dec("3.00"), 1L)),
      "the surviving same-label nation must keep its rows")
    assert((lake.committedBatches("lsales_nat").toSet -- batchesBefore)
      .exists(b => b < 0 && -b >= (1L << 40)),
      "a left SUFFIX-hop change must land through the hop-1 subtractive leg")
    // a suffix-hop re-insert CONVERTS a null-extension back: cust 4's
    // rows leave the null group into ZZ (non-emptying — cust 9 stays)
    lake.append(natDf((300L, "ZZ")), "lnat_t")
    MV.refresh(lake, LDef)
    assert(m(lake.read("lsales_nat")) === m(recompute()))
    assert(m(lake.read("lsales_nat"))("∅") === ((dec("7.00"), 1L)))
    assert(m(lake.read("lsales_nat"))("ZZ") === ((dec("2.00"), 1L)))
    // fact path still advances after the left-hop legs
    lake.append(factDf((15L, 5L, dec("1.00"))), "lfact_t")
    MV.refresh(lake, LDef)
    assert(m(lake.read("lsales_nat")) === m(recompute()))
    // both dim watermarks converged to the new pins
    assert(MV.dimWatermarkOf(lake, "lsales_nat", 2) ===
      Some(Seq(lake.currentSnapshot("lcust_t").get, lake.currentSnapshot("lnat_t").get)))
  }

  test("multi-hop definition persists as a joins array and reloads; left hops survive") {
    val root = freshDir("graft-mview-starp")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(custDf((1L, 100L)), "cust_t")
    lake.createOrReplace(natDf((100L, "FR")), "nat_t")
    lake.createOrReplace(factDf((10L, 1L, dec("10.00"))), "fact_t")
    val withLeft = StarDef.copy(
      joins = StarDef.joins.init :+ StarDef.joins.last.copy(joinType = "left"))
    MV.create(lake, withLeft)
    MV.persist(lake, withLeft)
    assert(MV.load(lake, "sales_by_nation") === Some(withLeft))
  }
}

/** Test-side twin of the view's aggregation, for recompute checks. */
private object MVTestAccess {
  def aggOf(rows: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    rows.groupBy("status").agg(
      sum(col("price")).as("total"), count(lit(1)).as("n"),
      min(col("price")).as("lo"), max(col("price")).as("hi"))
}

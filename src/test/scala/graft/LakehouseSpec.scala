package graft

import org.apache.spark.sql.functions._

import graft.sources.{JsonDocSource, Lakehouse, Sinks, Tables}

class LakehouseSpec extends SparkSpec {

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-lake").toString
    d
  }

  test("createOrReplace + read round-trip, partitioned") {
    val lake = new Lakehouse(spark, freshRoot())
    val nation = Tables.nation(spark, sf)
    lake.createOrReplace(nation, "nation", partitionBy = Seq("n_regionkey"))
    assert(lake.read("nation").count() === nation.count())
    assert(lake.read("nation").columns.toSet === nation.columns.toSet)
  }

  test("replace creates a new snapshot; time travel reads the old one") {
    val lake = new Lakehouse(spark, freshRoot())
    val orders = Tables.orders(spark, sf)
    val s1 = lake.createOrReplace(orders.limit(10), "orders")
    val s2 = lake.createOrReplace(orders.limit(25), "orders")
    assert(s1 === 1L && s2 === 2L)
    assert(lake.currentSnapshot("orders") === Some(2L))
    assert(lake.read("orders").count() === 25)
    assert(lake.readSnapshot("orders", s1).count() === 10)
    assert(lake.snapshots("orders").map(_._1) === Seq(1L, 2L))
  }

  test("append writes only a delta dir and unions with history") {
    val lake = new Lakehouse(spark, freshRoot())
    val orders = Tables.orders(spark, sf)
    lake.createOrReplace(orders.limit(10), "orders")
    val s2 = lake.append(orders.limit(40).where(col("o_orderkey") > 1000), "orders")
    val expected = 10 + orders.limit(40).where(col("o_orderkey") > 1000).count()
    assert(lake.read("orders").count() === expected)
    // the append snapshot references two dirs, the first references one
    assert(lake.snapshots("orders").find(_._1 == s2).get._2.length === 2)
  }

  test("schema evolution: appended column appears, old rows read null") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "evo")
    lake.append(Seq((2L, "b", 9.5)).toDF("k", "v", "score"), "evo")
    val got = lake.read("evo")
    assert(got.columns.toSet === Set("k", "v", "score"))
    assert(got.where(org.apache.spark.sql.functions.col("k") === 1)
      .head().isNullAt(got.columns.indexOf("score")))
  }

  test("compact folds an append chain into one data dir, preserving data and history") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "c")
    lake.append(Seq((2L, "b")).toDF("k", "v"), "c")
    lake.append(Seq((3L, "c")).toDF("k", "v"), "c")
    val before = lake.snapshots("c").last._2.length
    assert(before === 3)
    val snap = lake.compact("c")
    assert(lake.snapshots("c").find(_._1 == snap).get._2.length === 1)
    assert(lake.read("c").count() === 3)
    assert(lake.readSnapshot("c", 3).count() === 3) // pre-compaction history intact
  }

  test("branches: isolated commits, time-shared history, fast-forward merge") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "b")            // snap 1 on main
    lake.createBranch("b", "dev", fromSnap = 1)
    lake.append(Seq((2L, "x")).toDF("k", "v"), "b", branch = "dev")     // snap 2 on dev
    assert(lake.read("b").count() === 1, "main must not see dev commits")
    assert(lake.read("b", "dev").count() === 2)
    assert(lake.branches("b") === Seq("main", "dev").sorted || lake.branches("b") === Seq("main", "dev"))
    lake.mergeBranch("b", from = "dev", into = "main")
    assert(lake.read("b").count() === 2, "merge fast-forwards main")
  }

  test("partition-pruned read: a filter on the partition column skips other partitions") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Tables.nation(spark, sf), "nation_p", partitionBy = Seq("n_regionkey"))
    val q = lake.read("nation_p").where(org.apache.spark.sql.functions.col("n_regionkey") === 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"),
      s"partition filter not pushed:\n${plan.take(500)}")
    assert(q.count() === Tables.nation(spark, sf)
      .where(org.apache.spark.sql.functions.col("n_regionkey") === 2).count())
  }

  test("upsert merges on key: updates win, unmatched rows survive, inserts land") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "kv")
    lake.upsert(Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "kv", Seq("k"))
    val got = lake.read("kv").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // history preserved: snapshot 1 still has the pre-merge state
    assert(lake.readSnapshot("kv", 1).count() === 2)
  }

  test("registerView exposes the table to spark.sql") {
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Tables.region(spark, sf), "region_lake")
    lake.registerView("region_lake")
    assert(spark.sql("SELECT count(*) FROM region_lake").head().getLong(0) === 5)
  }

  test("sinks export csv and parquet with overwrite") {
    val out = freshRoot()
    val df = Tables.region(spark, sf)
    Sinks.exportCsv(df, s"$out/r.csv")
    Sinks.exportCsv(df, s"$out/r.csv") // overwrite works
    Sinks.exportParquet(df, s"$out/r.parquet")
    assert(spark.read.option("header", "true").csv(s"$out/r.csv").count() === 5)
    assert(spark.read.parquet(s"$out/r.parquet").count() === 5)
  }

  test("partition-scoped upsert rewrites only touched partitions; others keep their original files") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(
      Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p3"))
        .toDF("k", "v", "p"), "pt", partitionBy = Seq("p"))
    // snapshot-1 file inventory per partition (path, length, mtime)
    def files(entrySuffix: String): Seq[(String, Long, Long)] = {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      val dir = new org.apache.hadoop.fs.Path(lake.tableRoot("pt"), entrySuffix)
      fs.listStatus(dir).toSeq.filter(_.isFile).filter(_.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.toString, s.getLen, s.getModificationTime))
    }
    val p2Before = files("data-1/p=p2")
    val p3Before = files("data-1/p=p3")
    // touch ONLY p1: update k=2, insert k=9
    lake.upsert(Seq((2L, "B", "p1"), (9L, "z", "p1")).toDF("k", "v", "p"),
      "pt", keyCols = Seq("k"), partitionBy = Seq("p"))
    val got = lake.read("pt").select("k", "v", "p").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "p1"), (2L, "B", "p1"), (9L, "z", "p1"),
      (3L, "c", "p2"), (4L, "d", "p3")))
    // untouched partitions are THE SAME FILES (path+size+mtime), referenced from snapshot 2
    assert(files("data-1/p=p2") === p2Before)
    assert(files("data-1/p=p3") === p3Before)
    val entries = lake.snapshots("pt").find(_._1 == 2L).get._2
    assert(entries.contains("data-1/p=p2") && entries.contains("data-1/p=p3"))
    assert(entries.contains("data-2") && !entries.exists(_ == "data-1"))
    // history: snapshot 1 still reads the pre-merge state
    assert(lake.readSnapshot("pt", 1L).count() === 4)
  }

  test("snapshot expiry deletes orphaned data, keeps current + branch-referenced history") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "ex")   // snap 1
    lake.createBranch("ex", "pin", fromSnap = 1)
    lake.createOrReplace(Seq((2L, "b")).toDF("k", "v"), "ex")   // snap 2
    lake.createOrReplace(Seq((3L, "c")).toDF("k", "v"), "ex")   // snap 3
    lake.createOrReplace(Seq((4L, "d")).toDF("k", "v"), "ex")   // snap 4
    lake.expireSnapshots("ex", keepLast = 2)
    // snaps 3,4 kept by recency; snap 1 kept by the pin branch; snap 2 expired
    assert(lake.snapshots("ex").map(_._1) === Seq(1L, 3L, 4L))
    intercept[IllegalArgumentException] { lake.readSnapshot("ex", 2L) }
    assert(lake.read("ex").collect().map(_.getLong(0)).toSeq === Seq(4L))
    assert(lake.read("ex", "pin").collect().map(_.getLong(0)).toSeq === Seq(1L))
    // snap 2's data dir is gone from disk; kept dirs remain
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(lake.tableRoot("ex"), "data-2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(lake.tableRoot("ex"), "data-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(lake.tableRoot("ex"), "data-4")))
  }

  test("file-level data skipping: a key-range read opens only overlapping files") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    // 4 appends of disjoint key ranges → 4 files with disjoint min/max
    lake.createOrReplace((0L until 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), "sk")
    (1 to 3).foreach { i =>
      lake.append((i * 100L until (i + 1) * 100L).map(k => (k, s"v$k")).toDF("k", "v").coalesce(1), "sk")
    }
    val pruned = lake.prunedRead("sk", "k", 250L, 260L)
    assert(pruned.inputFiles.length === 1,
      s"expected 1 of 4 files after stats pruning, read ${pruned.inputFiles.length}")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === (250L to 260L).toSeq)
    // conservative on a column with no overlap constraint violated
    assert(lake.prunedRead("sk", "k", 0L, 399L).count() === 400L)
  }

  test("SQL surface: tablesDf lists tables; sqlMerge upserts through a SQL plan") {
    val lake = new Lakehouse(spark, freshRoot())
    import spark.implicits._
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "mt")
    Seq((2L, "B"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("mt_src")
    lake.sqlMerge("mt", "mt_src", Seq("k"))
    assert(spark.sql("SELECT v FROM mt WHERE k = 2").head().getString(0) === "B")
    assert(spark.table("mt").count() === 3)
    val listing = lake.tablesDf().collect()
    val row = listing.find(_.getAs[String]("table_name") == "mt").get
    assert(row.getAs[Long]("current_snapshot") === 2L)
    assert(row.getAs[Long]("n_snapshots") === 2L)
    assert(row.getAs[String]("branches").contains("main"))
  }

  test("jdbc sink round-trips the gold report through embedded Derby") {
    val dbDir = freshRoot()
    val url = s"jdbc:derby:$dbDir/goldb;create=true"
    val gold = graft.operators.Medallion.goldSalesReport(spark, sf)
    Sinks.exportJdbc(gold, url, "gold_sales")
    Sinks.exportJdbc(gold, url, "gold_sales") // overwrite mode works
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "gold_sales")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver").load()
    assert(back.count() === gold.count())
    assert(back.agg(sum("order_count")).head().getLong(0)
      === gold.agg(sum("order_count")).head().getLong(0))
  }

  test("medallion flow on document source: bronze docs → lakehouse → gold report") {
    val lake = new Lakehouse(spark, freshRoot())
    val fixture = getClass.getResource("/orders_fixture.jsonl").getPath
    val docs = JsonDocSource.readValid(spark, fixture)
    lake.createOrReplace(docs, "bronze_orders")
    val gold = lake.read("bronze_orders")
      .groupBy(col("shipping_address.city").as("city"))
      .agg(sum("total_amount").as("total_revenue"), count("order_id").as("order_count"))
      .orderBy(col("total_revenue").desc)
    val top = gold.head()
    assert(top.getAs[String]("city") === "Hyderabad")
    assert(top.getAs[Long]("order_count") === 2L)
  }
}

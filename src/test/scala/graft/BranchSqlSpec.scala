package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Branch-addressable SQL — the reference's `NESSIE_REF` session
  * selector (gold_reporting.py:26): `spark.graft.branch` scopes the
  * parsed-SQL surface's reads and DML routing to a named branch, and
  * `VERSION AS OF '<ref>'` addresses tags-then-branches from any
  * session. Plus the plan-aware statement pinning that replaced the
  * word-regex scan. */
class BranchSqlSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-branch").toString

  test("session branch scopes SQL reads and DML; main sees nothing until fast-forward") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val v1 = lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "bt")
    lake.registerView("bt")
    lake.createBranch("bt", "dev", v1)
    spark.conf.set("spark.graft.branch", "dev")
    try {
      // DML routes to the session branch
      spark.sql("INSERT INTO bt SELECT 3, 'c'")
      spark.sql("UPDATE bt SET v = 'B' WHERE k = 2")
      // plain SQL reads pin the branch head
      assert(spark.sql("SELECT count(*) AS n FROM bt").head().getLong(0) === 3)
      assert(spark.sql("SELECT v FROM bt WHERE k = 2").head().getString(0) === "B")
      // main is untouched by branch-scoped statements
      assert(lake.read("bt", "main").count() === 2)
      assert(lake.read("bt", "main").where(col("k") === 2).head().getString(1) === "b")
      // a named ref addresses ANOTHER branch from this session
      assert(spark.sql("SELECT count(*) AS n FROM bt VERSION AS OF 'main'")
        .head().getLong(0) === 2)
    } finally spark.conf.unset("spark.graft.branch")
    // back on main: plain reads see the unmodified table…
    assert(spark.sql("SELECT count(*) AS n FROM bt").head().getLong(0) === 2)
    // …and the dev branch is addressable by name
    assert(spark.sql("SELECT count(*) AS n FROM bt VERSION AS OF 'dev'")
      .head().getLong(0) === 3)
    // fast-forward main; SQL sees the merge
    lake.mergeBranch("bt", "dev")
    assert(spark.sql("SELECT count(*) AS n FROM bt").head().getLong(0) === 3)
    assert(spark.sql("SELECT v FROM bt WHERE k = 2").head().getString(0) === "B")
  }

  test("VERSION AS OF named refs: tags win over a same-named branch") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val v1 = lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "tr")
    lake.registerView("tr")
    spark.sql("INSERT INTO tr SELECT 2, 'b'")
    // tag pins v1; a branch of the same name points at the head
    lake.tagSnapshot("tr", "rel", v1)
    lake.createBranch("tr", "rel", lake.currentSnapshot("tr").get)
    assert(spark.sql("SELECT count(*) AS n FROM tr VERSION AS OF 'rel'")
      .head().getLong(0) === 1, "the immutable tag must win over the branch")
    // an unknown ref fails loudly (travel view resolves neither)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM tr VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("nope"))
  }

  test("branch-scoped CTAS: the table exists on the branch, not on main") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    spark.conf.set(graft.sources.LakehouseCtasCommand.RootConf, root)
    spark.conf.set("spark.graft.branch", "scratch")
    try {
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x").createOrReplaceTempView("ctas_src")
      spark.sql("CREATE TABLE bct AS SELECT * FROM ctas_src")
      assert(spark.sql("SELECT count(*) AS n FROM bct").head().getLong(0) === 2)
      // main has no pointer for this table
      assert(lake.currentSnapshot("bct", "main").isEmpty)
      assert(lake.currentSnapshot("bct", "scratch").isDefined)
    } finally {
      spark.conf.unset("spark.graft.branch")
      spark.conf.unset(graft.sources.LakehouseCtasCommand.RootConf)
    }
  }

  test("branch DDL: CREATE BRANCH / DROP BRANCH / FAST FORWARD as parsed statements") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    val v1 = lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "bd")
    lake.registerView("bd")
    spark.sql("INSERT INTO bd SELECT 2, 'b'")
    // CREATE BRANCH defaults to the session branch's head…
    spark.sql("ALTER TABLE bd CREATE BRANCH dev")
    assert(spark.sql("SELECT count(*) AS n FROM bd VERSION AS OF 'dev'")
      .head().getLong(0) === 2)
    // …and AS OF VERSION pins an explicit snapshot
    spark.sql(s"ALTER TABLE bd CREATE BRANCH frozen AS OF VERSION $v1")
    assert(spark.sql("SELECT count(*) AS n FROM bd VERSION AS OF 'frozen'")
      .head().getLong(0) === 1)
    assert(lake.branches("bd").toSet === Set("main", "dev", "frozen"))
    // branch-scoped write, then FAST FORWARD merges it into main
    spark.conf.set("spark.graft.branch", "dev")
    try spark.sql("INSERT INTO bd SELECT 3, 'c'")
    finally spark.conf.unset("spark.graft.branch")
    assert(spark.sql("SELECT count(*) AS n FROM bd").head().getLong(0) === 2)
    spark.sql("ALTER TABLE bd FAST FORWARD dev")
    assert(spark.sql("SELECT count(*) AS n FROM bd").head().getLong(0) === 3)
    // DROP BRANCH removes the pointer; history survives
    spark.sql("ALTER TABLE bd DROP BRANCH frozen")
    assert(lake.branches("bd").toSet === Set("main", "dev"))
    assert(lake.readSnapshot("bd", v1).count() === 1)
    intercept[Exception](spark.sql("ALTER TABLE bd DROP BRANCH main").collect())
    intercept[Exception](
      spark.sql("ALTER TABLE bd DROP BRANCH frozen AS OF VERSION 1").collect())
  }

  test("statement pinning is plan-aware: a registered name inside a string literal never re-pins") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(Seq((1L, "x")).toDF("k", "v"), "alpha")
    lake.createOrReplace(Seq((2L, "y")).toDF("k", "v"), "beta")
    lake.registerView("alpha")
    lake.registerView("beta")
    // drop beta's temp view: only an actual RELATION reference may
    // re-create (re-pin) it
    spark.catalog.dropTempView("beta")
    val got = spark.sql("SELECT 'beta' AS tag, count(*) AS n FROM alpha").head()
    assert(got.getString(0) === "beta" && got.getLong(1) === 1)
    assert(!spark.catalog.tableExists("beta"),
      "a string literal containing a registered name must not trigger a pin")
    // a real reference (incl. from a subquery) pins it again
    assert(spark.sql(
      "SELECT (SELECT count(*) FROM beta) AS n FROM alpha").head().getLong(0) === 1)
    assert(spark.catalog.tableExists("beta"))
  }

  test("write-audit-publish: stage on a branch, audit + fix there, publish by fast-forward") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace(
      Seq((1L, "widget", 9.99), (2L, "gadget", 24.50)).toDF("id", "item", "price"), "wap")
    lake.registerView("wap")
    spark.sql("ALTER TABLE wap CREATE BRANCH staging")
    // the incoming batch lands on the BRANCH — one bad row included
    lake.append(Seq((3L, "doohickey", 4.25), (4L, "corrupt", -1.0))
      .toDF("id", "item", "price"), "wap", branch = "staging")
    // main serves readers untouched while the audit runs
    assert(lake.read("wap", "main").count() === 2)
    // audit ON the staged state finds the violation...
    val bad = lake.read("wap", "staging").where(col("price") < 0)
    assert(bad.count() === 1)
    // ...which is repaired on the branch (row-level delete, main still clean)
    lake.deleteWhere(col("price") < 0, "wap", branch = "staging")
    assert(lake.read("wap", "staging").where(col("price") < 0).count() === 0)
    assert(lake.read("wap", "main").count() === 2)
    // publish: a pointer move — no data is rewritten
    spark.sql("ALTER TABLE wap FAST FORWARD staging INTO main")
    val main = lake.read("wap", "main").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(main === Seq(1L, 2L, 3L), "audited batch published, corrupt row never reached main")
  }
}

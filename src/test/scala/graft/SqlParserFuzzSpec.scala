package graft

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkSqlParser
import org.apache.spark.sql.functions._

import graft.sources.{GraftSqlParser, Lakehouse}

/** Parser-equivalence fuzzing for [[graft.sources.GraftSqlParser]] —
  * the regex front-end's one permitted failure mode is a LOUD error;
  * it must never silently mis-route a statement Spark would have
  * handled. Three contracts, each over generated adversarial
  * statements (>1000 total):
  *
  *  1. DELEGATION IS EXACT — statements outside the intercept surface
  *     (including ones carrying registered view names, DML keywords,
  *     `WHEN MATCHED`, and intercept-shaped text inside string
  *     literals and comments) parse to a plan `==` the delegate's.
  *  2. INTERCEPTED OUTPUT ≡ DELEGATE OUTPUT — SELECT shapes that MAY
  *     hit the metaAgg/groupAgg fast paths execute to the same rows
  *     and column names as the identical statement against an
  *     UNREGISTERED twin of the same data (which can only delegate).
  *  3. REFUSALS ARE LOUD — the documented unsupported corners
  *     (subqueries in row-local predicates) throw
  *     `UnsupportedOperationException`, never parse to a command that
  *     would quietly do the wrong thing.
  */
class SqlParserFuzzSpec extends SparkSpec {

  private lazy val delegate: ParserInterface = new SparkSqlParser()
  private lazy val graftParser: ParserInterface = new GraftSqlParser(delegate)

  // deterministic corpus: same statements every run
  private val rnd = new scala.util.Random(0x5eedL)

  private def mixCase(s: String): String =
    s.map(c => if (c.isLetter && rnd.nextBoolean()) c.toUpper else if (c.isLetter) c.toLower else c)

  /** Random keyword-preserving mutation: case-flip keywords, stretch
    * whitespace, append `;`, and drop trap text into comments. */
  private def mutate(sql: String): String = {
    var s = sql
    if (rnd.nextInt(3) == 0)
      s = s.split(' ').map(w => if (rnd.nextBoolean()) mixCase(w) else w).mkString(" ")
    if (rnd.nextInt(3) == 0) s = s.replace(" ", "  ")
    if (rnd.nextInt(4) == 0) s = s + " ;"
    if (rnd.nextInt(4) == 0) s = s + "\n-- DELETE FROM fz WHERE 1=1"
    s
  }

  private sealed trait Outcome
  private case class Planned(p: LogicalPlan) extends Outcome
  private case class Errored(cls: Class[_]) extends Outcome
  private def outcome(p: ParserInterface, sql: String): Outcome =
    Try(p.parsePlan(sql)) match {
      case Success(plan) => Planned(plan)
      case Failure(e) => Errored(e.getClass)
    }

  private lazy val setupRoot: String = {
    val root = java.nio.file.Files.createTempDirectory("graft-sqlfuzz").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val df = (0L until 120L).map { i =>
      (i, s"name_$i WHERE x", Seq("red", "green", "blue")(i.toInt % 3), i * 7 % 100)
    }.toDF("k", "s", "p", "m")
    // registered, identity-partitioned (so groupAgg COULD fire on p)
    lake.createOrReplace(df, "fz", Seq("p"))
    lake.registerView("fz", Seq("p"))
    // the unregistered twin: same rows, can only ever delegate
    df.createOrReplaceTempView("fz_twin")
    root
  }

  test("delegation is exact on >600 adversarial non-intercept statements") {
    setupRoot
    val traps = Seq(
      "DELETE FROM fz WHERE k = 1",
      "MERGE INTO fz USING fz_twin ON a = b WHEN MATCHED THEN UPDATE SET *",
      "WHEN MATCHED THEN UPDATE SET *",
      "INSERT INTO fz VALUES (1)",
      "CALL rewrite_data_files(table => 'fz')",
      "CREATE MATERIALIZED VIEW mv AS SELECT count(*) AS n FROM fz GROUP BY p",
      "ALTER TABLE fz ADD COLUMNS (z INT)",
      "VACUUM fz RETAIN 1 SNAPSHOTS",
      // travel/meta-table syntax on a REGISTERED name: trapped in a
      // literal or comment it must reach the delegate byte-exact (the
      // rewriteTimeTravel guard), not become a temp-view reference
      "fz VERSION AS OF 3",
      "fz.history",
      "fz.snapshots",
      "fz TIMESTAMP AS OF '2020-01-01 00:00:00'")
    val templates: Seq[String] = Seq(
      // registered name + DML text trapped in string literals
      traps.map(t => s"SELECT '$t' AS s1 FROM fz_twin"),
      traps.map(t => s"SELECT k, '$t' AS s1 FROM fz_twin WHERE k < 5"),
      // trapped in comments
      traps.map(t => s"SELECT k FROM fz_twin /* $t */ WHERE k < 9"),
      traps.map(t => s"-- $t\nSELECT k FROM fz_twin"),
      // quoted alias containing a comma and keywords
      Seq("SELECT k AS `a,b`, s AS `WHEN MATCHED` FROM fz_twin",
        "SELECT max(k) AS `x, WHERE y` FROM fz_twin",
        "SELECT 1 AS `DELETE FROM fz`"),
      // DML on UNregistered names must delegate to Spark's own commands
      Seq("DELETE FROM not_reg WHERE k = 1",
        "UPDATE not_reg SET s = 'a' WHERE k = 2",
        "INSERT INTO not_reg VALUES (1, 'x')",
        "MERGE INTO not_reg USING src ON not_reg.k = src.k " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        "DROP TABLE not_reg",
        "ALTER TABLE not_reg ADD COLUMNS (z INT)"),
      // the r16 statement kinds on NON-lake names must delegate: a
      // native CREATE VIEW whose body merely MENTIONS a registered
      // lake table as a column/alias is Spark's, not ours
      Seq("CREATE VIEW nv AS SELECT k FROM not_reg",
        "CREATE OR REPLACE VIEW nv AS SELECT fz FROM not_reg",
        "CREATE VIEW nv AS SELECT k AS fz_twin FROM not_reg",
        "CREATE TEMPORARY VIEW tv AS SELECT k FROM not_reg",
        "DROP VIEW not_a_view",
        "SHOW CREATE TABLE not_reg",
        "DESCRIBE EXTENDED not_reg",
        "DESC EXTENDED not_reg"),
      // aggregate-LOOKING statements that must NOT hit metaAgg/groupAgg
      Seq("SELECT count(*) FROM not_reg",
        "SELECT count(*) FROM fz_twin",
        "SELECT min(k) OVER () FROM fz_twin",
        "SELECT count(*) FROM fz JOIN fz_twin ON fz.k = fz_twin.k",
        "SELECT count(DISTINCT k) AS n, p FROM fz GROUP BY p HAVING n > 1",
        "SELECT p, count(*) FROM fz GROUP BY p ORDER BY rand()",
        "SELECT count(*) FROM (SELECT k FROM fz WHERE k < 10)",
        "WITH c AS (SELECT k FROM fz) SELECT count(*) FROM c")
    ).flatten
    var n = 0
    val statements = templates.flatMap(t => Seq(t) ++ (1 to 20).map(_ => mutate(t)))
    statements.foreach { sql =>
      (outcome(graftParser, sql), outcome(delegate, sql)) match {
        case (Planned(g), Planned(d)) =>
          assert(!g.getClass.getName.startsWith("graft"),
            s"silently intercepted a statement outside the surface: $sql\n-> $g")
          // each parse mints fresh exprIds (Alias#N) — compare the
          // id-normalized trees
          def norm(p: LogicalPlan): String = p.treeString.replaceAll("#\\d+", "#")
          assert(norm(g) == norm(d), s"delegated plan differs from Spark's for: $sql")
        case (Errored(gc), Errored(_)) =>
          // both refuse (e.g. Spark can't parse a trap comment tail);
          // graft must surface the DELEGATE's error, not its own
          assert(classOf[ParseException].isAssignableFrom(gc)
            || gc == classOf[UnsupportedOperationException], s"odd error class $gc for: $sql")
        case (g, d) =>
          fail(s"asymmetric outcomes for: $sql\n graft=$g\n spark=$d")
      }
      n += 1
    }
    assert(n >= 600, s"corpus too small: $n")
  }

  test("intercepted SELECT output == delegate output on the same data (>200 executed pairs)") {
    setupRoot
    // shapes chosen to straddle the metaAgg/groupAgg boundary: some
    // intercept, some miss it by one feature — every one must return
    // the same rows + column names through either route
    val shapes = Seq(
      "SELECT count(*) FROM %T",
      "SELECT count(*) AS n FROM %T",
      "SELECT COUNT( * ) AS n FROM %T WHERE k >= 17",
      "SELECT min(k) AS lo, max(k) AS hi FROM %T",
      "SELECT min(k) AS lo, max(k) AS hi, count(*) AS n FROM %T WHERE m < 50",
      "SELECT sum(k) AS sk FROM %T",
      "SELECT sum(m) AS sm, count(*) AS n FROM %T WHERE p = 'red'",
      "SELECT min(s) AS lo FROM %T WHERE s LIKE 'name_1%%'",
      "SELECT p, count(*) AS n FROM %T GROUP BY p",
      "SELECT p, count(*) AS n, sum(m) AS sm FROM %T GROUP BY p ORDER BY p",
      "SELECT p, min(k) AS lo, max(k) AS hi FROM %T WHERE k > 3 GROUP BY p",
      "SELECT p, sum(k) AS sk FROM %T GROUP BY p ORDER BY sk DESC",
      // near-misses: expressions/aliases the fast path must not mangle
      "SELECT count(*) + 1 AS n FROM %T",
      "SELECT count(*) AS `a,b` FROM %T",
      "SELECT min(k + 1) AS lo FROM %T",
      "SELECT p, avg(m) AS am FROM %T GROUP BY p",
      "SELECT upper(p) AS p2, count(*) AS n FROM %T GROUP BY upper(p)",
      "SELECT count(*) AS n FROM %T WHERE s = 'DELETE FROM fz'",
      "SELECT count(*) AS n FROM %T WHERE s LIKE '%%WHERE%%'",
      "SELECT min(k) AS lo FROM %T WHERE p IN ('red', 'blue')")
    var pairs = 0
    shapes.foreach { shape =>
      val variants = Seq(shape) ++ (1 to 5).map(_ => mutate(shape))
      variants.foreach { v =>
        val viaLake = Try(spark.sql(v.replace("%T", "fz")))
        val viaTwin = Try(spark.sql(v.replace("%T", "fz_twin")))
        (viaLake, viaTwin) match {
          case (Success(a), Success(b)) =>
            assert(a.columns.toSeq == b.columns.toSeq,
              s"column names diverge for: $v\n ${a.columns.toSeq} vs ${b.columns.toSeq}")
            val ra = a.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
            val rb = b.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
            assert(ra == rb, s"results diverge for: $v")
          case (Failure(_), Failure(_)) => // both refuse the mutation: fine
          case (a, b) =>
            fail(s"asymmetric run outcomes for: $v\n lake=$a\n twin=$b")
        }
        pairs += 1
      }
    }
    assert(pairs >= 120, s"executed corpus too small: $pairs")
  }

  test("DML on the registered view routes to a graft command or refuses loudly (>300 statements)") {
    setupRoot
    val intercepts = Seq(
      "DELETE FROM fz WHERE k = 1",
      "DELETE FROM fz",
      "UPDATE fz SET m = m + 1 WHERE k < 5",
      "UPDATE fz SET s = 'x' WHERE p = 'red'",
      "INSERT INTO fz VALUES (1000, 'v', 'red', 1)",
      "INSERT INTO fz SELECT k + 5000, s, p, m FROM fz_twin",
      "MERGE INTO fz USING fz_twin ON fz.k = fz_twin.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      "ALTER TABLE fz ADD COLUMNS (z INT)",
      "VACUUM fz",
      "DROP TABLE fz")
    val refusals = Seq(
      "DELETE FROM fz WHERE k IN (SELECT k FROM fz_twin)",
      "UPDATE fz SET m = 1 WHERE k IN (SELECT k FROM fz_twin)",
      "UPDATE fz SET m = (SELECT max(k) FROM fz_twin)",
      "MERGE INTO fz USING fz_twin ON fz.k = fz_twin.k " +
        "WHEN MATCHED AND fz.k IN (SELECT k FROM fz_twin) THEN DELETE")
    var n = 0
    intercepts.foreach { sql =>
      (Seq(sql) ++ (1 to 19).map(_ => mutate(sql))).foreach { v =>
        outcome(graftParser, v) match {
          case Planned(p) => assert(p.getClass.getName.startsWith("graft"),
            s"registered-view DML fell through to the delegate: $v\n-> $p")
          case Errored(c) => assert(c == classOf[UnsupportedOperationException],
            s"mutation must refuse loudly, got $c for: $v")
        }
        n += 1
      }
    }
    refusals.foreach { sql =>
      (Seq(sql) ++ (1 to 9).map(_ => mutate(sql))).foreach { v =>
        val e = intercept[UnsupportedOperationException] { graftParser.parsePlan(v) }
        assert(e.getMessage.toLowerCase.contains("subquer"), s"for: $v")
        n += 1
      }
    }
    assert(n >= 240, s"DML corpus too small: $n")
  }

  test("string literals inside row-local predicates survive the intercept executably") {
    setupRoot
    // a WHERE literal containing keywords: the intercepted command must
    // either apply EXACTLY the predicate Spark would, or error loudly
    // before touching data — never corrupt rows
    val root = java.nio.file.Files.createTempDirectory("graft-sqlfuzz-lit").toString
    val lake = new Lakehouse(spark, root)
    import spark.implicits._
    val df = Seq((1L, "keep WHERE me"), (2L, "plain"), (3L, "WHEN MATCHED")).toDF("k", "v")
    lake.createOrReplace(df, "fzlit")
    lake.registerView("fzlit")
    spark.sql("DELETE FROM fzlit WHERE v = 'keep WHERE me'")
    assert(spark.table("fzlit").orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    spark.sql("UPDATE fzlit SET v = 'WHEN NOT MATCHED' WHERE v = 'WHEN MATCHED'")
    assert(spark.table("fzlit").where(col("v") === "WHEN NOT MATCHED").count() == 1)
  }

  test("travel syntax inside literals/comments survives execution byte-exact") {
    setupRoot
    // `fz` IS registered and the statement DOES contain travel syntax,
    // so rewriteTimeTravel runs — but only code segments may rewrite
    val lit = spark.sql("SELECT 'fz VERSION AS OF 1' AS s, 'fz.history' AS h " +
      "FROM fz_twin LIMIT 1 -- fz VERSION AS OF 2").head()
    assert(lit.getString(0) == "fz VERSION AS OF 1")
    assert(lit.getString(1) == "fz.history")
    // and REAL travel through the same path still resolves: the
    // registered view's first snapshot is readable by number
    val snap0 = new Lakehouse(spark, setupRoot).snapshots("fz").head._1
    assert(spark.sql(s"SELECT count(*) AS n FROM fz VERSION AS OF $snap0").head().getLong(0) > 0)
  }
}

package graft

import graft.sources.Lakehouse

/** Catalog browsing through the parsed surface — the reference
  * notebook's literal first cells (query_iceberg.ipynb: `SHOW
  * CATALOGS`, `SHOW NAMESPACES IN nessie`, `SHOW TABLES IN
  * nessie.sales`). All three are driver-side metadata listings over
  * the session's registered lakes; native Spark statements keep
  * working for non-lake names. */
class ShowCatalogSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-showcat").toString

  test("SHOW CATALOGS lists spark_catalog plus each registered lake with its root") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "t_show1")
    lake.registerView("t_show1")

    val rows = spark.sql("SHOW CATALOGS").collect()
    assert(rows.map(_.getString(0)).contains("spark_catalog"))
    val lakeName = new java.io.File(root).getName
    val lakeRow = rows.find(_.getString(0) == lakeName)
    assert(lakeRow.isDefined, s"expected catalog $lakeName in ${rows.mkString(",")}")
    assert(lakeRow.get.getString(1) === root)
  }

  test("SHOW NAMESPACES / SHOW TABLES IN <lake> list the flat namespace and its tables") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "t_show2")
    lake.registerView("t_show2")
    lake.createOrReplace(Seq((9L, "z")).toDF("k", "v"), "t_show3")
    lake.registerView("t_show3")
    val lakeName = new java.io.File(root).getName

    val ns = spark.sql(s"SHOW NAMESPACES IN $lakeName").collect()
    assert(ns.map(_.getString(0)).toSeq === Seq("default"))

    val tables = spark.sql(s"SHOW TABLES IN `$lakeName`").collect()
    val byName = tables.map(r => r.getString(0) -> r).toMap
    assert(byName.keySet === Set("t_show2", "t_show3"))
    assert(byName("t_show2").getLong(2) === 1L) // one snapshot
    assert(tables.forall(_.getString(3).contains("main")))
  }

  test("native SHOW TABLES and SHOW NAMESPACES still delegate for non-lake names") {
    // session catalog: must not be intercepted (name doesn't match a lake)
    val native = spark.sql("SHOW TABLES IN default")
    assert(native.columns.contains("tableName") || native.columns.contains("name"))
    val nativeNs = spark.sql("SHOW NAMESPACES IN spark_catalog").collect()
    assert(nativeNs.nonEmpty)
  }
}

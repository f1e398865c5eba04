package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.sources.Lakehouse
import graft.sources.spj.GraftSpjCatalog

/** Round-14 canonicalization fixes on the SPJ/DSv2 read path — each a
  * silent-divergence bug class between the catalog scan and the
  * ordinary read (the two must be bit-equal or refuse loudly):
  *  - float→double promotion under equality tombstones: [[graft.sources.SpjLayout.canonKey]]
  *    now widens float EXACTLY to double (one canonical domain), so a
  *    pre-promotion float dir matches a post-promotion double tombstone
  *    key the same way the ordinary path's cast-then-compare anti-join
  *    does — deleted rows can no longer resurrect on the SPJ path;
  *  - equality keys on a column ADDED after older dirs: those dirs
  *    bind the key as a NULL literal (their rows all read NULL there),
  *    matching the ordinary path's null-safe `<=>` over aligned dirs,
  *    instead of failing the reader factory for a table the catalog
  *    advertised;
  *  - a renamed TIME-TRANSFORM source column refuses the layout (the
  *    probe already did — the two must agree);
  *  - position-delete `_file` paths record in the URL-encoded
  *    SparkPath form on BOTH writer surfaces, so a table root with
  *    URL-encodable characters (spaces) anti-joins exactly on both
  *    read paths. */
class SpjCanonPathSpec extends SparkSpec {

  import spark.implicits._

  private def withSpj[T](root: String, cat: String)(body: => T): T = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    body
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  test("float->double promotion: post-promotion equality tombstone deletes pre-promotion float rows on the SPJ path") {
    val root = freshRoot("spj-fd")
    val lake = new Lakehouse(spark, root)
    val rows = (1L to 20L).map(k => (k, (k * 0.5).toFloat)).toDF("k", "u")
    lake.createOrReplace(rows, "fdt", Seq("bucket(4,k)"))
    lake.alterColumnType("fdt", "u", DoubleType)
    // the tombstone is written at the PROMOTED type; the committed dirs
    // are physically float — the one canonical domain must bridge them
    lake.deleteByKeyMor(Seq(1.5d, 5.0d).toDF("u"), "fdt")
    withSpj(root, "spj_cp1") {
      val got = spark.table("spj_cp1.fdt")
      assert(got.count() === 18, "float-dir rows under a double tombstone key must delete")
      assert(got.where(col("u").isin(1.5d, 5.0d)).count() === 0)
      assert(sortedRows(got) === sortedRows(lake.read("fdt")),
        "the SPJ and ordinary reads must agree after a float->double promotion")
    }
  }

  test("float tombstone then promotion: the pre-promotion tombstone keeps applying on both paths") {
    val root = freshRoot("spj-fd2")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 12L).map(k => (k, (k * 1.0).toFloat)).toDF("k", "u"),
      "fdt2", Seq("bucket(4,k)"))
    lake.deleteByKeyMor(Seq(3.0f, 7.0f).toDF("u"), "fdt2") // float-typed keys
    lake.alterColumnType("fdt2", "u", DoubleType) // promotion AFTER the delete
    withSpj(root, "spj_cp2") {
      assert(spark.sql("SHOW TABLES IN spj_cp2").collect()
        .map(_.getString(1)).contains("fdt2"),
        "the probe must advertise what the unified canonical domain can serve")
      val got = spark.table("spj_cp2.fdt2")
      assert(got.count() === 10)
      assert(got.where(col("u").isin(3.0d, 7.0d)).count() === 0)
      assert(sortedRows(got) === sortedRows(lake.read("fdt2")))
    }
  }

  test("equality key on a column ADDED after older dirs: old dirs bind NULL, null-keyed tombstones match them") {
    val root = freshRoot("spj-addkey")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"),
      "addk", Seq("bucket(4,k)"))
    lake.addColumns("addk", StructType(Seq(StructField("u", LongType))))
    lake.append((11L to 16L).map(k => (k, s"v$k", k * 100)).toDF("k", "v", "u"),
      "addk", Seq("bucket(4,k)"))
    // keys: one matching a post-ADD row, one NULL — the NULL key
    // null-safely matches EVERY pre-ADD row (they all read u = NULL)
    lake.deleteByKeyMor(Seq[java.lang.Long](1200L, null).toDF("u"), "addk")
    withSpj(root, "spj_cp3") {
      val got = spark.table("spj_cp3.addk")
      // 16 - 10 old (null u) - 1 (u=1200) = 5 survivors
      assert(got.count() === 5)
      assert(got.where(col("k") <= 10L).count() === 0,
        "a NULL tombstone key must delete the pre-ADD dirs' rows")
      assert(got.where(col("u") === 1200L).count() === 0)
      assert(sortedRows(got) === sortedRows(lake.read("addk")),
        "the SPJ and ordinary reads must agree over added-column keys")
      // pruned projections still anti-filter (the key rides as an extra)
      assert(got.select("v").count() === 5)
    }
  }

  test("a renamed time-transform SOURCE column refuses the layout, and the probe agrees") {
    val root = freshRoot("spj-trename")
    val lake = new Lakehouse(spark, root)
    val rows = (1L to 12L).map(k =>
      (k, java.sql.Timestamp.valueOf(s"2024-01-${(k % 9) + 1} 00:00:00")))
      .toDF("k", "ts")
    lake.createOrReplace(rows, "trt", Seq("days(ts)", "bucket(4,k)"))
    lake.renameColumn("trt", "ts", "event_ts")
    assert(lake.spjServableSpec("trt").isEmpty,
      "the probe must refuse a renamed time-transform source")
    val e = intercept[IllegalArgumentException](lake.spjLayout("trt"))
    assert(e.getMessage.contains("renamed a partition column"),
      s"spjLayout must refuse too (probe and layout agreed to disagree): ${e.getMessage}")
    withSpj(root, "spj_cp4") {
      assert(!spark.sql("SHOW TABLES IN spj_cp4").collect()
        .map(_.getString(1)).contains("trt"))
    }
  }

  test("URL-encodable table roots: position deletes from BOTH writer surfaces apply on BOTH read paths") {
    // a root with spaces: Hadoop Path.toString and _metadata.file_path
    // disagree there (%20) unless every recorded path takes ONE form
    val root = java.nio.file.Files.createTempDirectory("graft spj enc").toString
    assert(root.contains(" "), s"the fixture root must contain a space: $root")
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace((1L to 30L).map(k => (k, k % 3, k * 1.0)).toDF("k", "g", "w"),
      "enc", Seq("bucket(4,k)"))
    // surface 1: the ordinary writer's positional tombstone
    lake.deleteWhereMor(col("g") === 0, "enc")
    withSpj(root, "spj_cp5") {
      assert(spark.table("spj_cp5.enc").where(col("g") === 0).count() === 0,
        "ordinary-written position deletes must apply on the SPJ read")
      // surface 2: the SPJ delta writer's positional tombstone
      spark.conf.set("spark.graft.update-mode", "merge-on-read")
      try spark.sql("UPDATE spj_cp5.enc SET w = -1 WHERE g = 1")
      finally spark.conf.unset("spark.graft.update-mode")
      val expect = (1L to 30L).filterNot(_ % 3 == 0).map(k =>
        s"$k|${k % 3}|${if (k % 3 == 1) -1.0 else k * 1.0}").sorted
      assert(sortedRows(spark.table("spj_cp5.enc")) === expect)
      assert(sortedRows(lake.read("enc")) === expect,
        "SPJ-written position deletes must apply on the ordinary read (encoded _file form)")
      // and compaction (ordinary-path materialization) lands the same rows
      lake.compact("enc", Seq("bucket(4,k)"))
      assert(sortedRows(lake.read("enc")) === expect)
    }
  }
}

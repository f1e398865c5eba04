package graft.sources.spj

import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Lakehouse

/** CDC delete-leg PLANNING is per-tombstone (r16 verdict ask #8): an
  * equality tombstone admits a lower-sequence file only when the
  * file's recorded stats can hold one of its keys — a multi-tombstone
  * interval whose keys live in disjoint dirs plans exactly those
  * dirs' files, never every pre-existing dir. Unit-level: the stream's
  * own planInputPartitions, file counts asserted per leg. */
class SpjCdcPlanSpec extends SparkSpec {
  import spark.implicits._

  test("two equality tombstones with disjoint key ranges plan only their own dirs' files") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcplan").toString
    val lake = new Lakehouse(spark, root)
    val spec = Seq("bucket(2,k)")
    // three dirs with DISJOINT key ranges
    lake.createOrReplace((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), "cp", spec)
    lake.append((1001L to 1050L).map(k => (k, s"v$k")).toDF("k", "v"), "cp", spec)
    lake.append((2001L to 2050L).map(k => (k, s"v$k")).toDF("k", "v"), "cp", spec)
    val from = lake.currentSnapshot("cp").get
    val dirsBefore = lake.snapshots("cp").find(_._1 == from).get._2
      .map(_.takeWhile(_ != '/')).distinct
    // bootstrap the streaming checkpoint BEFORE the tombstones so the
    // delete interval arrives as its own micro-batch below
    val ck = java.nio.file.Files.createTempDirectory("graft-cdcplan-ck").toString
    spark.conf.set("spark.sql.catalog.cdcplan",
      classOf[GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.cdcplan.root", root)
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.option("cdc", "true").table("cdcplan.cp")
        .select(col("k"), col("_change_type"))
        .writeStream.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          events.synchronized {
            events ++= df.where(col("_change_type") === "delete")
              .collect().map(_.getLong(0).toString)
          }; ()
        }
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    drain() // bootstrap at `from`
    // two equality tombstones in ONE interval: keys in dir 1 and dir 2
    lake.deleteByKeyMor(Seq(5L).toDF("k"), "cp")
    lake.deleteByKeyMor(Seq(1005L).toDF("k"), "cp")
    val to = lake.currentSnapshot("cp").get

    val stream = new GraftSpjCdcMicroBatchStream(root, "cp", "main",
      lake.tableSchema("cp"))
    val parts = stream.planInputPartitions(LongOffset(from), LongOffset(to))
    val deleteFiles = parts.collect { case GraftCdcPartition(1, inner) => inner }
      .flatMap(_.files)
    assert(deleteFiles.nonEmpty, "the delete leg must plan the touched dirs")
    val touchedDirs = deleteFiles.map(_.dataDir).distinct.sorted
    val (d1 +: d2 +: d3 +: _) = dirsBefore.sorted: @unchecked
    assert(touchedDirs.contains(d1) && touchedDirs.contains(d2),
      s"both keyed dirs must plan: $touchedDirs")
    assert(!touchedDirs.contains(d3),
      s"the key-disjoint dir must be pruned by the tombstones' stats: $touchedDirs")
    // correctness stays exact: the delete interval still emits both
    drain()
    assert(events.sorted.toSeq === Seq("1005", "5"),
      s"pruned planning must not lose delete events: $events")
  }

  test("equality keys on the bucket column prune the delete leg to their own buckets") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcbk").toString
    val lake = new Lakehouse(spark, root)
    val n = 8
    lake.createOrReplace((1L to 400L).map(k => (k, s"v$k")).toDF("k", "v"),
      "bk", Seq(s"bucket($n,k)"))
    val from = lake.currentSnapshot("bk").get
    // two single-key equality tombstones: stats can't discriminate
    // hash-scattered bucket keys, the layout hash can
    lake.deleteByKeyMor(Seq(7L).toDF("k"), "bk")
    lake.deleteByKeyMor(Seq(19L).toDF("k"), "bk")
    val to = lake.currentSnapshot("bk").get
    val stream = new GraftSpjCdcMicroBatchStream(root, "bk", "main",
      lake.tableSchema("bk"))
    val parts = stream.planInputPartitions(LongOffset(from), LongOffset(to))
    val deleteParts = parts.collect { case GraftCdcPartition(1, inner) => inner }
      .filter(_.files.nonEmpty)
    val expected = Set(SpjPruning.bucketOf("7", n), SpjPruning.bucketOf("19", n))
    // planned delete-leg partitions carry (bucket) keys — exactly the
    // tombstone keys' buckets, never all n
    val planned = deleteParts.flatMap(_.keys).map(_.asInstanceOf[Int]).toSet
    assert(planned === expected,
      s"delete leg must plan only the keys' buckets: planned $planned, expected $expected")
    assert(deleteParts.length < n, "bucket pruning must drop key-free buckets")
  }

  test("DATE equality keys on the bucket column prune the delete leg too (ISO re-print matches the layout hash, r17)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcdt").toString
    val lake = new Lakehouse(spark, root)
    val n = 8
    val base = java.time.LocalDate.parse("2024-03-01")
    val df = (0 until 200).map(i =>
      (java.sql.Date.valueOf(base.plusDays(i % 40)), s"v$i")).toDF("d", "v")
    lake.createOrReplace(df, "dbk", Seq(s"bucket($n,d)"))
    val from = lake.currentSnapshot("dbk").get
    val d1 = base.plusDays(3); val d2 = base.plusDays(17)
    lake.deleteByKeyMor(Seq(java.sql.Date.valueOf(d1)).toDF("d"), "dbk")
    lake.deleteByKeyMor(Seq(java.sql.Date.valueOf(d2)).toDF("d"), "dbk")
    val to = lake.currentSnapshot("dbk").get
    val stream = new GraftSpjCdcMicroBatchStream(root, "dbk", "main",
      lake.tableSchema("dbk"))
    val parts = stream.planInputPartitions(LongOffset(from), LongOffset(to))
    val deleteParts = parts.collect { case GraftCdcPartition(1, inner) => inner }
      .filter(_.files.nonEmpty)
    // the hash input is the ISO string — exactly the writer's
    // cast-to-string dir encoding
    val expected = Set(SpjPruning.bucketOf(d1.toString, n),
      SpjPruning.bucketOf(d2.toString, n))
    val planned = deleteParts.flatMap(_.keys).map(_.asInstanceOf[Int]).toSet
    assert(planned === expected,
      s"date-keyed delete leg must plan only the keys' buckets: " +
        s"planned $planned, expected $expected")
    assert(deleteParts.length < n, "date bucket pruning must drop key-free buckets")
  }

  test("bucket gating is PER TOMBSTONE: an unmappable sibling tombstone never launders files into foreign buckets (r17)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdcpt").toString
    val lake = new Lakehouse(spark, root)
    val n = 8
    val spec = Seq(s"bucket($n,k)")
    // two dirs with DISJOINT w ranges (w rides along, not the bucket key)
    lake.createOrReplace((1L to 50L).map(k => (k, k)).toDF("k", "w"), "pt", spec)
    lake.append((1001L to 1050L).map(k => (k, k)).toDF("k", "w"), "pt", spec)
    val from = lake.currentSnapshot("pt").get
    val d1 = lake.snapshots("pt").find(_._1 == from).get._2
      .map(_.takeWhile(_ != '/')).distinct.sorted.head
    // tombstone A: ON the bucket column (maps to exactly one bucket);
    // tombstone B: on the non-bucket column w, keys only in dir 2
    lake.deleteByKeyMor(Seq(7L).toDF("k"), "pt")
    lake.deleteByKeyMor(Seq(1005L).toDF("w"), "pt")
    val to = lake.currentSnapshot("pt").get
    val stream = new GraftSpjCdcMicroBatchStream(root, "pt", "main",
      lake.tableSchema("pt"))
    val parts = stream.planInputPartitions(LongOffset(from), LongOffset(to))
    val deleteParts = parts.collect { case GraftCdcPartition(1, inner) => inner }
      .filter(_.files.nonEmpty)
    // the r16 union gate collapsed to admit-all here (B is
    // bucket-unmappable) — per-tombstone gating keeps A scoped: every
    // planned DIR-1 file sits in A's own bucket; B's stats admit only
    // dir-2 files (w ranges are disjoint), in whatever bucket
    val kBucket = SpjPruning.bucketOf("7", n)
    val d1Buckets = deleteParts.flatMap(p =>
      p.files.filter(_.dataDir == d1).map(_ => p.keys.head.asInstanceOf[Int])).toSet
    assert(d1Buckets.subsetOf(Set(kBucket)),
      s"dir-1 files must plan only in tombstone A's own bucket $kBucket, got $d1Buckets")
    assert(deleteParts.flatMap(_.files).exists(_.dataDir != d1),
      "tombstone B's dir-2 files must still plan (its stats admit them)")
  }

  test("an ABOVE-GATE equality tombstone plans every pre-existing file (keys on disk: admit-all, reader keeps it exact)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdclzeq").toString
    val lake = new Lakehouse(spark, root)
    val spec = Seq("bucket(2,k)")
    lake.createOrReplace((1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"), "lz", spec)
    lake.append((1001L to 1050L).map(k => (k, s"v$k")).toDF("k", "v"), "lz", spec)
    val from = lake.currentSnapshot("lz").get
    val preFiles = lake.spjLayout("lz").files.values.flatten.map(_.path).toSet
    lake.deleteByKeyMor(Seq(5L, 1005L).toDF("k"), "lz")
    val to = lake.currentSnapshot("lz").get
    spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "1")
    try {
      // representation claim first: the keys stayed on disk
      assert(lake.spjLayout("lz").deletes
        .forall(_.isInstanceOf[graft.sources.SpjEqTombstoneFiles]))
      val stream = new GraftSpjCdcMicroBatchStream(root, "lz", "main",
        lake.tableSchema("lz"))
      val parts = stream.planInputPartitions(LongOffset(from), LongOffset(to))
      val deleteFiles = parts.collect { case GraftCdcPartition(1, inner) => inner }
        .flatMap(_.files).map(_.path).toSet
      // a lazy tombstone cannot stats-prune (its keys are unreadable at
      // plan time) — the documented degradation admits every
      // lower-sequence file; anything LESS would silently drop events
      assert(deleteFiles === preFiles,
        s"lazy equality planning must admit all pre-existing files: " +
          s"planned ${deleteFiles.size} of ${preFiles.size}")
    } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
  }
}

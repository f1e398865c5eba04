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
}

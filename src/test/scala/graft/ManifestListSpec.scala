package graft

import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Manifest-list summaries (Iceberg's manifest-list column ranges):
  * each commit records dir-level min/max per column on its manifest
  * line, and plan-time skipping drops whole dirs BEFORE opening their
  * per-file `_stats.jsonl`/`_bloom.jsonl` or listing their files. The
  * scale property under test: metadata I/O at plan time is
  * proportional to MATCHING dirs, not to table history — at millions
  * of files / thousands of commits, a narrow range query must not
  * open one ledger per historical commit. */
class ManifestListSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-mlist").toString

  test("narrow range over a 20-commit append chain reads ~1 ledger, not 20") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // 20 commits with disjoint key ranges: commit i owns keys [100i, 100i+9]
    lake.createOrReplace((0 to 9).map(j => (j.toLong, s"v$j")).toDF("k", "v"), "chain")
    (1 to 19).foreach { i =>
      lake.append((0 to 9).map(j => (i * 100L + j, s"v$i-$j")).toDF("k", "v"), "chain")
    }
    val before = Lakehouse.ledgerReads.get()
    val got = lake.readWhere(col("k") >= 700 && col("k") <= 705, "chain").collect()
    val opened = Lakehouse.ledgerReads.get() - before
    assert(got.map(_.getLong(0)).sorted.toSeq === (700L to 705L))
    // one matching dir; a couple of extra opens tolerated (never 20)
    assert(opened <= 3, s"expected <=3 ledger reads for 1 matching dir of 20, got $opened")
  }

  test("dir-skipped plan returns exactly what a full scan + filter returns") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 to 50).map(j => (j.toLong, j * 2.0)).toDF("k", "x"), "eq")
    (1 to 5).foreach { i =>
      lake.append((0 to 50).map(j => (i * 1000L + j, j * 2.0)).toDF("k", "x"), "eq")
    }
    val pred = col("k") >= 3000 && col("k") < 3026 && col("x") > 10.0
    val pruned = lake.readWhere(pred, "eq").collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val full = lake.read("eq").where(pred).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(pruned.toSeq === full.toSeq && pruned.nonEmpty)
  }

  test("string bounds survive the base64 manifest round-trip (quotes, commas, braces)") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // bounds deliberately contain the JSON metacharacters that would
    // break a naive quoted embedding: the summary must stay bit-exact
    lake.createOrReplace(Seq((1L, """a"x"""), (2L, "b,y")).toDF("k", "s"), "strb")
    lake.append(Seq((3L, "m{n"), (4L, """z}\q""")).toDF("k", "s"), "strb")
    // equality inside the second dir's range: only that dir may serve it
    val hit = lake.readWhere(col("s") === "m{n", "strb").collect()
    assert(hit.map(_.getLong(0)).toSeq === Seq(3L))
    // range that excludes the first dir entirely ("a…"/"b…" < "m")
    val before = Lakehouse.ledgerReads.get()
    val ge = lake.readWhere(col("s") >= "m", "strb").collect()
    assert(Lakehouse.ledgerReads.get() - before <= 1)
    assert(ge.map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
  }

  test("delete with a narrow predicate consults matching dirs' ledgers only") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    lake.createOrReplace((0 to 9).map(j => (j.toLong, s"v$j")).toDF("k", "v"), "dchain")
    (1 to 9).foreach { i =>
      lake.append((0 to 9).map(j => (i * 100L + j, s"v$j")).toDF("k", "v"), "dchain")
    }
    val before = Lakehouse.ledgerReads.get()
    lake.deleteWhere(col("k") === 505L, "dchain")
    val opened = Lakehouse.ledgerReads.get() - before
    // classification may touch the one matching dir's ledger plus the
    // rewrite commit's own fresh-dir summary build — never all 10
    assert(opened <= 4, s"expected <=4 ledger reads for a 1-dir delete of 10 dirs, got $opened")
    assert(lake.read("dchain").count() === 99)
    assert(lake.read("dchain").where(col("k") === 505L).count() === 0)
  }

  test("70-commit chain segments the ledger; history, travel and expiry stay exact") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((0L, "r0")).toDF("k", "v"), "seg")
    (1 to 69).foreach { i => lake.append(Seq((i.toLong, s"r$i")).toDF("k", "v"), "seg") }
    // the base segment is bounded: a second segment must exist
    val tdir = new java.io.File(s"$root/seg")
    val segNames = tdir.listFiles.map(_.getName).filter(_.startsWith("_snapshots")).sorted
    assert(segNames.length >= 2, s"expected segmented ledger, got ${segNames.mkString(",")}")
    // full history and reads span segments
    assert(lake.read("seg").count() === 70)
    assert(lake.snapshots("seg").size === 70)
    val snaps = lake.snapshots("seg").map(_._1)
    // time travel to a snapshot recorded in the FIRST segment
    assert(lake.readSnapshot("seg", snaps(3)).count() === 4)
    // dir skipping still proves out across segment boundaries
    val before = Lakehouse.ledgerReads.get()
    assert(lake.readWhere(col("k") === 68L, "seg").count() === 1)
    assert(Lakehouse.ledgerReads.get() - before <= 1)
    // expiry consolidates back to one bounded segment, keeping the tail
    lake.expireSnapshots("seg", keepLast = 5)
    val after = tdir.listFiles.map(_.getName).filter(_.startsWith("_snapshots")).sorted
    assert(after.toSeq === Seq("_snapshots.jsonl"))
    assert(lake.snapshots("seg").size === 5)
    assert(lake.read("seg").count() === 70) // appends carry all prior dirs
    // manifest-list summaries of live-but-old dirs survive expiry: the
    // introducing lines are gone, yet a narrow query still skips at
    // the dir level instead of opening one ledger per historical dir
    val b2 = Lakehouse.ledgerReads.get()
    assert(lake.readWhere(col("k") === 7L, "seg").count() === 1)
    assert(Lakehouse.ledgerReads.get() - b2 <= 1,
      "dir summaries rescued at expiry must keep dir-level skipping alive")
  }

  test("crash mid-swap: a .tmp-only ledger segment is still authoritative") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((1L, "a")).toDF("k", "v"), "cr")
    lake.append(Seq((2L, "b")).toDF("k", "v"), "cr")
    // simulate writeFile dying between delete(real) and rename(tmp):
    // only the complete .tmp exists
    val base = new java.io.File(s"$root/cr/_snapshots.jsonl")
    val tmp = new java.io.File(s"$root/cr/_snapshots.jsonl.tmp")
    assert(base.renameTo(tmp))
    // history remains visible through the tmp fallback…
    assert(lake.snapshots("cr").size === 2)
    assert(lake.read("cr").count() === 2)
    // …and the next append must EXTEND it, not start a fresh ledger
    lake.append(Seq((3L, "c")).toDF("k", "v"), "cr")
    assert(lake.snapshots("cr").size === 3)
    assert(lake.read("cr").count() === 3)
  }

  test("crash mid-consolidation: stale tail is ignored by readers and healed by the next commit") {
    import spark.implicits._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((0L, "x")).toDF("k", "v"), "cc2")
    (1 to 69).foreach(i => lake.append(Seq((i.toLong, "x")).toDF("k", "v"), "cc2"))
    val seg2 = new java.io.File(s"$root/cc2/_snapshots-2.jsonl")
    assert(seg2.exists)
    val staleContent = new String(java.nio.file.Files.readAllBytes(seg2.toPath))
    // run a real expiry (consolidates to base + deletes seg2), then
    // resurrect seg2 — exactly the state a crash between the base
    // write and the tail delete leaves behind
    lake.expireSnapshots("cc2", keepLast = 5)
    val keptIds = lake.snapshots("cc2").map(_._1)
    assert(keptIds.size === 5)
    java.nio.file.Files.write(seg2.toPath, staleContent.getBytes)
    // readers: first-occurrence dedup ignores the stale duplicates and
    // monotone history is preserved (no duplicated ids, base copy wins)
    val seen = lake.snapshots("cc2").map(_._1)
    assert(seen.distinct.size === seen.size)
    assert(keptIds.toSet.subsetOf(seen.toSet))
    assert(lake.read("cc2").count() === 70)
    // the next commit self-heals: the stale tail disappears
    lake.append(Seq((999L, "z")).toDF("k", "v"), "cc2")
    assert(!seg2.exists, "stale pre-consolidation tail must be deleted at the next commit")
    assert(lake.read("cc2").count() === 71)
    assert(lake.snapshots("cc2").map(_._1).distinct.size === lake.snapshots("cc2").size)
  }

  test("concurrent appends racing across a segment boundary lose nothing") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = freshRoot()
    val lake = new Lakehouse(spark, root)
    lake.createOrReplace(Seq((0L, "seed")).toDF("k", "v"), "cseg")
    // fill the base segment to 4 lines short of the boundary…
    (1 to 59).foreach(i => lake.append(Seq((i.toLong, "x")).toDF("k", "v"), "cseg"))
    // …then race 8 writers THROUGH the boundary (commits 61-68 span
    // the 64-line segment cut)
    val writers = (60 to 67).map { i =>
      Future { lake.append(Seq((i.toLong, s"w$i")).toDF("k", "v"), "cseg") }
    }
    Await.result(Future.sequence(writers), 120.seconds)
    assert(lake.read("cseg").count() === 68L)
    assert(lake.snapshots("cseg").map(_._1).distinct.length === 68)
    val segs = new java.io.File(s"$root/cseg").listFiles.map(_.getName)
      .filter(_.startsWith("_snapshots")).sorted
    assert(segs.length === 2, s"boundary must have been crossed: ${segs.mkString(",")}")
  }

  test("partitioned table: partition-value conjunct skips foreign dirs at the manifest") {
    import spark.implicits._
    val lake = new Lakehouse(spark, freshRoot())
    // two commits, each one partition's data
    lake.createOrReplace(
      (0 to 9).map(j => (j.toLong, "us", j * 1.0)).toDF("id", "region", "x"),
      "pt", partitionBy = Seq("region"))
    lake.append(
      (0 to 9).map(j => (100L + j, "eu", j * 1.0)).toDF("id", "region", "x"),
      "pt", partitionBy = Seq("region"))
    val before = Lakehouse.ledgerReads.get()
    val eu = lake.readWhere(col("region") === "eu", "pt").select("region").collect()
    assert(Lakehouse.ledgerReads.get() - before <= 1)
    assert(eu.length === 10 && eu.forall(_.getString(0) == "eu"))
  }
}

package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import java.nio.charset.StandardCharsets

/** Minimal lakehouse table layer: partitioned-parquet tables with
  * create-or-replace, O(1) append, snapshot history, and time travel.
  *
  * Plays the role of the reference's Iceberg/Nessie catalog layer
  * (reference: spark_jobs/mongo_to_iceberg.py:90
  * `writeTo(...).createOrReplace()`, silver_transformation.py:71,
  * query_iceberg.ipynb time-travel cells) re-expressed without
  * connector jars: a table is a directory of immutable snapshot
  * data-dirs plus a manifest log, and a snapshot is a LIST OF DIRS —
  * so an append writes only the delta files and a new manifest line
  * (never rewrites history), exactly the property that matters at
  * 100 TB. Readers go through `spark.read.parquet(dirs…)` so Catalyst
  * pushdown/pruning applies unchanged.
  *
  * Layout:
  * {{{
  *   root/<table>/data-<n>/…parquet     immutable data dirs
  *   root/<table>/_snapshots.jsonl      {"snap":n,"dirs":[…]} per line
  *   root/<table>/_current              text: latest snapshot id
  * }}}
  */
class Lakehouse(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(table: String) = new Path(root, table)
  private def manifest(table: String) = new Path(tableDir(table), "_snapshots.jsonl")

  /** Branch pointer file — git/Nessie-style: a branch is just a named
    * pointer into the shared snapshot history; `main` keeps the legacy
    * `_current` filename. */
  private def currentPtr(table: String, branch: String = "main") =
    new Path(tableDir(table), if (branch == "main") "_current" else s"_branch_$branch")

  private def readLines(p: Path): Seq[String] = {
    // crash-recovery: if the target is missing mid-swap, the complete
    // temp written by writeFile is authoritative
    val target =
      if (fs.exists(p)) p
      else new Path(p.getParent, p.getName + ".tmp")
    if (!fs.exists(target)) Seq.empty
    else {
      val in = fs.open(target)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
      finally in.close()
    }
  }

  /** Durable file replace: write a temp file, then swap it in. A crash
    * mid-write leaves either the previous complete file or the
    * complete temp beside it — never a truncated manifest/pointer. The
    * delete+rename pair is the narrowest non-atomic window a plain
    * FileSystem offers (HDFS/local rename won't overwrite); readers
    * fall back to the temp if the target vanished inside it. */
  private def writeFile(p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Parsed manifest: snapshot id → data dirs composing it. */
  def snapshots(table: String): Seq[(Long, Seq[String])] =
    readLines(manifest(table)).map { line =>
      val snap = """"snap":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
      val dirs = """"dirs":\[([^\]]*)\]""".r.findFirstMatchIn(line).get.group(1)
        .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      (snap, dirs)
    }

  def currentSnapshot(table: String, branch: String = "main"): Option[Long] =
    readLines(currentPtr(table, branch)) match {
      case Seq() => None
      case lines => Some(lines.head.trim.toLong)
    }

  private def commit(table: String, snap: Long, dirs: Seq[String], branch: String): Long = {
    val line = s"""{"snap":$snap,"dirs":[${dirs.map(d => s""""$d"""").mkString(",")}]}"""
    writeFile(manifest(table), (readLines(manifest(table)) :+ line).mkString("\n") + "\n")
    // Pointer swap last: readers resolve the branch pointer after the
    // manifest and data dirs are durable, so a torn write can't expose
    // a half-written snapshot.
    writeFile(currentPtr(table, branch), snap.toString)
    snap
  }

  /** Create (or reset) a branch pointing at a snapshot — snapshots are
    * immutable and shared, so branching is a one-file write. */
  def createBranch(table: String, branch: String, fromSnap: Long): Unit = {
    require(snapshots(table).exists(_._1 == fromSnap), s"$table has no snapshot $fromSnap")
    writeFile(currentPtr(table, branch), fromSnap.toString)
  }

  def branches(table: String): Seq[String] = {
    val names = fs.listStatus(tableDir(table)).toSeq.map(_.getPath.getName)
    (if (names.contains("_current")) Seq("main") else Seq.empty) ++
      names.filter(n => n.startsWith("_branch_") && !n.endsWith(".tmp"))
        .map(_.stripPrefix("_branch_")).sorted
  }

  /** Fast-forward `into` to `from`'s snapshot (both share the same
    * immutable history, so a merge is a pointer move). */
  def mergeBranch(table: String, from: String, into: String = "main"): Long = {
    val snap = currentSnapshot(table, from)
      .getOrElse(throw new IllegalArgumentException(s"$table has no branch $from"))
    writeFile(currentPtr(table, into), snap.toString)
    snap
  }

  private def nextSnap(table: String): Long =
    snapshots(table).map(_._1).foldLeft(0L)(math.max) + 1

  /** Create-or-replace: write a fresh data dir, commit a snapshot
    * containing ONLY it. Old snapshots stay readable (time travel). */
  def createOrReplace(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
      branch: String = "main"): Long = {
    val snap = nextSnap(table)
    val dir = s"data-$snap"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new Path(tableDir(table), dir).toString)
    commit(table, snap, Seq(dir), branch)
  }

  /** Append: write ONLY the delta as a new data dir; the new snapshot
    * is the branch's previous dirs + delta. No data is rewritten. */
  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
      branch: String = "main"): Long = {
    val prev = currentSnapshot(table, branch)
      .map(c => snapshots(table).find(_._1 == c).get._2).getOrElse(Seq.empty)
    val snap = nextSnap(table)
    val dir = s"data-$snap"
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(new Path(tableDir(table), dir).toString)
    commit(table, snap, prev :+ dir, branch)
  }

  /** Copy-on-write MERGE (upsert): source rows replace target rows on
    * key match, unmatched target rows survive, unmatched source rows
    * insert. Commits one new snapshot; history stays time-travelable.
    * (At 100 TB with partitioned tables, rewrite only the partitions
    * the source touches — same plan, narrower createOrReplace.) */
  def upsert(source: DataFrame, table: String, keyCols: Seq[String],
      partitionBy: Seq[String] = Nil): Long = {
    val keep = read(table).join(
      source.select(keyCols.map(source(_)): _*).distinct(), keyCols, "left_anti")
    createOrReplace(keep.unionByName(source), table, partitionBy)
  }

  /** Read a branch's current snapshot. */
  def read(table: String, branch: String = "main"): DataFrame =
    readSnapshot(table, currentSnapshot(table, branch)
      .getOrElse(throw new IllegalArgumentException(s"no such table/branch: $table@$branch")))

  /** Time travel: read any committed snapshot. `mergeSchema` unions
    * the data-dir schemas, so a column added by a later append is
    * visible (null for pre-evolution rows) — Iceberg-style additive
    * schema evolution without rewriting history. */
  def readSnapshot(table: String, snap: Long): DataFrame = {
    val dirs = snapshots(table).find(_._1 == snap)
      .getOrElse(throw new IllegalArgumentException(s"$table has no snapshot $snap"))._2
    spark.read.option("mergeSchema", "true")
      .parquet(dirs.map(d => new Path(tableDir(table), d).toString): _*)
  }

  /** Compact a branch's snapshot: rewrite its (possibly many) delta
    * dirs into ONE data dir and commit that as a new snapshot. Fixes
    * the small-files problem of long append chains; history still
    * time-travels to the pre-compaction snapshots. */
  def compact(table: String, partitionBy: Seq[String] = Nil, branch: String = "main"): Long =
    createOrReplace(read(table, branch), table, partitionBy, branch)

  /** Register the current snapshot as a temp view for SQL access —
    * the `SHOW TABLES` / `SELECT * FROM catalog.table` path. */
  def registerView(table: String): Unit =
    read(table).createOrReplaceTempView(table)
}

/** Bucketed catalog tables: hash-bucket the join key at WRITE time so
  * repeated equi-joins on that key are co-located — Spark reads
  * matching buckets pairwise and plans the join with no Exchange on
  * either side. At 100 TB this converts every fact-fact join on the
  * bucketing key from a full shuffle into a local merge, the single
  * biggest recurring-cost lever in §4 (spec proves the shuffle-free
  * plan). Uses the session catalog (`saveAsTable`), the only write
  * path that records bucketing metadata. */
object Bucketed {
  def write(df: DataFrame, table: String, bucketCols: Seq[String], nBuckets: Int,
      path: String): Unit = {
    require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }
}

/** Generic single-table sinks — the JDBC-export analog of the
  * reference's gold layer (reference: gold_reporting.py:82 jdbc
  * write, mode=overwrite). Overwrite-mode csv/parquet directories;
  * swap the format for `jdbc` on a cluster with a warehouse. */
object Sinks {
  def exportCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def exportParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}

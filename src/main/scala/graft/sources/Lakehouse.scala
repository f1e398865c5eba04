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

  /** The table's directory (for inspection/specs). */
  def tableRoot(table: String): Path = tableDir(table)

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

  /** Parsed manifest: snapshot id → data entries composing it. An
    * entry is either a whole data dir ("data-3") or, after a
    * partition-scoped upsert, a partition leaf inside one
    * ("data-3/p=2") — the granularity that lets a MERGE rewrite one
    * partition while every other partition keeps its original files. */
  def snapshots(table: String): Seq[(Long, Seq[String])] =
    readLines(manifest(table)).map { line =>
      val snap = """"snap":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
      val dirs = """"dirs":\[([^\]]*)\]""".r.findFirstMatchIn(line).get.group(1)
        .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      (snap, dirs)
    }

  /** Relative partition-leaf subdirs (k=v[/k=v…]) of a data dir, to
    * `depth` partition levels. */
  private def leafDirs(dataDir: Path, depth: Int): Seq[String] = {
    def walk(p: Path, d: Int): Seq[String] =
      if (d == 0) Seq("")
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => walk(s.getPath, d - 1).map {
          case "" => s.getPath.getName
          case rest => s"${s.getPath.getName}/$rest"
        })
    walk(dataDir, depth).filter(_.nonEmpty)
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
    writeStats(table, dir)
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
    writeStats(table, dir)
    commit(table, snap, prev :+ dir, branch)
  }

  // ---- file-level data skipping (Iceberg-manifest-stats analog) ----

  /** Per-file min/max column stats for a freshly written data dir,
    * stored as `_stats.jsonl` inside it (underscore-prefixed files are
    * invisible to parquet discovery). One line per (file, column) for
    * long/double/string leaf columns. In a real deployment the write
    * tasks would emit these for free from the parquet footers; the
    * one extra scan here is the sandbox analog of that bookkeeping. */
  private def writeStats(table: String, dir: String): Unit = {
    val dataDir = new Path(tableDir(table), dir)
    val df = spark.read.parquet(dataDir.toString)
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    import org.apache.spark.sql.types.{ByteType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType}
    val statCols = df.schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType) => (f.name, "long")
      case f if Seq(FloatType, DoubleType).contains(f.dataType) => (f.name, "double")
      case f if f.dataType == StringType => (f.name, "string")
    }
    if (statCols.isEmpty) return
    val aggs = statCols.flatMap { case (c, _) =>
      Seq(min(col(c)).cast("string").as(s"lo_$c"), max(col(c)).cast("string").as(s"hi_$c"))
    }
    val rows = df.groupBy(input_file_name().as("f")).agg(aggs.head, aggs.tail: _*).collect()
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c => c.toString
    }
    // key stats by the table-relative path ("data-N/…"), independent of
    // how the runtime renders the file URI scheme
    val marker = "/" + dir + "/"
    val lines = for {
      r <- rows.toSeq
      f = r.getAs[String]("f")
      idx = f.indexOf(marker)
      if idx >= 0
      rel = f.substring(idx + 1)
      (c, t) <- statCols
      lo = r.getAs[String](s"lo_$c")
      hi = r.getAs[String](s"hi_$c")
      if lo != null
      // oversized string bounds (e.g. full document text) would bloat
      // the manifest; absence of a line just disables skipping there
      if t != "string" || (lo.length <= 128 && hi.length <= 128)
    } yield s"""{"file":"${esc(rel)}","col":"${esc(c)}","t":"$t","lo":"${esc(lo)}","hi":"${esc(hi)}"}"""
    writeFile(new Path(dataDir, "_stats.jsonl"), lines.mkString("\n") + "\n")
  }

  private def unesc(s: String) =
    s.replace("\\n", "\n").replace("\\\"", "\"").replace("\\\\", "\\")

  /** Parsed `(file, col, type, lo, hi)` stats lines of one data dir. */
  private def readStats(table: String, dataDir: String): Seq[(String, String, String, String, String)] =
    readLines(new Path(new Path(tableDir(table), dataDir), "_stats.jsonl")).flatMap { line =>
      val m = """\{"file":"(.*)","col":"(.*)","t":"(.*)","lo":"(.*)","hi":"(.*)"\}""".r
      m.findFirstMatchIn(line).map(g =>
        (unesc(g.group(1)), unesc(g.group(2)), g.group(3), unesc(g.group(4)), unesc(g.group(5))))
    }

  /** Range read with FILE-LEVEL data skipping: files whose recorded
    * [min,max] for `colName` cannot intersect [lo,hi] are never opened
    * (files without stats are conservatively kept); the residual
    * predicate then filters exactly. The Iceberg-manifest data-skipping
    * property: a time/key-range query over a long append chain reads
    * the few files that can match, not the table. Unpartitioned tables
    * only (partitioned reads already prune by partition dir). */
  def prunedRead(table: String, colName: String, lo: Any, hi: Any,
      branch: String = "main"): DataFrame = {
    val snap = currentSnapshot(table, branch)
      .getOrElse(throw new IllegalArgumentException(s"no such table/branch: $table@$branch"))
    val entries = snapshots(table).find(_._1 == snap).get._2
    require(entries.forall(!_.contains("/")), "prunedRead supports unpartitioned tables")
    def overlaps(t: String, fLo: String, fHi: String): Boolean = t match {
      case "long" => !(hi.toString.toLong < fLo.toLong || lo.toString.toLong > fHi.toLong)
      case "double" => !(hi.toString.toDouble < fLo.toDouble || lo.toString.toDouble > fHi.toDouble)
      case _ => !(hi.toString < fLo || lo.toString > fHi)
    }
    val keptFiles = entries.flatMap { dir =>
      val stats = readStats(table, dir).filter(_._2 == colName)
      val byFile = stats.groupBy(_._1)
      val allFiles = fs.listStatus(new Path(tableDir(table), dir)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => s"$dir/${s.getPath.getName}")
      allFiles.filter { f =>
        byFile.get(f).forall(_.exists { case (_, _, t, fLo, fHi) => overlaps(t, fLo, fHi) })
      }
    }
    import org.apache.spark.sql.functions.{col, lit}
    val empty = keptFiles.isEmpty
    val base =
      if (empty) read(table, branch) // degenerate: no matching files — filter yields 0 rows
      else spark.read.option("mergeSchema", "true")
        .parquet(keptFiles.map(f => new Path(tableDir(table), f).toString): _*)
    base.where(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  // ---- snapshot expiry / GC ----

  /** Expire old snapshots: keep the most recent `keepLast` plus every
    * snapshot a branch pointer references, drop the rest from the
    * manifest, and DELETE data dirs (or partition leaf dirs) no
    * surviving snapshot references. The `expire_snapshots` analog —
    * without it a long-lived table's history grows without bound.
    * Expired snapshots become unreadable; live branches and time
    * travel among kept snapshots are untouched. */
  def expireSnapshots(table: String, keepLast: Int): Unit = {
    val snaps = snapshots(table)
    val branchRefs = branches(table).flatMap(b => currentSnapshot(table, b)).toSet
    val keepIds = snaps.map(_._1).sorted.takeRight(math.max(keepLast, 1)).toSet ++ branchRefs
    val kept = snaps.filter(s => keepIds.contains(s._1))
    val live = kept.flatMap(_._2).toSet
    // rewrite the manifest first (a crash after leaves only unreferenced
    // data behind, never a referenced-but-deleted dir)
    val lines = kept.map { case (snap, dirs) =>
      s"""{"snap":$snap,"dirs":[${dirs.map(d => s""""$d"""").mkString(",")}]}"""
    }
    writeFile(manifest(table), lines.mkString("\n") + "\n")
    val dataDirs = fs.listStatus(tableDir(table)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("data-"))
    dataDirs.foreach { d =>
      val name = d.getPath.getName
      if (live.contains(name)) () // whole dir referenced
      else {
        val leafRefs = live.filter(_.startsWith(name + "/")).map(_.stripPrefix(name + "/"))
        if (leafRefs.isEmpty) fs.delete(d.getPath, true)
        else
          // partially referenced: delete only the dead partition leaves
          leafDirs(d.getPath, depth = leafRefs.map(_.count(_ == '/') + 1).max)
            .filterNot(leafRefs.contains)
            .foreach(l => fs.delete(new Path(d.getPath, l), true))
      }
    }
  }

  // ---- SQL surface (SHOW TABLES / MERGE-shaped DML over views) ----

  /** Catalog listing — the `SHOW TABLES IN nessie.sales` analog
    * (reference: query_iceberg.ipynb): one row per lakehouse table
    * with its current snapshot, snapshot count, and branches. */
  def tablesDf(): DataFrame = {
    val rows = fs.listStatus(new Path(root)).toSeq
      .filter(_.isDirectory).map(_.getPath.getName).sorted
      .filter(t => fs.exists(manifest(t)))
      .map { t =>
        (t, currentSnapshot(t).getOrElse(-1L), snapshots(t).size.toLong,
          branches(t).mkString(","))
      }
    spark.createDataFrame(rows)
      .toDF("table_name", "current_snapshot", "n_snapshots", "branches")
  }

  /** MERGE-shaped SQL DML: upsert `sourceView` (a registered view)
    * into a lakehouse table through a pure-SQL merge plan —
    * `MERGE INTO t USING s ON keys WHEN MATCHED UPDATE ALL WHEN NOT
    * MATCHED INSERT ALL` expressed over the registered views — and
    * commit the result as a new snapshot. */
  def sqlMerge(table: String, sourceView: String, keyCols: Seq[String],
      partitionBy: Seq[String] = Nil): Long = {
    registerView(table)
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val merged = spark.sql(
      s"""SELECT * FROM $sourceView
         |UNION ALL
         |SELECT t.* FROM $table t LEFT ANTI JOIN $sourceView s ON $on""".stripMargin)
    val snap =
      if (partitionBy.nonEmpty) upsert(spark.table(sourceView), table, keyCols, partitionBy)
      else createOrReplace(merged, table)
    registerView(table)
    snap
  }

  /** Copy-on-write MERGE (upsert): source rows replace target rows on
    * key match, unmatched target rows survive, unmatched source rows
    * insert. Commits one new snapshot; history stays time-travelable.
    *
    * PARTITION-SCOPED when `partitionBy` is given (the property the
    * reference gets from Iceberg's copy-on-write —
    * mongo_to_iceberg.py:140): only the partitions the source touches
    * are merged and rewritten into the new data dir; every untouched
    * partition's ORIGINAL leaf dir is carried into the new snapshot
    * by reference, byte-identical. At 100 TB a one-partition MERGE
    * costs one partition's rewrite, not a table rewrite. */
  def upsert(source: DataFrame, table: String, keyCols: Seq[String],
      partitionBy: Seq[String] = Nil): Long = {
    if (partitionBy.isEmpty) {
      val keep = read(table).join(
        source.select(keyCols.map(source(_)): _*).distinct(), keyCols, "left_anti")
      return createOrReplace(keep.unionByName(source), table, partitionBy)
    }
    val branch = "main"
    val prev = currentSnapshot(table, branch)
      .map(c => snapshots(table).find(_._1 == c).get._2).getOrElse(Seq.empty)
    // merge = (target rows in touched partitions that lose on key) ∪ source;
    // the semi join restricts the merge input to the touched partitions
    val touched = source.select(partitionBy.map(source(_)): _*).distinct()
    val targetTouched = read(table, branch).join(touched, partitionBy, "left_semi")
    val merged = targetTouched
      .join(source.select(keyCols.map(source(_)): _*).distinct(), keyCols, "left_anti")
      .unionByName(source)
    val snap = nextSnap(table)
    val dir = s"data-$snap"
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(new Path(tableDir(table), dir).toString)
    writeStats(table, dir)
    // the delta dir's partition leaves ARE the touched set, in Spark's
    // own path encoding — classify prior entries against those names,
    // so no value re-encoding can ever disagree with what was written
    val touchedLeaves = leafDirs(new Path(tableDir(table), dir), partitionBy.length).toSet
    val kept = prev.flatMap { entry =>
      val slash = entry.indexOf('/')
      if (slash >= 0) {
        // already a partition leaf: keep unless superseded
        if (touchedLeaves.contains(entry.substring(slash + 1))) Nil else Seq(entry)
      } else {
        // whole data dir: explode into leaves and keep the untouched ones
        leafDirs(new Path(tableDir(table), entry), partitionBy.length)
          .filterNot(touchedLeaves.contains).map(l => s"$entry/$l")
      }
    }
    commit(table, snap, kept :+ dir, branch)
  }

  /** Read a branch's current snapshot. */
  def read(table: String, branch: String = "main"): DataFrame =
    readSnapshot(table, currentSnapshot(table, branch)
      .getOrElse(throw new IllegalArgumentException(s"no such table/branch: $table@$branch")))

  /** Time travel: read any committed snapshot. `mergeSchema` unions
    * the data-dir schemas, so a column added by a later append is
    * visible (null for pre-evolution rows) — Iceberg-style additive
    * schema evolution without rewriting history.
    *
    * Entries are read one GROUP per data dir: a whole-dir entry reads
    * the dir root (partition discovery relative to it), and partition
    * leaf entries of one data dir read together with `basePath` at
    * the dir root so the partition columns resolve identically. The
    * per-dir reads then union by name (missing columns → null), which
    * both preserves partition pruning inside each scan and makes a
    * mixed whole-dir/leaf snapshot (post-upsert) read seamlessly. */
  def readSnapshot(table: String, snap: Long): DataFrame = {
    val dirs = snapshots(table).find(_._1 == snap)
      .getOrElse(throw new IllegalArgumentException(s"$table has no snapshot $snap"))._2
    val groups = dirs.groupBy(_.takeWhile(_ != '/')).toSeq.sortBy(_._1)
    val reads = groups.map { case (dataDir, entries) =>
      val base = new Path(tableDir(table), dataDir)
      if (entries.contains(dataDir)) spark.read.option("mergeSchema", "true").parquet(base.toString)
      else spark.read.option("mergeSchema", "true").option("basePath", base.toString)
        .parquet(entries.map(e => new Path(tableDir(table), e).toString): _*)
    }
    reads.reduce(_.unionByName(_, allowMissingColumns = true))
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

  /** The actual `.format("jdbc")` writer of the reference's gold layer
    * (gold_reporting.py:127 writes the report to Postgres,
    * mode=overwrite). Exercised offline in the spec against embedded
    * Derby (on Spark's classpath); on a cluster, point `url`/`driver`
    * at the warehouse. */
  def exportJdbc(df: DataFrame, url: String, table: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .save()
}

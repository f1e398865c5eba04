package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Lakehouse
import graft.sources.spj.GraftSpjCatalog

/** Property fuzz for the row-level operations: seeded random layouts ×
  * random statement sequences over a 12-kind alphabet — UPDATE of
  * value and partition columns, DELETE (translatable and
  * beyond-algebra), MERGE, MoR DELETE/UPDATE ×3 routes, additive ADD
  * COLUMNS, and (r14) EQUALITY-KEY MoR DELETE, RENAME COLUMN of the
  * value column, widening ALTER COLUMN TYPE, and column MOVE (FIRST/AFTER reorders) — each statement's
  * full table state compared against a driver-side MIRROR maintained
  * with the same Spark expressions (the mirror TRACKS renames and type
  * widenings), so the comparison pins the STORAGE path (entry pruning,
  * staging, replace commits, partition-column moves, tombstone
  * anti-filters incl. equality keys forward-mapped through later
  * renames, conform projections) against pure dataframe semantics. All
  * statement kinds run UNGATED on each other — positional tombstones
  * compose with evolution by construction, and equality tombstones
  * compose whenever their keys survive canonically (the alphabet's
  * renames/widenings stay inside one canonical domain). When a live
  * equality tombstone keys on a column, DROP COLUMN of it must refuse
  * (asserted inline). Also asserts the table stays SPJ-servable after
  * every statement, and that a closing compaction changes nothing. */
class SpjRowLevelFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  private val groups = Array("A", "B", "C", "D")

  /** One seeded fuzz trial: random layout, random statement sequence
    * plus the shuffled deterministic r14 tail, every state compared to
    * the dataframe mirror. `tag` keys the temp roots so gate-forced
    * reruns never collide with the default-gate trials. */
  private def fuzzTrial(rnd: scala.util.Random, trial: Int, tag: String): Unit = {
    {
      val root = java.nio.file.Files.createTempDirectory(s"graft-$tag$trial").toString
      val lake = new Lakehouse(spark, root)
      val spec = rnd.nextInt(3) match {
        case 0 => Seq(s"bucket(${Seq(2, 4, 8)(rnd.nextInt(3))},k)")
        case 1 => Seq("grp")
        case 2 => Seq("grp", s"bucket(${Seq(2, 4)(rnd.nextInt(2))},k)")
      }
      def rows(n: Int, keyBase: Long) = (1 to n).map { i =>
        (keyBase + i,
          // occasional NULL partition value: the Hive null dir must
          // survive every rewrite
          if (rnd.nextInt(10) == 0) null else groups(rnd.nextInt(groups.length)),
          new java.math.BigDecimal(f"${rnd.nextInt(1000)}%d.${rnd.nextInt(100)}%02d"))
      }.toDF("k", "grp", "v")
        .select(col("k"), col("grp"), col("v").cast("decimal(10,2)").as("v"))
      // 1-3 commits of history. The catalog LINE registers too (what
      // any DDL-created table has): a statement sequence may DELETE
      // every row, and the emptied table keeps loading only through
      // its declared-spec fallback.
      var mirror = rows(20 + rnd.nextInt(20), 0)
      lake.createOrReplace(mirror, "fz_t", spec)
      lake.registerView("fz_t", spec)
      (1 to rnd.nextInt(3)).foreach { c =>
        val extra = rows(5 + rnd.nextInt(10), 1000L * c)
        lake.append(extra, "fz_t", spec)
        mirror = mirror.unionByName(extra)
      }
      mirror = mirror.localCheckpoint(true)
      val cat = s"rlfuzz_${catSeq.incrementAndGet()}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSpjCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)

      // the VALUE column's current name and declared type — renames and
      // widenings move them; every later statement (and the mirror)
      // must reference the current pair
      var vName = "v"
      var vType = "decimal(10,2)"
      var renameSeq = 0

      def randPred(): (String, org.apache.spark.sql.Column) = rnd.nextInt(5) match {
        case 0 => val c = rnd.nextInt(40); (s"k < $c", col("k") < c)
        case 1 => val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          (s"pmod(k, $m) = $r", pmod(col("k"), lit(m)) === r) // beyond the filter algebra
        case 2 => val g = groups(rnd.nextInt(groups.length))
          (s"grp = '$g'", col("grp") === g)
        case 3 => val c = rnd.nextInt(900); (s"$vName > $c", col(vName) > c)
        case 4 => ("grp IS NULL", col("grp").isNull)
      }

      var evoSeq = 0
      // random body + a shuffled deterministic tail covering the four
      // r14 kinds (8 = equality-key MoR delete, 9 = RENAME COLUMN,
      // 10 = widening ALTER COLUMN TYPE, 11 = column MOVE)
      val body = Seq.fill(4 + rnd.nextInt(3))(rnd.nextInt(12))
      val kinds = body ++ rnd.shuffle(Seq(8, 9, 10, 11))
      for ((kind, op) <- kinds.zipWithIndex) {
        val (predSql, predCol) = randPred()
        val cond = coalesce(predCol, lit(false))
        // mirror column-map that PRESERVES evolution-added columns
        def mapCols(f: PartialFunction[String, org.apache.spark.sql.Column]): Unit =
          mirror = mirror.select(mirror.columns.toSeq.map(c =>
            f.applyOrElse(c, (n: String) => col(n)).as(c)): _*)
        kind match {
          case 0 => // UPDATE a value column
            val c = 1 + rnd.nextInt(5)
            spark.sql(s"UPDATE $cat.fz_t SET $vName = $vName + $c WHERE $predSql")
            mapCols { case n if n == vName =>
              when(cond, col(vName) + c).otherwise(col(vName)).cast(vType) }
          case 1 => // UPDATE the PARTITION column: rows must move leaves
            val g = groups(rnd.nextInt(groups.length))
            spark.sql(s"UPDATE $cat.fz_t SET grp = '$g' WHERE $predSql")
            mapCols { case "grp" => when(cond, lit(g)).otherwise(col("grp")) }
          case 2 => // DELETE (translatable or CoW-fallback per pred)
            spark.sql(s"DELETE FROM $cat.fz_t WHERE $predSql")
            mirror = mirror.where(cond =!= lit(true))
          case 3 => // MERGE: matched bump + unmatched insert, distinct keys
            val srcRows = (1 to 5 + rnd.nextInt(5)).map { i =>
              (if (rnd.nextBoolean()) rnd.nextInt(40).toLong
               else 5000L + rnd.nextInt(100),
                groups(rnd.nextInt(groups.length)), i * 1L)
            }.distinctBy(_._1)
            val src = srcRows.toDF("k", "grp", "bump")
            src.createOrReplaceTempView("fz_src")
            // evolution-added columns insert as typed NULLs
            val extraCols = mirror.columns.toSeq.filterNot(Set("k", "grp", vName))
            val insCols = (Seq("k", "grp", vName) ++ extraCols).mkString(", ")
            val insVals = (Seq("s.k", "s.grp", s"CAST(s.bump AS ${vType.toUpperCase})") ++
              extraCols.map(_ => "CAST(NULL AS DOUBLE)")).mkString(", ")
            spark.sql(
              s"""MERGE INTO $cat.fz_t t USING fz_src s ON t.k = s.k
                 |WHEN MATCHED THEN UPDATE SET t.$vName = t.$vName + s.bump
                 |WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)""".stripMargin)
            val bump = src.select(col("k"), col("grp").as("s_grp"), col("bump"))
            val matchedOrKept = mirror.join(bump.select("k", "bump"), Seq("k"), "left")
              .select(mirror.columns.toSeq.map {
                case n if n == vName => when(col("bump").isNotNull, col(vName) + col("bump"))
                  .otherwise(col(vName)).cast(vType).as(vName)
                case other => col(other)
              }: _*)
            val inserted = bump.join(mirror.select("k"), Seq("k"), "left_anti")
              .select(col("k"), col("s_grp").as("grp"),
                col("bump").cast(vType).as(vName))
            mirror = matchedOrKept.unionByName(inserted,
              allowMissingColumns = true)
          case 4 => // MERGE-ON-READ delete via the session routing knob
            spark.conf.set("spark.graft.delete-mode", "merge-on-read")
            try spark.sql(s"DELETE FROM $cat.fz_t WHERE $predSql")
            finally spark.conf.unset("spark.graft.delete-mode")
            mirror = mirror.where(cond =!= lit(true))
          case 5 => // MERGE-ON-READ update (tombstone + layout-spec delta dir)
            val c = 1 + rnd.nextInt(5)
            lake.updateWhereMor(
              Seq(vName -> (col(vName) + c).cast(vType)), predCol,
              "fz_t", spec)
            mapCols { case n if n == vName =>
              when(cond, col(vName) + c).otherwise(col(vName)).cast(vType) }
          case 6 => // additive evolution: a fresh nullable column
            evoSeq += 1
            val name = s"x$evoSeq"
            spark.sql(s"ALTER TABLE $cat.fz_t ADD COLUMNS ($name DOUBLE)")
            mirror = mirror.withColumn(name, lit(null).cast("double"))
          case 7 => // DELTA update: Spark-native UPDATE routed merge-on-read
            val c = 1 + rnd.nextInt(5)
            spark.conf.set("spark.graft.update-mode", "merge-on-read")
            try spark.sql(s"UPDATE $cat.fz_t SET $vName = $vName + $c WHERE $predSql")
            finally spark.conf.unset("spark.graft.update-mode")
            mapCols { case n if n == vName =>
              when(cond, col(vName) + c).otherwise(col(vName)).cast(vType) }
          case 8 => // EQUALITY-KEY MoR delete (r14): keys on k or the value
            // column; the live tombstone must block DROP COLUMN of its key
            if (rnd.nextBoolean() || spec.exists(_.contains("grp"))) {
              val ks = (1 to 3).map(_ => rnd.nextInt(60).toLong).distinct
              lake.deleteByKeyMor(ks.toDF("k"), "fz_t")
              mirror = mirror.where(!col("k").isin(ks: _*))
              // k may be a layout source (bucket key) — the layout
              // refusal fires first there; otherwise the tombstone
              // refusal must (either way the DROP never lands)
              val e = intercept[Exception](lake.dropColumn("fz_t", "k"))
              assert(e.getMessage.contains("equality tombstone") ||
                e.getMessage.contains("partition-layout source"),
                s"DROP of a live equality-tombstone key must refuse: ${e.getMessage}")
            } else {
              // keys on the CURRENT value column name: samples from the
              // live table so the delete usually hits something
              val sample = mirror.select(vName).limit(3).collect()
                .map(_.getDecimal(0)).filter(_ != null).distinct.toSeq
              if (sample.nonEmpty) {
                lake.deleteByKeyMor(
                  sample.toDF(vName).select(col(vName).cast(vType).as(vName)), "fz_t")
                mirror = mirror.where(!col(vName).isin(sample: _*))
                val e = intercept[Exception](lake.dropColumn("fz_t", vName))
                assert(e.getMessage.contains("equality tombstone"),
                  s"DROP of a live equality-tombstone key must refuse: ${e.getMessage}")
              }
            }
          case 9 => // RENAME COLUMN (r14): the value column moves names —
            // later statements AND any live equality tombstone keyed on
            // the old name must forward-map
            renameSeq += 1
            val next = s"v_r$renameSeq"
            spark.sql(s"ALTER TABLE $cat.fz_t RENAME COLUMN $vName TO $next")
            mirror = mirror.withColumnRenamed(vName, next)
            vName = next
          case 11 => // column MOVE (r14): declared order is pure metadata;
            // the mirror reorders identically (the compare is positional)
            val first = rnd.nextBoolean()
            spark.sql(s"ALTER TABLE $cat.fz_t ALTER COLUMN $vName " +
              (if (first) "FIRST" else "AFTER grp"))
            val rest = mirror.columns.toSeq.filterNot(_ == vName)
            val order = if (first) vName +: rest
            else {
              val i = rest.indexOf("grp")
              (rest.take(i + 1) :+ vName) ++ rest.drop(i + 1)
            }
            mirror = mirror.select(order.map(col): _*)
          case 10 => // widening ALTER COLUMN TYPE (r14): decimal precision
            // grows, scale pinned — same canonical domain, so live
            // equality tombstones keep applying
            val newPrec = vType match {
              case s if s.startsWith("decimal(") =>
                s.stripPrefix("decimal(").takeWhile(_ != ',').toInt + 2
            }
            val next = s"decimal($newPrec,2)"
            spark.sql(s"ALTER TABLE $cat.fz_t ALTER COLUMN $vName TYPE $next")
            mirror = mirror.withColumn(vName, col(vName).cast(next))
            vType = next
        }
        mirror = mirror.localCheckpoint(true)
        assert(sortedRows(spark.table(s"$cat.fz_t")) === sortedRows(mirror),
          s"trial $trial diverged after op ${op + 1} kind=$kind (spec=$spec, pred=$predSql); table cols=${spark.table(s"$cat.fz_t").columns.mkString(",")}")
        // the layout contract survived the rewrite
        assert(lake.spjLayout("fz_t").spec === graft.sources.Transforms.canon(spec))
      }
      // closure: compaction materializes tombstones (and rebases the
      // evolved schema into one physical shape) — state must not move
      lake.compact("fz_t", spec)
      assert(sortedRows(spark.table(s"$cat.fz_t")) === sortedRows(mirror),
        s"trial $trial diverged after the closing compact")
      assert(!lake.spjLayout("fz_t").tombstoned)
    }
  }

  test("random op sequences over random layouts equal the dataframe mirror") {
    val rnd = new scala.util.Random(1234)
    // 6 trials; each trial's tail deterministically covers the three
    // r14 kinds (random draws alone could miss an 11-kind alphabet)
    for (trial <- 1 to 6) fuzzTrial(rnd, trial, "rlf")
  }

  test("the same alphabet with EVERY tombstone above the gate: lazy positional + equality representations equal the mirror (r17)") {
    // gate forced to 1 byte: every MoR delete/update the alphabet
    // produces — positional AND equality, incl. equality keys that
    // rename or widen mid-sequence — serves through the executor-side
    // representations (SpjPosTombstoneFiles slices / SpjEqKeyCache
    // key sets); the mirror compare proves the lazy path never
    // resurrects or over-deletes a row under composition
    val rnd = new scala.util.Random(98765)
    spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "1")
    try for (trial <- 1 to 3) fuzzTrial(rnd, trial, "rlfl")
    finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Adversarial dedup stress harness (SURVEY §5): 16 identical copies
  * of the sf0.1 corpus (80k docs / 160k vectors, the dup-heaviest
  * possible regime) — exact-dup collapse must absorb the 16× blowup.
  * Run: `sbt "Test/runMain graft.Stress"`. Not part of `sbt test`
  * (minutes-long by design).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = 16
    val spark = GraftSession.local(32)
    val dir = java.nio.file.Files.createTempDirectory("graft-stress").toString
    val docs = graft.sources.Tables.documents(spark, base)
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val docsN = (0 until copies).map(i =>
      docs.select((col("doc_id") + lit(i * n)).as("doc_id"),
        col("text"), col("source"))).reduce(_.unionByName(_))
    docsN.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = graft.sources.Tables.embeddings(spark, base)
    val m = emb.agg(max("vec_id")).head().getLong(0) + 1
    val embN = (0 until copies).map { i =>
      val cols = (col("vec_id") + lit(i * m)).as("vec_id") +:
        emb.columns.filterNot(_ == "vec_id").map(col).toSeq
      emb.select(cols: _*)
    }.reduce(_.unionByName(_))
    embN.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"STRESS $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s  rows=$rows")
    }
    import graft.operators.{Curate, Dedup}
    t("dedup_exact")(Dedup.dedupExact(spark, dir).where(col("is_dup")).count())
    t("dedup_ngram_jaccard")(Dedup.dedupNgramJaccard(spark, dir).count())
    // components over the 600k+-edge pair graph: 16-clique clusters
    // must converge in a couple of pointer-jump rounds
    t("dedup_components")(Dedup.dedupComponents(spark, dir).count())
    t("dedup_minhash_lsh")(Dedup.dedupMinhashLsh(spark, dir).count())
    t("dedup_simhash")(Dedup.dedupSimhash(spark, dir).count())
    t("dedup_embedding")(Dedup.dedupEmbedding(spark, dir).count())
    t("pipeline_decontam")(Dedup.pipelineDecontaminate(spark, dir).count())
    t("pipeline_curate")(Curate.pipelineCurate(spark, dir).count())
    t("pipeline_curate_cc")(Curate.pipelineCurateCc(spark, dir).count())
    // span dedup at 16×: every span repeats 16 times across copies, so
    // kept spans stay at the single-copy count while segment rows 16×
    t("dedup_spans")(Dedup.dedupSpans(spark, dir).count())
    // ANN at 16× (160k vectors): the approximate paths must beat the
    // exact scan exactly here — candidates per query stay ~constant
    // while brute-force scoring grows linearly; the BQ pass scans the
    // whole corpus but at one xor+popcount per row
    import graft.operators.Similarity
    t("ann_cosine_topk")(Similarity.annCosineTopk(spark, dir).count())
    t("ann_lsh_multiprobe")(Similarity.annLshMultiprobe(spark, dir).count())
    t("ann_ivf_topk")(Similarity.annIvfTopk(spark, dir).count())
    t("ann_bq_rerank")(Similarity.annBqRerank(spark, dir).count())
    // incremental maintenance at 16×: a ONE-copy delta onto a 15-copy
    // base — refresh must price the delta, not the corpus (compare the
    // *_create and *_refresh_delta lines: create scans 15 copies,
    // refresh scans 1)
    import graft.operators.AnnIndex
    import graft.sources.{Lakehouse, MaterializedView => MV}
    val lakeDir = java.nio.file.Files.createTempDirectory("graft-stress-lake").toString
    val lake = new Lakehouse(spark, lakeDir)
    val srcDf = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
    val vd = MV.ViewDef("docs_rollup", "docs_t", Seq("source"),
      Seq(MV.SumCol("n_chars", "chars"), MV.CountAll("n")))
    lake.createOrReplace(srcDf.where(col("doc_id") < (copies - 1) * n), "docs_t")
    t("mview_create") {
      MV.create(lake, vd); lake.read("docs_rollup").count()
    }
    lake.append(srcDf.where(col("doc_id") >= (copies - 1) * n), "docs_t")
    t("mview_refresh_delta") {
      MV.refresh(lake, vd); lake.read("docs_rollup").count()
    }
    val embSrc = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    lake.createOrReplace(embSrc.where(col("vec_id") < (copies - 1) * m), "emb_t")
    t("ann_index_create") {
      AnnIndex.create(lake, "emb_t", nCells = 64)
      lake.read(AnnIndex.assignTable("emb_t")).count()
    }
    lake.append(embSrc.where(col("vec_id") >= (copies - 1) * m), "emb_t")
    t("ann_index_refresh_delta") {
      AnnIndex.refresh(lake, "emb_t")
      lake.read(AnnIndex.assignTable("emb_t")).count()
    }
    // COPY-ON-WRITE row-level ops at 16× (1.28M docs, bucket(16)):
    // a KEYED UPDATE through the DSv2 catalog must rewrite ONE leaf
    // (static bucket pruning bounds the CoW scan), while a
    // beyond-algebra DELETE whose predicate no ledger can bound pays
    // the honest full rewrite — compare the two lines
    import graft.sources.spj.GraftSpjCatalog
    // a further 16× for the row-level legs (1.28M rows): wide-update
    // write amplification only shows once the data outweighs the
    // fixed commit cost
    val rlDf = (0 until copies).map(i => srcDf.select(
      (col("doc_id") + lit(i.toLong * copies * n)).as("doc_id"),
      col("source"), col("n_chars"))).reduce(_.unionByName(_))
    lake.createOrReplace(rlDf, "docs_rl", Seq("bucket(16,doc_id)"))
    spark.conf.set("spark.sql.catalog.stress_rl", classOf[GraftSpjCatalog].getName)
    spark.conf.set("spark.sql.catalog.stress_rl.root", lakeDir)
    val beforeRl = lake.spjLayout("docs_rl").files.valuesIterator.flatten.map(_.path).toSet
    t("rl_update_keyed") {
      spark.sql("UPDATE stress_rl.docs_rl SET n_chars = n_chars + 1 WHERE doc_id = 42")
      val after = lake.spjLayout("docs_rl").files.valuesIterator.flatten.map(_.path).toSet
      val leaves = (beforeRl -- after).map(p => p.take(p.lastIndexOf('/'))).size
      println(s"STRESS rl_update_keyed rewrote $leaves leaf/leaves of 16 buckets")
      spark.table("stress_rl.docs_rl").where(col("doc_id") === 42).count()
    }
    t("rl_delete_unbounded") { // pmod: no stat can bound it — full CoW rewrite
      spark.sql("DELETE FROM stress_rl.docs_rl WHERE pmod(doc_id, 100003) = 7")
      spark.table("stress_rl.docs_rl").count()
    }
    // WIDE low-selectivity UPDATE (~30% of rows, every bucket touched):
    // the round-12 watch item — CoW pays near-table leaf rewrites plus
    // the staging pass (2× write amplification on the rewritten set);
    // the round-13 DELTA path pays O(matched rows) positions + images
    // and rewrites ZERO leaves. Compare the two lines; then price the
    // tombstone-serving read (per-file anti-filter) against the clean
    // read above.
    t("rl_update_wide_cow") {
      spark.sql(
        "UPDATE stress_rl.docs_rl SET n_chars = n_chars + 1 WHERE pmod(doc_id, 10) < 3")
      spark.table("stress_rl.docs_rl").count()
    }
    t("rl_update_wide_mor") {
      spark.conf.set("spark.graft.update-mode", "merge-on-read")
      try spark.sql(
        "UPDATE stress_rl.docs_rl SET n_chars = n_chars + 1 WHERE pmod(doc_id, 10) < 3")
      finally spark.conf.unset("spark.graft.update-mode")
      val layout = lake.spjLayout("docs_rl")
      println(s"STRESS rl_update_wide_mor tombstoned=${layout.tombstoned} " +
        s"(zero leaves rewritten by construction)")
      spark.table("stress_rl.docs_rl").count()
    }
    t("mor_read_groupby") { // the anti-filter price on a ~30%-tombstoned table
      spark.table("stress_rl.docs_rl")
        .groupBy(pmod(col("doc_id"), lit(7))).count().count()
    }
    // MULTI-MILLION-ROW POSITIONAL TOMBSTONE (the round-13 scale-killer
    // closed): force the broadcast gate low so the ~2M-position
    // tombstone takes the ABOVE-GATE path — the plan never collects
    // the payload to the driver; each task anti-joins only the slices
    // naming its file. The read must stay row-exact vs the arithmetic
    // truth and the plan must stay flat-cost however wide the delete.
    val bigN = 6000000L
    lake.createOrReplace(
      spark.range(bigN).select(col("id").as("k"), pmod(col("id"), lit(3)).as("g")),
      "docs_big", Seq("bucket(16,k)"))
    t("mor_tombstone_2m_write") {
      lake.deleteWhereMor(col("g") === 0, "docs_big") // ~2M positions
      bigN / 3
    }
    spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "262144")
    try {
      val dels = lake.spjLayout("docs_big").deletes
      require(dels.nonEmpty &&
        dels.forall(_.isInstanceOf[graft.sources.SpjPosTombstoneFiles]),
        s"2M-position tombstone must take the executor-side path: $dels")
      t("mor_tombstone_2m_read") { // row-exact over the lazy anti-join
        val got = spark.table("stress_rl.docs_big").count()
        require(got == bigN - bigN / 3, s"lazy anti-join lost rows: $got")
        got
      }
    } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
    // CDC OVER AN ABOVE-GATE TOMBSTONE (r16): the catalog CDC stream's
    // delete leg must emit ~2M delete events with the positional
    // payload never touching the driver — slices open executor-side,
    // per admitted file, exactly like the batch anti-filter
    val ckBig = java.nio.file.Files.createTempDirectory("graft-stress-cdc").toString
    val nDel = new java.util.concurrent.atomic.AtomicLong()
    def drainBig(): Long = {
      val q = spark.readStream.option("cdc", "true").table("stress_rl.docs_big")
        .select(col("k"), col("_change_type"))
        .writeStream.option("checkpointLocation", ckBig)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          nDel.addAndGet(df.where(col("_change_type") === "delete").count()); ()
        }
        .start()
      try require(q.awaitTermination(600000), "CDC drain timed out")
      finally q.stop()
      nDel.get()
    }
    t("cdc_bootstrap_4m") { drainBig(); bigN - bigN / 3 }
    lake.deleteWhereMor(col("g") === 1, "docs_big") // ~2M more positions
    spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "262144")
    try t("cdc_above_gate_2m_dels") {
      nDel.set(0)
      val dels = drainBig()
      require(dels == bigN / 3, s"CDC lazy delete leg lost events: $dels")
      dels
    } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
    // ABOVE-GATE EQUALITY tombstone at scale (r17, scaled 1M→10M keys
    // in r18): a 10M-key MoR delete-by-key takes the lazy path — the
    // driver never collects a key; each executor materializes the
    // canonical key set ONCE from the tombstone slices (single-flight
    // JVM cache) in the COMPACT primitive-array representation
    // (8 bytes/key) and every scan task probes the shared set. Batch
    // read AND the CDC delete leg must stay row-exact at a 256 KiB
    // gate, and the measured executor memory ceiling is asserted:
    // 10M long keys retain ≈80 MB, not the ~GB a boxed-tuple hash
    // set would.
    val eqN = 30000000L
    lake.createOrReplace(
      spark.range(eqN).select(col("id").as("k"), pmod(col("id"), lit(3)).as("g")),
      "docs_bigeq", Seq("bucket(16,k)"))
    val ckEq = java.nio.file.Files.createTempDirectory("graft-stress-cdceq").toString
    val nDelEq = new java.util.concurrent.atomic.AtomicLong()
    def drainEq(): Long = {
      val q = spark.readStream.option("cdc", "true").table("stress_rl.docs_bigeq")
        .select(col("k"), col("_change_type"))
        .writeStream.option("checkpointLocation", ckEq)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          nDelEq.addAndGet(df.where(col("_change_type") === "delete").count()); ()
        }
        .start()
      try require(q.awaitTermination(600000), "CDC eq drain timed out")
      finally q.stop()
      nDelEq.get()
    }
    drainEq() // bootstrap the checkpoint before the tombstone
    t("mor_eq_tombstone_10m_write") { // ~10M distinct keys, one tombstone dir
      lake.deleteByKeyMor(
        spark.range(eqN).where(col("id") % 3 === 0).select(col("id").as("k")),
        "docs_bigeq")
      eqN / 3
    }
    spark.conf.set("spark.graft.spj.tombstone-broadcast-bytes", "262144")
    try {
      val dels = lake.spjLayout("docs_bigeq").deletes
      require(dels.nonEmpty &&
        dels.forall(_.isInstanceOf[graft.sources.SpjEqTombstoneFiles]),
        s"10M-key equality tombstone must take the executor-side path: $dels")
      graft.sources.spj.SpjEqKeyCache.clear()
      t("mor_eq_tombstone_10m_read") { // row-exact over the lazy set probe
        val got = spark.table("stress_rl.docs_bigeq").count()
        require(got == eqN - eqN / 3, s"lazy equality probe lost rows: $got")
        got
      }
      require(graft.sources.spj.SpjEqKeyCache.loads.get() >= 1)
      // the measured executor-memory ceiling: the compact primitive
      // representation retains ~8 bytes/key — 10M keys under 96 MB
      // (a boxed Set[Seq[Any]] held the same keys in GBs)
      val retained = graft.sources.spj.SpjEqKeyCache.cachedBytes
      require(retained > 0L && retained <= 96L * 1024 * 1024,
        s"10M-key compact set must retain <=96MB, got $retained")
      t("cdc_above_gate_10m_eq_dels") { // the CDC delete leg, same path
        nDelEq.set(0)
        val dels = drainEq()
        require(dels == eqN / 3, s"CDC lazy equality leg lost events: $dels")
        dels
      }
    } finally spark.conf.unset("spark.graft.spj.tombstone-broadcast-bytes")
    // NESTED + ARRAY-ELEMENT conform at volume (r15): a 2M-row table
    // with a struct and a 4-element array-of-structs column, evolved
    // at BOTH depths — the read-through conform (struct rebuild +
    // per-element ArrayTransform on the SPJ path, transform() on the
    // ordinary path) must price like a projection, not a join
    val nevN = 2000000L
    lake.createOrReplace(
      spark.range(nevN).select(col("id").as("k"),
        struct(concat(lit("c"), pmod(col("id"), lit(1000))).as("city"),
          pmod(col("id"), lit(97)).as("zip")).as("addr"),
        expr("transform(sequence(0, 3), i -> " +
          "named_struct('sku', id % 500, 'qty', CAST(id % 7 AS INT)))").as("items")),
      "docs_nev", Seq("bucket(16,k)"))
    lake.alterSchemaGrouped("docs_nev", Seq(
      lake.addColumnsStep("docs_nev", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("addr.country",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("items.element.disc",
          org.apache.spark.sql.types.DoubleType)))),
      lake.renameColumnStep("docs_nev", "items.element.qty", "amount"),
      lake.renameColumnStep("docs_nev", "addr.zip", "postal")))
    t("nested_conform_2m_read") { // ordinary path: full conform scan
      val got = lake.read("docs_nev")
        .select(sum(expr("aggregate(items.amount, 0L, (a, x) -> a + x)")).as("s"),
          count(col("addr.postal")).as("n")).head()
      require(got.getLong(1) == nevN, s"conform lost rows: ${got.getLong(1)}")
      got.getLong(0)
    }
    t("nested_conform_2m_spj") { // SPJ path: pre-bound ArrayTransform
      val got = spark.table("stress_rl.docs_nev")
        .select(sum(expr("aggregate(items.amount, 0L, (a, x) -> a + x)")).as("s"),
          count(col("addr.postal")).as("n")).head()
      require(got.getLong(1) == nevN, s"SPJ conform lost rows: ${got.getLong(1)}")
      got.getLong(0)
    }
    graft.sources.Memo.release(spark)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lakeDir))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

/** Scratch stage-level profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    import graft.operators.Dedup
    val m = Dedup.getClass.getDeclaredMethods
    def call(n: String, a: Object*): org.apache.spark.sql.DataFrame = {
      val meth = m.find(_.getName == n).get
      meth.setAccessible(true)
      meth.invoke(Dedup, a: _*).asInstanceOf[org.apache.spark.sql.DataFrame]
    }
    t("dupGroups")(call("dupGroups", spark, dir).count())
    t("postings")(call("postings", spark, dir).count())
    t("prefixPostings")(call("prefixPostings", spark, dir, java.lang.Double.valueOf(0.5)).count())
    t("candidates")(Dedup.jaccardCandidates(spark, dir, 0.5, 10000).count())
    t("full query 1st")(Dedup.dedupNgramJaccard(spark, dir).count())
    t("full query 2nd")(Dedup.dedupNgramJaccard(spark, dir).count())
    t("curate 1st")(graft.operators.Curate.pipelineCurate(spark, dir).count())
    t("curate 2nd")(graft.operators.Curate.pipelineCurate(spark, dir).count())
    // simhash stage dissection
    locally {
      import graft.operators.TextAnalysis.{tokens => toks}
      val groups = call("dupGroups", spark, dir)
      val hashed = groups
        .select(col("gid"), explode(toks(col("nt"))).as("tok"))
        .select(col("gid"), graft.functions.HashFunctions.h62(col("tok")).as("h"))
      t("simhash tokenize+hash")(hashed.count())
      val sims = hashed.groupBy("gid")
        .agg(count(lit(1)).as("t"),
          (0 until 48).map(b =>
            sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"s$b")): _*)
      t("simhash 48-agg")(sims.count())
      t("simhash full 1st")(graft.operators.Dedup.dedupSimhash(spark, dir).count())
      t("simhash full 2nd")(graft.operators.Dedup.dedupSimhash(spark, dir).count())
      val gsim = call("simhashSigs", spark, dir)
      t("simhash sigs (memo)")(gsim.count())
      val buckets = gsim.select(
        struct(col("gid"), col("sim")).as("e"),
        posexplode(transform(
          sequence(lit(0), lit(3)),
          k => call_function("shiftright", col("sim"), k * 12)
            .bitwiseAND(lit((1L << 12) - 1)))))
        .groupBy(col("pos").as("band"), col("col").as("bval"))
        .agg(collect_list(col("e")).as("ds"))
      val gp = buckets
        .where(size(col("ds")) > 1)
        .select(col("ds"), explode(col("ds")).as("a"))
        .select(col("a"), explode(col("ds")).as("b"))
        .where(col("a.gid") < col("b.gid"))
      t("simhash raw pairs")(gp.count())
      t("simhash dedup pairs")(gp.select(col("a.gid").as("ga"), col("b.gid").as("gb"))
        .dropDuplicates("ga", "gb").count())
    }
    spark.stop()
  }
}

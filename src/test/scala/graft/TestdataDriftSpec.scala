package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Canary against silent testdata regeneration.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed physical encodings once (events.ts went from
  * TIMESTAMP(NANOS) to plain timestamp[us], which broke 15 driver
  * queries in round 9). This spec pins the ENGINE-VISIBLE schema of
  * every table — the contract all operators are written against — so
  * a future re-encoding fails ONE named test with a readable diff
  * instead of a shower of downstream analysis errors.
  *
  * Deliberately asserts the post-normalization schema (what
  * [[Tables]] hands to operators), not the raw footer: the reader is
  * allowed to absorb physical drift (nanos vs micros vs NTZ) as long
  * as the logical surface stays fixed.
  */
class TestdataDriftSpec extends SparkSpec {

  private def types(name: String): Map[String, DataType] = {
    val df = if (name == "events") Tables.events(spark, sf) else Tables.load(spark, sf, name)
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  test("all ten tables open and events.ts normalizes to session TimestampType") {
    Tables.names.foreach { n => assert(types(n).nonEmpty, s"table $n unreadable") }
    assert(types("events")("ts") === TimestampType,
      "events.ts must normalize to TimestampType whatever the parquet footer declares")
  }

  test("key columns every operator family depends on keep their logical types") {
    val e = types("events")
    assert(e("event_id") === LongType && e("user_id") === LongType &&
      e("event_type") === StringType && e("value") === DoubleType && e("props") === StringType)

    val li = types("lineitem")
    assert(li("l_orderkey") === LongType && li("l_quantity") === DoubleType &&
      li("l_extendedprice") === DoubleType && li("l_shipdate") === TimestampNTZType)

    val o = types("orders")
    assert(o("o_orderkey") === LongType && o("o_totalprice") === DoubleType &&
      o("o_orderdate") === TimestampNTZType && o("o_orderstatus") === StringType)

    val d = types("documents")
    assert(d("doc_id") === LongType && d("text") === StringType &&
      d("lang") === StringType && d("source") === StringType)

    val em = types("embeddings")
    assert(em("vec_id") === LongType && em("label") === IntegerType)
    em("embedding") match {
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(s"embeddings.embedding must be a float/double array, got $other")
    }
  }

  test("registerAll survives one broken table and still registers the rest") {
    // Point at a directory holding a deliberately corrupt events.parquet
    // plus a valid orders table: queries on orders must still work.
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Tables.orders(spark, sf).write.parquet(s"$dir/orders.parquet")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/events.parquet"), "not parquet".getBytes)
    val fresh = spark.newSession()
    Tables.registerAll(fresh, dir)
    assert(fresh.sql("SELECT count(*) AS n FROM orders").head.getLong(0) > 0,
      "orders must register and query even when events is unreadable")
  }
}

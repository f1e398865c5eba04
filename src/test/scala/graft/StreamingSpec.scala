package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg (readStream → watermark → window) matches the batch plan") {
    val stream = EventStream.hourlyAgg(EventStream.readEvents(spark, sf))
    val qname = "hourly_test"
    val q = stream.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table(qname).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    val want = Relational.qEventsHourly(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("hour"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    assert(got === want)
  }

  test("stateful sessionization (flatMapGroupsWithState) matches the window-function batch plan") {
    val sessions = EventStream.sessionize(
      EventStream.toSessionEvents(Tables.events(spark, sf)))
    val got = sessions.collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end)).toSet
    val want = Relational.qEventsSessionize(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
        r.getAs[Long]("n_events"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"))).toSet
    assert(got === want)
  }

  test("sessions respect the 30-minute gap invariant") {
    val sessions = EventStream.sessionize(
      EventStream.toSessionEvents(Tables.events(spark, sf))).collect()
    sessions.groupBy(_.user_id).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.session_id)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.session_start.getTime - a.session_end.getTime > EventStream.GapSeconds * 1000,
          s"adjacent sessions closer than the gap: $a $b")
      }
    }
  }
}

package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSuite extends SparkSpec {
  import spark.implicits._

  // offset from epoch: an event at exactly ts=0 sits on the initial
  // watermark and is discarded as late
  private val Base = 100000L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  test("windowed counts aggregate per tumbling window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.windowedCounts(input.toDF(), window = "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      input.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(3), 10, "click", 2.0),
        Event(3, ts(12), 11, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000 - Base, r.getString(2), r.getLong(3))).toSet
      assert(rows == Set((0L, "click", 2L), (10L, "view", 1L)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions after the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 10: events at minute 0 and 10 (one session), then minute 100
      input.addData(
        Event(1, ts(0), 10, "a", 1.0),
        Event(2, ts(10), 10, "a", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(100), 10, "a", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to time the second session out
      input.addData(Event(4, ts(500), 99, "a", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(900), 98, "a", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getLong(1) / 60000 - Base, r.getLong(2) / 60000 - Base, r.getInt(3))).toSet
      assert(sessions.contains((10L, 0L, 10L, 2)))   // first session: closed by gap
      assert(sessions.contains((10L, 100L, 100L, 1))) // second: closed by timeout
    } finally q.stop()
  }
}

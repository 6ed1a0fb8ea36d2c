package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Event, Session}

class WindowedCountsStreamSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling windows drop too-late events in a real stream") {
    implicit val sqlCtx = TestSpark.spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = graft.streaming.IncrementalIngest.windowedCounts(
      mem.toDF().toDF("ts", "event_type", "value"), "ts", "1 hour", "30 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (+30 min delay)
      mem.addData((ts("2024-01-01 14:00:00"), "click", 5.0))
      q.processAllAvailable()
      // this event is 3.5h behind the watermark -> dropped
      mem.addData((ts("2024-01-01 10:10:00"), "click", 100.0))
      q.processAllAvailable()
      // close the 14:00 window too
      mem.addData((ts("2024-01-01 18:00:00"), "click", 1.0))
      q.processAllAvailable()

      val out = TestSpark.spark.table("win_out")
        .select($"window_start", $"n", $"total_value")
        .as[(java.sql.Timestamp, Long, Double)].collect().toSet
      // the 10:00 window closed with ONLY the on-time event
      assert(out.contains((ts("2024-01-01 10:00:00"), 1L, 1.0)))
      assert(!out.exists(_._3 == 101.0))
    } finally q.stop()
  }
}

class StreamingSessionizeSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful streaming sessions: gap splits in-batch, timeout closes via watermark") {
    implicit val sqlCtx = TestSpark.spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = StreamingSessionize.sessions(
      mem.toDS().withWatermark("ts", "0 seconds"), gapSeconds = 60)

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // batch 1: two close events + one far event for u1 (in-batch gap
      // split), plus u2 activity
      mem.addData(
        Event("u1", ts("2024-01-01 10:00:00")),
        Event("u1", ts("2024-01-01 10:00:30")),
        Event("u1", ts("2024-01-01 10:10:00")),
        Event("u2", ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // the split emits u1's first session immediately
      val afterB1 = TestSpark.spark.table("sessions_out").as[Session].collect()
      assert(afterB1.toSet === Set(
        Session("u1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:30"), 2)))

      // batch 2: later activity advances the watermark past the open
      // sessions' timeouts -> they close via EventTimeTimeout
      mem.addData(Event("u3", ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      mem.addData(Event("u3", ts("2024-01-01 11:00:01")))
      q.processAllAvailable()

      val all = TestSpark.spark.table("sessions_out").as[Session].collect().toSet
      assert(all.contains(Session("u1", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:10:00"), 1)))
      assert(all.contains(Session("u2", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:10:00"), 1)))
    } finally q.stop()
  }
}

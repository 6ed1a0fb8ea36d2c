package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Event, Session}

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

package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IncrementalIngest

class IncrementalIngestSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("idempotentAppend: re-delivered keys are dropped (ON CONFLICT DO NOTHING parity)") {
    val dir = Files.createTempDirectory("graft_ingest").toString + "/t"
    val b1 = Seq(("k1", 1), ("k2", 2), ("k2", 2)).toDF("k", "v") // in-batch dup too
    IncrementalIngest.idempotentAppend(b1, dir, Seq("k"))
    val b2 = Seq(("k2", 99), ("k3", 3)).toDF("k", "v") // k2 re-delivered
    IncrementalIngest.idempotentAppend(b2, dir, Seq("k"))
    // replay the whole second batch (at-least-once redelivery)
    IncrementalIngest.idempotentAppend(b2, dir, Seq("k"))

    val got = TestSpark.spark.read.parquet(dir).as[(String, Int)].collect().toSet
    assert(got === Set(("k1", 1), ("k2", 2), ("k3", 3)))
  }

  test("startIngest drives the idempotent sink through a real streaming query") {
    implicit val sqlCtx = TestSpark.spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[(String, Int)]
    val q = IncrementalIngest.startIngest(
      mem.toDF().toDF("k", "v"), s"$dir/t", s"$dir/cp", Seq("k"),
      trigger = Trigger.AvailableNow())
    mem.addData(("a", 1), ("b", 2), ("a", 1))
    q.awaitTermination(60000)
    val got = TestSpark.spark.read.parquet(s"$dir/t").as[(String, Int)].collect().toSet
    assert(got === Set(("a", 1), ("b", 2)))
  }

  test("windowedCounts aggregates into tumbling windows (batch-mode check)") {
    val events = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    val got = IncrementalIngest.windowedCounts(events, "ts", "1 hour", "10 minutes")
      .orderBy("window_start", "event_type")
      .select($"event_type", $"n", $"total_value")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }
}

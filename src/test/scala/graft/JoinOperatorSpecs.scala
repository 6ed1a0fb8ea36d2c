package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at-or-before each left ts") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 100.0),
      ("A", ts("2024-01-01 11:00:00"), 2L, 110.0),
      ("B", ts("2024-01-01 10:30:00"), 3L, 55.0)
    ).toDF("sym", "ts", "qid", "price")
    val trades = Seq(
      ("A", ts("2024-01-01 10:30:00"), 901L), // between quotes -> 100
      ("A", ts("2024-01-01 11:00:00"), 902L), // exactly at quote 2 -> 110
      ("A", ts("2024-01-01 09:00:00"), 903L), // before any quote -> null
      ("B", ts("2024-01-01 12:00:00"), 904L), // after B's quote -> 55
      ("C", ts("2024-01-01 12:00:00"), 905L)  // no quotes at all -> null
    ).toDF("sym", "ts", "tid")

    val got = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "ts", "ts",
      payload = Seq("price"), tieBreak = col("qid"))
      .select("tid", "asof_price").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      901L -> Some(100.0), 902L -> Some(110.0), 903L -> None,
      904L -> Some(55.0), 905L -> None))
  }

  test("right-side ties on ts resolve to the greatest tiebreaker") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L, 1.0),
      ("A", ts("2024-01-01 10:00:00"), 2L, 2.0)
    ).toDF("sym", "ts", "qid", "price")
    val trades = Seq(("A", ts("2024-01-01 10:00:00"), 9L)).toDF("sym", "ts", "tid")
    val got = AsofJoin.asofBackward(trades, quotes, Seq("sym"), "ts", "ts",
      Seq("price"), col("qid"))
      .select("asof_price").as[Double].head()
    assert(got === 2.0)
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("bucketized point-in-interval equals the naive theta join") {
    val points = (0L until 500L).map(i => ("u" + (i % 3), i * 7L)).toDF("k", "pt")
    val intervals = (0L until 40L).map(i =>
      ("u" + (i % 3), i * 80L, i * 80L + (i % 5) * 30L + 10L)).toDF("k", "s", "e")

    val fast = RangeJoin.pointInInterval(points, intervals, Seq("k"), "pt", "s", "e", bucketWidth = 64L)
      .select("k", "pt", "s", "e").as[(String, Long, Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter($"pt" >= $"s" && $"pt" < $"e")
      .select("k", "pt", "s", "e").as[(String, Long, Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("no duplicate matches when an interval spans many buckets") {
    val points = Seq(("k", 100L)).toDF("k", "pt")
    val intervals = Seq(("k", 0L, 1000L)).toDF("k", "s", "e") // spans 100 buckets of 10
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "pt", "s", "e", bucketWidth = 10L)
    assert(got.count() === 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IntersectCardSorted

class IntersectCardSortedSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def card(a: Seq[Long], b: Seq[Long]): java.lang.Integer = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(IntersectCardSorted(col("a"), col("b"))).collect().head
    if (r.isNullAt(0)) null else Int.box(r.getInt(0))
  }

  test("merge-walk cardinality on sorted distinct arrays") {
    assert(card(Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)) === 2)
    assert(card(Seq(1L, 2L), Seq(3L, 4L)) === 0)
    assert(card(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) === 3)
    assert(card(Seq(), Seq(1L)) === 0)
    assert(card(Seq(), Seq()) === 0)
    assert(card(Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)) === 2)
  }

  test("null propagation") {
    val r = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(IntersectCardSorted(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val df = TestSpark.spark.range(1000).select(
      sort_array(array_distinct(array(
        pmod(xxhash64(col("id"), lit(1)), lit(50)),
        pmod(xxhash64(col("id"), lit(2)), lit(50)),
        pmod(xxhash64(col("id"), lit(3)), lit(50)),
        pmod(xxhash64(col("id"), lit(4)), lit(50))))).as("a"),
      sort_array(array_distinct(array(
        pmod(xxhash64(col("id"), lit(5)), lit(50)),
        pmod(xxhash64(col("id"), lit(6)), lit(50)),
        pmod(xxhash64(col("id"), lit(7)), lit(50))))).as("b"))
    val expected = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
      .as[Int].collect().toSeq
    val got = df.select(IntersectCardSorted(col("a"), col("b")).as("n"))
      .as[Int].collect().toSeq
    assert(got === expected)
  }
}

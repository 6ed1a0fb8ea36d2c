package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contracts for the sketch aggregates exposed by
  * q_approx_stats (no SQL oracle — estimator outputs are engine-specific).
  */
class ApproxSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private lazy val li = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_count_distinct within 5% of exact") {
    val r = li.agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey").as("approx")).as[(Long, Long)].head()
    assert(math.abs(r._2 - r._1).toDouble / r._1 < 0.05, s"exact=${r._1} approx=${r._2}")
  }

  test("approx_percentile median within 2% of exact percentile") {
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .as[(Double, Double)].head()
    assert(math.abs(r._2 - r._1) / r._1 < 0.02, s"exact=${r._1} approx=${r._2}")
  }

  test("merged daily HLL sketches estimate within 3% of the exact distinct") {
    val events = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.01", "events")
    val merged = events
      .groupBy(to_date($"ts").as("d"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("approx"))
      .as[Long].head()
    val exact = events.select(countDistinct($"user_id")).as[Long].head()
    // the merge path (never re-reading raw rows) must agree with exact
    assert(math.abs(merged - exact).toDouble / exact < 0.03,
      s"exact=$exact merged-sketch=$merged")
  }
}

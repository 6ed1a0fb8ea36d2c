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
}

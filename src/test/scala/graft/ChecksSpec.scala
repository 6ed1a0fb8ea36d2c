package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.Checks

class ChecksSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val df = Seq(
    (Some(1), Some(10.0), Some("A")),
    (Some(2), Some(-1.0), Some("B")),
    (None, Some(3.0), Some("A")),
    (Some(4), None, Some("Z"))
  ).toDF("id", "amount", "code")

  test("fusedInvariants matches the per-check invariant counts") {
    val checks = Seq(
      "id_not_null" -> $"id".isNotNull,
      "amount_positive" -> ($"amount" > 0),
      "code_domain" -> ($"code".isNull || $"code".isin("A", "B")))
    val fused = Checks.fusedInvariants(df, checks)
      .as[(String, Long)].collect().toMap
    val separate = checks.map { case (name, pred) =>
      name -> Checks.invariant(df, pred).count()
    }.toMap
    assert(fused === separate)
    assert(fused === Map("id_not_null" -> 1L, "amount_positive" -> 2L, "code_domain" -> 1L))
  }

  test("fusedInvariants is one scan: a single aggregate over one relation") {
    val fused = Checks.fusedInvariants(df, Seq(
      "a" -> $"id".isNotNull, "b" -> ($"amount" > 0), "c" -> $"code".isNotNull))
    // exactly one leaf relation in the plan — three checks share the scan
    val leaves = fused.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size === 1, s"expected one scan, got:\n${fused.queryExecution.optimizedPlan}")
  }

  test("fusedInvariants on an empty relation reports zero violations") {
    val empty = df.filter(lit(false))
    val got = Checks.fusedInvariants(empty, Seq("x" -> $"id".isNotNull))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("x", 0L)))
  }
}

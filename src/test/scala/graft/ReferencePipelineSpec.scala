package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vault.ReferencePipeline

class ReferencePipelineSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private lazy val out = ReferencePipeline.run(TestSpark.spark, nCustomers = 200, nTransactions = 1000)

  test("hubs hold one row per business key with md5 hash keys") {
    assert(out.hubCustomer.count() === 200)
    assert(out.hubTransaction.count() === 1000)
    assert(out.hubCustomer.filter(!$"customer_hk".rlike("^[0-9a-f]{32}$")).count() === 0)
  }

  test("fact keeps the transaction grain and resolves every customer") {
    assert(out.fctTransactions.count() === 1000)
    assert(out.fctTransactions.filter($"customer_id".isNull).count() === 0)
  }

  test("semantic overview: per-customer totals reconcile with raw transactions") {
    val expected = out.rawTransactions.groupBy("customer_id")
      .agg(count(lit(1)).as("n"), sum($"transaction_amount".cast("decimal(20,2)")).as("amt"))
    val got = out.semanticCustomerOverview
      .select($"customer_id", $"total_transactions".as("n"), $"total_amount".as("amt"))
    assert(got.except(expected.select($"customer_id", $"n", $"amt")).count() === 0)
    assert(got.count() === expected.count())
  }

  test("every data-quality check passes on generated data") {
    val failing = out.qualitySummary.filter($"n_violations" > 0)
      .as[(String, Long)].collect()
    assert(failing.isEmpty, s"failing checks: ${failing.mkString(", ")}")
  }

  test("the whole DAG is deterministic in the seed") {
    val again = ReferencePipeline.run(TestSpark.spark, nCustomers = 200, nTransactions = 1000)
    assert(out.semanticCustomerOverview.orderBy("customer_id").collect().toSeq ===
      again.semanticCustomerOverview.orderBy("customer_id").collect().toSeq)
  }
}

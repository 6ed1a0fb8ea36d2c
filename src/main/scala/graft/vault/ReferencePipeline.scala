package graft.vault

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Scd2}
import graft.quality.Checks
import graft.sources.Generator

/** The reference's daily batch DAG end-to-end on the reference-shaped data
  * model (SURVEY §3.1): generate -> raw -> vault (hubs/links/sats) -> marts
  * (fact + SCD2 dim + semantic rollup) -> quality summary.
  *
  * The reference runs this as 6 Prefect tasks + a dbt graph
  * (`scripts/flow/flow__batch_data_s3_snowflake.py:13-110`,
  * `dbt_project.yml:25-42`); here the whole DAG is lazy DataFrame
  * composition — one driver program, executed by Catalyst, with
  * process/warehouse hops collapsed into shuffle boundaries.
  */
object ReferencePipeline {

  final case class Outputs(
      rawCustomers: DataFrame,
      rawTransactions: DataFrame,
      hubCustomer: DataFrame,
      hubTransaction: DataFrame,
      linkCustomerTransaction: DataFrame,
      satTransaction: DataFrame,
      fctTransactions: DataFrame,
      dimCustomerHistory: DataFrame,
      semanticCustomerOverview: DataFrame,
      qualitySummary: DataFrame)

  /** Run the full DAG over `nCustomers` customers / `nTransactions`
    * synthetic transactions (deterministic in `seed`).
    */
  def run(spark: SparkSession, nCustomers: Long, nTransactions: Long, seed: Long = 42L): Outputs = {
    val loadTs = lit("2024-01-31 20:00:00").cast("timestamp")

    // ---- raw layer (generator stands in for the REST/Faker/Kafka feeds)
    val rawCustomers = Generator.customers(spark, nCustomers, seed)
      .withColumn("load_timestamp", loadTs)
      .withColumn("source", lit("BATCH_DATA"))
    val rawTransactions = Generator.transactions(spark, nTransactions, nCustomers, seed)
      .withColumn("load_timestamp", loadTs)
      .withColumn("source", lit("BATCH_DATA"))

    // ---- vault (reference models/warehouse)
    val order = Seq(col("load_timestamp"))
    val hubCustomer = DataVault.hub(rawCustomers, Seq("customer_id"), "customer_hk",
      "load_timestamp", col("source"), order :+ col("customer_id"))
    val hubTransaction = DataVault.hub(rawTransactions, Seq("transaction_id"), "transaction_hk",
      "load_timestamp", col("source"), order :+ col("transaction_id"))
    val linkCustomerTransaction = DataVault.link(rawTransactions,
      Seq("customer_hk" -> Seq("customer_id"), "transaction_hk" -> Seq("transaction_id")),
      "link_hk", "load_timestamp", col("source"), order :+ col("transaction_id"))
    val satTransaction = DataVault.satellite(rawTransactions, Seq("transaction_id"),
      "transaction_hk",
      Seq("asset_type", "transaction_type", "quantity", "price_per_unit",
        "transaction_amount", "fee_amount"),
      "load_timestamp")

    // ---- marts (reference models/marts)
    // fct_transactions: 4-way star join, hubs broadcast (J4)
    val fctTransactions = linkCustomerTransaction
      .select("link_hk", "customer_hk", "transaction_hk")
      .join(satTransaction, Seq("transaction_hk"))
      .join(broadcast(hubCustomer.select(col("customer_hk"), col("customer_id"))),
        Seq("customer_hk"))

    // dim_customer_history: SCD2 over customer attribute versions (W3)
    val dimCustomerHistory = Scd2.intervals(
      rawCustomers.select(col("customer_id"), col("customer_tier"),
        col("risk_tolerance"), col("load_timestamp")),
      Seq("customer_id"), "load_timestamp", Seq(col("load_timestamp")))

    // semantic_customer_overview: KPI rollup + latest profile (A3+J5)
    val latestProfile = Dedup.latestRows(rawCustomers, Seq("customer_id"),
      Seq(col("load_timestamp").desc, col("customer_id")))
    val semanticCustomerOverview = fctTransactions
      .groupBy(col("customer_hk"), col("customer_id"))
      .agg(
        count(lit(1)).as("total_transactions"),
        // decimal money math (reference NUMERIC(20,2)) — exact and
        // order-independent, unlike double sums
        sum(col("transaction_amount").cast("decimal(20,2)")).as("total_amount"),
        sum(col("fee_amount").cast("decimal(20,2)")).as("total_fees"))
      .join(latestProfile.select(col("customer_id"), col("customer_tier"), col("risk_tolerance")),
        Seq("customer_id"), "left")

    // ---- quality (reference tests/) — the four row-predicate checks on
    // rawTransactions fuse into ONE scan (Checks.fusedInvariants); the
    // join/window-shaped checks keep their own shuffles
    val acceptedValuesPred = (c: String, allowed: Seq[String]) =>
      col(c).isNull || col(c).isin(allowed: _*)
    val qualitySummary = Checks.summary(Seq(
      "customer_id_not_null" -> Checks.notNull(rawCustomers, Seq("customer_id")),
      "transaction_id_unique" -> Checks.unique(rawTransactions, Seq("transaction_id")),
      "transactions_have_customer" ->
        Checks.relationships(rawTransactions, "customer_id", rawCustomers, "customer_id"),
      "scd2_no_overlaps" -> Checks.invariant(
        dimCustomerHistory.withColumn("__next_from",
          lead(col("effective_from"), 1).over(
            Window.partitionBy(col("customer_id")).orderBy(col("effective_from")))),
        col("__next_from").isNull || col("effective_to") <= col("__next_from"))))
      .unionByName(Checks.fusedInvariants(rawTransactions, Seq(
        "transaction_type_valid" -> acceptedValuesPred("transaction_type", Seq("BUY", "SELL")),
        "tier_valid" -> acceptedValuesPred("customer_tier",
          Seq("BRONZE", "SILVER", "GOLD", "PLATINUM")),
        "fee_reasonable" -> (col("fee_amount") >= 0 && col("fee_amount") <= least(
          col("transaction_amount"), col("transaction_amount") * 0.1)),
        "amount_consistent" ->
          (abs(col("transaction_amount") - round(col("quantity") * col("price_per_unit"), 2)) < 0.01))))

    Outputs(rawCustomers, rawTransactions, hubCustomer, hubTransaction,
      linkCustomerTransaction, satTransaction, fctTransactions,
      dimCustomerHistory, semanticCustomerOverview, qualitySummary)
  }
}

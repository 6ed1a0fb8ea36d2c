package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed synthetic-data generator — the Spark-first
  * replacement for the reference's Faker batch generator
  * (`scripts/data_generation/a1_1_raw_data_faker_generator.py:131-522`) and
  * its streaming twin (`scripts/kafka/kafka_producer.py:155-449`).
  *
  * Design: `spark.range(n)` gives a distributed, evenly-partitioned id
  * spine; every attribute is a pure column expression over
  * `xxhash64(seed, id, fieldTag)` — so generation is map-only, reproducible
  * for any (seed, n), and scales linearly with executors (no driver-side
  * Faker loop, no rand() whose value depends on partitioning).
  */
object Generator {

  /** Uniform double in [0,1) derived from (seed, id, tag) — stable under
    * repartitioning, unlike `rand()` which is per-partition seeded.
    */
  private def u01(seed: Long, tag: String): Column =
    (pmod(xxhash64(lit(seed), col("id"), lit(tag)), lit(1000000000L)).cast("double")
      / lit(1000000000.0))

  /** Weighted categorical pick (reference tier weights
    * `a1_1_raw_data_faker_generator.py:206`, asset-type weights `:275-276`).
    */
  private def weighted(seed: Long, tag: String, choices: Seq[(String, Double)]): Column = {
    val u = u01(seed, tag)
    val cum = choices.scanLeft(0.0)(_ + _._2).tail
    choices.zip(cum).foldRight(lit(choices.last._1): Column) {
      case (((v, _), bound), acc) => when(u < bound, lit(v)).otherwise(acc)
    }
  }

  /** Synthetic customers: id, tier, risk tolerance, age group, registration
    * date over a trailing window — the shape of `raw_customers`
    * (reference `a1_1:131-204`).
    */
  def customers(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).toDF("id").select(
      concat(lit("CUST-"), lpad(col("id").cast("string"), 8, "0")).as("customer_id"),
      weighted(seed, "tier", Seq(
        "BRONZE" -> 0.40, "SILVER" -> 0.30, "GOLD" -> 0.20, "PLATINUM" -> 0.10)).as("customer_tier"),
      weighted(seed, "risk", Seq(
        "CONSERVATIVE" -> 0.30, "MODERATE" -> 0.50, "AGGRESSIVE" -> 0.20)).as("risk_tolerance"),
      weighted(seed, "age", Seq(
        "18-25" -> 0.15, "26-35" -> 0.30, "36-50" -> 0.30, "51-65" -> 0.18, "65+" -> 0.07)).as("age_group"),
      date_sub(lit("2024-01-31").cast("date"),
        pmod(xxhash64(lit(seed), col("id"), lit("reg")), lit(90)).cast("int")).as("registration_date"))

  /** Synthetic transactions with tier-dependent magnitude (the reference's
    * lot logic `a1_1:323-350`: higher tiers trade larger quantities).
    */
  def transactions(spark: SparkSession, n: Long, nCustomers: Long, seed: Long = 42L): DataFrame = {
    val custId = pmod(xxhash64(lit(seed), col("id"), lit("cust")), lit(nCustomers))
    val tier = weighted(seed, "txtier", Seq(
      "BRONZE" -> 0.40, "SILVER" -> 0.30, "GOLD" -> 0.20, "PLATINUM" -> 0.10))
    val tierMult = when(col("customer_tier") === "PLATINUM", 20.0)
      .when(col("customer_tier") === "GOLD", 10.0)
      .when(col("customer_tier") === "SILVER", 4.0)
      .otherwise(1.0)
    val qty = (u01(seed, "qty") * 100.0 + 1.0)
    val price = (u01(seed, "price") * 990.0 + 10.0)
    spark.range(n).toDF("id").select(
      col("id"),
      concat(lit("TXN-"), lpad(col("id").cast("string"), 10, "0")).as("transaction_id"),
      concat(lit("CUST-"), lpad(custId.cast("string"), 8, "0")).as("customer_id"),
      weighted(seed, "asset", Seq("stock" -> 0.6, "crypto" -> 0.4)).as("asset_type"),
      weighted(seed, "side", Seq("BUY" -> 0.55, "SELL" -> 0.45)).as("transaction_type"),
      tier.as("customer_tier"))
      .withColumn("quantity", round(qty * tierMult, 4))
      .withColumn("price_per_unit", round(price, 2))
      .withColumn("transaction_amount", round(col("quantity") * col("price_per_unit"), 2))
      .withColumn("fee_amount", round(col("transaction_amount") * 0.001, 2))
      .drop("id")
  }
}

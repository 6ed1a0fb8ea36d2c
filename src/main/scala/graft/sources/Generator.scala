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
      // derivable from the id, always well-formed (the email_format_valid
      // DQ test expects the pipeline's own data to be clean)
      concat(lit("cust-"), lpad(col("id").cast("string"), 8, "0"),
        lit("@example.com")).as("email_addr"),
      weighted(seed, "tier", Seq(
        "BRONZE" -> 0.40, "SILVER" -> 0.30, "GOLD" -> 0.20, "PLATINUM" -> 0.10)).as("customer_tier"),
      weighted(seed, "risk", Seq(
        "CONSERVATIVE" -> 0.30, "MODERATE" -> 0.50, "AGGRESSIVE" -> 0.20)).as("risk_tolerance"),
      weighted(seed, "age", Seq(
        "18-25" -> 0.15, "26-35" -> 0.30, "36-50" -> 0.30, "51-65" -> 0.18, "65+" -> 0.07)).as("age_group"),
      date_sub(lit("2024-01-31").cast("date"),
        pmod(xxhash64(lit(seed), col("id"), lit("reg")), lit(90)).cast("int")).as("registration_date"))

  /** Synthetic corporates (reference `a1_1:226-268`): 12-hex ids,
    * LLC/PUBLIC/PRIVATE types, founding years in [1950, 2020].
    */
  def corporates(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    spark.range(n).toDF("id").select(
      upper(substring(md5(concat(lit(seed), lit("|corp|"), col("id"))), 1, 12)).as("company_id"),
      concat(lit("Corp "), col("id").cast("string")).as("company_name"),
      weighted(seed, "ctype", Seq("LLC" -> 0.4, "PRIVATE" -> 0.35, "PUBLIC" -> 0.25)).as("company_type"),
      weighted(seed, "country", Seq("US" -> 0.6, "UK" -> 0.15, "DE" -> 0.15, "JP" -> 0.10)).as("country"),
      (pmod(xxhash64(lit(seed), col("id"), lit("yf")), lit(71)) + 1950).cast("int").as("year_founded"),
      concat(lit("TAX-"), lpad(col("id").cast("string"), 9, "0")).as("tax_number"))

  /** Per-(symbol, day) reference price series shared by every source, so
    * cross-source observations stay inside the reference's 20% variance SLO
    * (`tests/test_price_comparison_variance.sql:28-36`): each source
    * observes base*(1 ± <=5%).
    */
  def cryptoPrices(spark: SparkSession, symbols: Seq[String], days: Int,
      source: String, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val syms = symbols.toDF("symbol")
    val base = pmod(xxhash64(lit(seed), col("symbol")), lit(95000L)).cast("double") + 100.0
    val dayWiggle = (u01x(seed, "day", col("symbol"), col("day")) * 0.2 - 0.1) + 1.0
    val srcJitter = (u01x(seed, "src|" + source, col("symbol"), col("day")) * 0.1 - 0.05) + 1.0
    syms
      .crossJoin(spark.range(days).toDF("day"))
      .select(
        col("symbol"),
        lower(split(col("symbol"), "-").getItem(0)).as("base_currency"),
        lit("USD").as("quote_currency"),
        round(base * dayWiggle * srcJitter, 8).cast("decimal(20,8)").as("price"),
        round(u01x(seed, "vol|" + source, col("symbol"), col("day")) * 1e6, 2)
          .cast("decimal(28,8)").as("volume"),
        lit(source).as("source"),
        timestamp_seconds(lit(1704110400L) + col("day") * 86400L).as("observed_at"))
  }

  /** Daily stock OHLCV honoring low <= open,close <= high
    * (reference `tests/test_stock_price_range_valid.sql`).
    */
  def stockPrices(spark: SparkSession, tickers: Seq[String], days: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val base = pmod(xxhash64(lit(seed), col("symbol")), lit(900L)).cast("double") + 20.0
    val center = base * ((u01x(seed, "sday", col("symbol"), col("day")) * 0.2 - 0.1) + 1.0)
    val spreadUp = u01x(seed, "up", col("symbol"), col("day")) * 0.03
    val spreadDn = u01x(seed, "dn", col("symbol"), col("day")) * 0.03
    tickers.toDF("symbol")
      .crossJoin(spark.range(days).toDF("day"))
      .select(
        col("symbol"),
        date_add(lit("2024-01-01").cast("date"), col("day").cast("int")).as("date"),
        round(center, 8).cast("decimal(20,8)").as("open_price"),
        round(center * (spreadUp + 1.0), 8).cast("decimal(20,8)").as("high_price"),
        round(center * (lit(1.0) - spreadDn), 8).cast("decimal(20,8)").as("low_price"),
        round(center * ((u01x(seed, "cl", col("symbol"), col("day")) * (spreadUp + spreadDn))
          + (lit(1.0) - spreadDn)), 8).cast("decimal(20,8)").as("close_price"),
        round(u01x(seed, "svol", col("symbol"), col("day")) * 1e7, 0)
          .cast("decimal(28,8)").as("volume"),
        // 52-week range straddles the daily band: high in [1.0, 1.5]x,
        // low in [0.5, 0.9]x of center — high > low by construction
        // (reference tests/test_week52_price_range_valid.sql)
        round(center * (u01x(seed, "w52h", col("symbol"), col("day")) * 0.5 + 1.0), 8)
          .cast("decimal(20,8)").as("week_52_high"),
        round(center * (u01x(seed, "w52l", col("symbol"), col("day")) * 0.4 + 0.5), 8)
          .cast("decimal(20,8)").as("week_52_low"))
  }

  /** Crypto news with a keyword pool that exercises the reference's
    * categorize_news macro (`macros/categorize_news.sql:2-7`).
    */
  def news(spark: SparkSession, tickers: Seq[String], perTicker: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val theme = weighted(seed, "theme", Seq(
      "price surge rally" -> 0.3, "regulation lawsuit sec" -> 0.2,
      "adoption partnership launch" -> 0.3, "hack exploit breach" -> 0.2))
    tickers.toDF("ticker")
      .crossJoin(spark.range(perTicker).toDF("id"))
      .select(
        upper(col("ticker")).as("ticker"),
        lit("CRYPTO").as("asset_type"),
        concat(lit("https://news.example.com/"), lower(col("ticker")), lit("/"),
          col("id").cast("string")).as("url"),
        concat(upper(col("ticker")), lit(" "), theme).as("title"),
        concat(lit("story about "), lower(col("ticker"))).as("description"),
        concat(lit("https://img.example.com/"), lower(col("ticker")), lit("/"),
          col("id").cast("string"), lit(".jpg")).as("image"),
        timestamp_seconds(lit(1704182400L)
          + pmod(xxhash64(lit(seed), col("ticker"), col("id")), lit(20)) * 86400L).as("date"))
  }

  /** u01 keyed by two columns (symbol/day style grids). */
  private def u01x(seed: Long, tag: String, a: Column, b: Column): Column =
    (pmod(xxhash64(lit(seed), a, b, lit(tag)), lit(1000000000L)).cast("double")
      / lit(1000000000.0))

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
      // symbol pool consistent with the sampled asset_type (J2 joins on
      // (symbol, upper(type)) — a mismatched pair would never resolve)
      when(weighted(seed, "asset", Seq("stock" -> 0.6, "crypto" -> 0.4)) === "stock",
        weighted(seed, "ssym", Seq("AAPL" -> 0.4, "MSFT" -> 0.35, "NVDA" -> 0.25)))
        .otherwise(weighted(seed, "csym", Seq("BTC-USD" -> 0.6, "ETH-USD" -> 0.4)))
        .as("asset_symbol"),
      weighted(seed, "side", Seq("BUY" -> 0.55, "SELL" -> 0.45)).as("transaction_type"),
      weighted(seed, "custtype", Seq("PERSONAL" -> 0.8, "CORPORATE" -> 0.2)).as("customer_type"),
      tier.as("customer_tier"),
      weighted(seed, "txrisk", Seq(
        "CONSERVATIVE" -> 0.30, "MODERATE" -> 0.50, "AGGRESSIVE" -> 0.20)).as("customer_risk_tolerance"),
      lit("BATCH_DATA").as("data_source"),
      timestamp_seconds(lit(1704067200L)
        + pmod(xxhash64(lit(seed), col("id"), lit("txd")), lit(20)) * 86400L
        + pmod(xxhash64(lit(seed), col("id"), lit("txh")), lit(24)) * 3600L)
        .as("transaction_timestamp"))
      .withColumn("data_date", to_date(col("transaction_timestamp")))
      .withColumn("quantity", round(qty * tierMult, 4))
      .withColumn("price_per_unit", round(price, 2))
      .withColumn("transaction_amount", round(col("quantity") * col("price_per_unit"), 2))
      .withColumn("fee_amount", round(col("transaction_amount") * 0.001, 2))
      .drop("id")
  }
}

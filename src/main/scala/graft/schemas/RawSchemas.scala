package graft.schemas

import org.apache.spark.sql.types._

/** Canonical schemas for the reference's nine raw tables — always passed
  * explicitly to readers (never `inferSchema`; SURVEY §1.3), decimal
  * precision preserved exactly for hash-parity with any SQL oracle.
  *
  * Sources of truth in the reference:
  *   - transactions: `scripts/data_generation/a1_5_batch_s3_to_postgres.py:121-144`
  *     (Kafka variant `scripts/kafka/kafka_consumer.py:106-150`)
  *   - customers `a1_5:147-167`, corporates `a1_5:170-187`, news `a1_5:189-204`
  *   - crypto prices `a2_0_crypto_common.py:121-131`, stock prices
  *     `a3_0_stock_common.py:178-202`
  */
object RawSchemas {

  private def s(n: String) = StructField(n, StringType)
  private def ts(n: String, nullable: Boolean = true) = StructField(n, TimestampType, nullable)
  private def d(n: String) = StructField(n, DateType)

  /** raw_transaction_personal / raw_transaction_corporate (17 cols). */
  val transactions: StructType = StructType(Seq(
    s("transaction_id"), s("customer_id"), s("asset_type"), s("asset_symbol"),
    s("transaction_type"),
    StructField("quantity", DecimalType(20, 8)),
    StructField("price_per_unit", DecimalType(20, 8)),
    StructField("transaction_amount", DecimalType(20, 2)),
    StructField("fee_amount", DecimalType(20, 2)),
    ts("transaction_timestamp"), d("data_date"),
    s("customer_tier"), s("customer_risk_tolerance"), s("customer_type"),
    s("data_source"), ts("load_timestamp", nullable = false), s("source")))

  /** raw_customers (14 cols; PK (customer_id, load_timestamp)). */
  val customers: StructType = StructType(Seq(
    s("customer_id"), s("first_name"), s("last_name"), s("email"), s("phone"),
    s("gender"), s("age_group"), s("customer_tier"), s("risk_tolerance"),
    s("customer_type"), d("registration_date"), s("company_id"),
    s("data_source"), ts("load_timestamp", nullable = false)))

  /** raw_corporates (11 cols; PK (company_id, load_timestamp)). */
  val corporates: StructType = StructType(Seq(
    s("company_id"), s("company_name"), s("industry"),
    StructField("year_founded", IntegerType), s("tax_number"),
    s("office_primary_location"), s("contact_email"), s("contact_phone"),
    s("data_source"), ts("load_timestamp", nullable = false), s("source")))

  /** raw_news (PK (ticker, url, load_timestamp); scraper's `cryptocurrency`
    * is renamed to upper-cased `ticker`, asset_type defaults 'CRYPTO').
    */
  val news: StructType = StructType(Seq(
    s("ticker"), s("asset_type"), s("url"), s("title"), s("description"),
    ts("date"), s("image"), ts("load_timestamp", nullable = false), s("source")))

  /** raw_cryptoprices_{binance,coingecko,yfinance,freecryptoapi} (8 cols). */
  val cryptoPrices: StructType = StructType(Seq(
    s("symbol"), s("base_currency"), s("quote_currency"),
    StructField("price", DecimalType(20, 8)),
    StructField("volume", DecimalType(28, 8)),
    s("source"), ts("observed_at"), ts("load_timestamp", nullable = false)))

  /** raw_stock_prices_yfinance (21-col OHLCV + fundamentals). */
  val stockPrices: StructType = StructType(Seq(
    s("symbol"), d("date"),
    StructField("open_price", DecimalType(20, 8)),
    StructField("high_price", DecimalType(20, 8)),
    StructField("low_price", DecimalType(20, 8)),
    StructField("close_price", DecimalType(20, 8)),
    StructField("volume", DecimalType(28, 8)),
    s("currency"), s("exchange"), s("sector"), s("industry"),
    StructField("market_cap", DecimalType(28, 2)),
    StructField("pe_ratio", DecimalType(20, 8)),
    StructField("dividend_yield", DecimalType(20, 8)),
    StructField("week52_high", DecimalType(20, 8)),
    StructField("week52_low", DecimalType(20, 8)),
    StructField("avg_volume", DecimalType(28, 8)),
    s("long_name"), s("short_name"), s("data_source"),
    ts("load_timestamp", nullable = false)))

  /** The static asset_info seed — columns exactly as documented in the
    * reference (`seeds/seeds.yml:15-35`): symbol, type, name, category,
    * class, market-cap bucket, sector.
    */
  val assetInfo: StructType = StructType(Seq(
    s("asset_symbol"), s("asset_type"), s("asset_name"), s("asset_category"),
    s("asset_class"), s("market_cap_category"), s("sector")))

  /** All nine raw tables by name (the engine's table catalog). */
  val all: Map[String, StructType] = Map(
    "raw_transaction_personal" -> transactions,
    "raw_transaction_corporate" -> transactions,
    "raw_customers" -> customers,
    "raw_corporates" -> corporates,
    "raw_news" -> news,
    "raw_cryptoprices_binance" -> cryptoPrices,
    "raw_cryptoprices_coingecko" -> cryptoPrices,
    "raw_cryptoprices_yfinance" -> cryptoPrices,
    "raw_cryptoprices_freecryptoapi" -> cryptoPrices,
    "raw_stock_prices_yfinance" -> stockPrices)
}

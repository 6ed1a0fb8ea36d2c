package graft.vault

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{Dedup, EventWindows, Scd2}

/** The reference's complete named model DAG (`models/`): 5 hubs, 5 links,
  * 7 satellites, 3 ephemerals, 9 marts, semantic views — each dbt SQL file
  * re-expressed as one DataFrame function with the same grain, keys, and
  * semantics (file citations inline). `Raw` carries the nine raw-table
  * inputs; every model is a pure function, so the DAG composes lazily and
  * Catalyst optimizes across model boundaries (the reference's ephemeral
  * inlining for free — SURVEY §4).
  */
object Models {

  def apply(raw: Raw): Models = new Models(raw)

  /** The nine raw tables (SURVEY §1.2). Crypto price maps are keyed by
    * source name (binance/coingecko/yfinance/...).
    */
  final case class Raw(
      transactionPersonal: DataFrame,
      transactionCorporate: DataFrame,
      customers: DataFrame,
      corporates: DataFrame,
      news: DataFrame,
      cryptoPrices: Map[String, DataFrame],
      stockPrices: DataFrame)
}

/** One DAG instantiation over a Raw input: every model is a lazy val, so
  * shared upstream models (hubs, price sats, facts) are constructed once
  * per run however many downstream marts reference them — and a caller can
  * `.persist()` any lazy val before materializing several dependents.
  */
final class Models(val raw: Models.Raw) {
  import Models.Raw

  // ---------------------------------------------------------------- hubs

  /** hub_customer.sql:9-36 — W1 earliest-wins over customer_id + md5 key. */
  lazy val hubCustomer: DataFrame =
    DataVault.hub(raw.customers, Seq("customer_id"), "customer_hk",
      "load_timestamp", col("source"), Seq(col("load_timestamp"), col("customer_id")))

  /** hub_company.sql:17-37. */
  lazy val hubCompany: DataFrame =
    DataVault.hub(raw.corporates, Seq("company_id"), "company_hk",
      "load_timestamp", col("source"), Seq(col("load_timestamp"), col("company_id")))

  /** hub_transaction.sql:13-60 — union of personal+corporate first (U2). */
  lazy val hubTransaction: DataFrame =
    DataVault.hub(
      raw.transactionPersonal.unionByName(raw.transactionCorporate),
      Seq("transaction_id"), "transaction_hk",
      "load_timestamp", col("source"), Seq(col("load_timestamp"), col("transaction_id")))

  /** hub_news.sql:15-37 — grain (ticker, url). */
  lazy val hubNews: DataFrame =
    DataVault.hub(raw.news, Seq("ticker", "url"), "news_hk",
      "load_timestamp", col("source"), Seq(col("load_timestamp"), col("url")))

  /** ephemeral_asset.sql:5-65 (U1) — all assets across price sources +
    * transactions, typed and deduped; hub_asset.sql:21-44 keys it.
    */
  lazy val ephemeralAsset: DataFrame = {
    val fromCrypto = raw.cryptoPrices.values.map(
      _.select(upper(col("symbol")).as("asset_symbol"), lit("CRYPTO").as("asset_type")))
      .reduce(_ unionByName _)
    val fromStock = raw.stockPrices
      .select(upper(col("symbol")).as("asset_symbol"), lit("STOCK").as("asset_type"))
    val fromTx = raw.transactionPersonal.unionByName(raw.transactionCorporate)
      .select(upper(col("asset_symbol")).as("asset_symbol"), upper(col("asset_type")).as("asset_type"))
    fromCrypto.unionByName(fromStock).unionByName(fromTx).distinct()
  }

  /** hub_asset.sql:21-44 — key over (symbol, type). */
  lazy val hubAsset: DataFrame =
    ephemeralAsset.select(
      Hashing.surrogateKey(col("asset_symbol"), col("asset_type")).as("asset_hk"),
      col("asset_symbol"), col("asset_type"))

  // --------------------------------------------------------------- links

  /** link_customer_transaction.sql:15-85 (J1 over the U2 union). */
  lazy val linkCustomerTransaction: DataFrame =
    DataVault.link(
      raw.transactionPersonal.unionByName(raw.transactionCorporate),
      Seq("customer_hk" -> Seq("customer_id"), "transaction_hk" -> Seq("transaction_id")),
      "link_customer_transaction_hk", "load_timestamp", col("source"),
      Seq(col("load_timestamp"), col("transaction_id")))

  /** link_transaction_asset.sql:15-66 (J2 case-normalized). */
  lazy val linkTransactionAsset: DataFrame = {
    val tx = raw.transactionPersonal.unionByName(raw.transactionCorporate)
      .withColumn("asset_symbol", upper(col("asset_symbol")))
      .withColumn("asset_type", upper(col("asset_type")))
    DataVault.link(tx,
      Seq("transaction_hk" -> Seq("transaction_id"),
        "asset_hk" -> Seq("asset_symbol", "asset_type")),
      "link_transaction_asset_hk", "load_timestamp", col("source"),
      Seq(col("load_timestamp"), col("transaction_id")))
  }

  /** link_customer_company.sql:23-40 — only customers with a company. */
  lazy val linkCustomerCompany: DataFrame =
    DataVault.link(raw.customers.filter(col("company_id").isNotNull),
      Seq("customer_hk" -> Seq("customer_id"), "company_hk" -> Seq("company_id")),
      "link_customer_company_hk", "load_timestamp", col("source"),
      Seq(col("load_timestamp"), col("customer_id")))

  /** link_news_asset.sql:33-47 (J2). */
  lazy val linkNewsAsset: DataFrame =
    DataVault.link(raw.news.withColumn("ticker", upper(col("ticker")))
      .withColumn("asset_type", upper(col("asset_type"))),
      Seq("news_hk" -> Seq("ticker", "url"), "asset_hk" -> Seq("ticker", "asset_type")),
      "link_news_asset_hk", "load_timestamp", col("source"),
      Seq(col("load_timestamp"), col("url")))

  // ---------------------------------------------------------- satellites

  /** sat_customer_profile.sql:41-75 — insert-only attribute history. */
  lazy val satCustomerProfile: DataFrame =
    DataVault.satellite(raw.customers, Seq("customer_id"), "customer_hk",
      Seq("customer_tier", "risk_tolerance", "age_group"), "load_timestamp")

  /** sat_company_details.sql:41-75. */
  lazy val satCompanyDetails: DataFrame =
    DataVault.satellite(raw.corporates, Seq("company_id"), "company_hk",
      Seq("company_name", "company_type", "country", "year_founded"), "load_timestamp")

  /** sat_transaction_personal.sql:41-93 / sat_transaction_corp.sql. */
  def satTransaction(tx: DataFrame): DataFrame =
    DataVault.satellite(tx, Seq("transaction_id"), "transaction_hk",
      Seq("asset_type", "asset_symbol", "transaction_type", "quantity",
        "price_per_unit", "transaction_amount", "fee_amount",
        "transaction_timestamp"),
      "load_timestamp")

  /** ephemeral_sat_transaction_full.sql:4-6 (U5 union distinct). */
  lazy val ephemeralSatTransactionFull: DataFrame =
    satTransaction(raw.transactionPersonal)
      .union(satTransaction(raw.transactionCorporate)).distinct()

  /** sat_asset_price_crypto.sql:15-103 (U3 of the crypto sources). */
  lazy val satAssetPriceCrypto: DataFrame =
    raw.cryptoPrices.values.map(
      _.select(
        Hashing.surrogateKey(upper(col("symbol")), lit("CRYPTO")).as("asset_hk"),
        col("price"), col("volume"), upper(col("source")).as("price_source"),
        col("observed_at"),
        Hashing.hashdiff(col("price"), col("volume"), col("observed_at")).as("hashdiff")))
      .reduce(_ unionByName _)

  /** sat_asset_price_stock.sql:15-91. */
  lazy val satAssetPriceStock: DataFrame =
    raw.stockPrices.select(
      Hashing.surrogateKey(upper(col("symbol")), lit("STOCK")).as("asset_hk"),
      col("open_price"), col("high_price"), col("low_price"), col("close_price"),
      col("volume"), col("date").as("price_date"),
      Hashing.hashdiff(col("close_price"), col("volume"), col("date")).as("hashdiff"))

  /** sat_news_content.sql:17-63 + categorize_news macro
    * (`macros/categorize_news.sql:2-7`).
    */
  lazy val satNewsContent: DataFrame =
    raw.news.select(
      Hashing.surrogateKey(upper(col("ticker")), col("url")).as("news_hk"),
      col("title"), col("description"), col("date").as("published_date"),
      when(lower(col("title")).like("%surge%") || lower(col("title")).like("%rally%"), "PRICE_MOVEMENT")
        .when(lower(col("title")).like("%regulation%") || lower(col("title")).like("%sec%"), "REGULATORY")
        .when(lower(col("title")).like("%hack%") || lower(col("title")).like("%breach%"), "SECURITY")
        .otherwise("GENERAL").as("news_category"),
      Hashing.hashdiff(col("title"), col("description")).as("hashdiff"))

  // --------------------------------------------------------------- marts

  /** dim_company.sql:29-51 — W2 latest-wins snapshot. */
  lazy val dimCompany: DataFrame =
    Dedup.latestRows(raw.corporates, Seq("company_id"),
      Seq(col("load_timestamp").desc, col("company_id")))
      .select(
        Hashing.surrogateKey(col("company_id")).as("company_hk"),
        col("company_id"), col("company_name"), col("company_type"),
        col("country"), col("year_founded"))

  /** dim_customer_history.sql:28-77 — SCD2 over profile versions (W3). */
  lazy val dimCustomerHistory: DataFrame =
    Scd2.intervals(
      raw.customers.select(
        Hashing.surrogateKey(col("customer_id")).as("customer_hk"),
        col("customer_id"), col("customer_tier"), col("risk_tolerance"),
        col("load_timestamp")),
      Seq("customer_id"), "load_timestamp", Seq(col("load_timestamp")))
      .drop("load_timestamp")

  /** dim_customer.sql:27 — current versions only (P5). */
  lazy val dimCustomer: DataFrame =
    Scd2.current(dimCustomerHistory)

  /** dim_asset.sql:36-105 — hub + latest observed price per asset (W2+U4+J5). */
  lazy val dimAsset: DataFrame = {
    val cryptoLatest = Dedup.latestRows(
      satAssetPriceCrypto, Seq("asset_hk"),
      Seq(col("observed_at").desc, col("price_source").desc))
      .select(col("asset_hk"), col("price").as("latest_price"))
    val stockLatest = Dedup.latestRows(
      satAssetPriceStock, Seq("asset_hk"),
      Seq(col("price_date").desc))
      .select(col("asset_hk"), col("close_price").as("latest_price"))
    hubAsset.join(cryptoLatest.unionByName(stockLatest), Seq("asset_hk"), "left")
  }

  /** fct_transactions.sql:32-43 — 4-way star assembly (J4). */
  lazy val fctTransactions: DataFrame =
    linkCustomerTransaction
      .select("customer_hk", "transaction_hk")
      .join(ephemeralSatTransactionFull, Seq("transaction_hk"))
      .join(broadcast(hubCustomer.select("customer_hk", "customer_id")), Seq("customer_hk"))

  /** fct_asset_prices.sql:12-53 — U4 harmonized crypto+stock prices. */
  lazy val fctAssetPrices: DataFrame = {
    val crypto = satAssetPriceCrypto.select(
      col("asset_hk"), col("price"),
      lit(null).cast("decimal(20,8)").as("open_price"),
      lit(null).cast("decimal(20,8)").as("close_price"),
      col("volume"), col("price_source"),
      to_date(col("observed_at")).as("price_date"))
    val stock = satAssetPriceStock.select(
      col("asset_hk"),
      lit(null).cast("decimal(20,8)").as("price"),
      col("open_price"), col("close_price"), col("volume"),
      lit("YFINANCE").as("price_source"), col("price_date"))
    crypto.unionByName(stock)
  }

  /** fct_news_events.sql:22-29 — news ⋈ link ⋈ asset (3-way). */
  lazy val fctNewsEvents: DataFrame =
    linkNewsAsset.select("news_hk", "asset_hk")
      .join(satNewsContent.drop("hashdiff"), Seq("news_hk"))
      .join(broadcast(hubAsset), Seq("asset_hk"))

  /** fct_asset_price_comparison.sql:9-32 — A1 daily avg + A2 fixed pivot. */
  lazy val fctAssetPriceComparison: DataFrame =
    satAssetPriceCrypto
      .groupBy(col("asset_hk"), to_date(col("observed_at")).as("price_date"))
      .pivot("price_source", Seq("BINANCE", "COINGECKO", "YFINANCE"))
      .agg(avg(col("price")))
      .withColumnsRenamed(Map(
        "BINANCE" -> "binance_price", "COINGECKO" -> "coingecko_price",
        "YFINANCE" -> "yfinance_price"))

  /** fct_asset_news_impact.sql:20-88 — J6 event windows at t0/t1/t3/t7 +
    * derived returns.
    */
  lazy val fctAssetNewsImpact: DataFrame = {
    val dailyPrices = fctAssetPrices
      .withColumn("p", coalesce(col("price"), col("close_price")))
      .groupBy(col("asset_hk"), col("price_date"))
      .agg(avg(col("p")).as("daily_price"))
    val newsDates = fctNewsEvents
      .select(col("asset_hk"), col("news_hk"), to_date(col("published_date")).as("news_date"))
    val ret = (a: Column, b: Column) => (a - b) / nullif(b, lit(0))
    EventWindows.impactJoin(newsDates, dailyPrices, Seq("asset_hk"),
      "news_date", "price_date", "daily_price", Seq(0, 1, 3, 7))
      .withColumn("return_1d", ret(col("v_t1"), col("v_t0")))
      .withColumn("return_3d", ret(col("v_t3"), col("v_t0")))
      .withColumn("return_7d", ret(col("v_t7"), col("v_t0")))
      .filter(col("v_t0").isNotNull)
  }

  // ------------------------------------------------------------ semantic

  /** semantic_customer_overview.sql:9-46 — A3 KPI rollup + J5 + P7. */
  lazy val semanticCustomerOverview: DataFrame =
    fctTransactions
      .groupBy(col("customer_hk"), col("customer_id"))
      .agg(
        count(lit(1)).as("total_transactions"),
        sum(col("transaction_amount").cast("decimal(20,2)")).as("total_amount"),
        sum(col("fee_amount").cast("decimal(20,2)")).as("total_fees"),
        max(col("transaction_timestamp")).as("last_transaction_at"))
      .join(dimCustomer.select(col("customer_id"), col("customer_tier"), col("risk_tolerance")),
        Seq("customer_id"), "left")

  /** semantic_transactions.sql:41-45 — fact + asset dim flat view (J2+J5). */
  lazy val semanticTransactions: DataFrame = {
    val assets = hubAsset
      .withColumnRenamed("asset_symbol", "hub_symbol")
      .withColumnRenamed("asset_type", "hub_type")
    fctTransactions
      .join(broadcast(assets),
        upper(col("asset_symbol")) === col("hub_symbol") &&
          upper(col("asset_type")) === col("hub_type"), "left")
      .drop("hub_symbol", "hub_type")
  }

  /** semantic_asset_overview-style rollup over prices + news counts. */
  lazy val semanticAssetOverview: DataFrame = {
    val newsCounts = fctNewsEvents.groupBy(col("asset_hk"))
      .agg(count(lit(1)).as("n_news"))
    dimAsset.join(newsCounts, Seq("asset_hk"), "left")
      .withColumn("n_news", coalesce(col("n_news"), lit(0L)))
  }
}

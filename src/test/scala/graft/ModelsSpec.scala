package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Generator
import graft.vault.Models

/** The reference's complete named model DAG over generated
  * reference-shaped raw tables — grain, key, and semantic checks per model
  * family (the dbt schema-test equivalents).
  */
class ModelsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val s = TestSpark.spark
  private val loadTs = lit("2024-01-21 20:00:00").cast("timestamp")
  private val cryptoSyms = Seq("BTC-USD", "ETH-USD")
  private val stockSyms = Seq("AAPL", "MSFT", "NVDA")

  private def stamp(df: DataFrame) =
    df.withColumn("load_timestamp", loadTs).withColumn("source", lit("BATCH_DATA"))

  private lazy val raw = {
    val tx = Generator.transactions(s, 800, nCustomers = 150)
      .withColumn("load_timestamp", loadTs).withColumn("source", lit("BATCH_DATA"))
    val corp = stamp(Generator.corporates(s, 40))
    Models.Raw(
      transactionPersonal = tx.filter($"customer_type" === "PERSONAL"),
      transactionCorporate = tx.filter($"customer_type" === "CORPORATE"),
      customers = stamp(Generator.customers(s, 150))
        .withColumn("company_id",
          when(pmod(xxhash64($"customer_id"), lit(5)) === 0,
            upper(substring(md5(concat(lit(42L), lit("|corp|"),
              pmod(xxhash64($"customer_id"), lit(40)))), 1, 12)))),
      corporates = corp,
      news = stamp(Generator.news(s, cryptoSyms, perTicker = 10)),
      // price feeds keep their own `source` column (= feed name, reference
      // a2_0 schema) — only the load timestamp is stamped
      cryptoPrices = Map(
        "binance" -> Generator.cryptoPrices(s, cryptoSyms, 21, "binance").withColumn("load_timestamp", loadTs),
        "coingecko" -> Generator.cryptoPrices(s, cryptoSyms, 21, "coingecko").withColumn("load_timestamp", loadTs),
        "yfinance" -> Generator.cryptoPrices(s, cryptoSyms, 21, "yfinance").withColumn("load_timestamp", loadTs)),
      stockPrices = Generator.stockPrices(s, stockSyms, 21).withColumn("load_timestamp", loadTs))
  }

  private lazy val models = Models(raw)

  test("hubs: one row per business key, 32-hex md5 keys") {
    assert(models.hubCustomer.count() === 150)
    assert(models.hubTransaction.count() === 800)
    val asset = models.hubAsset
    assert(asset.count() === asset.select("asset_hk").distinct().count())
    assert(asset.filter(!$"asset_hk".rlike("^[0-9a-f]{32}$")).count() === 0)
    // all five traded symbols + price-feed symbols resolve to assets
    assert(asset.count() >= 5)
  }

  test("links resolve every transaction to a customer and an asset") {
    assert(models.linkCustomerTransaction.count() === 800)
    val lta = models.linkTransactionAsset
    assert(lta.count() === 800)
    // every link's asset_hk exists in hub_asset (relationships test)
    val orphans = lta.join(models.hubAsset.select("asset_hk"), Seq("asset_hk"), "left_anti")
    assert(orphans.count() === 0)
  }

  test("satellites carry hashdiffs; crypto price sat unions 3 sources") {
    val sat = models.satAssetPriceCrypto
    assert(sat.count() === 2 * 21 * 3)
    assert(sat.select("price_source").distinct().count() === 3)
    assert(models.satNewsContent
      .filter(!$"hashdiff".rlike("^[0-9a-f]{32}$")).count() === 0)
  }

  test("fct_transactions keeps transaction grain; fct_asset_prices harmonizes") {
    assert(models.fctTransactions.count() === 800)
    val fap = models.fctAssetPrices
    assert(fap.filter($"price".isNull && $"close_price".isNull).count() === 0)
    assert(fap.count() === (2 * 21 * 3) + (3 * 21))
  }

  test("price comparison pivot: one row per asset-day, sources within 20%") {
    val cmp = models.fctAssetPriceComparison
    assert(cmp.count() === 2 * 21)
    val spread = cmp.filter(
      abs($"binance_price" - $"coingecko_price") / $"binance_price" > 0.2)
    assert(spread.count() === 0)
  }

  test("news impact: t0 present, derived returns consistent") {
    val impact = models.fctAssetNewsImpact
    assert(impact.count() > 0)
    val bad = impact.filter($"v_t1".isNotNull &&
      abs($"return_1d" - ($"v_t1" - $"v_t0") / $"v_t0") > 1e-4)
    assert(bad.count() === 0)
  }

  test("scd2 dim: current view has exactly one row per customer") {
    val cur = models.dimCustomer
    assert(cur.count() === 150)
    assert(cur.filter(!$"is_current").count() === 0)
  }

  test("all 20 ported reference DQ tests return zero violations") {
    val results = graft.quality.Checks.summary(graft.quality.ReferenceTests.all(models))
      .as[(String, Long)].collect()
    assert(results.length >= 20)
    val failing = results.filter(_._2 > 0)
    assert(failing.isEmpty, s"failing: ${failing.mkString(", ")}")
  }

  test("semantic overview reconciles with the raw transaction totals") {
    val overview = models.semanticCustomerOverview
    val expectedTotal = raw.transactionPersonal.unionByName(raw.transactionCorporate)
      .agg(sum($"transaction_amount".cast("decimal(20,2)"))).as[java.math.BigDecimal].head()
    val gotTotal = overview.agg(sum($"total_amount")).as[java.math.BigDecimal].head()
    assert(gotTotal === expectedTotal)
    assert(models.semanticAssetOverview.filter($"n_news" > 0).count() === 2)
  }
}

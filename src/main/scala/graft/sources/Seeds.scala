package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schemas.RawSchemas

/** Static seed tables — the engine's equivalent of the reference's dbt
  * seed layer (`seeds/seeds.yml`, loaded by `dbt seed`).
  *
  * `asset_info` classifies assets with consistent attributes (type, class,
  * category, market-cap bucket, sector — `seeds/seeds.yml:15-35`). The
  * reference ships the schema + ticker lists (`seeds/cryptolist.txt`,
  * `seeds/stocklist.txt`); here the rows are derived deterministically per
  * symbol so every attribute is stable across runs and engines. A real
  * deployment would load the curated CSV through `CsvSource` with
  * `RawSchemas.assetInfo` instead.
  */
object Seeds {

  /** Build the asset_info seed for the given (symbol, type) pairs. */
  def assetInfo(spark: SparkSession, assets: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val base = assets.toDF("asset_symbol", "asset_type")
      .withColumn("asset_type", upper(col("asset_type")))
    val isCrypto = col("asset_type") === "CRYPTO"
    val sectors = Seq("Technology", "Financials", "Energy", "Healthcare", "Industrials")
    val caps = Seq("Large Cap", "Mid Cap", "Small Cap")
    def pick(choices: Seq[String], tag: String) =
      choices.zipWithIndex.foldRight(lit(choices.last)) { case ((v, i), acc) =>
        when(pmod(xxhash64(col("asset_symbol"), lit(tag)), lit(choices.size)) === i, lit(v))
          .otherwise(acc)
      }
    base.select(
      col("asset_symbol"),
      col("asset_type"),
      concat(initcap(lower(regexp_replace(col("asset_symbol"), "-USD$", ""))),
        when(isCrypto, lit(" Network")).otherwise(lit(" Inc."))).as("asset_name"),
      when(isCrypto, lit("Crypto Market")).otherwise(lit("Stock Market")).as("asset_category"),
      when(isCrypto, lit("Cryptocurrency")).otherwise(lit("Equity")).as("asset_class"),
      when(isCrypto, lit("Large Cap")).otherwise(pick(caps, "cap")).as("market_cap_category"),
      when(isCrypto, lit("Blockchain")).otherwise(pick(sectors, "sector")).as("sector"))
  }
}

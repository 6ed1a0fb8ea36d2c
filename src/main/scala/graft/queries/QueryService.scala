package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized ad-hoc query builders — the engine's equivalent of the
  * reference's six chatbot SQL tools
  * (`scripts/chatbot/warehouse_tools.py:140-449`): each tool is a function
  * from typed parameters to a lazy DataFrame over the semantic layer.
  *
  * Scale notes: every builder pushes its filters into the scan (predicate
  * pushdown visible in `.explain`), and every top-k is `orderBy().limit(n)`
  * which Catalyst plans as TakeOrderedAndProject — no global sort
  * materializes.
  */
object QueryService {

  /** Filtered lookup with case-insensitive name search + recency top-k
    * (reference `warehouse_tools.py:140-213`).
    */
  def searchOrders(
      orders: DataFrame,
      customers: DataFrame,
      namePattern: String,
      status: Option[String],
      limit: Int): DataFrame = {
    val base = orders
      .join(customers, orders("o_custkey") === customers("c_custkey"))
      .filter(lower(col("c_name")).contains(namePattern.toLowerCase))
    status.fold(base)(st => base.filter(col("o_orderstatus") === st))
      .select(col("o_orderkey"), col("c_name"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      .limit(limit)
  }

  /** Recent observations for one entity (reference `:216-266`). */
  def recentEvents(events: DataFrame, userId: String, sinceDays: Int,
      asOf: Column, limit: Int): DataFrame =
    events
      .filter(col("user_id") === userId)
      .filter(to_date(col("ts")) >= date_sub(to_date(asOf), sinceDays))
      .orderBy(col("ts").desc, col("event_id"))
      .limit(limit)

  /** Grouped KPI summary with a caller-chosen group key + count distinct
    * (reference `:269-310`).
    */
  def kpiSummary(orders: DataFrame, groupCol: String, limit: Int): DataFrame =
    orders
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_amount"))
      .orderBy(col("total_amount").desc, col(groupCol))
      .limit(limit)

  /** Lag-based trend with percent change for one entity (reference
    * `:313-349`); partitioned by the entity even though pre-filtered, so the
    * same plan works unfiltered at scale.
    */
  def valueTrend(events: DataFrame, userId: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id") === userId)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("pct_change",
        (col("value") - col("prev_value")) / nullif(col("prev_value"), lit(0.0)) * 100.0)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("prev_value"), col("pct_change"))
  }

  /** Entity search by case-insensitive substring (reference `:393-438`). */
  def searchCustomers(customers: DataFrame, pattern: String, limit: Int): DataFrame =
    customers
      .filter(lower(col("c_name")).contains(pattern.toLowerCase))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
      .limit(limit)

  /** Recent asset prices with optional symbol/type filters (reference
    * `warehouse_tools.py:216-266`, the `query_asset_prices` tool): a
    * days-bounded recency scan over a price-observation mart, newest first.
    * Expects columns (asset_symbol, asset_type, observed_at, price, volume)
    * plus a unique tiebreak so the top-k selection is deterministic.
    * Both filters and the date bound push into the scan; the top-k is
    * TakeOrderedAndProject.
    */
  def recentPrices(
      prices: DataFrame,
      symbol: Option[String],
      assetType: Option[String],
      sinceDays: Int,
      asOf: Column,
      limit: Int,
      tiebreak: Seq[Column]): DataFrame = {
    val bySymbol = symbol.fold(prices)(sy => prices.filter(col("asset_symbol") === sy))
    val byType = assetType.fold(bySymbol)(ty => bySymbol.filter(col("asset_type") === ty))
    byType
      .filter(to_date(col("observed_at")) >= date_sub(to_date(asOf), sinceDays))
      .orderBy(col("observed_at").desc +: tiebreak: _*)
      .limit(limit)
      .select(col("asset_symbol"), col("asset_type"), col("observed_at"),
        col("price"), col("volume"))
  }
}

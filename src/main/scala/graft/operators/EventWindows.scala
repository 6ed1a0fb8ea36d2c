package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-window ("impact") join: attach a measure observed at fixed day
  * offsets after an anchor event.
  *
  * Reference semantics (`models/marts/fct_asset_news_impact.sql:41-74` — J6
  * in SURVEY §2.4): 4 left joins of news × daily_prices on
  * `p.price_date = dateadd(day, k, n.news_date)` for k ∈ {0,1,3,7}.
  *
  * Spark-first design: instead of N sequential joins (N shuffles, N plan
  * branches over the same daily table), explode the offset list on the
  * anchor side (cheap row multiplication, no shuffle), join ONCE on the
  * shifted date, and pivot the offsets back to columns (fixed pivot values →
  * deterministic schema, single shuffle). At 100 TB this turns 4 scans +
  * 4 shuffles of the daily relation into 1 + 1 — and when the daily
  * aggregate is small (dates × keys), Catalyst/AQE broadcasts it, leaving
  * only the pivot aggregation shuffle.
  */
object EventWindows {

  /** @param anchors  one row per anchor event; must contain `anchorDateCol`
    * @param daily    one row per (joinKeys, dateCol) with `valueCol`
    * @param offsets  day offsets, e.g. Seq(0, 1, 3, 7)
    * @return anchors with one `v_t{k}` column per offset
    */
  def impactJoin(
      anchors: DataFrame,
      daily: DataFrame,
      joinKeys: Seq[String],
      anchorDateCol: String,
      dateCol: String,
      valueCol: String,
      offsets: Seq[Int]): DataFrame = {

    val anchorCols = anchors.columns.toSeq
    val exploded = anchors.withColumn("__k", explode(lit(offsets.toArray)))
      .withColumn("__probe_date", expr(s"date_add($anchorDateCol, __k)"))

    val joined = exploded.join(
      daily.withColumnRenamed(dateCol, "__probe_date").withColumnRenamed(valueCol, "__v"),
      joinKeys :+ "__probe_date", "left")

    joined
      .groupBy(anchorCols.map(col): _*)
      .pivot("__k", offsets)
      .agg(first(col("__v")))
      .select(anchorCols.map(col) ++ offsets.map(k => col(k.toString).as(s"v_t$k")): _*)
  }
}

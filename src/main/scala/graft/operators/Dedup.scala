package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-scoped deduplication operators.
  *
  * Reproduces the reference's signature dedup shapes:
  *   - earliest-wins `row_number() over (partition by key order by ts asc)=1`
  *     (reference `models/warehouse/hubs/hub_customer.sql:16-32` — W1 in
  *     SURVEY §2.6), used by every hub/link;
  *   - latest-wins desc variant (`models/marts/dim_company.sql:29-51` — W2).
  *
  * Scale notes: a single hash-partition shuffle on the keys; no sort of the
  * whole relation (window sort is per-partition). For heavily skewed keys the
  * caller can pre-salt, but dedup keys here are business keys with bounded
  * fan-in. When only the *key* (not the full first row) is needed, prefer
  * `groupBy(keys).agg(min(...))` which gets a map-side partial aggregate —
  * `firstRows` must keep whole rows, which row_number cannot partial-agg.
  */
object Dedup {

  private def pick(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Earliest-wins: first row per key by `order` (caller supplies a total
    * order — include a unique tiebreaker for determinism).
    */
  def firstRows(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** Latest-wins snapshot: last row per key (pass desc orderings). */
  def latestRows(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** Exact full-row dedup (reference `ephemeral_asset.sql:59-65` — A6). */
  def distinctRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Exact content dedup for a corpus: group by a content fingerprint, keep
    * the minimum id as the canonical representative. One shuffle on the
    * fingerprint; partial aggregation applies map-side, so at 100 TB the
    * shuffle carries one row per distinct hash per map partition.
    */
  def exactDedupGroups(df: DataFrame, fingerprintCol: Column, idCol: Column): DataFrame =
    df.groupBy(fingerprintCol.as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))
}

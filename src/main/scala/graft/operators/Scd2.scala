package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 interval derivation.
  *
  * Reference semantics (`models/marts/dim_customer_history.sql:28-31,70-73`
  * — W3 in SURVEY §2.6): each version row gets
  * `effective_from = load_timestamp`,
  * `effective_to = coalesce(lead(load_timestamp), '9999-12-31')`,
  * `is_current = effective_to = '9999-12-31'`.
  *
  * The reference recomputes SCD2 marts from scratch every run (they are
  * views) because `lead` is only correct over the complete history — this
  * operator does the same; do NOT try to increment it (SURVEY §7.4.6).
  *
  * Scale: one shuffle on the entity key; per-key sort only.
  */
object Scd2 {

  val EndOfTime = "9999-12-31 00:00:00"

  /** Derive effective_from / effective_to / is_current version intervals.
    *
    * @param tsCol name of the version timestamp column (its exact type —
    *              TIMESTAMP or TIMESTAMP_NTZ — is preserved in the output)
    * @param order version ordering within a key — include a unique
    *              tiebreaker for determinism under equal timestamps.
    */
  def intervals(df: DataFrame, keys: Seq[String], tsCol: String, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val eot = lit(EndOfTime).cast(df.schema(tsCol).dataType)
    df.withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", coalesce(lead(col(tsCol), 1).over(w), eot))
      .withColumn("is_current", col("effective_to") === eot)
  }

  /** Current-version view (reference `dim_customer.sql:27` — P5). */
  def current(scd2: DataFrame): DataFrame = scd2.filter(col("is_current"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (batch form).
  *
  * Classic lag + cumulative-sum: a new session starts when the gap to the
  * previous event of the same entity exceeds `gapSeconds`. One shuffle on
  * the entity key; both window functions share the same partitioning +
  * ordering so Catalyst plans a single exchange + sort.
  *
  * Gap arithmetic uses epoch microseconds (exact integers) rather than
  * second-truncating timestamp diffs, so results are reproducible across
  * engines regardless of sub-second alignment.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per entity) to the events.
    * @param order total order within an entity — include a unique tiebreaker.
    */
  def withSessionSeq(events: DataFrame, entity: String, tsCol: String,
      gapSeconds: Long, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    events
      .withColumn("__prev_us", lag(micros, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull
          .or(micros - col("__prev_us") > gapSeconds * 1000000L), lit(1))
          .otherwise(lit(0)))
      .withColumn("session_seq",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_us", "__new_session")
  }

  /** Session-level rollup: start/end/n_events per (entity, session). */
  def sessions(events: DataFrame, entity: String, tsCol: String,
      gapSeconds: Long, order: Seq[Column]): DataFrame =
    withSessionSeq(events, entity, tsCol, gapSeconds, order)
      .groupBy(col(entity), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Scd2

/** Streaming maintenance of an SCD2 dimension: each micro-batch of version
  * rows (keys…, attrs…, tsCol) is merged into a published dimension whose
  * effective_from / effective_to / is_current intervals stay correct —
  * including under at-least-once redelivery and out-of-order (late)
  * versions.
  *
  * The batch operator's warning holds (`Scd2.intervals` is only correct
  * over complete history — SURVEY §7.4.6), so the merge is a KEY-SCOPED
  * recompute rather than a naive append: per batch, only the keys present
  * in the batch have their version chains re-derived; untouched keys are
  * carried over as-is. Cost per batch is O(affected keys' history), not
  * O(table) — the honest incremental shape for SCD2. Idempotency comes for
  * free: rows are deduped on (keys, tsCol), so a redelivered batch rebuilds
  * an identical chain, and the output directory is versioned by batchId
  * (Structured Streaming replays a failed batch with the same id, which
  * simply rewrites the same version).
  *
  * Scale notes: the affected-key set is a distinct projection of the batch
  * (small), broadcast into BOTH the carry-over anti-join and the history
  * semi-join — the big published table is scanned once, map-side pruned.
  * With the dimension bucketed by key (`core/Bucketing`) the rewrite can be
  * confined to affected buckets; with parquet-only storage we republish the
  * full (dimension-sized, not fact-sized) table atomically via `Pointer`.
  * The reference instead recomputes its SCD2 views from scratch every
  * 5-minute dbt tick (`models/marts/dim_customer_history.sql:28-31`) — this
  * sink does strictly less work per tick at the same semantics.
  */
object StreamingScd2 {

  /** The key-scoped SCD2 merge itself, as a pure batch function: rebuild
    * the version chains of the keys present in `batch`, carry every other
    * key over untouched. This is the exact relation the streaming sink
    * publishes per micro-batch — exposed so batch callers (and the oracle
    * gate, `q_stream_scd2_batch`) run the same code path the stream runs.
    */
  def merge(
      target: Option[DataFrame],
      batch: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    val baseCols = batch.columns.toSeq
    val incoming = batch.dropDuplicates(keys :+ tsCol)
    target match {
      case Some(tgt) =>
        val affected = incoming.select(keys.map(col): _*).distinct()
        val untouched = tgt.join(broadcast(affected), keys, "left_anti")
        val touchedHistory = tgt.join(broadcast(affected), keys, "left_semi")
          .select(baseCols.map(col): _*)
        val rebuilt = Scd2.intervals(
          touchedHistory.unionByName(incoming).dropDuplicates(keys :+ tsCol),
          keys, tsCol, Seq(col(tsCol)))
        untouched.unionByName(rebuilt)
      case None =>
        Scd2.intervals(incoming, keys, tsCol, Seq(col(tsCol)))
    }
  }

  /** Merge one micro-batch of version rows into the published dimension at
    * `base` and atomically republish. Exposed for direct testing.
    */
  def upsertBatch(
      batch: DataFrame,
      base: String,
      keys: Seq[String],
      tsCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val path = s"$base/v$batchId"
    // replay of an already-committed batch (crash between sink commit and
    // checkpoint advance): the published pointer already names this version
    // — re-merging would read and overwrite the same directory; skip.
    if (Pointer.read(spark, s"$base/_current").contains(path)) return

    val merged = merge(Pointer.currentTable(spark, s"$base/_current"), batch, keys, tsCol)

    merged.write.mode("overwrite").parquet(path)
    Pointer.write(spark, s"$base/_current", path)
  }

  /** Attach the SCD2 sink to a stream of version rows. */
  def start(
      stream: DataFrame,
      base: String,
      checkpointPath: String,
      keys: Seq[String],
      tsCol: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch, base, keys, tsCol, id)
      }
      .start()

  /** The currently-published dimension. */
  def current(spark: SparkSession, base: String): Option[DataFrame] =
    Pointer.currentTable(spark, s"$base/_current")
}

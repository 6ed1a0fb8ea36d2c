package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EXACT duplicate suppression — the stream twin of batch
  * `dropDuplicates(keys)`, bounded-state by construction: duplicates are
  * only suppressed while their key can still legally reappear, i.e.
  * within the event-time watermark (`dropDuplicatesWithinWatermark`,
  * Structured Streaming's sanctioned shape). The reference's ingest
  * dedups on business key at load time (`ON CONFLICT DO NOTHING`,
  * `scripts/kafka/kafka_consumer.py:447-569` upsert); this operator is
  * that semantics applied before the sink, with state that expires
  * instead of growing with the corpus.
  *
  * Scale shape: keyed state is one entry per key seen within the
  * watermark horizon — O(arrival rate x horizon), independent of total
  * corpus size; the output feeds the same idempotent appends the other
  * sinks use, so at-least-once redelivery cannot double rows either side
  * of the dedup.
  */
object StreamingDedup {

  /** The batch VALUE-twin of one micro-batch through this operator — the
    * (keys, event-time)-scoped suppression relation the sink enforces,
    * exposed pure so the correctness gate can hash-grade it
    * (`q_stream_dedup_batch`) while the MemoryStream spec proves the
    * mechanics (state expiry, idempotent replay):
    *
    *  1. within-batch dedup: earliest event per key, totally ordered by
    *     (tsCol, tiebreak) — the deterministic event-time counterpart of
    *     `dropDuplicatesWithinWatermark`'s first-arrival-wins (identical
    *     when delivery is event-time ordered);
    *  2. the sink's conflict guard: anti-join on (keys :+ tsCol) against
    *     `published`, the target rows of the redelivery window — a
    *     redelivered row (same key, same event time) is suppressed, a key
    *     reappearing with a NEW event time appends (see the sink comment
    *     below; same relation `IncrementalIngest.pendingRows` computes
    *     against the partition-pruned target).
    */
  def suppressBatch(
      published: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame = {
    val deduped = graft.operators.Dedup.firstRows(
      batch, keys, org.apache.spark.sql.functions.col(tsCol) +: tiebreak)
    graft.operators.Incremental.newKeys(deduped, published, keys :+ tsCol)
  }

  /** Suppress duplicate `keys` within the `delayThreshold` event-time
    * watermark on `tsCol`, appending survivors idempotently to `outPath`.
    */
  def start(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      delayThreshold: String,
      outPath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    stream
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // sink idempotence is scoped to (keys, event time), NOT keys
        // alone: a replayed micro-batch re-emits identical (key, ts)
        // rows, while a key legitimately REAPPEARING after its dedup
        // state expired carries a new event time and must append. The
        // partitioned variant prunes the conflict-guard scan to the
        // batch's redelivery window — the guard never rescans table
        // history (the round-2 unpruned-rescan lesson).
        IncrementalIngest.idempotentAppendPartitioned(
          batch, outPath, keys :+ tsCol, tsCol)
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins (§2.10 extension): correlate two live
  * streams without landing either — e.g. fills against quotes, clicks
  * against errors, consumer lag events against deploys.
  *
  * Spark's micro-batch engine buffers each side in the state store and
  * evicts by watermark; the INTERVAL condition is what makes eviction
  * possible (an unbounded-time equi-join would hold both streams forever).
  * State per key is bounded by (watermark delay + interval width) × event
  * rate — the knobs a 1000-executor deployment actually tunes.
  */
object StreamingJoins {

  /** Inner interval join: left rows matched to right rows with the same
    * key where `leftTs ∈ [rightTs, rightTs + interval]`. Both sides MUST
    * be watermarked by the caller-supplied delays (required by Spark for
    * state cleanup in stream-stream joins).
    *
    * @param interval SQL interval literal body, e.g. "1 HOUR".
    */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftDelay: String,
      right: DataFrame, rightTs: String, rightDelay: String,
      keys: (Column, Column), interval: String): DataFrame = {
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    l.join(r,
      keys._1 === keys._2 &&
        col(leftTs) >= col(rightTs) &&
        col(leftTs) <= col(rightTs) + expr(s"INTERVAL $interval"))
  }
}

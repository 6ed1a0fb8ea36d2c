package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>` embedding
  * columns — no UDFs, no MLlib dependency. The per-pair hot loops (dot,
  * distSq) are native codegen Catalyst expressions (`VectorExprs`): the
  * higher-order-function forms would block whole-stage codegen in the
  * similarity joins, where these evaluate once per candidate PAIR.
  *
  * Determinism note: accumulation is a *sequential* left fold over array
  * elements (same order as `functions.aggregate` and a SQL engine's
  * `list_reduce`), so double results are bit-identical across run,
  * partition layout, and the HOF/codegen implementations.
  */
object VectorFns {

  /** Cast an array<float> embedding to array<double> for stable math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays → double. */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared euclidean distance (avoids the sqrt when only ranking). */
  def distSq(a: Column, b: Column): Column = VectorExprs.distSq(a, b)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>` embedding
  * columns, built from Spark's higher-order array functions (`zip_with`,
  * `aggregate`, `transform`) — codegen'd expressions, no UDFs, no MLlib
  * dependency.
  *
  * Determinism note: `aggregate` is a *sequential* left fold over array
  * elements, so double summation order is fixed — identical results on every
  * run and partition layout (unlike row-wise `sum()` over doubles).
  */
object VectorFns {

  /** Cast an array<float> embedding to array<double> for stable math. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays → double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Squared euclidean distance (avoids the sqrt when only ranking). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
}

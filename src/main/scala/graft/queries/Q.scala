package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Graft

/** One registered engine query: the Spark implementation plus (when
  * SQL-expressible) an equivalent ANSI SQL oracle the driver runs in DuckDB
  * over the same parquet tables.
  *
  * `maxGateFactor` is the query's SCALE-GATE POLICY, carried in code so the
  * replicated-corpus gates read it from the registry instead of from tooling
  * invocation notes: `Some(f)` means the query is value-gated up to
  * replication factor f and policy-skipped above it, with `gatePolicyReason`
  * saying why (the standing adjudications: a pair query whose OUTPUT is
  * C(factor,2)-quadratic per copy-family on replicated corpora cannot be
  * replayed at unbounded factors — its linear GROUPS twin carries the dedup
  * contract and is gated instead). `None` (the default) = gate at every
  * factor.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    maxGateFactor: Option[Int] = None,
    gatePolicyReason: Option[String] = None)

object Q {

  /** Load a testdata table with timestamps normalized to TIMESTAMP_NTZ so
    * engine output parquet carries naive timestamps — the same calendar
    * values DuckDB's oracle produces (the reference likewise stores naive
    * wall-clock timestamps; SURVEY §7.4.1).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // Historically events.ts was TIMESTAMP(NANOS) parquet, which Spark only
    // reads as long; current generations store TIMESTAMP_MICROS (NTZ).
    // Adapt to whichever type actually arrives rather than assuming one.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = Graft.table(s, dir, name)
    // Scale-adaptive scan spread (guide §2.5 "input skew — one huge
    // unsplittable file ... repartition immediately after the read"): a
    // compacted table can arrive as fewer splits than the cluster has
    // slots — here each testdata table is ONE parquet file with one row
    // group, so every map-heavy stage before the first exchange (token
    // explodes, md5 chains, decode flatMaps, partial aggregation) ran on a
    // single core while the rest idled. A deterministic round-robin
    // repartition to the scheduler's slot count fixes the parallelism
    // floor; the condition makes it a NO-OP at scale, where a 100 TB table
    // scans as thousands of splits already >= the slot count (and
    // `spark.sql.files.minPartitionNum` cannot help here: a one-row-group
    // parquet file yields one non-empty split no matter how it is ranged).
    // Row placement does not affect results: every registered query is
    // partitioning-insensitive by design (decimal sums / ordered folds,
    // hash-gate-proven across replicated corpora with different layouts).
    val target = s.sparkContext.defaultParallelism
    val df =
      if (raw.rdd.getNumPartitions < target) raw.repartition(target) else raw
    val ntz = df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case TimestampType => d.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        // a DATE-typed generation would otherwise surface date objects where
        // every oracle (and every registered query) expects naive midnight
        // timestamps — same adaptation posture as the events.ts branch below
        case DateType => d.withColumn(f.name, col(f.name).cast("timestamp_ntz"))
        case _        => d
      }
    }
    if (name == "events")
      ntz.schema("ts").dataType match {
        // nanos-as-long → micros (truncating, same as DuckDB) → naive timestamp
        case LongType =>
          ntz.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        // TIMESTAMP_MICROS parquet: already a timestamp; normalize to NTZ
        case TimestampNTZType => ntz
        case TimestampType    => ntz.withColumn("ts", col("ts").cast("timestamp_ntz"))
        case other            => sys.error(s"unexpected events.ts type: $other")
      }
    else ntz
  }

  /** Exact 2-dp decimal view of a money-like double column. All testdata
    * numeric doubles are 2-decimal values, so this cast is lossless and
    * makes sums order-independent (hash-stable vs the oracle).
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Order-independent exact sum of a 2-dp double column, emitted as double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact average of a 2-dp double column (decimal sum, double division). */
  def avgExact(c: Column): Column = moneySum(c) / count(c)
}

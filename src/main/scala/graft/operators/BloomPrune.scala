package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Relational Bloom filter for key-pruned joins at scale.
  *
  * The reference's incremental loads anti-join every batch against the full
  * key history (`ON CONFLICT DO NOTHING` — reference
  * `scripts/kafka/kafka_consumer.py:447-569`; dbt incremental `is_incremental()`
  * blocks). At 100 TB the exact anti-join shuffles the entire probe side.
  * A Bloom bitmap over the build keys is a few KB broadcast to every task:
  * keys whose probe MISSES are provably absent (Bloom has no false
  * negatives) and never enter the shuffle — only the tiny "maybe" slice
  * (true matches + the false-positive rate) pays the exact join.
  *
  * Built from plain relational expressions (agg `bit_or` over packed words,
  * probe = codegen'd bit tests), not a driver-side sketch object: the bitmap
  * itself is a 1-row DataFrame, so the whole pipeline stays in-plan — no
  * `.collect()`, no UDF, and the build side streams through one partial-agg
  * shuffle of at most `mBits/64` rows per mapper.
  */
object BloomPrune {

  /** k probe positions for a key: xxhash64(key, seed) mod mBits, seed=0..k-1. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits.toLong)))

  private def shiftLeft1(bits: Column): Column =
    Bridge.column(ShiftLeft(Bridge.expression(lit(1L)), Bridge.expression(bits)))

  /** Build the Bloom bitmap over `build`'s `key` as ONE row holding a
    * map<word_idx, word> of the non-zero 64-bit words (mBits/64 entries max
    * — at mBits=2^20 that is a 128 KiB broadcast). Two-level aggregation:
    * partial `bit_or` per mapper, final merge of <= mBits/64 rows.
    */
  def bitmapRow(build: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a multiple of 64: $mBits")
    val pos = explode(array(positions(key, mBits, k): _*)).as("__pos")
    build.select(pos)
      .select((col("__pos") / 64).cast("int").as("word_idx"),
        shiftLeft1(pmod(col("__pos"), lit(64L)).cast("int")).as("bit"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("bit")).as("word"))
      .agg(map_from_entries(collect_list(struct(col("word_idx"), col("word"))))
        .as("bloom"))
  }

  /** Codegen'd membership test of `key` against a bitmap-map column:
    * all k bits set => "maybe in set"; any bit clear => definitely absent.
    */
  def mightContain(key: Column, bloom: Column, mBits: Int, k: Int): Column =
    positions(key, mBits, k).map { p =>
      val word = coalesce(element_at(bloom, (p / 64).cast("int")), lit(0L))
      word.bitwiseAND(shiftLeft1(pmod(p, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** Exact "new keys" (probe keys absent from build), Bloom-accelerated.
    *
    * Identical result to a plain distinct + left-anti join — Bloom false
    * positives are removed by the exact verify join, and false negatives
    * cannot exist — so the plain anti-join IS the oracle. The win is the
    * plan shape: the broadcast-bitmap filter runs map-side, so at 100 TB
    * only Bloom-positive keys reach the anti-join's shuffle.
    */
  def newKeys(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      mBits: Int = 1 << 17,
      k: Int = 3): DataFrame = {
    val keys = probe.select(col(probeKey)).where(col(probeKey).isNotNull).distinct()
    val flagged = keys
      .crossJoin(broadcast(bitmapRow(build, col(buildKey), mBits, k)))
      .withColumn("__maybe", mightContain(col(probeKey), col("bloom"), mBits, k))
    val certainNew = flagged.filter(!col("__maybe")).select(col(probeKey))
    val verifiedNew = flagged.filter(col("__maybe")).select(col(probeKey))
      .join(build.select(col(buildKey)).where(col(buildKey).isNotNull),
        col(probeKey) === col(buildKey), "left_anti")
    certainNew.unionByName(verifiedNew)
  }
}

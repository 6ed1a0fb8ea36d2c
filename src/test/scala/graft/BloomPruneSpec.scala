package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

/** Contracts for the relational Bloom filter: exactness (identical result
  * to the plain anti-join), zero false negatives by construction, and the
  * pruning rate that justifies it at scale (most absent keys never reach
  * the exact join).
  */
class BloomPruneSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val mBits = 1 << 12
  private val k = 3

  test("newKeys equals the plain distinct anti-join") {
    val probe = (0L until 2000L).toDF("pk")
    val build = (1500L until 1800L).toDF("bk")
    val got = BloomPrune.newKeys(probe, "pk", build, "bk", mBits, k)
      .as[Long].collect().sorted
    val want = probe.select($"pk").distinct()
      .join(build, $"pk" === $"bk", "left_anti").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("mightContain has no false negatives") {
    val build = (0L until 500L).map(_ * 7).toDF("bk")
    val bitmap = BloomPrune.bitmapRow(build, $"bk", mBits, k)
    val misses = build.select($"bk".as("key"))
      .crossJoin(broadcast(bitmap))
      .filter(!BloomPrune.mightContain($"key", $"bloom", mBits, k))
      .count()
    assert(misses === 0L)
  }

  test("bloom prunes the vast majority of absent keys map-side") {
    val build = (0L until 1000L).toDF("bk")
    val probe = (100000L until 110000L).toDF("pk") // fully disjoint
    val bitmap = BloomPrune.bitmapRow(build, $"bk", 1 << 15, k)
    val maybes = probe
      .crossJoin(broadcast(bitmap))
      .filter(BloomPrune.mightContain($"pk", $"bloom", 1 << 15, k))
      .count()
    // fp rate at m=32768 bits / n=1000 keys / k=3 is ~0.1%; allow 10x slack
    assert(maybes < 100L, s"false-positive count too high: $maybes")
  }

  test("bitmap is bounded: at most mBits/64 map entries in one row") {
    val build = (0L until 5000L).toDF("bk")
    val n = BloomPrune.bitmapRow(build, $"bk", mBits, k)
      .select(size(map_keys($"bloom"))).as[Int].head()
    assert(n <= mBits / 64)
  }
}

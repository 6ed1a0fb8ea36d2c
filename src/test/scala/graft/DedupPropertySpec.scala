package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property contracts for key-scoped dedup over generated data (SURVEY §5
  * test plan: dedup idempotence + determinism under reordering).
  */
class DedupPropertySpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // 400 rows over a small key space with colliding timestamps to stress
  // tiebreaking
  private val rows = {
    val gen = Gen.listOfN(400, for {
      k <- Gen.choose(0, 20)
      ts <- Gen.choose(0L, 50L)
      id <- Gen.choose(0L, 100000L)
    } yield (s"k$k", ts, id))
    gen(Gen.Parameters.default, Seed(7L)).get
  }

  private def df = rows.toDF("k", "ts", "id")
  private val order = Seq(col("ts"), col("id"))

  test("property: firstRows is idempotent") {
    val once = Dedup.firstRows(df, Seq("k"), order)
    val twice = Dedup.firstRows(once, Seq("k"), order)
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("property: result is independent of input row order and partitioning") {
    val a = Dedup.firstRows(df, Seq("k"), order).collect().toSet
    val b = Dedup.firstRows(df.orderBy(col("id").desc).repartition(13), Seq("k"), order)
      .collect().toSet
    assert(a === b)
  }

  test("property: exactly one row per key, and it is the minimum by (ts, id)") {
    val got = Dedup.firstRows(df, Seq("k"), order)
      .as[(String, Long, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (_, g) => g.minBy(r => (r._2, r._3)) }.toSet
    assert(got.toSet === expected)
    assert(got.map(_._1).distinct.length === got.length)
  }
}

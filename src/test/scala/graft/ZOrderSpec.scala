package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Contracts of the z-order layout: the mask-spread Morton encoding equals
  * the naive bit-interleave reference, layout partitions carry disjoint
  * contiguous z-ranges, and a 2-D box predicate touches few partitions.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 16) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("mask-spread encoding equals the naive bit-interleave reference") {
    val pts = (for {
      x <- Seq(0L, 1L, 2L, 255L, 256L, 12345L, 65535L)
      y <- Seq(0L, 1L, 3L, 254L, 32768L, 54321L, 65535L)
    } yield (x, y)) ++ (1 to 200).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zvalue2($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === mortonRef(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("z-value is bijective: distinct (x, y) give distinct z") {
    val n = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
    val zs = n.toDF("x", "y").select(ZOrder.zvalue2($"x", $"y")).as[Long].collect()
    assert(zs.distinct.length === n.length)
  }

  test("layout gives disjoint contiguous z-ranges and box-query locality") {
    val o = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.01", "orders")
    val x = col("o_custkey") % 65536
    val y = (datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date")) % 65536).cast("long")
    val laid = ZOrder.layoutBy2(o, x, y, numPartitions = 16).persist()

    // per-partition z-ranges are disjoint and ordered (repartitionByRange)
    val ranges = laid
      .select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("pid").as[(Int, Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, "overlapping z-ranges")
      case _ =>
    }

    // a 2-D box around a real point concentrates in a minority of partitions
    val probe = laid.select((col("o_custkey") % 65536).as("px"),
        (datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date")) % 65536)
          .cast("long").as("py"))
      .head()
    val (px, py) = (probe.getLong(0), probe.getLong(1))
    val hit = laid.filter(
      (col("o_custkey") % 65536).between(px - 16, px + 16) &&
        (datediff(to_date(col("o_orderdate")), lit("1990-01-01").cast("date")) % 65536)
          .cast("long").between(py - 16, py + 16))
      .select(spark_partition_id()).distinct().count()
    val total = ranges.length.toLong
    assert(hit <= (total + 1) / 2, s"box query touched $hit of $total partitions")
    laid.unpersist()
  }
}

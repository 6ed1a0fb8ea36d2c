package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("pagerank: hand-unrolled 3-iteration ranks, exact double equality") {
    // 1 -> 3, 2 -> 3, 3 -> 1 : node 2 has no in-edges, node 3 two
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (3L, 1L)) // dup collapses
      .toDF("src", "dst")
    val got = PageRank.run(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // replicate the operator's exact fp sequence: teleport is the COMPUTED
    // subtraction, neighbor sums fold 0.0 + contributions in ascending order
    val t = 1.0 - 0.85
    val third = 1.0 / 3.0
    val r1_1 = t + 0.85 * (0.0 + (third / 1.0))
    val r1_2 = t
    val r1_3 = t + 0.85 * ((0.0 + (third / 1.0)) + (third / 1.0))
    val r2_1 = t + 0.85 * (0.0 + (r1_3 / 1.0))
    val r2_3 = t + 0.85 * ((0.0 + (r1_2 / 1.0)) + (r1_1 / 1.0))
    val r3_1 = t + 0.85 * (0.0 + (r2_3 / 1.0))
    val r3_2 = t
    val r3_3 = t + 0.85 * ((0.0 + (t / 1.0)) + (r2_1 / 1.0))
    assert(got(1L) === r3_1)
    assert(got(2L) === r3_2)
    assert(got(3L) === r3_3)
    // sink of both spokes outranks everyone; the in-degree-0 node floors
    assert(got(3L) > got(1L) && got(1L) > got(2L))
  }

  test("pagerank: rank mass stays bounded and dangling nodes floor at 1-d") {
    // star: everyone points at 0
    val edges = (1L to 5L).map(i => (i, 0L)).toDF("src", "dst")
    val got = PageRank.run(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === 6)
    val t = 1.0 - 0.85
    (1L to 5L).foreach(i => assert(got(i) === t))
    // iter 2: five spokes each contribute their floored rank t
    assert(got(0L) === t + 0.85 * (((((0.0 + (t / 1.0)) + (t / 1.0)) + (t / 1.0)) + (t / 1.0)) + (t / 1.0)))
  }

  test("property: random-graph ranks equal a sequential plain-Scala replay exactly") {
    // seeded random multigraph over 30 nodes; duplicates exercise the
    // distinct-edge collapse, self-loops are legal PageRank edges
    val rawEdges = Gen.listOfN(80, for {
      s <- Gen.choose(0L, 29L)
      d <- Gen.choose(0L, 29L)
    } yield (s, d))(Gen.Parameters.default, Seed(41L)).get
    val edgeSet = rawEdges.toSet

    val nodes = edgeSet.flatMap { case (s, d) => Seq(s, d) }
    val outdeg = edgeSet.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val t = 1.0 - 0.85
    var ranks = nodes.map(n => n -> (1.0 / nodes.size.toDouble)).toMap
    for (_ <- 1 to 3) {
      val sums = edgeSet.toSeq
        .map { case (s, d) => d -> (ranks(s) / outdeg(s).toDouble) }
        .groupBy(_._1)
        .map { case (d, xs) =>
          // ascending fold from 0.0 — the operator's ordered-sum contract
          d -> xs.map(_._2).sorted.foldLeft(0.0)(_ + _)
        }
      ranks = nodes.map(n => n -> (t + 0.85 * sums.getOrElse(n, 0.0))).toMap
    }

    val got = PageRank.run(rawEdges.toDF("src", "dst").repartition(7),
      "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === nodes)
    nodes.foreach(n => assert(got(n) === ranks(n), s"node $n (bit-exact)"))
  }
}

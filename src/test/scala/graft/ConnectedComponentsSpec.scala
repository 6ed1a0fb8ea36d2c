package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // two triangles bridged by one edge + an isolated pair + a 5-chain
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),        // triangle A
    (3L, 10L),                           // bridge
    (10L, 11L), (11L, 12L), (10L, 12L),  // triangle B
    (20L, 21L),                          // isolated pair
    (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L) // chain, diameter 4
  ).toDF("a", "b")

  // driver-side union-find reference (canonical label = component min)
  private def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def groundTruth: Map[Long, Long] =
    unionFind(edges.as[(Long, Long)].collect().toSeq)

  test("converges to the exact components (min id per component)") {
    val got = ConnectedComponents.minLabel(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === groundTruth)
    // canonical ids are the component minima
    assert(got.values.toSet === Set(1L, 20L, 30L))
  }

  test("a chain longer than any small fixed round budget still merges fully") {
    // 9-node path 100-101-...-108: diameter 8. The old fixed rounds=3 form
    // would have left 108 labeled 105 — convergence must reach 100.
    val chain = (100L until 108L).map(v => (v, v + 1)).toDF("a", "b")
    val got = ConnectedComponents.minLabel(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 9)
    assert(got.values.toSet === Set(100L), s"under-merged: $got")
  }

  test("maxRounds below the diameter throws instead of under-merging silently") {
    // long enough that even 4 jumps/round (pointer depth ~2^4 per round,
    // compounding across rounds) cannot reach the fixpoint in 2 rounds
    val chain = (100L until 700L).map(v => (v, v + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.minLabel(chain, "a", "b", maxRounds = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("matches union-find on seeded random graphs across densities") {
    // sparse (many components, long paths), medium, and dense (few big
    // components, small diameter) regimes — same seed every run
    val rnd = new scala.util.Random(7)
    for (density <- Seq(0.01, 0.05, 0.25)) {
      val n = 60L
      val es = for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < density
      } yield (a, b)
      val got = ConnectedComponents.minLabel(es.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === unionFind(es), s"density=$density, |E|=${es.size}")
    }
  }

  test("dedupGroups flags exactly one canonical member per group") {
    val groups = ConnectedComponents.dedupGroups(edges, "a", "b")
    val canon = groups.filter($"is_canonical").select("group_id")
      .as[Long].collect().toSeq
    assert(canon.sorted === Seq(1L, 20L, 30L))
    // every member's group is its component's canonical id
    assert(groups.filter($"group_id" =!= $"member_id")
      .filter($"is_canonical").count() === 0)
  }
}

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

  private def groundTruth: Map[Long, Long] = {
    // driver-side union-find over the fixture
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    edges.as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("rounds >= diameter reaches the exact components (min id per component)") {
    val got = ConnectedComponents.minLabel(edges, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === groundTruth)
    // canonical ids are the component minima
    assert(got.values.toSet === Set(1L, 20L, 30L))
  }

  test("fewer rounds than the diameter under-merges exactly by hop distance") {
    val got = ConnectedComponents.minLabel(edges, "a", "b", rounds = 1)
      .as[(Long, Long)].collect().toMap
    // one hop: 34 only sees 33's initial label
    assert(got(34L) === 33L)
    // but the triangles already collapse (diameter 1 within, 2 via bridge)
    assert(got(2L) === 1L && got(3L) === 1L)
  }

  test("dedupGroups flags exactly one canonical member per group") {
    val groups = ConnectedComponents.dedupGroups(edges, "a", "b", rounds = 4)
    val canon = groups.filter($"is_canonical").select("group_id")
      .as[Long].collect().toSeq
    assert(canon.sorted === Seq(1L, 20L, 30L))
    // every member's group is its component's canonical id
    assert(groups.filter($"group_id" =!= $"member_id")
      .filter($"is_canonical").count() === 0)
  }
}

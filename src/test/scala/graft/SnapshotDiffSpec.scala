package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotDiff

/** Semantics of the CDC snapshot diff: status classification incl. nulls
  * (null-safe compares), multi-key grain, and multi-column change detection.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("classifies added / removed / changed / unchanged, null-safely") {
    val oldS = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)), (3L, Option.empty[Double]), (4L, Some(40.0)))
      .toDF("k", "v")
    val newS = Seq(
      (1L, Some(10.0)), (2L, Some(21.0)), (3L, Option.empty[Double]), (5L, Some(50.0)))
      .toDF("k", "v")
    val got = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("v"))
      .select($"k", $"status").as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "unchanged",
      2L -> "changed",
      3L -> "unchanged", // null <=> null is a match, not a change
      4L -> "removed",
      5L -> "added"))
  }

  test("null-to-value transitions are changed, not added/removed") {
    val oldS = Seq((1L, Option.empty[Double]), (2L, Some(2.0))).toDF("k", "v")
    val newS = Seq((1L, Some(1.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val got = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("v"))
      .select($"k", $"status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed"))
  }

  test("multi-key, multi-column: any differing column marks the row changed") {
    val oldS = Seq(("a", 1, "x", 1.0), ("a", 2, "y", 2.0)).toDF("g", "k", "s", "v")
    val newS = Seq(("a", 1, "x", 1.0), ("a", 2, "y", 2.5)).toDF("g", "k", "s", "v")
    val got = SnapshotDiff.diff(oldS, newS, Seq("g", "k"), Seq("s", "v"))
    val byKey = got.select($"k", $"status").as[(Int, String)].collect().toMap
    assert(byKey === Map(1 -> "unchanged", 2 -> "changed"))
    // old/new columns are both carried for every compared column
    assert(got.columns.toSet ===
      Set("g", "k", "old_s", "old_v", "new_s", "new_v", "status"))
  }

  test("diff of a snapshot against itself is all unchanged") {
    val snap = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.001", "customer")
      .select($"c_custkey", $"c_acctbal")
    val got = SnapshotDiff.diff(snap, snap, Seq("c_custkey"), Seq("c_acctbal"))
    assert(got.filter($"status" =!= "unchanged").count() === 0)
    assert(got.count() === snap.count())
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.operators.TextDedup

/** Statistical contract of the MinHash-LSH pipeline against exact
  * all-pairs ground truth on the sf0.001 documents corpus.
  */
class LshRecallSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private lazy val docs = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.001", "documents")
  private def sh = TextFns.wordShingles(TextFns.tokens(col("text")), 2)

  private lazy val truth = TextDedup.blockedJaccardPairs(
    docs.withColumn("__all", lit(1)), "doc_id", "__all",
    TextFns.tokens(col("text")), 2, threshold = 0.5)
    .select($"a_id", $"b_id", $"jaccard").as[(Long, Long, Double)].collect()

  private lazy val lsh = TextDedup.minhashDupPairs(
    docs, "doc_id", "text", shingleWords = 2, bands = 4, rowsPerBand = 3,
    threshold = 0.5, family = TextDedup.Xx64)
    .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet

  test("precision is 1.0: every LSH pair is a true >=threshold pair") {
    val truthPairs = truth.map(t => (t._1, t._2)).toSet
    assert(lsh.subsetOf(truthPairs),
      s"false positives: ${lsh.diff(truthPairs).mkString(", ")}")
  }

  test("recall is 1.0 for near-identical pairs (jaccard >= 0.95)") {
    val certain = truth.filter(_._3 >= 0.95).map(t => (t._1, t._2)).toSet
    assert(certain.nonEmpty, "corpus should contain planted near-dups")
    assert(certain.subsetOf(lsh),
      s"missed near-identical pairs: ${certain.diff(lsh).mkString(", ")}")
  }

  test("hash families agree: md5 and xx64 pipelines find the same certain pairs") {
    val md5Pairs = TextDedup.minhashDupPairs(
      docs, "doc_id", "text", shingleWords = 2, bands = 4, rowsPerBand = 3,
      threshold = 0.5, family = TextDedup.HexMd5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // both families exact-Jaccard-verify, so precision is 1.0 for each;
    // on the near-identical tier recall is 1.0 for both -> sets agree
    val certain = truth.filter(_._3 >= 0.95).map(t => (t._1, t._2)).toSet
    assert(certain.subsetOf(md5Pairs))
    assert(md5Pairs.subsetOf(truth.map(t => (t._1, t._2)).toSet))
  }

  test("candidate stage has no Window node: bucket cap is aggregate + anti-join") {
    // a count window over (band, band_hash) funnels every row of a
    // degenerate bucket through ONE task; the cap must be a map-side
    // keyed aggregate + anti-join prune (VERDICT r7 finding #1)
    val banded = TextDedup.bandedSignatures(
      docs, "doc_id", sh, bands = 4, rowsPerBand = 3, TextDedup.Xx64)
    val cands = TextDedup.candidatePairs(banded, "doc_id", bucketCap = 10)
    val plan = cands.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"Window node in candidate plan:\n$plan")
  }

  test("bucket cap drops exactly the over-cap buckets (window-formulation parity)") {
    val banded = TextDedup.bandedSignatures(
      docs, "doc_id", sh, bands = 4, rowsPerBand = 3, TextDedup.Xx64).cache()
    try {
      val cap = 3
      val expected = {
        import org.apache.spark.sql.expressions.Window
        banded
          .withColumn("__n", count(lit(1)).over(Window.partitionBy($"band", $"band_hash")))
          .filter($"__n" <= cap).drop("__n")
          .select($"doc_id", $"band", $"band_hash")
          .collect().map(_.toSeq).toSet
      }
      val got = TextDedup.capBuckets(banded, cap)
        .select($"doc_id", $"band", $"band_hash")
        .collect().map(_.toSeq).toSet
      assert(got == expected)
      assert(got.size < banded.count(), "fixture should exercise the cap (some bucket > cap)")
    } finally banded.unpersist()
  }

  test("crossCorpusDupPairs never emits self-pairs on overlapping id spaces") {
    // same frame on both sides: every doc is its own perfect duplicate in
    // the other "corpus" — the a_id =!= b_id guard must suppress all of them
    val pairs = TextDedup.crossCorpusDupPairs(
      docs, docs, "doc_id", "text", shingleWords = 2, bands = 4, rowsPerBand = 3,
      threshold = 0.5, family = TextDedup.Xx64)
      .select($"a_id", $"b_id", $"jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.forall(p => p._1 != p._2), "self-pair leaked through cross-corpus join")
    // and it still finds the genuine cross-doc near-dups, in both orders
    val certain = truth.filter(_._3 >= 0.95).map(t => (t._1, t._2)).toSet
    val found = pairs.map(p => if (p._1 < p._2) (p._1, p._2) else (p._2, p._1)).toSet
    assert(certain.subsetOf(found))
  }
}

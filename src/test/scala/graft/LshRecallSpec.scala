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
}

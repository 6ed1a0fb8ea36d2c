package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Contracts of the product-quantization path: code shape and determinism,
  * and ADC ranking quality against exact L2 ground truth.
  */
class SimilarityPqSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val dims = 64
  private val m = 4
  private val sub = dims / m
  private val k = 16

  private lazy val emb = queries.Q.t(TestSpark.spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val codebook =
    Similarity.pqTrain(emb, "vec_id", "embedding", dims, m, k, iters = 2).persist()
  private lazy val codes =
    Similarity.pqAssign(emb, codebook, "vec_id", "embedding", m, sub).persist()

  test("codebook has m*k sub-centroids of sub dims each") {
    val shape = codebook.select($"subspace", $"centroid_id", size($"embedding").as("d"))
      .as[(Int, Long, Int)].collect()
    assert(shape.length === m * k)
    assert(shape.forall(_._3 == sub))
    assert(shape.map(r => (r._1, r._2)).distinct.length === m * k)
  }

  test("codes are m entries, each a valid centroid id; assignment is deterministic") {
    val c = codes.select($"vec_id", $"code").as[(Long, Seq[Long])].collect()
    assert(c.nonEmpty)
    assert(c.forall(_._2.length == m))
    assert(c.forall(_._2.forall(cid => cid >= 1 && cid <= k)))
    val again = Similarity.pqAssign(emb, codebook, "vec_id", "embedding", m, sub)
      .select($"vec_id", $"code").as[(Long, Seq[Long])].collect()
    assert(c.toSet === again.toSet)
  }

  test("ADC top-k ranks near the exact L2 ground truth") {
    val all = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val query = all.head
    def l2sq(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val exactTop10 = all.map { case (id, v) => id -> l2sq(query._2, v) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet

    val adcTop20 = Similarity.pqTopK(
      codes, codebook, emb.filter($"vec_id" === query._1),
      "vec_id", "embedding", sub, k = 20)
      .select($"vec_id").as[Long].collect().toSet

    val hit = exactTop10.intersect(adcTop20).size
    // random 20-of-500 would expect 0.4 overlap with a fixed 10-set; the
    // coarse 2-iteration codebook must do far better than chance
    assert(hit >= 3, s"ADC recall too low: $hit of 10 exact neighbors in top-20")
    // the query's own vector has the minimum possible ADC distance to itself
    assert(adcTop20.contains(query._1))
  }

  test("IVF-PQ equals a PQ scan restricted to the probed clusters (composition identity)") {
    val coarseK = 8
    val centroids = Similarity.kmeansFit(emb, "vec_id", "embedding", coarseK, iters = 2)
      .persist()
    val assigned = Similarity.ivfAssign(emb, centroids, "vec_id", "embedding", "centroid_id")
      .select($"vec_id", $"cluster_id").persist()
    val query = emb.orderBy($"vec_id").limit(1)
    val qVec = query.select($"embedding").as[Seq[Float]].head()
    val got = Similarity.ivfPqTopK(
      assigned, codes, codebook, query, centroids,
      "vec_id", "embedding", "centroid_id", nprobe = 2, sub = sub, k = 10)
      .select($"vec_id", $"approx_dist_sq").as[(Long, Double)].collect().toSeq

    // reference: find the 2 nearest coarse clusters driver-side, restrict
    // the candidate ids, and run the plain ADC scan on that subset
    def l2sq(a: Seq[Double], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probed = centroids.select($"centroid_id", $"embedding")
      .as[(Long, Seq[Double])].collect()
      .map { case (cid, v) => cid -> l2sq(v, qVec) }
      .sortBy { case (cid, d) => (d, cid) }.take(2).map(_._1).toSet
    val candIds = assigned.as[(Long, Long)].collect()
      .filter(p => probed.contains(p._2)).map(_._1).toSet
    val want = Similarity.pqTopK(
      codes.filter($"vec_id".isin(candIds.toSeq: _*)), codebook, query,
      "vec_id", "embedding", sub, k = 10)
      .select($"vec_id", $"approx_dist_sq").as[(Long, Double)].collect().toSeq
    assert(got === want)
    // the query's own vector sits in a probed cluster and tops the list
    assert(got.head._1 === query.select($"vec_id").as[Long].head())
  }
}

/** SemDeDup contracts: group formation, representative rule, singletons. */
class SemDeDupSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("semDeDup: least-centroid-similar member survives, singletons kept") {
    val centroids = Seq(
      (100L, Seq(1f, 0f)), (200L, Seq(0f, 1f))
    ).toDF("centroid_id", "embedding")
    val emb = Seq(
      (10L, Seq(2f, 0f)),     // c100, centroid_cos 1.0
      (11L, Seq(1f, 0.1f)),   // c100, centroid_cos ~0.995
      (12L, Seq(0.9f, 0.15f)),// c100, centroid_cos ~0.986 -> representative
      (20L, Seq(0f, 3f))      // c200, singleton
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(
      emb, centroids, "vec_id", "embedding", "centroid_id", threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 20L))
    // all of cluster 100 pairwise cosine > 0.9 -> one group labeled 10
    assert(got(10L)._1 === 100L && got(10L)._2 === 10L && !got(10L)._4)
    assert(got(11L)._2 === 10L && !got(11L)._4)
    assert(got(12L)._2 === 10L && got(12L)._4) // least prototypical survives
    assert(got(12L)._3 < got(11L)._3 && got(11L)._3 < got(10L)._3)
    // singleton: own group, kept
    assert(got(20L) === ((200L, 20L, 1.0, true)))
  }

  test("semDeDup: zero-norm vector gets null cosine, pinned representative order") {
    val centroids = Seq((100L, Seq(1f, 0f))).toDF("centroid_id", "embedding")
    val emb = Seq(
      (1L, Seq(0f, 0f)),  // zero vector: null cosine -> ordered as -2.0
      (2L, Seq(1f, 0f))
    ).toDF("vec_id", "embedding")
    // threshold > any defined pair cosine involving the zero vector
    // (its pair cosine is null -> filtered), so both are singletons
    val got = Similarity.semDeDup(
      emb, centroids, "vec_id", "embedding", "centroid_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))).toMap
    assert(got(1L) === ((1L, None, true)))   // own group, null cosine surfaces
    assert(got(2L) === ((2L, Some(1.0), true)))
  }

  test("semDeDup: a NULL embedding vector survives as a kept singleton") {
    // null keys never equi-join, so the family-collapse join must be LEFT:
    // an inner join would silently drop the row, where the doc-grain
    // contract keeps it as a singleton with a null centroid cosine (a null
    // vector's every pairwise cosine is null, never >= threshold)
    val centroids = Seq((100L, Seq(1f, 0f))).toDF("centroid_id", "embedding")
    val emb = Seq(
      (1L, Seq(1f, 0f)),
      (5L, null.asInstanceOf[Seq[Float]])
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(
      emb, centroids, "vec_id", "embedding", "centroid_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(1L, 5L), "the null-vector row must not be dropped")
    assert(got(5L) === ((5L, None, true)))
    assert(got(1L) === ((1L, Some(1.0), true)))
  }

  test("semDeDup: threshold 1.0 gates the family self-loop on the computed self-cosine") {
    // IEEE: dot(v,v)/(sqrt(S)*sqrt(S)) is NOT always 1.0 — for v=[1,1],
    // S=2 and sqrt(2)^2 = 2.0000000000000004, so the self-cosine rounds to
    // 0.9999999999999998 < 1 and the doc-grain verify would REJECT the
    // exact-copy pair. The family self-loop must run the same computation,
    // not a norm>0 shortcut that would over-group at threshold = 1.0.
    val centroids = Seq((100L, Seq(1f, 1f))).toDF("centroid_id", "embedding")
    val emb = Seq(
      (1L, Seq(1f, 1f)), (2L, Seq(1f, 1f)), // self-cos < 1.0 -> singletons
      (3L, Seq(1f, 0f)), (4L, Seq(1f, 0f))  // self-cos == 1.0 -> one group
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDeDup(
      emb, centroids, "vec_id", "embedding", "centroid_id", threshold = 1.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(got(1L) === ((1L, true)) && got(2L) === ((2L, true)),
      "copies whose computed self-cosine rounds below 1.0 must stay singletons")
    assert(got(3L)._1 === 3L && got(4L)._1 === 3L,
      "copies with an exact self-cosine of 1.0 must group")
    assert(Seq(got(3L), got(4L)).count(_._2) === 1)
  }
}

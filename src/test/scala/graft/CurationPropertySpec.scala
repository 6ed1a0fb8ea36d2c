package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Property contracts for the tokenize-for-training operators: each is
  * checked for EXACT equality against an independent plain-Scala
  * reimplementation over a seeded random corpus (same evidence class as
  * `DedupPropertySpec` — the distributed plan and the sequential replay
  * must agree bit-for-bit, partitioning included).
  */
class CurationPropertySpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // 60 docs over a 5-token vocabulary with lengths 0..9 — small vocab
  // forces heavy bigram/vocab collisions, empty docs exercise guards
  private val corpus: Seq[(Long, String, String)] = {
    val gen = Gen.listOfN(60, for {
      n <- Gen.choose(0, 9)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "b", "ccc", "dd", "e"))
      lang <- Gen.oneOf("en", "fr")
    } yield (lang, toks.mkString(" ")))
    gen(Gen.Parameters.default, Seed(23L)).get
      .zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }
  }

  private def docs = corpus.toDF("doc_id", "lang", "text")
  private def toks(t: String): Seq[String] =
    t.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  test("property: lmScore equals a sequential plain-Scala replay exactly") {
    val bigrams = corpus.flatMap { case (id, _, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (id, p.mkString(" ")))
    }
    val model = bigrams.groupBy(_._2).map { case (bg, xs) => bg -> xs.size.toLong }
    val prefixTotals = model.groupBy(_._1.split(" ")(0))
      .map { case (p, m) => p -> m.values.sum }
    val expected = bigrams.groupBy(_._1).map { case (id, xs) =>
      val byBg = xs.groupBy(_._2).map { case (bg, ys) => bg -> ys.size.toLong }
      val n = xs.size.toLong
      // sorted-bigram sequential fold, exactly as the operator documents
      val s = byBg.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (bg, dcnt)) =>
        acc + dcnt.toDouble * (model(bg).toDouble / prefixTotals(bg.split(" ")(0)).toDouble)
      }
      id -> ((n, s / n.toDouble))
    }
    val got = Curation.lmScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    corpus.foreach { case (id, _, t) =>
      expected.get(id) match {
        case Some((n, score)) =>
          assert(got(id)._1 === n, s"n_bigrams doc $id")
          assert(got(id)._2 === score, s"avg_cond_prob doc $id (bit-exact)")
        case None =>
          assert(got(id)._1 === 0L && got(id)._2.isNaN, s"bigram-less doc $id")
      }
    }
  }

  test("property: vocabEncode matches an independent ranking + encoding replay") {
    val all = corpus.flatMap { case (id, _, t) => toks(t) }
    val ranked = all.groupBy(identity).map { case (tk, xs) => (tk, xs.size) }
      .toSeq.sortBy { case (tk, n) => (-n, tk) }.map(_._1)
    val vocabSize = 3 // < |vocab| = 5, so OOV is exercised
    val idOf = ranked.take(vocabSize).zipWithIndex.map { case (tk, i) => tk -> (i + 1) }.toMap
    val expected = corpus.flatMap { case (id, _, t) =>
      toks(t).zipWithIndex.map { case (tk, pos) =>
        (id, pos.toLong) -> idOf.getOrElse(tk, 0)
      }
    }.toMap
    val got = Curation.vocabEncode(docs.repartition(5), "doc_id", "text", vocabSize)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got === expected)
  }

  test("property: bm25Retrieve equals a sequential plain-Scala replay exactly") {
    val queryTerms = Seq("aa", "ccc")
    val dls = corpus.map { case (id, _, t) => id -> toks(t).size.toLong }.toMap
    val nD = corpus.size.toDouble
    val avgdl = dls.values.sum.toDouble / nD
    val tf = corpus.flatMap { case (id, _, t) =>
      toks(t).filter(queryTerms.contains).map(tk => (id, tk))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val df = tf.keys.toSeq.groupBy(_._2).map { case (tk, xs) => tk -> xs.size.toLong }
    val expected = tf.keys.map(_._1).toSeq.distinct.map { id =>
      val dlD = dls(id).toDouble
      // the operator's exact fp sequence: per-term contribution with the
      // pre-folded constants, absent terms contribute coalesced 0.0, the
      // sum folds left in query-term order
      val contribs = queryTerms.map { qt =>
        tf.get((id, qt)) match {
          case Some(f) =>
            val dfD = df(qt).toDouble
            ((nD - dfD + 0.5) / (dfD + 0.5)) *
              ((f.toDouble * 2.2) / (f.toDouble + (1.2 * (0.25 + (0.75 * (dlD / avgdl))))))
          case None => 0.0
        }
      }
      (id, dls(id), contribs.reduceLeft(_ + _))
    }.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = Curation.bm25Retrieve(
      docs.repartition(7), "doc_id", "text", queryTerms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("property: packSequences offsets are contiguous and bins partition each shard") {
    val seqLen = 7
    val got = Curation.packSequences(docs.repartition(9), "doc_id", "text", "lang", seqLen)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byShard = got.groupBy(_._1)
    corpus.groupBy(_._2).foreach { case (lang, ds) =>
      val nonEmpty = ds.filter(d => toks(d._3).nonEmpty).sortBy(_._1)
      val rows = byShard.getOrElse(lang,
        Array.empty[(String, Long, Long, Long, Long, Long)]).sortBy(_._2)
      assert(rows.map(_._2).toSeq === nonEmpty.map(_._1), s"doc set $lang")
      // contiguity: each doc starts where the previous ended
      var offset = 0L
      rows.foreach { case (_, id, n, start, sBin, eBin) =>
        assert(start === offset, s"start of doc $id")
        assert(n === toks(nonEmpty.find(_._1 == id).get._3).size.toLong)
        assert(sBin === start / seqLen && eBin === (start + n - 1) / seqLen, s"bins of doc $id")
        offset += n
      }
    }
  }
}

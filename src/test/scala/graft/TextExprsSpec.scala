package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns

class TextExprsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // the HOF formulation the codegen expression replaced — ground truth
  private def hofShingles(tokensCol: org.apache.spark.sql.Column, n: Int) =
    when(size(tokensCol) >= n,
      array_distinct(transform(
        sequence(lit(1), size(tokensCol) - lit(n - 1)),
        i => concat_ws(" ", slice(tokensCol, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  test("codegen wordShingles is element-identical to the HOF form (random corpora)") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff")
    val rows = (0 until 200).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("toks")
    for (n <- Seq(2, 3)) {
      val diff = df.select(
        TextFns.wordShingles($"toks", n).as("cg"),
        hofShingles($"toks", n).as("hof"))
        .filter($"cg" =!= $"hof")
      assert(diff.count() === 0, s"n=$n mismatch")
    }
  }

  test("short, empty, and null token arrays yield an empty shingle set") {
    val df = Seq(
      (1, Some(Seq("only"))),
      (2, Some(Seq.empty[String])),
      (3, Option.empty[Seq[String]])).toDF("id", "toks")
    val got = df.select($"id", size(TextFns.wordShingles($"toks", 2)).as("s"))
      .as[(Int, Int)].collect().toMap
    assert(got === Map(1 -> 0, 2 -> 0, 3 -> 0))
  }

  test("duplicate shingles keep first-occurrence order, once") {
    val got = Seq(Tuple1(Seq("x", "y", "x", "y"))).toDF("toks")
      .select(TextFns.wordShingles($"toks", 2))
      .as[Seq[String]].head()
    assert(got === Seq("x y", "y x"))
  }

  // the HOF positional (non-distinct) formulation — ShingleList ground truth
  private def hofShingleList(tokensCol: org.apache.spark.sql.Column, n: Int) =
    when(size(tokensCol) >= n,
      transform(
        sequence(lit(1), size(tokensCol) - lit(n - 1)),
        i => concat_ws(" ", slice(tokensCol, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  test("codegen shingleList is element-identical to the positional HOF form") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val rows = (0 until 200).map { _ =>
      Tuple1(Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("toks")
    for (n <- Seq(1, 2, 3)) {
      val diff = df.select(
        TextFns.shingleList($"toks", n).as("cg"),
        hofShingleList($"toks", n).as("hof"))
        .filter($"cg" =!= $"hof")
      assert(diff.count() === 0, s"n=$n mismatch")
    }
  }

  test("shingleList keeps duplicates with position order; short/null input is empty") {
    val got = Seq(Tuple1(Seq("x", "y", "x", "y"))).toDF("toks")
      .select(TextFns.shingleList($"toks", 2))
      .as[Seq[String]].head()
    assert(got === Seq("x y", "y x", "x y"))
    val empties = Seq(
      (1, Some(Seq("only"))),
      (2, Some(Seq.empty[String])),
      (3, Option.empty[Seq[String]])).toDF("id", "toks")
      .select($"id", size(TextFns.shingleList($"toks", 2)).as("s"))
      .as[(Int, Int)].collect().toMap
    assert(empties === Map(1 -> 0, 2 -> 0, 3 -> 0))
  }

  test("fused winnowSelect equals the composable HOF selection (random corpora)") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ffff", "g")
    val rows = (0 until 300).map { _ =>
      // lengths 0..11 cover: shorter than k, shorter than one window, long
      Tuple1(Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    }
    val df = rows.toDF("toks")
    for ((k, w) <- Seq((3, 4), (2, 5), (1, 1))) {
      val grams = TextFns.shingleList($"toks", k)
      val hashes = transform(grams, g => substring(md5(g), 1, 16))
      val m = size(hashes)
      val hof = when(m > 0,
        array_distinct(transform(
          sequence(lit(1), greatest(m - lit(w) + 1, lit(1))),
          j => array_min(slice(hashes, j, lit(w))))))
        .otherwise(array().cast("array<string>"))
      val diff = df.select(
        TextFns.winnowSelect($"toks", k, w).as("fused"), hof.as("hof"))
        .filter($"fused" =!= $"hof")
      assert(diff.count() === 0, s"k=$k w=$w mismatch")
    }
  }

  test("nfc composes decomposed sequences, is idempotent, and passes nulls through") {
    val decomposed = "cafe\u0301 A\u030Angstro\u0308m"
    val composed = "caf\u00e9 \u00c5ngstr\u00f6m"
    val df = Seq(
      (1, Some(decomposed)),
      (2, Some(composed)),
      (3, Some("plain ascii")),
      (4, Option.empty[String])).toDF("id", "s")
    val got = df.select($"id", TextFns.nfc($"s").as("n")).as[(Int, Option[String])]
      .collect().toMap
    assert(got(1) === Some(composed))
    assert(got(2) === Some(composed)) // already-NFC passthrough
    assert(got(3) === Some("plain ascii"))
    assert(got(4) === None)
    // idempotence: nfc(nfc(x)) == nfc(x)
    val twice = df.filter($"s".isNotNull)
      .select(TextFns.nfc(TextFns.nfc($"s")).as("a"), TextFns.nfc($"s").as("b"))
      .filter($"a" =!= $"b")
    assert(twice.count() === 0)
  }

  test("nfc matches java.text.Normalizer on random combining-mark strings") {
    val rnd = new scala.util.Random(17)
    val pieces = Vector("e", "a", "o", "\u0301", "\u0308", "\u030A", "x", " ")
    val rows = (0 until 200).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(10))(pieces(rnd.nextInt(pieces.size))).mkString))
    val got = rows.toDF("id", "s").select($"id", TextFns.nfc($"s").as("n"))
      .as[(Int, String)].collect().toMap
    rows.foreach { case (i, s) =>
      assert(got(i) ===
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC), s"id=$i")
    }
  }
}

class RepetitionStatsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // plain-Scala replay of the documented semantics — ground truth
  private def repRef(toks: Seq[String]): Seq[Double] = {
    val total = toks.map(_.length).sum
    (2 to 10).map { n =>
      if (toks.size < n || total == 0) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toVector
        val counts = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
        if (n <= 4) {
          val (g, c) = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
          (c.toLong * (g.length - (n - 1))).toDouble / total.toDouble
        } else {
          val covered = Array.fill(toks.size)(false)
          grams.zipWithIndex.foreach { case (g, i) =>
            if (counts(g) > 1) (i until i + n).foreach(covered(_) = true)
          }
          covered.zipWithIndex.collect { case (true, i) => toks(i).length.toLong }
            .sum.toDouble / total.toDouble
        }
      }
    }
  }

  test("repetitionSignals: hand-computed fractions and keep verdict") {
    val docs = Seq((1L, "a b a b c"), (2L, "x y z x y z x y")).toDF("doc_id", "text")
    val got = graft.operators.Curation.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    // total=5; top2: "a b"x2 * 2ch = 0.8; top3 tie -> "a b a" 3ch = 0.6;
    // top4 tie -> "a b a b" 4ch = 0.8; n>=5: no duplicated gram / too short
    assert(r1.getDouble(1) === 0.8 && r1.getDouble(2) === 0.6 && r1.getDouble(3) === 0.8)
    (4 to 9).foreach(i => assert(r1.getDouble(i) === 0.0))
    assert(!r1.getBoolean(10))
    val r2 = got(2L)
    // total=8; top2 "x y"x3 = 0.75; top3 tie "x y z"x2 = 0.75; top4 tie
    // "x y z x"x2 = 1.0; dup5 "x y z x y" at 0 and 3 covers all 8 = 1.0
    assert(r2.getDouble(1) === 0.75 && r2.getDouble(2) === 0.75 && r2.getDouble(3) === 1.0)
    assert(r2.getDouble(4) === 1.0)
    (5 to 9).foreach(i => assert(r2.getDouble(i) === 0.0))
    assert(!r2.getBoolean(10))
  }

  test("repetitionSignals matches the plain-Scala replay on random corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "bb", "ccc", "d", "ee")
    val rows = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val got = graft.operators.Curation.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1 to 9).map(r.getDouble)).toMap
    rows.foreach { case (i, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val exp = repRef(if (text.trim.isEmpty) Seq.empty else toks)
      assert(got(i) === exp, s"doc $i: '$text'")
    }
  }

  test("repetition_stats is SQL-registered") {
    graft.core.GraftExtensions.register(TestSpark.spark)
    val r = TestSpark.spark.sql(
      "SELECT repetition_stats(array('a','b','a','b')).top_2gram_frac AS f")
      .collect().head.getDouble(0)
    // "a b" x2 * 2 chars / 4 chars
    assert(r === 1.0)
  }
}

class HashedTermFreqsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  // the relational form the fused expression replaced — ground truth
  private def relational(docs: org.apache.spark.sql.DataFrame, dims: Int) = {
    val toks = TextFns.tokens($"text")
    docs
      .select($"doc_id", size(toks).cast("long").as("n"), explode(toks).as("tk"))
      .withColumn("bucket",
        pmod(conv(substring(md5($"tk"), 1, 8), 16, 10).cast("long"), lit(dims.toLong)))
      .groupBy($"doc_id", $"bucket")
      .agg(count(lit(1)).as("tf"), max($"n").as("n"))
      .select($"doc_id", $"bucket", $"tf",
        ($"tf".cast("double") / $"n".cast("double")).as("weight"))
  }

  test("featureHashTf (fused) row-identical to the relational form on random docs") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("spark", "query", "fast", "table", "röw", "值", "x")
    val rows = (0L until 150L).map { i =>
      (i, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    for (dims <- Seq(8, 256)) {
      val fused = graft.operators.Curation.featureHashTf(docs, "doc_id", "text", dims)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val rel = relational(docs, dims)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(fused === rel, s"dims=$dims")
    }
  }

  test("hashed_term_freqs is SQL-registered and empty arrays yield empty maps") {
    graft.core.GraftExtensions.register(TestSpark.spark)
    val n = TestSpark.spark.sql(
      "SELECT size(hashed_term_freqs(array(), 64)) AS s").collect().head.getInt(0)
    assert(n === 0)
  }
}

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

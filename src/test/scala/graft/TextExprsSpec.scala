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
}

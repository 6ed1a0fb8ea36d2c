package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hashing, TextFns, VectorFns}

class HashingSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("surrogateKey matches dbt_utils.generate_surrogate_key semantics") {
    val got = Seq(("42", "GOLD")).toDF("id", "tier")
      .select(Hashing.surrogateKey($"id", $"tier")).as[String].head()
    assert(got === md5hex("42-GOLD"))
  }

  test("nulls hash as the dbt_utils sentinel (not empty string)") {
    val got = Seq((Some("a"), Option.empty[String])).toDF("x", "y")
      .select(Hashing.surrogateKey($"x", $"y")).as[String].head()
    assert(got === md5hex("a-" + Hashing.NullSentinel))
    // NULL and '' must NOT collide
    val empty = Seq((Some("a"), Some(""))).toDF("x", "y")
      .select(Hashing.surrogateKey($"x", $"y")).as[String].head()
    assert(empty === md5hex("a-"))
    assert(got !== empty)
  }

  test("property: surrogateKey == md5 of '-'-joined strings (100 generated pairs)") {
    val gen = Gen.listOfN(100, Gen.zip(Gen.asciiPrintableStr, Gen.alphaNumStr))
    val pairs = gen(Gen.Parameters.default, Seed(42L)).get
    val df = pairs.toDF("a", "b")
      .select($"a", $"b", Hashing.surrogateKey($"a", $"b").as("hk"))
    df.as[(String, String, String)].collect().foreach { case (a, b, hk) =>
      assert(hk === md5hex(s"$a-$b"), s"for ($a, $b)")
    }
  }

  test("sha256Key uses '||' separator and sha-256") {
    val got = Seq(("x", "y")).toDF("a", "b")
      .select(Hashing.sha256Key($"a", $"b")).as[String].head()
    val exp = MessageDigest.getInstance("SHA-256").digest("x||y".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got === exp)
  }
}

class TextFnsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("sanitizeText strips html, quotes, and collapses whitespace") {
    val got = Seq("  Hello <b>World</b>\n 'quoted'  ").toDF("t")
      .select(TextFns.sanitizeText($"t"))
    assert(one[String](got) === "hello world quoted")
  }

  test("tokens of empty/blank text is an empty array") {
    val got = Seq(("", "a b  c")).toDF("e", "t")
      .select(size(TextFns.tokens($"e")), size(TextFns.tokens($"t")))
    assert(got.as[(Int, Int)].head() === ((0, 3)))
  }

  test("bpeishTokenCount segments letter runs, digit runs, punct marks") {
    val got = Seq("hello, world42!").toDF("t").select(TextFns.bpeishTokenCount($"t"))
    // hello , world 42 ! -> 5
    assert(one[Int](got) === 5)
  }

  test("wordShingles produces distinct n-grams; short docs yield empty") {
    val got = Seq("a b c b c").toDF("t")
      .select(TextFns.wordShingles(TextFns.tokens($"t"), 2))
    assert(one[Seq[String]](got).toSet === Set("a b", "b c", "c b"))
    val short = Seq("a").toDF("t").select(size(TextFns.wordShingles(TextFns.tokens($"t"), 2)))
    assert(one[Int](short) === 0)
  }

  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b"), Seq("c"))).toDF("x", "y", "z")
    assert(one[Double](df.select(TextFns.jaccard($"x", $"y"))) === 1.0)
    assert(one[Double](df.select(TextFns.jaccard($"x", $"z"))) === 0.0)
  }

  test("langId picks the language with most stopword hits, 'und' for none") {
    val df = Seq(
      "the cat is in the house and it is big",
      "der hund ist nicht mit der katze",
      "zzz qqq xxx").toDF("t")
      .select(TextFns.langId(TextFns.tokens($"t")).as("l"))
    assert(df.as[String].collect().toSeq === Seq("en", "de", "und"))
  }

  test("qualityScore is within [0,1] and rewards longer alphabetic text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog " * 6,
      "!!! ??? ...").toDF("t")
      .select(TextFns.qualityScore($"t").as("q"))
    val Seq(good, bad) = df.as[Double].collect().toSeq
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("Hello  World", "hello world")).toDF("a", "b")
      .select(TextFns.fingerprint($"a") === TextFns.fingerprint($"b"))
    assert(one[Boolean](df))
  }
}

class VectorFnsSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  test("codegen dot/distSq are bit-identical to the sequential HOF fold") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { _ =>
      (Seq.fill(64)(rnd.nextFloat()), Seq.fill(64)(rnd.nextDouble()))
    }
    val df = rows.toDF("f", "d")
    val hofDot = aggregate(
      zip_with($"f", $"d", (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x)
    val hofDist = aggregate(
      zip_with($"f", $"d", (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
      VectorFns.dot($"f", $"d").as("cg_dot"), hofDot.as("hof_dot"),
      VectorFns.distSq($"f", $"d").as("cg_dist"), hofDist.as("hof_dist"))
      .filter($"cg_dot" =!= $"hof_dot" || $"cg_dist" =!= $"hof_dist")
    assert(diff.count() === 0) // exact ==, not a tolerance
    // null propagation
    val nulls = Seq((Option.empty[Seq[Double]], Some(Seq(1.0)))).toDF("a", "b")
      .select(VectorFns.dot($"a", $"b"))
    assert(nulls.collect().head.isNullAt(0))
  }

  test("ragged (unequal-length) inputs yield null, matching the HOF fold") {
    // zip_with pads the shorter side with nulls, which poison the fold to
    // NULL — the codegen expressions must agree, not emit a partial sum.
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val row = df.select(
      VectorFns.dot($"a", $"b"), VectorFns.distSq($"a", $"b"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x))
      .collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.isNullAt(2)) // the HOF form it must match
  }

  test("codegen orderedSum is bit-identical to aggregate(sort_array(...), 0.0, +)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 60).map { i =>
      // mixed signs, duplicates, a signed zero, varying lengths incl. empty
      Tuple1(Seq.fill(i % 7)(rnd.nextDouble() * 2.0 - 1.0) ++
        (if (i % 3 == 0) Seq(-0.0, 0.0) else Nil))
    }
    val df = rows.toDF("xs")
    val hof = aggregate(sort_array($"xs"), lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
      graft.functions.VectorExprs.orderedSum($"xs").as("cg"), hof.as("hof"))
      .filter($"cg" =!= $"hof")
    assert(diff.count() === 0)
    // null input propagates
    val n = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("xs")
      .select(graft.functions.VectorExprs.orderedSum($"xs")).collect().head
    assert(n.isNullAt(0))
    // SQL registration
    graft.core.GraftExtensions.register(TestSpark.spark)
    assert(TestSpark.spark.sql("SELECT ordered_sum(array(3.0d, 1.0d, 2.0d))")
      .collect().head.getDouble(0) === 6.0)
  }

  test("dot, norm, cosine, distSq on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 4.0, 4.0), Seq(0.0, 0.0, 0.0)))
      .toDF("a", "b", "z")
    val row = df.select(
      VectorFns.dot($"a", $"b"),
      VectorFns.norm($"a"),
      VectorFns.cosine($"a", $"b"),
      VectorFns.cosine($"a", $"z"),
      VectorFns.distSq($"a", $"b")).collect().head
    assert(row.getDouble(0) === 18.0)
    assert(row.getDouble(1) === 3.0)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12) // parallel vectors
    assert(row.isNullAt(3)) // zero-norm -> null, not NaN
    assert(row.getDouble(4) === (1.0 + 4.0 + 4.0))
  }
}

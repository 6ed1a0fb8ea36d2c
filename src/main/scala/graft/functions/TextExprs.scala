package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen form of the word-n-gram shingle set.
  *
  * The HOF formulation (`transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i, n)))` + `array_distinct`) evaluates through interpreted
  * lambda plumbing and allocates a slice array + sequence array per
  * shingle — measured at sf0.1 it was ~90% of the MinHash signature stage
  * (4.2 s vs 0.3 s for the bare token explode). This expression is one
  * compiled loop building the same strings in the same first-occurrence
  * order, so every downstream hash (md5 family, xxhash64 family) sees
  * byte-identical input and every oracle stays valid.
  *
  * Semantics (must stay exactly `TextFns.wordShingles`): distinct
  * space-joined n-grams in first-occurrence order; fewer than n tokens →
  * empty array; null element handling matches concat_ws (nulls skipped).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    WordShingles.compute(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  private val Sep = UTF8String.fromString(" ")

  /** Compiled shingle loop — called from both interpreted eval and the
    * generated code.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Positional (non-distinct) word-n-gram list: one space-joined n-gram per
  * starting position, in position order — the sequence form winnowing and
  * n-gram language models need, where `WordShingles`' distinct SET form
  * would lose multiplicity and position. Same compiled-loop rationale as
  * `WordShingles`; fewer than n tokens → empty array.
  */
case class ShingleList(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    ShingleList.compute(in.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleList.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleList {

  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i + n <= m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Unicode NFC normalization (canonical composition) as a native codegen
  * expression — Spark ships no normalizer builtin, and a text pipeline
  * ingesting web data must canonicalize before hashing/dedup or the same
  * visible string ("café" composed vs decomposed) fingerprints twice.
  * NFC is fully specified by the Unicode standard (UAX #15), so
  * `java.text.Normalizer` here and ICU's `nfc_normalize` in the SQL
  * oracle produce byte-identical output.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(in: Any): Any =
    NfcNormalize.compute(in.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // quickCheck-positive strings (the overwhelming hot path on already-
    // normalized corpora) skip the String round-trip allocation
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

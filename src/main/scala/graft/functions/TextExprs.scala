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

/** Fused winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
  * SIGMOD'03): positional k-gram md5-16-hex-prefix hashes + sliding
  * window-of-w minima + distinct, as ONE compiled pass. The composable
  * formulation (`ShingleList` → `transform(md5)` → window-min HOF) is
  * semantically identical but allocates a slice array + sequence per
  * window through interpreted lambda plumbing — measured 24.5 s for the
  * corpus query at sf0.1, ~20% of the whole bench. This expression hashes
  * each gram incrementally (no gram string materialized; md5 over the
  * identical separator-joined byte sequence) and takes window minima with
  * a monotone deque — O(m) total, not O(m·w).
  *
  * Semantics contract (pinned by `TextExprsSpec` equality and the
  * `q_winnow_fp` oracle): fewer than k tokens → empty; fewer grams than
  * one window → the single overall minimum; else one minimum per window,
  * distinct. Byte-identical to the SQL-replayable HOF form.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(in: Any): Any =
    WinnowFingerprints.compute(in.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes

  def compute(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val m = arr.numElements()
    if (m < k) return new GenericArrayData(Array.empty[AnyRef])
    val g = m - k + 1
    val md = md5.get()
    // 16-hex-char prefixes (8 digest bytes) of each gram's md5; the gram
    // string "t1 t2 .. tk" is hashed incrementally, never materialized
    val hs = new Array[UTF8String](g)
    var i = 0
    while (i < g) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(arr.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](16)
      var b = 0
      while (b < 8) {
        hex(2 * b) = Hex((d(b) >> 4) & 0xF)
        hex(2 * b + 1) = Hex(d(b) & 0xF)
        b += 1
      }
      hs(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    // sliding-window minima via monotone deque (indices, ascending values)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val dq = new Array[Int](g)
    var head = 0
    var tail = 0
    var x = 0
    while (x < g) {
      while (tail > head && hs(dq(tail - 1)).compareTo(hs(x)) >= 0) tail -= 1
      dq(tail) = x
      tail += 1
      while (dq(head) < x - w + 1) head += 1
      if (x >= w - 1) seen.add(hs(dq(head)))
      x += 1
    }
    // fewer grams than one window: the single truncated window's minimum
    // (= the overall minimum, which the deque head still holds)
    if (g < w) seen.add(hs(dq(head)))
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
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

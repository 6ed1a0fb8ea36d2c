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

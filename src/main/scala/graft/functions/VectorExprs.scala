package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen expressions for the dense-vector hot loops.
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) evaluate
  * through interpreted lambda plumbing and block whole-stage codegen for
  * the enclosing operator — acceptable once per row, but the similarity
  * joins evaluate a dot product once per CANDIDATE PAIR. These expressions
  * compile to a tight scalar loop inside the generated code.
  *
  * Determinism contract: the accumulation is the same sequential
  * left-to-right fold as `functions.aggregate`, so results are
  * bit-identical to the HOF form (and to a SQL oracle's `list_reduce`) —
  * swapping them in cannot change any oracle-checked value. That includes
  * ragged inputs: `zip_with` pads the shorter array with nulls, which
  * poison the fold to NULL — so these expressions also return NULL when
  * the two arrays differ in length (a silently-partial sum would be a
  * plausible wrong number; a null is a conspicuous one).
  *
  * Inputs: equal-length `array<float>` or `array<double>` (each side may
  * differ in element type); null if either side is null or the lengths
  * differ; elements are assumed non-null (dense embeddings).
  */
private[functions] trait VectorLoop { self: BinaryExpression =>

  override def dataType: DataType = DoubleType

  // Length-mismatched inputs yield null even when both children are
  // non-nullable, so nullability cannot be derived from the children.
  override def nullable: Boolean = true

  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def get(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def genGet(arr: String, i: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Sequential-fold dot product: sum_i a(i)*b(i). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorLoop {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(x, i, lf) * get(y, i, rf); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${ev.value} += ${genGet(a, i, isFloat(left))} * ${genGet(b, i, isFloat(right))};
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential-fold squared euclidean distance: sum_i (a(i)-b(i))^2. */
case class DistanceSq(left: Expression, right: Expression)
    extends BinaryExpression with VectorLoop {

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(x, i, lf) - get(y, i, rf)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${genGet(a, i, isFloat(left))} - ${genGet(b, i, isFloat(right))};
         |    ${ev.value} += $d * $d;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Order-deterministic sum of an `array<double>`: sort ascending, then fold
  * left from 0.0 — the replay-exact sum contract used wherever a double
  * aggregation must hash-match an independent engine (PageRank neighbor
  * sums, the bigram-LM per-doc fold). Semantically identical to
  * `aggregate(sort_array(xs), 0.0, (a, x) -> a + x)`, but that HOF chain
  * evaluates through interpreted lambda plumbing (ArrayAggregate is
  * CodegenFallback) with per-element boxing, once per GROUP; this fuses
  * sort+fold into one primitive-double loop inside whole-stage codegen.
  * `java.util.Arrays.sort(double[])` and Spark's `sort_array` share the
  * same total order (-0.0 < 0.0, NaN last), so results are bit-identical.
  *
  * Null input yields null; elements are assumed non-null (the inputs are
  * `collect_list` outputs, which never contain null).
  */
case class OrderedSumDoubles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) { xs(i) = arr.getDouble(i); i += 1 }
    java.util.Arrays.sort(xs)
    var acc = 0.0
    i = 0
    while (i < n) { acc += xs(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      s"""
         |int $n = $a.numElements();
         |double[] $xs = new double[$n];
         |for (int $i = 0; $i < $n; $i++) { $xs[$i] = $a.getDouble($i); }
         |java.util.Arrays.sort($xs);
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) { ${ev.value} += $xs[$i]; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** Column API: codegen'd dot product over float/double arrays. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd squared euclidean distance. */
  def distSq(a: Column, b: Column): Column =
    Bridge.column(DistanceSq(Bridge.expression(a), Bridge.expression(b)))

  /** Column API: codegen'd order-deterministic (sorted ascending) sum. */
  def orderedSum(xs: Column): Column =
    Bridge.column(OrderedSumDoubles(Bridge.expression(xs)))
}

package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.IntersectCardSorted

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions, so `spark.sql("SELECT intersect_card_sorted(a, b)")`
  * works for SQL-surface users. Enable with
  * `spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** The injected SQL functions (exposed so they can also be registered
    * into an already-running session's FunctionRegistry).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq((
    FunctionIdentifier("intersect_card_sorted"),
    new ExpressionInfo(classOf[IntersectCardSorted].getName, "intersect_card_sorted"),
    (children: Seq[Expression]) => IntersectCardSorted(children(0), children(1))))

  /** Register the graft functions into an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{HashedTermFreqs, IntersectCardSorted, NfcNormalize, OrderedSumDoubles, RepetitionStats, ShingleList, WordShingles}

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
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("intersect_card_sorted"),
      new ExpressionInfo(classOf[IntersectCardSorted].getName, "intersect_card_sorted"),
      (children: Seq[Expression]) => IntersectCardSorted(children(0), children(1))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children(0))),
    (FunctionIdentifier("shingle_list"),
      new ExpressionInfo(classOf[ShingleList].getName, "shingle_list"),
      (children: Seq[Expression]) => ShingleList(children(0), foldableInt(children(1), "shingle_list(arr, n)"))),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children(0), foldableInt(children(1), "word_shingles(arr, n)"))),
    (FunctionIdentifier("ordered_sum"),
      new ExpressionInfo(classOf[OrderedSumDoubles].getName, "ordered_sum"),
      (children: Seq[Expression]) => OrderedSumDoubles(children(0))),
    (FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStats(children(0))),
    (FunctionIdentifier("hashed_term_freqs"),
      new ExpressionInfo(classOf[HashedTermFreqs].getName, "hashed_term_freqs"),
      (children: Seq[Expression]) => HashedTermFreqs(children(0),
        foldableInt(children(1), "hashed_term_freqs(arr, dims)"))))

  private def foldableInt(e: Expression, site: String): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$site needs a literal integer n, got: $other")
  }

  /** Register the graft functions into an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BreadthQueries

/** Structural invariants for the SQL-breadth queries (value-exactness is
  * the DuckDB oracle's job; these assert the semantics the oracle can't
  * see — bounds, complements, melt arithmetic).
  */
class BreadthQueriesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    BreadthQueries.all.find(_.name == name).get.fn(spark, dir)

  test("window suite: ranks bounded, percent_rank/cume_dist in [0,1]") {
    val bad = run("q_window_suite").filter(
      $"quartile" < 1 || $"quartile" > 4 ||
        $"prank" < 0 || $"prank" > 1 || $"cdist" <= 0 || $"cdist" > 1).count()
    assert(bad === 0L)
  }

  test("grouping sets: one subtotal row per segment plus one per nation") {
    val df = run("q_grouping_sets").cache()
    val segs = df.filter($"g_seg" === 0).count()
    val nations = df.filter($"g_nation" === 0).count()
    val c = queries.Q.t(spark, dir, "customer")
    val n = queries.Q.t(spark, dir, "nation")
    assert(segs === c.select($"c_mktsegment").distinct().count())
    assert(nations === c.join(n, $"c_nationkey" === $"n_nationkey")
      .select($"n_name").distinct().count())
    assert(df.count() === segs + nations)
  }

  test("unpivot melts every part row into exactly two metric rows") {
    val parts = queries.Q.t(spark, dir, "part").count()
    val df = run("q_unpivot").cache()
    assert(df.count() === 2 * parts)
    assert(df.groupBy($"metric").count().as[(String, Long)].collect().toMap ===
      Map("p_retailprice" -> parts, "p_size" -> parts))
  }

  test("array HOFs: positives+non-positives = dims, l1 >= |first|") {
    val emb = queries.Q.t(spark, dir, "embeddings")
    val dims = emb.select(size($"embedding")).as[Int].head()
    val bad = run("q_array_hof")
      .filter($"n_pos" < 0 || $"n_pos" > dims || $"l1" < abs($"first_val") ||
        $"vmax" < $"first_val").count()
    assert(bad === 0L)
  }
}

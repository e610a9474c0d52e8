package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specs for the native top-k-per-group operator (custom LogicalPlan +
  * strategy + physical heaps): result parity with the window form, the
  * two-phase plan shape, and heap-boundary semantics.
  */
class TopKSpec extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k).drop("rnk")
  }

  test("native top-k equals the ROW_NUMBER window form") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i % 37, (i * 31) % 1000, i.toLong))
      .toDF("g", "v", "id")
    val native = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 5)
      .collect().map(_.toString).sorted
    val window = windowTopK(df, 5).collect().map(_.toString).sorted
    assert(native.length == window.length && native.sameElements(window))
  }

  test("plan has partial + final phases around one exchange, no Window/Sort") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 5, i, i.toLong)).toDF("g", "v", "id")
    val plan = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, s"expected 2 phases in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no exchange in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "), s"sort/window leaked into:\n$plan")
  }

  test("k larger than every group returns all rows; heap evicts strictly worse rows") {
    import spark.implicits._
    val df = Seq((1, 10, 1L), (1, 20, 2L), (1, 20, 3L), (2, 5, 4L))
      .toDF("g", "v", "id")
    val all = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 10)
    assert(all.count() == 4)
    // ties on v broken by id ascending: top-2 of g=1 is (20,id=2),(20,id=3)
    val top2 = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .filter(col("g") === 1).select("id").collect().map(_.getLong(0)).sorted
    assert(top2.sameElements(Array(2L, 3L)))
  }

  test("partial-phase flush-and-reset past the group threshold is lossless") {
    import spark.implicits._
    // 200 groups per partition, threshold 7: the partial phase flushes and
    // resets its heap store dozens of times per partition (exercising the
    // carry-row handoff between chunks); the final merge must still equal
    // the window form exactly
    val df = (1 to 4000).map(i => (i % 200, (i * 13) % 500, i.toLong))
      .toDF("g", "v", "id").repartition(4)
    spark.conf.set("spark.graft.topk.maxPartialGroups", "7")
    try {
      val native = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 3)
        .collect().map(_.toString).sorted
      val window = windowTopK(df, 3).collect().map(_.toString).sorted
      assert(native.length == window.length && native.sameElements(window))
    } finally spark.conf.unset("spark.graft.topk.maxPartialGroups")
  }

  test("map-side cap: partial phase bounds shuffle input per partition") {
    import spark.implicits._
    // one group spread over many partitions, 100 rows each: the partial
    // phase must cap each partition's contribution at k
    val df = (1 to 800).map(i => (0, i, i.toLong)).toDF("g", "v", "id")
      .repartition(8)
    val res = TopK.perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 3)
      .select("v").collect().map(_.getInt(0)).sorted
    assert(res.sameElements(Array(798, 799, 800)))
  }
}

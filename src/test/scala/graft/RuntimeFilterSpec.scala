package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter join pruning (InjectRuntimeFilter): a
  * selective filter on the creation side of a shuffle equi-join makes the
  * optimizer build a bloom filter over the join keys and push a
  * `might_contain` probe into the application side's scan — rows that
  * cannot join are dropped BEFORE the shuffle. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only
  * the fraction that survives the dimension's predicate.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // local test tables are tiny — drop the size floors so the rule fires
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withConfs[T](body: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bloom filter is injected into the application side of a selective join") {
    val lineitem = graft.sources.Tables.load(spark, sf, "lineitem")
    val orders = graft.sources.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    withConfs {
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n$optimized")
      // correctness unchanged by the injected filter
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
        expected.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
  }
}

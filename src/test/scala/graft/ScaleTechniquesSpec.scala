package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Specs for the explicit at-scale techniques: salted skew joins and
  * bucketed-table shuffle elision.
  */
class ScaleTechniquesSpec extends SparkTestBase {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // heavy skew: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1, s"l$i")) ++ (1 to 100).map(i => (i + 1, s"x$i")))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salt = 8)
      .select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // spark.sql.warehouse.dir is static; use the default warehouse and
    // drop the tables afterwards. Disable broadcast to force the SMJ path.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // through the library API: triples bucketed on Subject
      val a = (1 to 1000).map(i => (i, 1, i * 2))
        .toDF(graft.core.TripleSchema.subject, graft.core.TripleSchema.predicate,
          graft.core.TripleSchema.objekt)
      val b = (1 to 1000).map(i => (i, 2, i * 3))
        .toDF(graft.core.TripleSchema.subject, graft.core.TripleSchema.predicate,
          graft.core.TripleSchema.objekt)
      graft.plans.Layouts.writeBucketed(a, "bucketed_a", graft.plans.Layouts.BySubject, 8)
      graft.plans.Layouts.writeBucketed(b, "bucketed_b", graft.plans.Layouts.BySubject, 8)

      val joined = spark.table("bucketed_a")
        .join(spark.table("bucketed_b"), graft.core.TripleSchema.subject)
      val physical = joined.queryExecution.executedPlan.toString

      assert(joined.count() == 1000)
      // co-bucketed join: no ShuffleExchange on either side
      assert(!physical.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join, got:\n$physical")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("persisted rdf layout: Q1 chain plan has no per-query range exchange") {
    import graft.sources.RdfBridge
    val eng = new graft.operators.QueryEngine(spark, RdfBridge.dictionary(spark, sf))
    eng.registerSingleTablePersisted(RdfBridge.triples(spark, sf), sf)
    val df = eng.sql(
      """SELECT t.Object AS o1, t1.Object AS o2, t2.Object AS o3
        |FROM `table` t
        |INNER JOIN `table` t1 ON t.Object = t1.Subject
        |INNER JOIN `table` t2 ON t1.Object = t2.Subject
        |WHERE t.Subject = (SELECT MIN(Subject) FROM `table` WHERE Predicate = -2)
        |  AND t.Predicate = -2 AND t1.Predicate = -13 AND t2.Predicate = -21""".stripMargin)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.toLowerCase.contains("rangepartitioning"),
      s"per-query range exchange survived persisted layout:\n$physical")
    assert(df.count() > 0)
  }

  test("persisted split layout: Positive/Negative prune sign partitions") {
    import graft.sources.RdfBridge
    val eng = new graft.operators.QueryEngine(spark, RdfBridge.dictionary(spark, sf))
    eng.registerSplitTablesPersisted(RdfBridge.triples(spark, sf), sf)
    val pos = spark.table("Positive")
    // partition filter on sign, no Filter over a unioned recompute: the scan
    // itself reads only the pos partition
    val scan = pos.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("sign"),
      s"expected sign partition pruning in:\n$scan")
    val negCount = spark.table("Negative")
      .filter(col(graft.core.TripleSchema.subject) >= 0).count()
    assert(negCount == 0)
  }
}

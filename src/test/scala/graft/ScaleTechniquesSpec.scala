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
}

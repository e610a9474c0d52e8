package graft

import graft.core.{Dictionary, TripleSchema}
import org.apache.spark.sql.functions._

/** The graft_decode analyzer rule: `SELECT graft_decode(c)` must plan as a
  * left-outer join against the `graft_dictionary` view and return lexical
  * forms — equivalent to Dictionary.decode, but available in plain SQL.
  */
class DecodeRewriteSpec extends SparkTestBase {

  private def setup(): Unit = {
    import spark.implicits._
    Seq((1, "one"), (-2, "neg two"), (3, "three"))
      .toDF("id", "term").createOrReplaceTempView("graft_dictionary")
    Seq((1, 9, -2), (3, 9, 99))
      .toDF(TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
      .createOrReplaceTempView("dec_triples")
  }

  test("graft_decode(col) rewrites to a dictionary join in SQL") {
    setup()
    val out = spark.sql(
      """SELECT graft_decode(Subject) AS s, graft_decode(Object) AS o
        |FROM dec_triples""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), Option(r.getString(1))))
      .sortBy(_.toString)
    assert(rows.toSeq == Seq(("one", Some("neg two")), ("three", None)).sortBy(_.toString))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"expected decode joins in plan:\n$plan")
  }

  test("graft_decode works in WHERE clauses (join below the filter)") {
    setup()
    val rows = spark.sql(
      "SELECT Subject FROM dec_triples WHERE graft_decode(Subject) = 'one'")
      .collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(1))
  }

  test("graft_decode in GROUP BY key + select list binds both to one join") {
    setup()
    val out = spark.sql(
      """SELECT graft_decode(Subject) AS s, COUNT(*) AS n
        |FROM dec_triples GROUP BY graft_decode(Subject)""".stripMargin)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("one", 1L), ("three", 1L)))
    // memoized rewrite: ONE dictionary join for the two textual occurrences
    val joins = out.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size == 1, s"expected one memoized dict join, got ${joins.size}")
  }

  test("graft_decode inside an aggregate function argument works") {
    setup()
    val n = spark.sql(
      "SELECT COUNT(DISTINCT graft_decode(Subject)) AS n FROM dec_triples")
      .head().getLong(0)
    assert(n == 2)
  }

  test("graft_decode outside supported positions fails with a clear analysis error") {
    setup()
    val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      "SELECT Subject FROM dec_triples ORDER BY graft_decode(Subject)").collect())
    assert(e.getMessage.contains("graft_decode is supported in SELECT projections"),
      s"unexpected error: ${e.getMessage}")
  }

  test("decode of a plain grouping key hoists above the aggregate") {
    setup()
    // GROUP BY the raw key, decode in the select list only: the rule
    // aliases the key out of the Aggregate and decodes on top (one join
    // per GROUP, not per row)
    val rows = spark.sql(
      """SELECT graft_decode(Subject) AS s, COUNT(*) AS n
        |FROM dec_triples GROUP BY Subject""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_.toString)
    assert(rows.toSeq == Seq(("one", 1L), ("three", 1L)))
  }

  test("grouping-key decode combines with an in-aggregate decode in one query") {
    setup()
    // entry 1 hoists above the Aggregate; entry 2 stays below and takes the
    // memo-join rewrite on the next analyzer pass — both in one statement
    val rows = spark.sql(
      """SELECT graft_decode(Subject) AS s, COUNT(graft_decode(Object)) AS n
        |FROM dec_triples GROUP BY Subject""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_.toString)
    // Object -2 decodes ('neg two'), 99 does not (null, uncounted)
    assert(rows.toSeq == Seq(("one", 1L), ("three", 0L)))
  }

  test("unsupported aggregate shapes fail with the clear error, not a cryptic one") {
    setup()
    // decode of a genuinely NON-grouping column in the select list: no
    // rewrite case may claim it — Spark's own missing-group-by analysis
    // error (which names the offending expression) must surface
    val e1 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT graft_decode(Object) AS o, COUNT(*) AS n
        |FROM dec_triples GROUP BY Subject""".stripMargin).collect())
    assert(e1.getMessage.toUpperCase.contains("GROUP"),
      s"unexpected error: ${e1.getMessage}")
    // decode OF an aggregate result: the join condition would contain MIN
    val e2 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT graft_decode(MIN(Object)) AS o
        |FROM dec_triples GROUP BY Subject""".stripMargin).collect())
    assert(e2.getMessage.contains("graft_decode is supported in SELECT projections"),
      s"unexpected error: ${e2.getMessage}")
    // mixed top-level decode + aggregate function in ONE expression
    val e3 = intercept[org.apache.spark.sql.AnalysisException](spark.sql(
      """SELECT concat(graft_decode(Subject), CAST(COUNT(*) AS STRING)) AS x
        |FROM dec_triples GROUP BY Subject""".stripMargin).collect())
    assert(e3.getMessage.contains("graft_decode is supported in SELECT projections"),
      s"unexpected error: ${e3.getMessage}")
  }

  test("graft_dot treats null array elements as zero in both eval paths") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT)))").head().getDouble(0)
    assert(v == 6.0)
  }

  test("graft_decode matches Dictionary.decode on the same data") {
    setup()
    val dict = Dictionary.fromPairs(spark, Seq(1 -> "one", -2 -> "neg two", 3 -> "three"))
    val viaRule = spark.sql(
      "SELECT graft_decode(Subject) AS s FROM dec_triples")
      .collect().map(_.getString(0)).sorted
    val viaJoin = dict.decode(spark.table("dec_triples"), Seq(TripleSchema.subject))
      .select(col(TripleSchema.subject).as("s"))
      .collect().map(_.getString(0)).sorted
    assert(viaRule.sameElements(viaJoin))
  }
}

package graft.sparql

import graft.SparkTestBase
import graft.core.{Dictionary, TripleSchema}
import graft.plans.Layouts
import graft.operators.QueryEngine
import org.apache.spark.sql.functions._

class SparqlSpec extends SparkTestBase {

  test("parser: single pattern, all term kinds") {
    val q = SparqlParser.parse("SELECT * WHERE {'aString1' <aString2> ':aString3'}")
    assert(q.patterns == Seq(TriplePattern(
      Constant("aString1"), Constant("aString2"), Constant(":aString3"))))
    assert(q.projection.isEmpty)
  }

  test("parser: multi-pattern BGP keeps ALL patterns (reference keeps only the last)") {
    val q = SparqlParser.parse("SELECT ?x ?z WHERE { ?x ?y ?z . ?z <p> 'lit' }")
    assert(q.patterns.size == 2)
    assert(q.projection == Seq("x", "z"))
    assert(q.patterns.head == TriplePattern(Variable("x"), Variable("y"), Variable("z")))
  }

  test("parser: URI with path reduces to last segment") {
    val q = SparqlParser.parse("SELECT * WHERE { ?s <http://ex.org/a/b/Pred> ?o }")
    assert(q.patterns.head.p == Constant("Pred"))
  }

  test("parser: quoted literal containing dots survives pattern splitting") {
    val q = SparqlParser.parse(
      "SELECT * WHERE { ':node_376609000_1451606409000_-9.15947_38.70289' <a> ':Node' }")
    assert(q.patterns.size == 1)
    assert(q.patterns.head.s == Constant(":node_376609000_1451606409000_-9.15947_38.70289"))
  }

  // tiny in-memory triple store: (1,10,2) (2,11,3) (-5,10,1) (1,12,1) dup row
  private def fixture = {
    import spark.implicits._
    Seq((1, 10, 2), (2, 11, 3), (-5, 10, 1), (1, 12, 1), (1, 12, 1))
      .toDF(TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
  }
  private def dict = Dictionary.fromPairs(spark, Seq(
    (1, "one"), (2, "two"), (3, "three"), (-5, "minusfive"),
    (10, ":p10"), (11, ":p11"), (12, ":p12")))

  private def mkEngine(split: Boolean): QueryEngine = {
    val e = new QueryEngine(spark, dict)
    if (split) e.registerSplitTables(fixture, Layouts.BySubject, 2)
    else e.registerSingleTable(fixture, Layouts.BySubject, 2)
    e
  }

  test("planner: chain BGP joins on shared variable") {
    val rows = mkEngine(split = false)
      .sparql("SELECT ?a ?c WHERE { ?a ':p10' ?b . ?b ':p11' ?c }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows == Set((1, 3))) // 1-p10->2-p11->3
  }

  test("planner: sign routing — bound negative subject scans Negative only") {
    val df = mkEngine(split = true).sparql("SELECT ?o WHERE { 'minusfive' ':p10' ?o }")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("planner: unbound subject unions both sign tables, bag semantics") {
    val rows = mkEngine(split = true).sparql("SELECT ?s WHERE { ?s ':p12' ?o }")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 1)) // duplicate row kept (UNION ALL)
  }

  test("planner: fully bound pattern acts as existence filter") {
    val e = mkEngine(split = false)
    assert(e.sparql("SELECT * WHERE { 'one' ':p10' 'two' }").count() == 1)
    assert(e.sparql("SELECT * WHERE { 'one' ':p10' 'three' }").count() == 0)
  }

  test("planner: unknown constant yields empty result, not error") {
    assert(mkEngine(split = false).sparql("SELECT ?o WHERE { 'nope' ':p10' ?o }").count() == 0)
  }

  test("planner: repeated variable within a pattern forces equality") {
    val rows = mkEngine(split = false).sparql("SELECT ?x WHERE { ?x ':p12' ?x }")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 1)) // (1,12,1) twice; (1,10,2) excluded
  }

  test("decoded output maps back to lexical forms") {
    val got = mkEngine(split = false)
      .sparqlDecoded("SELECT ?a ?c WHERE { ?a ':p10' ?b . ?b ':p11' ?c }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("one", "three")))
  }

  test("layout invariance: split-table plan ≡ single-table plan results") {
    val q = "SELECT ?s ?o WHERE { ?s ':p10' ?o }"
    val a = mkEngine(split = false).sparql(q).collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val b = mkEngine(split = true).sparql(q).collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(a.sameElements(b))
  }
}

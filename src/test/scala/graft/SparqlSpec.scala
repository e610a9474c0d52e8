package graft

import graft.core.{Dictionary, TripleSchema}
import graft.operators.QueryEngine
import graft.sparql._
import org.apache.spark.sql.functions._

/** Parser + BGP planner specs: the 8-template routing matrix of the
  * reference translator (MyOpVisitorBase.java:88-125) plus the multi-pattern
  * generalization its last-pattern-wins bug prevented.
  */
class SparqlSpec extends SparkTestBase {

  test("parser keeps ALL patterns of a multi-pattern BGP") {
    val q = SparqlParser.parse(
      "SELECT ?x ?z WHERE { ?x :p1 ?y . ?y :p2 ?z . ?z :p3 'end node' }")
    assert(q.patterns.length == 3)
    assert(q.projection == Seq("x", "z"))
    assert(q.patterns(2).o == Constant("end node"))
  }

  test("parser: star projection, variable/constant/uri terms") {
    val q = SparqlParser.parse("SELECT * WHERE { 'subj' <http://ex.org/pred> ?o }")
    assert(q.projection.isEmpty)
    assert(q.patterns.head.s == Constant("subj"))
    assert(q.patterns.head.p == Constant("pred")) // URI reduced to last segment
    assert(q.patterns.head.o == Variable("o"))
  }

  test("parser rejects non-BGP input") {
    intercept[IllegalArgumentException](
      SparqlParser.parse("INSERT DATA { <a> <b> <c> }"))
  }

  test("ASK: true iff the BGP has any solution; probes only one row") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    assert(reg.sparql("ASK { 'a' :p1 ?o }").collect().head.getBoolean(0))
    assert(!reg.sparql("ASK { 'd' :p1 ?o }").collect().head.getBoolean(0))
    val q = SparqlParser.parse("ASK { ?s ?p ?o }")
    assert(q.ask && q.projection.isEmpty)
  }

  test("CONSTRUCT: template instantiated per solution, set semantics") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // reverse the :p1 edges through the template
    val rows = reg.sparql("CONSTRUCT { ?o :p1 ?s } WHERE { ?s :p1 ?o }")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(rows == Seq((10, 1, -5), (11, 1, 6)))
    // ground template constant + dedup: every solution instantiates the
    // same triple once
    val one = reg.sparql("CONSTRUCT { 'a' :p3 'd' } WHERE { ?s :p1 ?o }")
      .collect()
    assert(one.length == 1 && one.head.getInt(0) == -5)
    // CONSTRUCT WHERE { bgp }: template == pattern group (the 1.1 shorthand)
    val cw = reg.sparql("CONSTRUCT WHERE { ?s :p1 ?o }")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(cw == Seq((-5, 1, 10), (6, 1, 11)))
    // paths are not triples — the shorthand rejects them loudly
    intercept[IllegalArgumentException](
      SparqlParser.parse("CONSTRUCT WHERE { ?s :p1/:p2 ?o }"))
  }

  test("PREFIX declarations expand declared names; REDUCED dedups") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // ex:a expands to <http://ex.org/a> -> last segment 'a'; the undeclared
    // default-prefix predicate :p1 passes through verbatim
    val rows = reg.sparql(
      "PREFIX ex: <http://ex.org/> SELECT ?o WHERE { ex:a :p1 ?o }")
      .collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(10))
    // a quoted literal containing a colon is NOT a prefixed name
    val q = SparqlParser.parse(
      "PREFIX ex: <http://ex.org/> SELECT ?o WHERE { 'ex:a' :p1 ?o }")
    assert(q.patterns.head.s == Constant("ex:a"))
    // REDUCED permits dedup — implemented as DISTINCT
    val r = SparqlParser.parse("SELECT REDUCED ?s WHERE { ?s ?p ?o }")
    assert(r.distinct && r.projection == Seq("s"))
    // declared prefixes inside PATH syntax expand to plain local names,
    // so the sequence grammar still recognizes them
    val seq = reg.sparql(
      "PREFIX x: <http://ex.org/> SELECT ?m WHERE { x:a x:p1/x:p2 ?m }")
    // x:p1 -> 'p1' which is NOT in the dictionary (stored as ':p1'), so
    // empty — but the PATTERN must have expanded to a 2-step chain
    val seqAst = SparqlParser.parse(
      "PREFIX x: <http://ex.org/> SELECT ?m WHERE { x:a x:p1/x:p2 ?m }")
    assert(seqAst.patterns.length == 2 && seq.count() == 0)
  }

  test("DESCRIBE returns every triple mentioning the resource") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // 'b' = 10: subject of (10,2,-7), object of (-5,1,10)
    val rows = reg.sparql("DESCRIBE 'b'")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted
    assert(rows.toSeq == Seq((-5, 1, 10), (10, 2, -7)))
    // unknown term describes nothing (empty, not an error)
    assert(reg.sparql("DESCRIBE 'nosuch'").count() == 0)
    intercept[IllegalArgumentException](SparqlParser.parse("DESCRIBE ?x"))
    // DESCRIBE ?v WHERE { bgp }: describes every binding of ?v — 'a' :p1
    // binds y=10, and 10 appears in (-5,1,10) and (10,2,-7)
    val dw = reg.sparql("DESCRIBE ?y WHERE { 'a' :p1 ?y }")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted
    assert(dw.toSeq == Seq((-5, 1, 10), (10, 2, -7)))
    // the described variable must be bound by the group
    intercept[IllegalArgumentException](
      SparqlParser.parse("DESCRIBE ?z WHERE { 'a' :p1 ?y }"))
  }

  test("the reference's own sample queries parse and run verbatim") {
    // MyOpVisitorBase.java:132-133 — the exact query texts the reference
    // feeds its translator, including the AIS literal with dots, dashes,
    // and a colon inside the quotes. The reference's visitor kept only the
    // LAST pattern of these; here both patterns join.
    val ais = SparqlParser.parse("SELECT * WHERE " +
      "{':node_376609000_1451606409000_-9.15947_38.70289' <a> ?x . ?x <a> ':Node'}")
    assert(ais.patterns == Seq(
      TriplePattern(Constant(":node_376609000_1451606409000_-9.15947_38.70289"),
        Constant("a"), Variable("x")),
      TriplePattern(Variable("x"), Constant("a"), Constant(":Node"))))
    val str = SparqlParser.parse("SELECT * WHERE {'aString' <a> ?x . ?x <a> ':Node'}")
    assert(str.patterns.length == 2)
    // terms absent from a dictionary: the plan runs and returns empty
    val (engine, triples) = fixture
    assert(engine.registerSplitTables(triples)
      .sparql("SELECT * WHERE {'aString' <a> ?x . ?x <a> ':Node'}").count() == 0)
  }

  test("term normalization: variables, quotes, URIs, prefixed names") {
    assert(Dictionary.normalizeTerm("?v") == null)
    assert(Dictionary.normalizeTerm("'lit'") == "lit")
    assert(Dictionary.normalizeTerm("<http://a/b/c>") == "c")
    assert(Dictionary.normalizeTerm(":name") == ":name")
  }

  private def fixture: (QueryEngine, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val triples = Seq(
      (-5, 1, 10), (10, 2, -7), (-7, 3, 20), // chain: -5 -> 10 -> -7 -> 20
      (6, 1, 11), (11, 2, -8),
      (-9, 9, -9)).toDF(
      TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    val dict = Dictionary.fromPairs(spark, Seq(
      -5 -> "a", 10 -> "b", -7 -> "c", 20 -> "d", 6 -> "e", 11 -> "f",
      -8 -> "g", -9 -> "h", 1 -> ":p1", 2 -> ":p2", 3 -> ":p3", 9 -> ":loop"))
    (new QueryEngine(spark, dict), triples)
  }

  test("property paths inside OPTIONAL / UNION / MINUS groups") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // OPTIONAL with a closure path: m=-7 reaches 20 via :p3+, m=-8 reaches
    // nothing -> null pads
    val opt = reg.sparql("SELECT ?x ?m ?r WHERE { ?x :p2 ?m . " +
      "OPTIONAL { ?m :p3+ ?r } }")
      .collect().map(r => (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getInt(2))))
      .toSet
    assert(opt == Set((-7, Some(20)), (-8, None)))
    // UNION arm with a closure path unions with a plain arm
    val uni = reg.sparql("SELECT ?s ?o WHERE { { ?s :p3+ ?o } UNION { ?s :loop ?o } }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(uni == Set((-7, 20), (-9, -9)))
    // MINUS with a sequence path: o=10 has the :p2/:p3 hop (10->-7->20),
    // o=11 does not (-8 has no :p3) — only the o=11 row survives
    val min = reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "MINUS { ?o :p2/:p3 ?z } }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(min == Set((6, 11)))
  }

  test("SPARQL UPDATE: insert mints ids, deletes filter, derivation constructs") {
    import graft.sparql.SparqlUpdate
    val (engine, triples) = fixture
    val dict = engine.dict
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet

    // INSERT DATA: known terms reuse ids; new terms get ids past max (20)
    val ins = SparqlUpdate(spark, triples, dict,
      "INSERT DATA { 'a' ':p1' 'newnode' . 'a' ':p9' 'b' }")
    assert(ins.triples.count() == triples.count() + 2)
    val newIds = ins.dict.encodeTerms(Seq("newnode", ":p9"))
    assert(newIds.values.forall(_ > 20), s"fresh ids must exceed max: $newIds")
    assert(ins.dict.encodeTerm("'a'").contains(-5)) // known id unchanged

    // DELETE DATA removes every copy of the listed ground triple
    val dup = triples.unionAll(triples.limit(1)) // (-5,1,10) twice
    val del = SparqlUpdate(spark, dup, dict, "DELETE DATA { 'a' ':p1' 'b' }")
    assert(!rows(del.triples).contains((-5, 1, 10)) &&
      del.triples.count() == triples.count() - 1)

    // DELETE DATA with an unknown term is a no-op, not an error
    val noop = SparqlUpdate(spark, triples, dict, "DELETE DATA { 'zz' ':p1' 'b' }")
    assert(noop.triples.count() == triples.count())

    // DELETE WHERE: pattern matches drop; repeated variable = self-loop only
    val dw = SparqlUpdate(spark, triples, dict, "DELETE WHERE { ?x ':p2' ?y }")
    assert(rows(dw.triples).intersect(Set((10, 2, -7), (11, 2, -8))).isEmpty &&
      dw.triples.count() == triples.count() - 2)
    val loop = SparqlUpdate(spark, triples, dict, "DELETE WHERE { ?x ?p ?x }")
    assert(!rows(loop.triples).contains((-9, 9, -9)) &&
      loop.triples.count() == triples.count() - 1)
    intercept[IllegalArgumentException](SparqlUpdate(spark, triples, dict,
      "DELETE WHERE { ?x ':p1' ?y . ?y ':p2' ?z }"))

    // INSERT..WHERE derives through CONSTRUCT with a minted predicate
    val iw = SparqlUpdate(spark, triples, dict,
      "INSERT { ?x ':hop2' ?m } WHERE { ?x :p1 ?y . ?y :p2 ?m }")
    val hop2 = iw.dict.encodeTerm("':hop2'").get
    assert(rows(iw.triples).contains((-5, hop2, -7)) &&
      rows(iw.triples).contains((6, hop2, -8)) &&
      iw.triples.count() == triples.count() + 2)

    // DELETE..INSERT..WHERE: ONE pre-update binding pass feeds both
    // templates — inverting :p2 deletes exactly what the WHERE matched,
    // so a sequential delete-then-re-match would insert NOTHING; the
    // atomic modify must insert every inverted edge
    val mod = SparqlUpdate(spark, triples, dict,
      "DELETE { ?x ':p2' ?y } INSERT { ?y ':p2inv' ?x } WHERE { ?x :p2 ?y }")
    val p2inv = mod.dict.encodeTerm("':p2inv'").get
    val p2 = dict.encodeTerm("':p2'").get
    assert(rows(mod.triples).contains((-7, p2inv, 10)) &&
      rows(mod.triples).contains((-8, p2inv, 11)),
      "insert must instantiate from the PRE-delete bindings")
    assert(!rows(mod.triples).exists(_._2 == p2),
      "every matched :p2 triple must be deleted")
    assert(mod.triples.count() == triples.count(),
      "rename-shape modify preserves the triple count")
    // unbound template variable fails loudly
    intercept[IllegalArgumentException](SparqlUpdate(spark, triples, dict,
      "DELETE { ?x ':p2' ?y } INSERT { ?y ':p2inv' ?zz } WHERE { ?x :p2 ?y }"))
  }

  test("BGP: 3-hop chain join across sign-split tables") {
    val (engine, triples) = fixture
    val rows = engine.registerSplitTables(triples)
      .sparql("SELECT ?m ?o WHERE { 'a' :p1 ?x . ?x :p2 ?m . ?m :p3 ?o }")
      .collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((-7, 20)))
  }

  test("BGP: unbound subject unions Positive and Negative") {
    val (engine, triples) = fixture
    val rows = engine.registerSplitTables(triples)
      .sparql("SELECT ?s WHERE { ?s :p2 ?o }")
      .collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(10, 11))
  }

  test("BGP: constant absent from dictionary yields empty, not error") {
    val (engine, triples) = fixture
    assert(engine.registerSplitTables(triples)
      .sparql("SELECT ?o WHERE { 'zzz' :p1 ?o }").count() == 0)
  }

  test("BGP: repeated variable in one pattern forces intra-row equality") {
    val (engine, triples) = fixture
    val rows = engine.registerSingleTable(triples)
      .sparql("SELECT ?x WHERE { ?x :loop ?x }").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(-9))
  }

  test("decode maps ids back to lexical forms via broadcast join") {
    val (engine, triples) = fixture
    val rows = engine.registerSingleTable(triples)
      .sparqlDecoded("SELECT ?m ?o WHERE { 'a' :p1 ?x . ?x :p2 ?m . ?m :p3 ?o }")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("c", "d")))
  }

  test("single-table and split-table layouts give identical results") {
    val (engine, triples) = fixture
    val q = "SELECT ?s ?o WHERE { ?s :p1 ?o }"
    val single = engine.registerSingleTable(triples).sparql(q).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val split = engine.registerSplitTables(triples).sparql(q).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(single == split && single.nonEmpty)
  }

  test("disconnected BGP patterns cross-join (SPARQL bag semantics)") {
    val (engine, triples) = fixture
    // patterns share no variable: result cardinality = product
    val n = engine.registerSingleTable(triples)
      .sparql("SELECT ?a ?b WHERE { ?x :p1 ?a . ?y :p3 ?b }").count()
    val p1 = engine.sparql("SELECT ?a WHERE { ?x :p1 ?a }").count()
    val p3 = engine.sparql("SELECT ?b WHERE { ?y :p3 ?b }").count()
    assert(n == p1 * p3 && n > 0)
  }

  test("projection of a variable absent from the BGP fails with analysis error") {
    val (engine, triples) = fixture
    engine.registerSingleTable(triples)
    intercept[Exception](
      engine.sparql("SELECT ?nope WHERE { ?x :p1 ?a }").collect())
  }

  test("parser: FILTER conditions extracted, patterns intact, LIMIT parsed") {
    val q = SparqlParser.parse(
      "SELECT ?x ?y WHERE { ?x :p1 ?y . FILTER(?y = 'lit val') . ?y :p2 ?z . FILTER(?z != ?x) } LIMIT 7")
    assert(q.patterns.length == 2)
    assert(q.filters == Seq(
      FilterCond("y", FilterEq, Constant("lit val")),
      FilterCond("z", FilterNeq, Variable("x"))))
    assert(q.limit.contains(7))
  }

  test("parser: no FILTER / no LIMIT → empty filters, None limit") {
    val q = SparqlParser.parse("SELECT * WHERE { ?s :p1 ?o }")
    assert(q.filters.isEmpty && q.limit.isEmpty)
  }

  test("parser rejects unsupported FILTER condition forms") {
    intercept[IllegalArgumentException](
      SparqlParser.parse("SELECT ?x WHERE { ?x :p1 ?y . FILTER(isIRI(?y)) }"))
    // comparisons are supported since round 4 — they must parse
    assert(SparqlParser.parse("SELECT ?x WHERE { ?x :p1 ?y . FILTER(?y > 3) }")
      .filters.head.op == FilterGt)
  }

  test("FILTER equality on constant narrows the BGP result") {
    val (engine, triples) = fixture
    val rows = engine.registerSplitTables(triples)
      .sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o = 'b') }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((-5, 10)))
  }

  test("FILTER inequality drops the matching binding; unknown term matches nothing") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val neq = reg.sparql("SELECT ?s WHERE { ?s :p1 ?o . FILTER(?o != 'b') }")
      .collect().map(_.getInt(0)).toSeq
    assert(neq == Seq(6))
    // `= unknown` is empty, `!= unknown` keeps everything
    assert(reg.sparql("SELECT ?s WHERE { ?s :p1 ?o . FILTER(?o = 'zzz') }").count() == 0)
    assert(reg.sparql("SELECT ?s WHERE { ?s :p1 ?o . FILTER(?o != 'zzz') }").count() == 2)
  }

  test("FILTER variable-variable equality and the unbound-variable error") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    val rows = reg.sparql("SELECT ?x WHERE { ?x :loop ?y . FILTER(?x = ?y) }")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(-9))
    intercept[IllegalArgumentException](
      reg.sparql("SELECT ?x WHERE { ?x :p1 ?y . FILTER(?nope = 'b') }"))
  }

  test("parser: OPTIONAL group extracted, required patterns intact") {
    val q = SparqlParser.parse(
      "SELECT ?s ?z WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } . FILTER(?s != 'e') }")
    assert(q.patterns.length == 1)
    assert(q.optionals == Seq(Seq(
      TriplePattern(Variable("o"), Constant(":p3"), Variable("z")))))
    assert(q.filters == Seq(FilterCond("s", FilterNeq, Constant("e"))))
  }

  test("OPTIONAL binds when matched, nulls when not (SPARQL LeftJoin)") {
    val (engine, triples) = fixture
    // (10,:p2,-7): -7 has a :p3 edge -> z=20; (11,:p2,-8): no :p3 -> null
    val rows = engine.registerSplitTables(triples)
      .sparql("SELECT ?s ?z WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } }")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sortBy(_._1)
    assert(rows.toSeq == Seq((10, Some(20)), (11, None)))
  }

  test("FILTER on an optional variable drops unbound rows (SPARQL error semantics)") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val eq = reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } . FILTER(?z = 'd') }")
      .collect().map(_.getInt(0)).toSeq
    assert(eq == Seq(10))
    // != also drops null bindings: comparison with unbound is an error
    val neq = reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } . FILTER(?z != 'd') }")
      .count()
    assert(neq == 0)
  }

  test("LIMIT caps the result set size exactly") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o } LIMIT 1").count() == 1)
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o } LIMIT 100").count() == 2)
  }

  test("SELECT DISTINCT deduplicates the projected solutions") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    // ?p ranges over predicates 1,2 for two chains each -> bag of 5 rows
    // (p1 x2, p2 x2, p3 x1) collapses to 3 distinct predicates... the
    // fixture has :p1 twice, :p2 twice, :p3 once, :loop once = 6 rows,
    // 4 distinct. Project only the subject's predicate variable via a
    // var-predicate pattern.
    val bag = reg.sparql("SELECT ?p WHERE { ?s ?p ?o }").count()
    val set = reg.sparql("SELECT DISTINCT ?p WHERE { ?s ?p ?o }").count()
    assert(bag == 6 && set == 4)
    val q = SparqlParser.parse("SELECT DISTINCT ?p WHERE { ?s ?p ?o }")
    assert(q.distinct && q.projection == Seq("p"))
  }

  test("parser: UNION arms, ORDER BY items, OFFSET extracted") {
    val q = SparqlParser.parse(
      "SELECT ?a ?b WHERE { { ?a :p1 ?x } UNION { ?b :p2 ?y . ?y :p3 ?z } } " +
        "ORDER BY DESC(?a) ?b LIMIT 10 OFFSET 5")
    assert(q.patterns.isEmpty)
    assert(q.unionArms.map(_.length) == Seq(1, 2))
    assert(q.orderBy == Seq(("a", false), ("b", true)))
    assert(q.limit.contains(10) && q.offset.contains(5))
    // LimitOffsetClauses: either order accepted
    val q2 = SparqlParser.parse("SELECT ?s WHERE { ?s :p1 ?o } OFFSET 1 LIMIT 2")
    assert(q2.limit.contains(2) && q2.offset.contains(1))
    intercept[IllegalArgumentException](
      SparqlParser.parse("SELECT ?s WHERE { ?s :p1 ?o } HAVING (?s > 1)"))
  }

  test("UNION: bag semantics with null padding for arm-local variables") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val rows = reg.sparql(
      "SELECT ?m ?o WHERE { { ?s :p1 ?m } UNION { ?s :p2 ?o } }").collect()
    // arm1 binds ?m (2 rows, ?o null), arm2 binds ?o (2 rows, ?m null)
    assert(rows.length == 4)
    assert(rows.count(r => !r.isNullAt(0) && r.isNullAt(1)) == 2)
    assert(rows.count(r => r.isNullAt(0) && !r.isNullAt(1)) == 2)
    // shared variable stays one column: both arms bind ?x
    val shared = reg.sparql(
      "SELECT ?x WHERE { { ?s :p1 ?x } UNION { ?s :p2 ?x } }").collect()
    assert(shared.map(_.getInt(0)).sorted.toSeq == Seq(-8, -7, 10, 11))
  }

  test("ORDER BY + OFFSET + LIMIT slice the ordered solution sequence") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    // DECODED ordering: subjects sort by their lexical terms (a..h), not
    // their encoded ids — desc by term: h(-9) f(11) e(6) c(-7) b(10) a(-5)
    val all = reg.sparql(
      "SELECT ?s ?p ?o WHERE { ?s ?p ?o } ORDER BY DESC(?s)").collect()
    assert(all.map(_.getInt(0)).toSeq == Seq(-9, 11, 6, -7, 10, -5))
    val sliced = reg.sparql(
      "SELECT ?s ?p ?o WHERE { ?s ?p ?o } ORDER BY DESC(?s) LIMIT 2 OFFSET 1")
      .collect()
    assert(sliced.map(_.getInt(0)).toSeq == Seq(11, 6))
  }

  test("ORDER BY sorts NUMERIC terms by value, with id order reversed") {
    import spark.implicits._
    // value ids DESCEND as values ascend: id -104 ⇒ "2", -103 ⇒ "9",
    // -102 ⇒ "10", -101 ⇒ "30" — id order would yield 30, 10, 9, 2
    val triples = Seq(
      (1, 7, -104), (2, 7, -103), (3, 7, -102), (4, 7, -101)).toDF(
      TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    val dict = Dictionary.fromPairs(spark, Seq(
      7 -> ":val", -104 -> "2", -103 -> "9", -102 -> "10", -101 -> "30"))
    val reg = new QueryEngine(spark, dict).registerSingleTable(triples)
    val got = reg.sparql(
      "SELECT ?s ?v WHERE { ?s :val ?v } ORDER BY ?v").collect()
    // numeric value order, NOT lexical ("10" < "2" lexically) and NOT id
    assert(got.map(_.getInt(1)).toSeq == Seq(-104, -103, -102, -101))
    // ties on ?v break deterministically by the secondary variable
    val tied = Seq((5, 7, -104), (1, 7, -104), (3, 7, -103)).toDF(
      TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    val reg2 = new QueryEngine(spark, dict).registerSingleTable(tied)
    val t = reg2.sparql(
      "SELECT ?s ?v WHERE { ?s :val ?v } ORDER BY ?v ?s").collect()
    assert(t.map(r => (r.getInt(1), r.getInt(0))).toSeq ==
      Seq((-104, 1), (-104, 5), (-103, 3)))
  }

  test("ORDER BY: OPTIONAL-unbound sorts first ascending, last descending") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // ?m ∈ {-7, -8}; only -7 has a :p3 edge — ?r is null for -8
    val asc = reg.sparql("SELECT ?m ?r WHERE { ?x :p2 ?m . " +
      "OPTIONAL { ?m :p3 ?r } } ORDER BY ?r").collect()
    assert(asc.head.isNullAt(1) && !asc.last.isNullAt(1))
    val desc = reg.sparql("SELECT ?m ?r WHERE { ?x :p2 ?m . " +
      "OPTIONAL { ?m :p3 ?r } } ORDER BY DESC(?r)").collect()
    assert(!desc.head.isNullAt(1) && desc.last.isNullAt(1))
  }

  test("parser: COUNT aggregates and GROUP BY extracted") {
    val q = SparqlParser.parse(
      "SELECT ?n (COUNT(?c) AS ?cnt) (COUNT(DISTINCT ?c) AS ?dcnt) " +
        "WHERE { ?c :p1 ?n } GROUP BY ?n ORDER BY ?n LIMIT 5")
    assert(q.projection == Seq("n", "cnt", "dcnt"))
    assert(q.countAggs == Seq(
      CountAgg(Some("c"), distinct = false, "cnt"),
      CountAgg(Some("c"), distinct = true, "dcnt")))
    assert(q.groupByVars == Seq("n") && q.orderBy == Seq(("n", true)))
    val star = SparqlParser.parse("SELECT (COUNT(*) AS ?total) WHERE { ?s ?p ?o }")
    assert(star.countAggs == Seq(CountAgg(None, distinct = false, "total")))
    assert(star.groupByVars.isEmpty)
  }

  test("COUNT/GROUP BY aggregate the solution sequence") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    // predicates 1 and 2 occur twice, 3 and 9 once
    val rows = reg.sparql(
      "SELECT ?p (COUNT(?s) AS ?cnt) WHERE { ?s ?p ?o } GROUP BY ?p")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows == Map(1 -> 2L, 2 -> 2L, 3 -> 1L, 9 -> 1L))
    // global aggregate (no GROUP BY): one row
    val total = reg.sparql("SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }")
      .collect()
    assert(total.length == 1 && total.head.getLong(0) == 6L)
    // COUNT DISTINCT: objects of p1/p2 are all distinct, subjects repeat
    val d = reg.sparql(
      "SELECT (COUNT(DISTINCT ?o) AS ?n) WHERE { ?s ?p ?o }").collect()
    assert(d.head.getLong(0) == 6L)
    // MIN/MAX/SUM over the p1 group: objects 10/11, subjects -5 + 6 = 1
    val mm = reg.sparql(
      "SELECT ?p (MIN(?o) AS ?lo) (MAX(?o) AS ?hi) (SUM(?s) AS ?ssum) " +
        "WHERE { ?s ?p ?o } GROUP BY ?p").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(mm(1) == ((10, 11, 1L)))
    intercept[IllegalArgumentException](
      SparqlParser.parse("SELECT (MAX(*) AS ?m) WHERE { ?s ?p ?o }"))
  }

  test("property path: one-or-more closure over an alternation") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // chain a -p1-> b -p2-> c -p3-> d: closure from 'a' over all three
    val rows = reg.sparql(
      "SELECT ?o WHERE { 'a' (:p1|:p2|:p3)+ ?o }").collect().map(_.getInt(0))
    assert(rows.sorted.toSeq == Seq(-7, 10, 20))
    // single-predicate path: one step only from 'a'
    val one = reg.sparql("SELECT ?o WHERE { 'a' :p1+ ?o }").collect()
    assert(one.map(_.getInt(0)).toSeq == Seq(10))
    // path composes with a plain pattern through the shared variable
    val joined = reg.sparql(
      "SELECT ?o ?z WHERE { 'a' (:p1|:p2)+ ?o . ?o :p3 ?z }").collect()
    assert(joined.map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((-7, 20)))
    // unknown subject term: empty, not an error
    assert(reg.sparql("SELECT ?o WHERE { 'nosuch' :p1+ ?o }").count() == 0)
    // zero-or-more includes the zero-step binding (the subject itself)
    val star = reg.sparql(
      "SELECT ?o WHERE { 'a' (:p1|:p2|:p3)* ?o }").collect().map(_.getInt(0))
    assert(star.sorted.toSeq == Seq(-7, -5, 10, 20))
    assert(reg.sparql("SELECT ?o WHERE { 'nosuch' :p1* ?o }").count() == 0)
    // zero-or-one: the subject itself plus DIRECT successors only
    val opt = reg.sparql(
      "SELECT ?o WHERE { 'a' (:p1|:p2|:p3)? ?o }").collect().map(_.getInt(0))
    assert(opt.sorted.toSeq == Seq(-5, 10)) // NOT the 2-hop -7 or 3-hop 20
    assert(reg.sparql("SELECT ?o WHERE { 'nosuch' :p1? ?o }").count() == 0)
  }

  test("property path: bounded repetition {n,m} / {n} / {n,}") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // chain a -p1-> b -p2-> c -p3-> d (ids -5 -> 10 -> -7 -> 20)
    def q(path: String): Seq[Int] =
      reg.sparql(s"SELECT ?o WHERE { 'a' $path ?o }")
        .collect().map(_.getInt(0)).sorted.toSeq
    assert(q("(:p1|:p2|:p3){2,3}") == Seq(-7, 20)) // depths 2 and 3 only
    assert(q("(:p1|:p2|:p3){2}") == Seq(-7))       // exactly 2
    assert(q("(:p1|:p2|:p3){2,}") == Seq(-7, 20))  // 2 or more
    assert(q("(:p1|:p2|:p3){0,1}") == Seq(-5, 10)) // like `?`
    assert(q("(:p1|:p2|:p3){0,0}") == Seq(-5))     // zero step only
    // exact-depth is PATH length, not shortest-visit depth: the 9-loop
    // (h -loop-> h) reaches h at EVERY depth
    assert(reg.sparql("SELECT ?o WHERE { 'h' :loop{3} ?o }")
      .collect().map(_.getInt(0)).toSeq == Seq(-9))
    // variable-variable windowed pairs: depth-2 pairs of BOTH chains
    // (a->b->c and e->f->g)
    val pairs = reg.sparql(
      "SELECT ?s ?o WHERE { ?s (:p1|:p2|:p3){2,2} ?o }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((-5, -7), (6, -8), (10, 20)))
    // bound object: who reaches 'd' in exactly 2 steps
    assert(reg.sparql("SELECT ?s WHERE { ?s (:p1|:p2|:p3){2} 'd' }")
      .collect().map(_.getInt(0)).toSeq == Seq(10))
    // unknown subject: empty under every window, including {0,…}
    assert(reg.sparql("SELECT ?o WHERE { 'nosuch' :p1{0,2} ?o }").count() == 0)
    // out-of-subset bounds fail loudly
    assertThrows[IllegalArgumentException](
      reg.sparql("SELECT ?o WHERE { 'a' :p1{3,2} ?o }").collect())
    assertThrows[IllegalArgumentException](
      reg.sparql("SELECT ?o WHERE { 'a' :p1{1,99} ?o }").collect())
  }

  test("property path: closure over a NEGATED property set") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // edges NOT :p1 from 'a': only 10-:p2->-7, -7-:p3->20 are non-p1, but
    // 'a'(-5) has no non-p1 out-edge, so the closure is empty
    assert(reg.sparql("SELECT ?o WHERE { 'a' (!:p1)+ ?o }").count() == 0)
    // negating :p2|:p3 leaves :p1 and :loop edges: from 'a' one hop to 10,
    // where the walk stops (10's only out-edge is :p2 — excluded)
    val noTail = reg.sparql(
      "SELECT ?o WHERE { 'a' (!(:p2|:p3))+ ?o }").collect().map(_.getInt(0))
    assert(noTail.toSeq == Seq(10))
    // negating only :p3 walks :p1/:p2 edges two hops: a -> 10 -> -7
    val twoHop = reg.sparql(
      "SELECT ?o WHERE { 'a' (!:p3)+ ?o }").collect().map(_.getInt(0))
    assert(twoHop.sorted.toSeq == Seq(-7, 10))
    // `*` adds the zero-step binding (the subject itself)
    val star = reg.sparql(
      "SELECT ?o WHERE { 'a' (!:p3)* ?o }").collect().map(_.getInt(0))
    assert(star.sorted.toSeq == Seq(-7, -5, 10))
    // an un-encodable negated term excludes nothing: same as any-predicate
    val unknown = reg.sparql(
      "SELECT ?o WHERE { 'a' (!:nosuch)+ ?o }").collect().map(_.getInt(0))
    assert(unknown.sorted.toSeq == Seq(-7, 10, 20))
    // self-loop stays reachable through the complement set
    val loop = reg.sparql(
      "SELECT ?o WHERE { 'h' (!:p1)+ ?o }").collect().map(_.getInt(0))
    assert(loop.toSeq == Seq(-9))
  }

  test("property path: closure with INVERSE members") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // chain -5 -p1-> 10 -p2-> -7 -p3-> 20; from 'c'(-7): ^p2 reverses to
    // 10, :p3 forwards to 20; neither target continues in the set
    val mixed = reg.sparql(
      "SELECT ?o WHERE { 'c' (^:p2|:p3)+ ?o }").collect().map(_.getInt(0))
    assert(mixed.sorted.toSeq == Seq(10, 20))
    // pure inverse closure walks the chain backwards: from 'd'(20),
    // ^p3 -> -7, then ^p2 -> 10, then ^p1 -> -5
    val back = reg.sparql(
      "SELECT ?o WHERE { 'd' (^:p1|^:p2|^:p3)+ ?o }").collect().map(_.getInt(0))
    assert(back.sorted.toSeq == Seq(-7, -5, 10))
    // `*` adds the zero-step binding
    val star = reg.sparql(
      "SELECT ?o WHERE { 'd' (^:p3)* ?o }").collect().map(_.getInt(0))
    assert(star.sorted.toSeq == Seq(-7, 20))
  }

  test("sparqlDecoded decodes id columns only; aggregates pass through") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val rows = reg.sparqlDecoded(
      "SELECT ?p (COUNT(?s) AS ?cnt) WHERE { ?s ?p ?o } GROUP BY ?p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // predicate ids decode to lexical forms; counts stay numeric
    assert(rows == Map(":p1" -> 2L, ":p2" -> 2L, ":p3" -> 1L, ":loop" -> 1L))
  }

  test("BIND adds visible bindings: variable alias and constant") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val rows = reg.sparql(
      "SELECT ?s ?o2 ?tag WHERE { ?s :p1 ?o . BIND(?o AS ?o2) . BIND('d' AS ?tag) }")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((-5, 10, 20), (6, 11, 20))) // 'd' encodes to 20
    // an unknown constant binds the error value (null), rows survive
    val nulls = reg.sparql(
      "SELECT ?s ?x WHERE { ?s :p1 ?o . BIND('nosuch' AS ?x) }")
      .collect().map(r => (r.getInt(0), r.isNullAt(1)))
    assert(nulls.forall(_._2) && nulls.length == 2)
    // a FILTER can reference the bound variable
    val f = reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . BIND(?o AS ?o2) FILTER(?o2 = 'b') }")
      .collect().map(_.getInt(0))
    assert(f.toSeq == Seq(-5))
    // rebinding an existing variable is an error
    intercept[IllegalArgumentException](reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . BIND(?s AS ?o) }").collect())
  }

  test("BIND(COALESCE/IF): OPTIONAL defaults and conditional bindings") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // COALESCE falls back when the OPTIONAL left ?r unbound:
    // a: 10 -> -7 -> 20 binds r=20; e: 11 -> -8 -> (no :p3) leaves r null
    val co = reg.sparql("SELECT ?s ?v WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p2 ?m . ?m :p3 ?r } BIND(COALESCE(?r, ?o) AS ?v) }")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(co == Set((-5, 20L), (6, 11L)))
    // all arguments error (unknown term) -> the alias binds null
    val nulls = reg.sparql(
      "SELECT ?s ?x WHERE { ?s :p1 ?o . BIND(COALESCE('nosuch') AS ?x) }")
      .collect().map(r => (r.getInt(0), r.isNullAt(1)))
    assert(nulls.length == 2 && nulls.forall(_._2))
    // IF with a TERM comparison (term ordering = id ordering, the layout
    // contract): o='b' -> else, o='f' -> then
    val iff = reg.sparql(
      "SELECT ?s ?f WHERE { ?s :p1 ?o . BIND(IF(?o > 'b', 1, 0) AS ?f) }")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(iff == Set((-5, 0L), (6, 1L)))
    // ...a NUMERIC literal against an ID variable is a decoded-VALUE
    // comparison inside IF too (pre-joined `__val_` column): every term of
    // this vocabulary is non-numeric, so the condition is a SPARQL type
    // error on every row — the IF nulls, it does NOT compare ids
    val ifNum = reg.sparql(
      "SELECT ?s ?f WHERE { ?s :p1 ?o . BIND(IF(?o > 10, 1, 0) AS ?f) }")
      .collect().map(r => (r.getInt(0), r.isNullAt(1))).toSet
    assert(ifNum == Set((-5, true), (6, true)))
    // BINDs evaluate in SOURCE order (SPARQL pattern order): an earlier
    // arithmetic alias feeds a later IF — ?k is a NUMBER, so the numeric
    // comparison applies to it directly (o=10 -> k=11 -> else; o=11 ->
    // k=12 -> then)
    val chain = reg.sparql("SELECT ?s ?f WHERE { ?s :p1 ?o . " +
      "BIND(?o + 1 AS ?k) BIND(IF(?k > 11, 1, 0) AS ?f) }")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(chain == Set((-5, 0L), (6, 1L)))
    // IF with BOUND over an OPTIONAL variable; branches are dictionary terms
    val bnd = reg.sparql("SELECT ?s ?v WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p2 ?m . ?m :p3 ?r } BIND(IF(BOUND(?r), 'd', 'b') AS ?v) }")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(bnd == Set((-5, 20L), (6, 10L)))
    // SPARQL error semantics: a null (errored) condition nulls the IF —
    // the term comparison with the unbound ?r is an error, not false
    val err = reg.sparql("SELECT ?s ?f WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p2 ?m . ?m :p3 ?r } BIND(IF(?r > 'a', 1, 0) AS ?f) }")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(err == Set((-5, Some(1L)), (6, None)))
  }

  test("multi-variable VALUES with UNDEF: per-row wildcard") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // p1 solutions: (a=-5, b=10), (e=6, f=11). Row 1 pins both variables;
    // row 2 leaves ?s UNDEF and pins ?o='f' — together both solutions pass,
    // each through exactly one row.
    val rows = reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "VALUES (?s ?o) { ('a' 'b') (UNDEF 'f') } }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((-5, 10), (6, 11)))
    // an all-UNDEF row restricts nothing
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "VALUES (?s ?o) { (UNDEF UNDEF) } }").count() == 2)
    // UNDEF does NOT extend an OPTIONAL-unbound variable (stays null)
    val opt = reg.sparql("SELECT ?s ?x WHERE { ?s :p3 ?y . " +
      "OPTIONAL { ?y :p2 ?x } VALUES (?s ?x) { ('c' UNDEF) } }")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(opt.toSeq == Seq((-7, None))) // c=-7 has :p3 20; 20 has no :p2
  }

  test("multi-variable VALUES restricts solutions to the tuple set") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // p1 solutions: (a=-5, b=10), (e=6, f=11); only the first tuple matches,
    // the second names an unknown term and is dropped
    val rows = reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . VALUES (?s ?o) { ('a' 'b') ('e' 'nosuch') } }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((-5, 10)))
    // two matching tuples keep both solutions
    val both = reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . VALUES (?s ?o) { ('a' 'b') ('e' 'f') } }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(both.toSeq == Seq((-5, 10), (6, 11)))
    // all tuples unknown: empty result, not an error
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . VALUES (?s ?o) { ('x1' 'x2') } }").count() == 0)
    // arity mismatch and duplicate variables rejected at parse time
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?s WHERE { ?s :p1 ?o . VALUES (?s ?o) { ('a') } }"))
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?s WHERE { ?s :p1 ?o . VALUES (?s ?s) { ('a' 'b') } }"))
    // the SPARQL-standard TRAILING position parses too
    val t = reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o } VALUES (?s ?o) { ('a' 'b') }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(t.toSeq == Seq((-5, 10)))
    // VALUES is a multiset: a duplicated single-var term doubles solutions
    val dup = reg.sparql(
      "SELECT ?o WHERE { 'a' :p1 ?o . VALUES ?o { 'b' 'b' } }").count()
    assert(dup == 2)
  }

  test("HAVING filters groups after aggregation") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    // predicates 1 and 2 occur twice; 3 and 9 once
    val rows = reg.sparql(
      "SELECT ?p (COUNT(?s) AS ?cnt) WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(?s) > 1)")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(rows == Map(1 -> 2L, 2 -> 2L))
    // HAVING without any projected aggregate: hidden column computed in the
    // same aggregate, filtered, dropped
    val singles = reg.sparql(
      "SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(*) = 1)")
      .collect().map(_.getInt(0)).sorted
    assert(singles.toSeq == Seq(3, 9))
    assert(reg.sparql("SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(*) = 1)")
      .columns.toSeq == Seq("p"))
    // two conditions conjoin; MAX over the group participates
    val both = reg.sparql(
      "SELECT ?p WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(*) > 1) (MAX(?o) >= 11)")
      .collect().map(_.getInt(0))
    assert(both.toSeq == Seq(1)) // p1 objects 10,11; p2 objects -7,-8
  }

  test("BOUND/!BOUND filters over OPTIONAL-bound variables") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // p2 edges 10->-7, 11->-8; only -7 continues via p3 — !BOUND keeps the
    // dead-end branch (negation-as-failure), BOUND keeps the continuing one
    val notBound = reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } FILTER(!BOUND(?z)) }")
      .collect().map(_.getInt(0))
    assert(notBound.toSeq == Seq(11))
    val bound = reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?o . OPTIONAL { ?o :p3 ?z } FILTER(BOUND(?z)) }")
      .collect().map(_.getInt(0))
    assert(bound.toSeq == Seq(10))
    // BOUND on a required variable is trivially true
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?o . FILTER(BOUND(?o)) }").count() == 2)
  }

  test("FILTER inside OPTIONAL scopes to the group") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // p1: -5->10, 6->11; p2: 10->-7 ('c'), 11->-8 ('g'); the group-scoped
    // filter restricts the optional side only — the unmatched row SURVIVES
    // with a null binding
    val rows = reg.sparql(
      "SELECT ?s ?m WHERE { ?s :p1 ?x . OPTIONAL { ?x :p2 ?m . FILTER(?m = 'g') } }")
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).sortBy(_._1)
    assert(rows.toSeq == Seq((-5, None), (6, Some(-8))))
    // the same filter at TOP level evaluates over the merged solution and
    // drops the unmatched row — the scoping distinction
    val top = reg.sparql(
      "SELECT ?s ?m WHERE { ?s :p1 ?x . OPTIONAL { ?x :p2 ?m } FILTER(?m = 'g') }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(top.toSeq == Seq((6, -8)))
  }

  test("AVG, SAMPLE, GROUP_CONCAT aggregates") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    val rows = reg.sparql(
      "SELECT ?p (AVG(?o) AS ?a) (SAMPLE(?o) AS ?any) (GROUP_CONCAT(?o) AS ?cat) " +
        "WHERE { ?s ?p ?o } GROUP BY ?p").collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getInt(2), r.getString(3)))).toMap
    assert(rows(1) == ((10.5, 10, "10,11"))) // p1 objects 10, 11
    assert(rows(3) == ((20.0, 20, "20")))
    // GROUP_CONCAT order is pinned ascending regardless of input order
    assert(rows(2)._3 == "-8,-7")
  }

  test("negated property set matches any predicate outside the alternation") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // predicates in the fixture: p1, p2, p3, loop — exclude p1/p2
    val rows = reg.sparql("SELECT ?s ?o WHERE { ?s !(:p1|:p2) ?o }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((-9, -9), (-7, 20))) // :loop and :p3 triples
    // single negation composes with a plain pattern
    val one = reg.sparql(
      "SELECT ?s ?o WHERE { 'c' !:loop ?o . ?s :p2 'c' }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(one.toSeq == Seq((10, 20)))
    // an unknown negated term excludes nothing: every triple matches
    assert(reg.sparql("SELECT ?s WHERE { ?s !:nosuch ?o }").count() == 6)
    // the synthetic predicate variable never leaks into star output
    assert(reg.sparql("SELECT * WHERE { ?s !(:p1) ?o }").columns.toSeq == Seq("o", "s"))
  }

  test("sequence path chains patterns through hidden fresh variables") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // a -p1-> b -p2-> c as one sequence path; intermediate not projected
    val q = SparqlParser.parse("SELECT ?m WHERE { 'a' :p1/:p2 ?m }")
    assert(q.patterns.length == 2)
    assert(q.patterns(0).o == q.patterns(1).s) // shared fresh variable
    assert(q.patterns(0).o.asInstanceOf[Variable].name.startsWith("__path"))
    val rows = reg.sparql("SELECT ?m WHERE { 'a' :p1/:p2 ?m }").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(-7))
    // 3-step sequence reaches the chain's end
    val rows3 = reg.sparql("SELECT ?o WHERE { 'a' :p1/:p2/:p3 ?o }").collect()
    assert(rows3.map(_.getInt(0)).toSeq == Seq(20))
    // star projection hides the path-internal variable
    val starCols = reg.sparql("SELECT * WHERE { 'a' :p1/:p2 ?m }").columns
    assert(starCols.toSeq == Seq("m"))
    // sequences work inside OPTIONAL groups too
    val opt = reg.sparql(
      "SELECT ?s ?m WHERE { ?s :p1 ?x . OPTIONAL { ?s :p1/:p2 ?m } }")
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).sortBy(_._1)
    assert(opt.toSeq == Seq((-5, Some(-7)), (6, Some(-8))))
  }

  test("inverse path steps swap subject and object") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // ^:p1 from b: who points to b via p1? (subject a = -5)
    val rows = reg.sparql("SELECT ?s WHERE { 'b' ^:p1 ?s }").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(-5))
    // inverse inside a sequence: c --(^p2)--> b --(^p1)--> a
    val back = reg.sparql("SELECT ?s WHERE { 'c' ^:p2/^:p1 ?s }").collect()
    assert(back.map(_.getInt(0)).toSeq == Seq(-5))
    // mixed forward/inverse: a -p1-> b, then who ELSE points into b's p2
    // target via p2 (only b itself) — forward then inverse round-trips
    val mixed = reg.sparql("SELECT ?x WHERE { 'a' :p1/:p2/^:p2 ?x }").collect()
    assert(mixed.map(_.getInt(0)).toSeq == Seq(10))
    // unknown bound term: empty, not an error
    assert(reg.sparql("SELECT ?s WHERE { 'nosuch' ^:p1 ?s }").count() == 0)
  }

  test("FILTER EXISTS/NOT EXISTS: correlated semi/anti join; differs from MINUS on disjoint domains") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // keep p1 solutions whose object continues via p2 — both do
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(EXISTS { ?x :p2 ?y }) }").count() == 2)
    // NOT EXISTS removes them all
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(NOT EXISTS { ?x :p2 ?y }) }").count() == 0)
    // only -7 continues via p3: correlated through the 2-hop variable
    val deep = reg.sparql(
      "SELECT ?s WHERE { ?s :p2 ?x . FILTER(EXISTS { ?x :p3 ?y }) }")
      .collect().map(_.getInt(0))
    assert(deep.toSeq == Seq(10))
    // THE DIVERGENCE: a disjoint-domain MINUS is a no-op, but a
    // disjoint-domain NOT EXISTS removes every solution when the group
    // matches anything at all
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . MINUS { ?a :p3 ?b } }").count() == 2)
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(NOT EXISTS { ?a :p3 ?b }) }").count() == 0)
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(EXISTS { ?a :p3 ?b }) }").count() == 2)
    // a group matching nothing: EXISTS empties, NOT EXISTS keeps all
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(EXISTS { 'nosuch' :p3 ?b }) }").count() == 0)
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . FILTER(NOT EXISTS { 'nosuch' :p3 ?b }) }").count() == 2)
  }

  test("MINUS removes solutions compatible on shared variables") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // subjects with :p1 minus those whose ?x also has :p2 outgoing — both
    // chains have one (-5 via 10, 6 via 11), and both 10/11 have :p2
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . MINUS { ?x :p2 ?y } }").count() == 0)
    // minus group matching nothing removes nothing
    val all = reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . MINUS { ?x :p3 ?y } }").count()
    assert(all == 2)
    // disjoint variable domains: SPARQL says nothing is compatible → no-op
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?x . MINUS { ?a :p2 ?b } }").count() == 2)
  }

  test("VALUES restricts a variable to the inline binding set") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    val q = SparqlParser.parse(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . VALUES ?o { 'b' 'g' } }")
    assert(q.inlineValues == Seq("o" -> Seq(Constant("b"), Constant("g"))))
    val rows = reg.sparqlAst(q).collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((-5, 10))) // only 'b'(=10) matches a :p1 object
    // unknown terms bind nothing
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . VALUES ?o { 'zzz' } }").count() == 0)
    intercept[IllegalArgumentException](reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . VALUES ?x { 'b' } }"))
    // OPTIONAL-unbound variable: the unbound solution is compatible with
    // every VALUES row and survives WITH the binding (SPARQL Join
    // semantics) — an isin filter would silently drop it
    val optRows = reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p3 ?x . OPTIONAL { ?x :p2 ?o } . VALUES ?o { 'g' } }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(optRows.toSeq == Seq((-7, -8)))
    // a variable bound in only ONE union arm is nullable: the other arm's
    // solutions are compatible with every VALUES row and get extended
    val uRows = reg.sparql(
      "SELECT ?x ?y WHERE { { ?s :p1 ?x } UNION { ?s :p2 ?y } } VALUES ?x { 'b' }")
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    // arm1: only x=10 ('b') survives, y stays null; arm2 rows (y=-7,-8)
    // have x null -> compatible with the binding -> extended with x=10
    assert(uRows.sortBy(_.toString).toSeq ==
      Seq((10, None), (10, Some(-8)), (10, Some(-7))).sortBy(_.toString))
  }

  test("reference Q1 SQL shape runs verbatim against registered views") {
    val (engine, triples) = fixture
    engine.registerSingleTable(triples)
    val n = engine.sql(
      """SELECT * FROM `table` INNER JOIN `table` t1 ON `table`.Object = t1.Subject
        |INNER JOIN `table` t2 ON t1.Object = t2.Subject
        |WHERE `table`.Subject = -5 AND `table`.Predicate = 1
        |  AND t1.Predicate = 2 AND t2.Predicate = 3""".stripMargin).count()
    assert(n == 1)
  }

  test("arithmetic BIND: computed integer bindings over the id domain") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // :p1 solutions (?s,?o): (a=-5, b=10), (e=6, f=11)
    assert(reg.sparql("SELECT ?o2 WHERE { ?s :p1 ?o . BIND(?o + 1 AS ?o2) }")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(11L, 12L))
    // two-variable operands
    assert(reg.sparql("SELECT ?d WHERE { ?s :p1 ?o . BIND(?o - ?s AS ?d) }")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 15L))
    // a dictionary-term operand resolves to its encoded id ('b' = 10)
    assert(reg.sparql("SELECT ?m WHERE { ?s :p1 ?o . BIND(?o * 'b' AS ?m) }")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(100L, 110L))
    // FILTER restricts on the computed alias
    assert(reg.sparql("SELECT ?s ?o2 WHERE { ?s :p1 ?o . " +
      "BIND(?o + 1 AS ?o2) FILTER(?o2 = 12) }")
      .collect().map(_.getInt(0)).toSeq == Seq(6))
    // unknown term operand: expression error — the alias binds null
    val nulls = reg.sparql(
      "SELECT ?x WHERE { ?s :p1 ?o . BIND(?o + 'nosuch' AS ?x) }").collect()
    assert(nulls.length == 2 && nulls.forall(_.isNullAt(0)))
    // '/' is rejected loudly
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?x WHERE { ?s :p1 ?o . BIND(?o / 2 AS ?x) }"))
  }

  test("FILTER IN / NOT IN: one isin over encoded ids; unknown terms drop") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // :p1 solutions (?s,?o): (a=-5, b=10), (e=6, f=11)
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o IN ('b', 'nosuch')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(10))
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o NOT IN ('b')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(11))
    // an all-unknown NOT IN list restricts nothing
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . FILTER(?s NOT IN ('nosuch')) }")
      .count() == 2)
    // IN composes inside &&/|| trees (it is a plain Column predicate)
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "FILTER(?o IN ('b', 'f') && ?s IN ('e')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(11))
    // OPTIONAL-unbound variable: expression error — IN and NOT IN both drop
    assert(reg.sparql("SELECT ?s ?x WHERE { ?s :p3 ?y . " +
      "OPTIONAL { ?y :p2 ?x } FILTER(?x NOT IN ('b')) }").count() == 0)
  }

  test("FILTER comparisons: <,<=,>,>= over encoded ids; integer-literal RHS") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // :p1 solutions: (-5,10) and (6,11); 'b' encodes to 10
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o > 'b') }")
      .collect().map(_.getInt(1)).toSeq == Seq(11))
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o <= 'b') }")
      .collect().map(_.getInt(1)).toSeq == Seq(10))
    // a bare integer literal compares the DECODED VALUE: every term of
    // this vocabulary is non-numeric, so the comparison is a SPARQL type
    // error on every row — empty, NOT an id comparison
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(?o >= 11) }")
      .count() == 0)
    // unknown non-numeric term: expression error — comparison drops the row
    assert(reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . FILTER(?o < 'nosuch') }").count() == 0)
  }

  test("FILTER numeric literals compare decoded VALUES, not ids") {
    import spark.implicits._
    // numeric-lexical vocabulary with id order REVERSED from value order:
    // id -100-n ↔ term "n" — an id-domain comparison would return the
    // complementary set, so this pins value-domain semantics specifically
    val triples = Seq(
      (1, 7, -105), (2, 7, -110), (3, 7, -120), (4, 7, -103)).toDF(
      TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    val dict = Dictionary.fromPairs(spark, Seq(
      -105 -> "5", -110 -> "10", -120 -> "20", -103 -> "3", 7 -> ":v",
      1 -> "s1", 2 -> "s2", 3 -> "s3", 4 -> "s4"))
    val reg = new QueryEngine(spark, dict).registerSplitTables(triples)
    def q(f: String): Set[Int] =
      reg.sparql(s"SELECT ?s ?x WHERE { ?s :v ?x . FILTER($f) }")
        .collect().map(_.getInt(0)).toSet
    assert(q("?x > 5") == Set(2, 3))      // values 10, 20
    assert(q("?x >= 5") == Set(1, 2, 3))
    assert(q("?x < 5") == Set(4))         // value 3
    assert(q("?x = 10") == Set(2))
    assert(q("?x != 10") == Set(1, 3, 4)) // numeric terms only, value ≠ 10
    // BIND-arithmetic variables hold NUMBERS — a numeric literal compares
    // the computed value directly (not through the dictionary)
    val b = reg.sparql("SELECT ?s ?y WHERE { ?s :v ?x . " +
      "BIND(?s + 100 AS ?y) FILTER(?y > 102) }")
      .collect().map(_.getInt(0)).toSet
    assert(b == Set(3, 4))
    // value comparisons compose inside &&/|| (the decoded value is ONE
    // pre-joined column per variable, reused by every leaf): range keeps
    // only value 10
    assert(reg.sparql("SELECT ?s WHERE { ?s :v ?x . FILTER(?x > 5 && ?x < 20) }")
      .collect().map(_.getInt(0)).toSet == Set(2))
    // ...and an UNMAPPED id (no dictionary entry) IS its own numeric
    // value — the engine's native literal domain (ids absent from the
    // vocabulary denote the integer itself), so it participates in value
    // comparisons as that number instead of dropping
    val reg2 = new QueryEngine(spark, dict).registerSplitTables(
      triples.unionAll(Seq((9, 7, 15)).toDF(
        TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)))
    assert(reg2.sparql("SELECT ?s ?x WHERE { ?s :v ?x . FILTER(?x > 5) }")
      .collect().map(_.getInt(0)).toSet == Set(2, 3, 9)) // 10, 20, raw 15
  }

  test("FILTER &&/||: && binds tighter than || (SPARQL ConditionalOr/And)") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // correct precedence: ?o='b' OR (?o='f' AND ?s='nosuch'→false) → only b;
    // a left-to-right misparse ((b OR f) AND false) would return EMPTY
    val rows = reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "FILTER(?o = 'b' || ?o = 'f' && ?s = 'nosuch') }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((-5, 10)))
    // range conjunction ANDed into one pushable predicate
    assert(reg.sparql("SELECT ?o WHERE { ?s :p1 ?o . " +
      "FILTER(?o >= 'b' && ?o < 'f') }").collect().map(_.getInt(0)).toSeq == Seq(10))
    // compound filters are rejected inside OPTIONAL (subset rule, loud)
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?s WHERE { ?s :p1 ?o . OPTIONAL { ?o :p2 ?x . FILTER(?x = 'g' && ?x != 'c') } }"))
  }

  test("FILTER parsing: quoted operators and parens do not split conditions") {
    // '||' inside a quoted lexical form must NOT split the disjunction
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?x :p1 ?y . FILTER(?y = 'a || b' || ?y = 'c') }")
    assert(q.filterExprs.length == 1)
    val FilterOr(FilterLeaf(l), FilterLeaf(r)) = q.filterExprs.head: @unchecked
    assert(l.value == Constant("a || b") && r.value == Constant("c"))
    // '&&' inside a regex pattern stays part of the pattern
    val q2 = SparqlParser.parse(
      "SELECT ?x WHERE { ?x :p1 ?y . FILTER(regex(?y, 'a&&b')) }")
    assert(q2.filters.head.op == FilterRegex &&
      q2.filters.head.value == Constant("a&&b"))
  }

  test("FILTER regex matches the DECODED lexical form via dictionary join") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // ?o ∈ {b(10), f(11)}: pattern ^f$ keeps only f
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(regex(?o, '^f$')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(11))
    // negated regex keeps the complement
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(!regex(?o, '^f$')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(10))
    // null (OPTIONAL-unbound) variable is an expression error under BOTH
    // regex and !regex — the row drops (an anti join alone would keep it)
    assert(reg.sparql("SELECT ?s ?x WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p3 ?x } FILTER(!regex(?x, 'z')) }").count() == 0)
  }

  test("FILTER string functions (STRSTARTS/STRENDS/CONTAINS/STRLEN) via dictionary join") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // ?o ∈ {b(10), f(11)}
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(STRSTARTS(STR(?o), 'f')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(11))
    // STR() wrapper optional; negation is the dictionary anti-join
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(!CONTAINS(?o, 'f')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(10))
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(STRENDS(STR(?o), 'b')) }")
      .collect().map(_.getInt(1)).toSeq == Seq(10))
    // STRLEN comparison folds into the vocabulary predicate (semi-join):
    // both 'b' and 'f' have length 1
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(STRLEN(STR(?o)) = 1) }")
      .count() == 2)
    assert(reg.sparql(
      "SELECT ?s ?o WHERE { ?s :p1 ?o . FILTER(STRLEN(?o) > 1) }")
      .count() == 0)
    // null (OPTIONAL-unbound) variable is an expression error under the
    // negated form too — the row drops
    assert(reg.sparql("SELECT ?s ?x WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p3 ?x } FILTER(!STRSTARTS(STR(?x), 'z')) }").count() == 0)
    // string functions cannot compose inside &&/|| (subset rule, loud)
    intercept[IllegalArgumentException](reg.sparql(
      "SELECT ?s WHERE { ?s :p1 ?o . FILTER(STRSTARTS(?o, 'f') || ?o = 'b') }"))
  }

  test("FILTER EXISTS without parens (primary SPARQL 1.1 grammar form)") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // o=10 has :p2 → -7 (not g); o=11 has :p2 → -8 (= g)
    val rows = reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "FILTER NOT EXISTS { ?o :p2 'g' } }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((-5, 10)))
    assert(reg.sparql("SELECT ?s ?o WHERE { ?s :p1 ?o . " +
      "FILTER EXISTS { ?o :p2 'g' } }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((6, 11)))
  }

  test("EXISTS over an OPTIONAL-nullable shared variable: null stays FREE") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // base (-5,10),(6,11); OPTIONAL {?o :p2 ?x . ?x :p3 ?z}: o=10 → x=-7
    // (has :p3 20); o=11 → x=-8 has no :p3 → group unmatched → x null.
    // SPARQL substitution semantics: the null ?x is FREE inside EXISTS, so
    // EXISTS { ?x :p3 ?w } asks "does ANY :p3 triple exist" → true → the
    // null row SURVIVES (a null-rejecting equi key would drop it).
    val rows = reg.sparql("SELECT ?s ?x WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p2 ?x . ?x :p3 ?z } FILTER EXISTS { ?x :p3 ?w } }")
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(rows.sortBy(_.toString).toSeq ==
      Seq((-5, Some(-7)), (6, None)).sortBy(_.toString))
    // dual: NOT EXISTS drops both (bound match AND free-match null row)
    assert(reg.sparql("SELECT ?s WHERE { ?s :p1 ?o . " +
      "OPTIONAL { ?o :p2 ?x . ?x :p3 ?z } FILTER NOT EXISTS { ?x :p3 ?w } }")
      .count() == 0)
  }

  test("sequence path with closure step: frontier evaluation") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // :p1/:p2+ from 'a'(-5): step1 → {10}; :p2 closure from 10 → {-7}
    assert(reg.sparql("SELECT ?x WHERE { 'a' :p1/:p2+ ?x }")
      .collect().map(_.getInt(0)).toSeq == Seq(-7))
    // :p1/:p2* keeps the zero-step frontier: {10} ∪ {-7}
    assert(reg.sparql("SELECT ?x WHERE { 'a' :p1/:p2* ?x }")
      .collect().map(_.getInt(0)).toSeq.sorted == Seq(-7, 10))
    // alternation closure as a step: :p1/(:p2|:p3)+ from 'a' → 10 → -7 → 20
    assert(reg.sparql("SELECT ?x WHERE { 'a' :p1/(:p2|:p3)+ ?x }")
      .collect().map(_.getInt(0)).toSeq.sorted == Seq(-7, 20))
  }

  test("group-closure sequence path (:p/:q)+ composes then closes") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // composed :p1/:p2 edges: -5→-7, 6→-8; from 'a'(-5), one-or-more → {-7}
    assert(reg.sparql("SELECT ?x WHERE { 'a' (:p1/:p2)+ ?x }")
      .collect().map(_.getInt(0)).toSeq == Seq(-7))
    // zero-or-more includes the seed itself
    assert(reg.sparql("SELECT ?x WHERE { 'a' (:p1/:p2)* ?x }")
      .collect().map(_.getInt(0)).toSeq.sorted == Seq(-7, -5).sorted)
    // zero-or-one: seed ∪ direct composed successors, no fixpoint
    assert(reg.sparql("SELECT ?x WHERE { 'a' (:p1/:p2)? ?x }")
      .collect().map(_.getInt(0)).toSeq.sorted == Seq(-7, -5).sorted)
  }

  test("path closure with bound OBJECT: who-reaches, via reversed edges") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // nodes reaching 'c'(-7) over :p2+ — only 10
    assert(reg.sparql("SELECT ?x WHERE { ?x :p2+ 'c' }")
      .collect().map(_.getInt(0)).toSeq == Seq(10))
    // group closure reversed: composed :p1/:p2 edges are -5→-7, 6→-8
    assert(reg.sparql("SELECT ?x WHERE { ?x (:p1/:p2)+ 'c' }")
      .collect().map(_.getInt(0)).toSeq == Seq(-5))
    // flat sequence with closure step, inverse evaluation:
    // (:p1/:p2+)⁻¹ from 'g'(-8): p2-closure back → {11}, then p1 back → {6}
    assert(reg.sparql("SELECT ?x WHERE { ?x :p1/:p2+ 'g' }")
      .collect().map(_.getInt(0)).toSeq == Seq(6))
    // zero-or-more to a bound end includes the bound node itself
    assert(reg.sparql("SELECT ?x WHERE { ?x :p2* 'c' }")
      .collect().map(_.getInt(0)).toSeq.sorted == Seq(-7, 10))
  }

  test("path closure with BOTH ends variable: pairwise transitive closure") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    // :p2 edges 10→-7, 11→-8: exactly those pairs, no chaining possible
    val p2 = reg.sparql("SELECT ?x ?y WHERE { ?x :p2+ ?y }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_.toString)
    assert(p2.toSeq == Seq((10, -7), (11, -8)).sortBy(_.toString))
    // alternation closure chains p1 then p2: adds the 2-step pairs
    val both = reg.sparql("SELECT ?x ?y WHERE { ?x (:p1|:p2)+ ?y }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(both == Set((-5, 10), (-5, -7), (6, 11), (6, -8), (10, -7), (11, -8)))
    // joins the rest of the BGP on the path variables
    val joined = reg.sparql(
      "SELECT ?x ?y WHERE { ?x (:p1|:p2)+ ?y . ?y :p3 ?z }")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(joined == Set((-5, -7), (10, -7))) // only -7 has :p3
    // same variable both ends: cycle membership (the :loop self-edge)
    assert(reg.sparql("SELECT ?x WHERE { ?x :loop+ ?x }")
      .collect().map(_.getInt(0)).toSeq == Seq(-9))
  }

  test("unsupported property-path syntax fails loudly, not silently empty") {
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?x WHERE { 'a' :p1//:p2 ?x }"))
    intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT ?x WHERE { 'a' (:p1/(:p2)+)+ ?x }"))
    // supported forms still parse
    SparqlParser.parse("SELECT ?x WHERE { 'a' (:p1/:p2)+ ?x }")
    SparqlParser.parse("SELECT ?x WHERE { 'a' :p1+ ?x }")
    SparqlParser.parse("SELECT ?x WHERE { 'a' !(:p1|:p2) ?x }")
  }

  test("subquery: inner SELECT aggregates join the enclosing BGP on shared vars") {
    val (engine, triples) = fixture
    val reg = engine.registerSplitTables(triples)
    val q = SparqlParser.parse("SELECT ?s ?n WHERE { ?s :p1 ?o . " +
      "{ SELECT ?s (COUNT(?o2) AS ?n) WHERE { ?s ?p ?o2 } GROUP BY ?s } }")
    assert(q.subqueries.length == 1 && q.patterns.length == 1)
    assert(q.subqueries.head.groupByVars == Seq("s"))
    val rows = reg.sparqlAst(q).collect().map(r => (r.getInt(0), r.getLong(1)))
    // every subject has exactly one outgoing triple in the fixture
    assert(rows.sortBy(_._1).toSeq == Seq((-5, 1L), (6, 1L)))
  }

  test("GRAPH groups: bound term scopes patterns; variable binds the graph") {
    val (engine, triples) = fixture
    // quad fixture: graph column = the predicate's own id (one named graph
    // per relation)
    val quads = triples.withColumn(TripleSchema.graph, col(TripleSchema.predicate))
    val reg = engine.registerSplitTables(triples).registerQuads(quads)
    // bound graph: only :p1 triples are in graph :p1
    val rows = reg.sparql("SELECT ?s ?o WHERE { GRAPH :p1 { ?s ?p ?o } }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.sortBy(_._1).toSeq == Seq((-5, 10), (6, 11)))
    // unknown graph holds nothing
    assert(reg.sparql("SELECT ?s WHERE { GRAPH 'nosuch' { ?s ?p ?o } }").count() == 0)
    // graph variable binds; patterns of one group share the SAME graph
    val gRows = reg.sparql(
      "SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(gRows.toSeq == Seq((1, 2L), (2, 2L), (3, 1L), (9, 1L)))
    // GRAPH group joins default-graph patterns on shared variables
    val joined = reg.sparql(
      "SELECT ?s ?m WHERE { GRAPH :p1 { ?s ?p ?o } . ?o :p2 ?m }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(joined.sortBy(_._1).toSeq == Seq((-5, -7), (6, -8)))
    // GRAPH without a registered quad store fails loudly
    val bare = new QueryEngine(spark, engine.dict).registerSplitTables(triples)
    intercept[IllegalArgumentException](
      bare.sparql("SELECT ?s WHERE { GRAPH :p1 { ?s ?p ?o } }").collect())
  }

  test("UNION with trailing multi-variable VALUES applies the tuple restriction") {
    val (engine, triples) = fixture
    val reg = engine.registerSingleTable(triples)
    // without the restriction the union has 4 rows; the tuple keeps ONE
    val rows = reg.sparql("SELECT ?a ?b WHERE { { ?a :p1 ?b } UNION { ?a :p2 ?b } } " +
      "VALUES (?a ?b) { ('a' 'b') }")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((-5, 10)))
  }
}

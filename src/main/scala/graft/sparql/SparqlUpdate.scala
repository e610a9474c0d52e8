package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Dictionary, TripleSchema}
import graft.operators.QueryEngine

/** SPARQL 1.1 Update over an immutable triple snapshot — Spark-first
  * semantics: every update form is a declarative transformation of the
  * store DataFrame (union / filter / construct-union), producing a NEW
  * snapshot plus a possibly-extended dictionary. Nothing mutates in place;
  * at 100 TB the result is written as the next table version (the same
  * copy-on-write arrangement every lakehouse update uses), and each form
  * stays embarrassingly parallel:
  *
  *  - `INSERT DATA { ground triples }` — literal triples union'd in; terms
  *    absent from the dictionary get FRESH ids past the current max (one
  *    scalar aggregate — dictionary growth is model-state-scale, like the
  *    IVF centroids).
  *  - `DELETE DATA { ground triples }` — every copy of each listed triple
  *    is removed via a pushdown-friendly NOT-filter (no shuffle at all).
  *  - `DELETE WHERE { one pattern }` — the pattern's matches are removed by
  *    the complementary filter; repeated variables become column-equality
  *    constraints. The subset keeps ONE pattern (multi-pattern DELETE WHERE
  *    instantiates templates over join solutions — rejected loudly rather
  *    than approximated).
  *  - `INSERT { template } WHERE { bgp }` — planned as the equivalent
  *    CONSTRUCT (encoded output) and union'd in; template constants absent
  *    from the dictionary are pre-assigned fresh ids so derivation can mint
  *    new vocabulary.
  *
  * The store is a BAG like the reference's (duplicate triples permitted);
  * INSERT does not dedup against existing rows — CONSTRUCT's internal
  * distinct only dedups the derived set itself.
  */
object SparqlUpdate {

  final case class UpdatedStore(triples: DataFrame, dict: Dictionary)

  def apply(spark: SparkSession, triples: DataFrame, dict: Dictionary,
      update: String): UpdatedStore = {
    val insertDataRe = "(?is)^\\s*INSERT\\s+DATA\\s*\\{(.*)\\}\\s*$".r
    val deleteDataRe = "(?is)^\\s*DELETE\\s+DATA\\s*\\{(.*)\\}\\s*$".r
    val deleteWhereRe = "(?is)^\\s*DELETE\\s+WHERE\\s*\\{(.*)\\}\\s*$".r
    val insertWhereRe = "(?is)^\\s*INSERT\\s*\\{(.*?)\\}\\s*WHERE\\s*\\{(.*)\\}\\s*$".r
    val modifyRe =
      "(?is)^\\s*DELETE\\s*\\{(.*?)\\}\\s*INSERT\\s*\\{(.*?)\\}\\s*WHERE\\s*\\{(.*)\\}\\s*$".r
    update match {
      case insertDataRe(body) => insertData(spark, triples, dict, body)
      case deleteDataRe(body) => deleteGround(spark, triples, dict, body)
      case deleteWhereRe(body) => deleteWhere(triples, dict, body)
      case modifyRe(dtpl, itpl, body) =>
        deleteInsertWhere(spark, triples, dict, dtpl, itpl, body)
      case insertWhereRe(tpl, body) => insertWhere(spark, triples, dict, tpl, body)
      case other => throw new IllegalArgumentException(
        "unsupported update (subset is INSERT DATA, DELETE DATA, " +
          s"DELETE WHERE, INSERT {tpl} WHERE {bgp}, " +
          s"DELETE {tpl} INSERT {tpl} WHERE {bgp}): $other")
    }
  }

  /** Ground triples of a DATA block — every term must be a constant. */
  private def groundPatterns(body: String): Seq[TriplePattern] = {
    val pats = splitTriples(body).map(SparqlParser.parsePattern)
    pats.foreach { p =>
      require(Seq(p.s, p.p, p.o).forall(_.isInstanceOf[Constant]),
        s"DATA blocks take ground triples only: $p")
    }
    pats
  }

  /** Split a block body on '.' outside single-quoted lexical forms. */
  private def splitTriples(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    body.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '.' if !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def lex(t: Term): String = t.asInstanceOf[Constant].lexical

  /** Encode the given lexicals, minting fresh ids (current max + 1, +2, …)
    * for terms the dictionary does not know. Returns the complete mapping
    * and the possibly-extended dictionary.
    */
  private def encodeMinting(spark: SparkSession, dict: Dictionary,
      lexicals: Seq[String]): (Map[String, Int], Dictionary) = {
    val known = dict.encodeTerms(lexicals)
    val unknown = lexicals.distinct.filterNot(known.contains)
    if (unknown.isEmpty) (known, dict)
    else {
      val maxId = dict.entries.agg(max(col("id"))).head().getInt(0)
      val fresh = unknown.zipWithIndex.map { case (t, i) => t -> (maxId + 1 + i) }
      import spark.implicits._
      val extended = Dictionary.fromDF(dict.entries.toDF()
        .unionAll(fresh.map { case (t, id) => (id, t) }.toDF("id", "term")))
      (known ++ fresh, extended)
    }
  }

  private def insertData(spark: SparkSession, triples: DataFrame,
      dict: Dictionary, body: String): UpdatedStore = {
    val pats = groundPatterns(body)
    val (enc, newDict) = encodeMinting(spark, dict,
      pats.flatMap(p => Seq(p.s, p.p, p.o)).map(lex))
    import spark.implicits._
    val rows = pats.map(p => (enc(lex(p.s)), enc(lex(p.p)), enc(lex(p.o))))
      .toDF(TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    UpdatedStore(triples.unionAll(rows), newDict)
  }

  private def deleteGround(spark: SparkSession, triples: DataFrame,
      dict: Dictionary, body: String): UpdatedStore = {
    val pats = groundPatterns(body)
    val enc = dict.encodeTerms(pats.flatMap(p => Seq(p.s, p.p, p.o)).map(lex))
    // a triple with an unknown term cannot exist in the store — no-op
    val conds = pats.flatMap { p =>
      for {
        s <- enc.get(lex(p.s)); pr <- enc.get(lex(p.p)); o <- enc.get(lex(p.o))
      } yield col(TripleSchema.subject) === s &&
        col(TripleSchema.predicate) === pr && col(TripleSchema.objekt) === o
    }
    val removed = conds.reduceOption(_ || _).getOrElse(lit(false))
    UpdatedStore(triples.filter(!removed), dict)
  }

  private def deleteWhere(triples: DataFrame, dict: Dictionary,
      body: String): UpdatedStore = {
    val pats = splitTriples(body).map(SparqlParser.parsePattern)
    require(pats.length == 1,
      "DELETE WHERE subset takes exactly one triple pattern " +
        "(multi-pattern deletion instantiates over join solutions)")
    val p = pats.head
    val terms = Seq(TripleSchema.subject -> p.s,
      TripleSchema.predicate -> p.p, TripleSchema.objekt -> p.o)
    val enc = dict.encodeTerms(terms.collect { case (_, Constant(l)) => l })
    val constConds: Seq[Column] = terms.collect {
      case (c, Constant(l)) => enc.get(l) match {
        case Some(id) => col(c) === id
        case None => lit(false) // unknown term matches nothing
      }
    }
    // a repeated variable constrains its positions to be equal
    val varConds: Seq[Column] = terms.collect { case (c, Variable(v)) => (v, c) }
      .groupBy(_._1).values.filter(_.length > 1)
      .map(g => g.map(x => col(x._2)).sliding(2)
        .map { case Seq(a, b) => a === b }.reduce(_ && _)).toSeq
    val matchCond = (constConds ++ varConds).reduceOption(_ && _).getOrElse(lit(true))
    UpdatedStore(triples.filter(!matchCond), dict)
  }

  /** `DELETE { tplD } INSERT { tplI } WHERE { bgp }` — SPARQL 1.1's
    * combined modify (spec §3.1.3): ONE binding pass over the PRE-UPDATE
    * snapshot feeds both templates atomically. The WHERE solutions are
    * planned once (`SELECT *`) and checkpointed; each template
    * instantiates over that shared relation, then the store transforms as
    * `(triples ANTI-JOIN deletions) UNION insertions`. Atomicity falls
    * out of immutability: a sequential delete-then-re-match would find
    * ZERO bindings whenever the DELETE template removes the very triples
    * the WHERE matched (the canonical predicate-rename), while the spec —
    * and this plan — inserts from the pre-delete bindings. Deletion
    * removes every copy of each instantiated triple (the bag-store
    * discipline of DELETE DATA); insertion appends the distinct
    * instantiations (CONSTRUCT semantics). Scale shape: one BGP join
    * pass, one hash anti-join on (s,p,o), one union — no per-solution
    * driver work.
    */
  private def deleteInsertWhere(spark: SparkSession, triples: DataFrame,
      dict: Dictionary, dtpl: String, itpl: String, body: String): UpdatedStore = {
    val dPats = splitTriples(dtpl).map(SparqlParser.parsePattern)
    val iPats = splitTriples(itpl).map(SparqlParser.parsePattern)
    require(dPats.nonEmpty && iPats.nonEmpty,
      "modify takes non-empty DELETE and INSERT templates")
    // mint ids for BOTH templates' constants before planning (a fresh
    // term in the DELETE template matches nothing — the anti-join no-ops)
    val consts = (dPats ++ iPats).flatMap(p => Seq(p.s, p.p, p.o))
      .collect { case Constant(l) => l }
    val (enc, newDict) = encodeMinting(spark, dict, consts)
    val bindings = new QueryEngine(spark, newDict)
      .registerSplitTables(triples)
      .sparql(s"SELECT * WHERE { $body }")
      .localCheckpoint()
    val vars = (dPats ++ iPats).flatMap(p => Seq(p.s, p.p, p.o))
      .collect { case Variable(v) => v }.distinct
    vars.foreach(v => require(bindings.columns.contains(v),
      s"modify template variable ?$v is not bound by the WHERE group"))
    def instantiate(pats: Seq[TriplePattern]): DataFrame =
      pats.map { t =>
        def termCol(term: Term): Column = term match {
          case Variable(v) => col(v)
          case Constant(l) => lit(enc(l))
        }
        bindings.select(
          termCol(t.s).cast("int").as(TripleSchema.subject),
          termCol(t.p).cast("int").as(TripleSchema.predicate),
          termCol(t.o).cast("int").as(TripleSchema.objekt))
      }.reduceLeft(_.unionAll(_)).distinct()
    val key = Seq(TripleSchema.subject, TripleSchema.predicate, TripleSchema.objekt)
    UpdatedStore(
      triples.join(instantiate(dPats), key, "left_anti")
        .unionAll(instantiate(iPats)),
      newDict)
  }

  private def insertWhere(spark: SparkSession, triples: DataFrame,
      dict: Dictionary, tpl: String, body: String): UpdatedStore = {
    // template constants may be new vocabulary — mint ids BEFORE planning
    val tplConsts = splitTriples(tpl).map(SparqlParser.parsePattern)
      .flatMap(p => Seq(p.s, p.p, p.o)).collect { case Constant(l) => l }
    val (_, newDict) = encodeMinting(spark, dict, tplConsts)
    val constructed = new QueryEngine(spark, newDict)
      .registerSplitTables(triples)
      .sparql(s"CONSTRUCT { $tpl } WHERE { $body }")
    UpdatedStore(triples.unionAll(constructed), newDict)
  }
}

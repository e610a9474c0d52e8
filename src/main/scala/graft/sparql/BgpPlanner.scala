package graft.sparql

import graft.core.{Dictionary, TripleSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compiles a basic graph pattern to a DataFrame plan over the triple table.
  *
  * Replaces the reference's 8-template SQL string generator
  * (`/root/reference/src/main/java/com/github/nkoutroumanis/MyOpVisitorBase.java:80-127`):
  * instead of emitting SQL text per bound/unbound case, each pattern becomes a
  * filtered scan and shared variables become equi-join conditions — the
  * general BGP→relational translation the reference's last-pattern-wins bug
  * (`MyOpVisitorBase.java:42-45`) prevented it from reaching.
  *
  * Sign routing (reference `MyOpVisitorBase.java:81-86,104-125`): when the
  * split layout is in use and a pattern's subject is bound, only the
  * sign-matching table is scanned; when the subject is a variable, the two
  * tables are UNION ALL'd (bag semantics, as the reference's `UNION ALL`).
  * With the partition-column layout (`Layouts.writePartitionedBySign`) the
  * same effect comes free from Catalyst partition pruning on a plain
  * `sign = 'pos'` filter.
  *
  * Scale notes: per-pattern constant filters are pushed into the parquet scan
  * by Catalyst (point predicates on int columns → row-group pruning via
  * min/max stats, strongest when the table is range-laid-out on that column —
  * `Layouts.rangeLayout`). Chain joins shuffle on the shared variable; with a
  * subject-bucketed table the exchange on the subject side is elided.
  */
object BgpPlanner {

  /** The triple store view the planner reads: either one table, or the
    * sign-split pair for routed scans.
    */
  sealed trait Store
  final case class SingleTable(df: DataFrame) extends Store
  final case class SplitTables(positive: DataFrame, negative: DataFrame) extends Store

  /** Plan `query` over `store`, encoding constants through `dict`.
    * Output: one int column per distinct variable (projection order), encoded;
    * decode with `Dictionary.decode`. A constant term that is absent from the
    * dictionary yields an empty (not failing) result — it can match nothing.
    */
  /** `:p+` / `(:p|:q)+` / `:p*` / `:p?` — SPARQL property path closure
    * modifiers over the (alternation of the) named predicates: one-or-more
    * (`+`), zero-or-more (`*`), zero-or-one (`?`). Returns (base predicate
    * lexical forms, modifier) when `lexical` is the path syntax.
    */
  private def pathPreds(lexical: String): Option[(Seq[String], Char)] = {
    val re = "^\\(?((?::?\\w+)(?:\\|:?\\w+)*)\\)?([+*?])$".r
    lexical match {
      case re(inner, mod) =>
        Some((inner.split("\\|").toSeq.map(Dictionary.normalizeTerm), mod.head))
      case _ => None
    }
  }

  /** `!:p` / `!(:p|:q)` — SPARQL negated property set: any predicate NOT
    * in the alternation. Returns the base predicate lexical forms.
    */
  private def negPreds(lexical: String): Option[Seq[String]] = {
    val re = "^!\\(?((?::?\\w+)(?:\\|:?\\w+)*)\\)?$".r
    lexical match {
      case re(inner) => Some(inner.split("\\|").toSeq.map(Dictionary.normalizeTerm))
      case _ => None
    }
  }

  /** `(!:p)+` / `(!(:p|:q))*` — closure over a NEGATED property set: walk
    * edges whose predicate is NOT in the alternation, any number of steps.
    * Same closure machinery as [[pathPreds]] paths, edge set complemented.
    */
  private def negClosurePreds(lexical: String): Option[(Seq[String], Char)] = {
    val re = "^\\(!\\(?((?::?\\w+)(?:\\|:?\\w+)*)\\)?\\)([+*?])$".r
    lexical match {
      case re(inner, mod) =>
        Some((inner.split("\\|").toSeq.map(Dictionary.normalizeTerm), mod.head))
      case _ => None
    }
  }

  /** `(^:p)+` / `(:p|^:q)*` — closure over an alternation with INVERSE
    * members: each `^`-marked member contributes its edges reversed, the
    * union is closed over. Only matched when at least one `^` appears —
    * pure-forward alternations stay with [[pathPreds]].
    */
  private def invClosurePreds(lexical: String): Option[(Seq[(String, Boolean)], Char)] = {
    val re = "^\\(?((?:\\^?:?\\w+)(?:\\|\\^?:?\\w+)*)\\)?([+*?])$".r
    lexical match {
      case re(inner, mod) if inner.contains("^") =>
        Some((inner.split("\\|").toSeq.map { t =>
          if (t.startsWith("^")) (Dictionary.normalizeTerm(t.substring(1)), true)
          else (Dictionary.normalizeTerm(t), false)
        }, mod.head))
      case _ => None
    }
  }

  /** `:p{n,m}` / `(:p|:q){n}` / `:p{n,}` — bounded path repetition (the
    * SPARQL 1.1 draft quantifier forms; the final spec dropped them, every
    * practical engine kept them). Returns (base predicate lexical forms,
    * min repetitions, max repetitions — None for the unbounded `{n,}`).
    */
  private def quantPreds(lexical: String): Option[(Seq[String], Int, Option[Int])] = {
    val re = "^\\(?((?::?\\w+)(?:\\|:?\\w+)*)\\)?\\{(\\d+)(?:(,)(\\d*))?\\}$".r
    lexical match {
      case re(inner, lo, comma, hi) =>
        val n = lo.toInt
        val m =
          if (comma == null) Some(n) // {n} = exactly n
          else if (hi.isEmpty) None  // {n,} = n or more
          else Some(hi.toInt)        // {n,m}
        require(m.forall(_ >= n), s"path quantifier needs n <= m: $lexical")
        // the bounded composition is one join per level — cap the plan
        // depth the syntax can demand
        require(n <= 20 && m.forall(_ <= 20),
          s"path quantifier bound beyond the subset's 20-level cap: $lexical")
        Some((inner.split("\\|").toSeq.map(Dictionary.normalizeTerm), n, m))
      case _ => None
    }
  }

  /** Base predicate lexical forms of any closure-path syntax (positive,
    * inverse-bearing, negated, or quantified) — for dictionary encoding. */
  private def closureBasePreds(lexical: String): Seq[String] =
    (pathPreds(lexical).map(_._1) orElse
      invClosurePreds(lexical).map(_._1.map(_._1)) orElse
      negClosurePreds(lexical).map(_._1) orElse
      quantPreds(lexical).map(_._1)).getOrElse(Nil)

  private def isClosurePath(lexical: String): Boolean =
    pathPreds(lexical).isDefined || invClosurePreds(lexical).isDefined ||
      negClosurePreds(lexical).isDefined || quantPreds(lexical).isDefined

  /** One step of a sequence property path: the alternation's predicate
    * lexical forms, inverse (`^`) flag, and an optional closure modifier
    * (`+` / `*` / `?`) applying to THIS step.
    */
  final case class PathStep(preds: Seq[String], inverse: Boolean, mod: Option[Char])

  private val stepRe = "^(\\^?)(:?\\w+|\\((?::?\\w+)(?:\\|:?\\w+)*\\))([+*?]?)$".r

  private def parseStep(text: String): Option[PathStep] = text match {
    case stepRe(inv, core, mod) =>
      val preds = core.stripPrefix("(").stripSuffix(")")
        .split("\\|").toSeq.map(Dictionary.normalizeTerm)
      Some(PathStep(preds, inv == "^", mod.headOption))
    case _ => None
  }

  /** Nested sequence property paths (SPARQL 1.1 PathSequence with closure):
    *  - group closure `(:p/:q)+` / `(^:p/:q)*` / `(:p/:q)?` — the closure
    *    of the COMPOSED relation (the sequence joined into one edge set);
    *  - flat sequence with closure steps `:p/:q+`, `:p+/^:q`,
    *    `:p/(:q|:r)*` — each step evaluated left-to-right over a frontier,
    *    closure steps through the BFS fixpoint.
    * Returns (steps, outer modifier — Some for the group-closure form).
    * Plain sequences without any modifier are NOT matched here (the parser
    * rewrites those to fresh-variable chains — one static join plan).
    */
  private[sparql] def seqPath(lexical: String): Option[(Seq[PathStep], Option[Char])] = {
    val groupRe = "^\\((.+)\\)([+*?])$".r
    lexical match {
      case groupRe(inner, mod) if inner.contains("/") =>
        val steps = inner.split("/").toSeq.map(parseStep)
        // group-closure steps must be modifier-free (no nested closures)
        if (steps.forall(s => s.isDefined && s.get.mod.isEmpty))
          Some((steps.map(_.get), Some(mod.head)))
        else None
      case l if l.contains("/") =>
        val steps = l.split("/").toSeq.map(parseStep)
        // at least one closure step or alternation group — otherwise the
        // parser's plain-sequence rewrite owns the syntax
        if (steps.forall(_.isDefined) &&
            steps.exists(s => s.get.mod.nonEmpty || s.get.preds.length > 1))
          Some((steps.map(_.get), None))
        else None
      case _ => None
    }
  }

  /** All atoms of a FILTER condition tree. */
  private def filterLeaves(e: FilterExpr): Seq[FilterCond] = e match {
    case FilterLeaf(c) => Seq(c)
    case FilterAnd(l, r) => filterLeaves(l) ++ filterLeaves(r)
    case FilterOr(l, r) => filterLeaves(l) ++ filterLeaves(r)
  }

  /** Base predicate constants referenced by any path-syntax predicate token
    * in `pats` (closure, negated set, or sequence) — nothing for plain
    * patterns.
    */
  private def pathBasePreds(pats: Seq[TriplePattern]): Seq[Constant] =
    pats.flatMap(_.p match {
      case Constant(l) =>
        (Some(closureBasePreds(l)).filter(_.nonEmpty) orElse negPreds(l) orElse
          seqPath(l).map(_._1.flatMap(_.preds)))
          .getOrElse(Nil).map(Constant.apply)
      case _ => Nil
    })

  /** True when `lexical` uses property-path syntax THIS planner supports in
    * the predicate position (closure, negated set, or sequence-with-closure
    * forms — plain sequences/inverses are the parser's rewrite). The parser
    * uses this to fail loudly on unsupported path syntax instead of letting
    * it fall through as a constant term that encodes to nothing.
    */
  private[sparql] def supportedPathSyntax(lexical: String): Boolean =
    isClosurePath(lexical) || negPreds(lexical).isDefined ||
      seqPath(lexical).isDefined

  /** `quads`: optional 4-column (Subject, Predicate, Object, Graph) store
    * backing `GRAPH` groups — absent, a GRAPH query fails loudly.
    */
  def plan(query: BgpQuery, store: Store, dict: Dictionary,
      quads: Option[DataFrame] = None): DataFrame = {
    // DESCRIBE: all triples with the term in subject OR object position —
    // the subject side sign-routes to ONE table (point predicate on the
    // layout key); the object side scans both. An unknown term describes
    // nothing.
    query.describeTerm.foreach { t =>
      val enc = dict.encodeTerms(Seq(t.lexical))
      val id = enc.get(t.lexical)
      val all = store match {
        case SingleTable(df) => df
        case SplitTables(pos, neg) => pos.unionAll(neg)
      }
      val bySubject = (store, id) match {
        case (_, None) => return all.limit(0).select(
          col(TripleSchema.subject), col(TripleSchema.predicate), col(TripleSchema.objekt))
        case (SplitTables(pos, neg), Some(i)) =>
          (if (i >= 0) pos else neg).filter(col(TripleSchema.subject) === lit(i))
        case (SingleTable(df), Some(i)) => df.filter(col(TripleSchema.subject) === lit(i))
      }
      val byObject = all.filter(col(TripleSchema.objekt) === lit(id.get))
      // an RDF description is a SET of triples: dedup collapses the
      // double-emission of reflexive triples (term in both positions)
      return bySubject.unionAll(byObject).select(
        col(TripleSchema.subject), col(TripleSchema.predicate), col(TripleSchema.objekt))
        .distinct()
    }
    // DESCRIBE ?v WHERE { bgp }: plan the inner query, take the DISTINCT
    // bindings of the described variable, and semi-join the triple store
    // against them in both positions (hash semi-joins — the binding set is
    // usually small and broadcasts; never a collect).
    query.describeWhere.foreach { inner =>
      val v = inner.projection.head
      val bind = plan(inner, store, dict, quads)
        .select(col(v).as("node")).distinct()
      val all = store match {
        case SingleTable(df) => df
        case SplitTables(pos, neg) => pos.unionAll(neg)
      }
      val bySubject = all.join(bind, all(TripleSchema.subject) === bind("node"), "left_semi")
      val byObject = all.join(bind, all(TripleSchema.objekt) === bind("node"), "left_semi")
      return bySubject.unionAll(byObject).select(
        col(TripleSchema.subject), col(TripleSchema.predicate), col(TripleSchema.objekt))
        .distinct()
    }
    // Patterns whose predicate is a one-or-more property path plan through
    // the iterative closure operator, not a scan.
    val (pathPatterns, nonPathPatterns) = query.patterns.partition {
      p => p.p match {
        case Constant(l) => isClosurePath(l)
        case _ => false
      }
    }
    // Sequence paths carrying closure steps (`:p/:q+`, `(:p/:q)*`) plan
    // left-to-right over a frontier (closures through the BFS fixpoint).
    val (seqPatterns, plainPatterns) = nonPathPatterns.partition {
      p => p.p match {
        case Constant(l) => seqPath(l).isDefined
        case _ => false
      }
    }
    // Negated property sets plan as ordinary scans over a hidden predicate
    // variable post-filtered with NOT isin (an unknown negated term excludes
    // nothing — it cannot occur in the data, so the pattern matches every
    // predicate, per SPARQL semantics).
    val (negPatterns, scanPatterns) = plainPatterns.partition {
      p => p.p match {
        case Constant(l) => negPreds(l).isDefined
        case _ => false
      }
    }
    // Encode every constant — pattern terms, path base predicates, AND
    // filter right-hand sides — in one dictionary round-trip (single
    // pushed-down isin scan, not one scan per term).
    val constants = ((plainPatterns ++ query.optionals.flatten ++ query.unionArms.flatten ++
      query.constructTemplate)
      .flatMap(p => Seq(p.s, p.p, p.o)) ++
      pathPatterns.flatMap(p => Seq(p.s, p.o)) ++
      pathPatterns.flatMap(p =>
        closureBasePreds(p.p.asInstanceOf[Constant].lexical).map(Constant(_))) ++
      seqPatterns.flatMap(p => Seq(p.s, p.o)) ++
      seqPatterns.flatMap(p => seqPath(p.p.asInstanceOf[Constant].lexical).get._1
        .flatMap(_.preds).map(Constant(_))) ++
      negPatterns.flatMap(p => negPreds(p.p.asInstanceOf[Constant].lexical).get.map(Constant(_))) ++
      (query.filters ++ query.optionalFilters.flatten ++
        query.filterExprs.flatMap(filterLeaves))
        // regex patterns / string-function args are raw strings, not
        // dictionary terms
        .filterNot(c => FilterOp.isLexical(c.op))
        .flatMap(c => c.value +: c.values) ++
      query.minuses.flatten.flatMap(p => Seq(p.s, p.p, p.o)) ++
      query.existsFilters.flatMap(_._1).flatMap(p => Seq(p.s, p.p, p.o)) ++
      // path syntax inside groups (OPTIONAL/UNION/MINUS/EXISTS/GRAPH):
      // the base predicates must encode even though the composite token
      // itself is not a dictionary term
      pathBasePreds(query.optionals.flatten ++ query.unionArms.flatten ++
        query.minuses.flatten ++ query.existsFilters.flatMap(_._1) ++
        query.graphGroups.flatMap(_._2)) ++
      query.inlineValues.flatMap(_._2) ++
      query.inlineValuesMulti.flatMap(_._2.flatten.flatten) ++
      query.graphGroups.flatMap { case (g, pats) =>
        g +: pats.flatMap(p => Seq(p.s, p.p, p.o)) } ++
      query.binds.flatMap(_._1 match {
        case BindTerm(t) => Seq(t)
        case BindArith(l, _, r) => Seq(l, r)
        case BindCoalesce(ts) => ts
        case BindIf(c, t, e) => Seq(c.value, t, e)
      })).collect {
      case Constant(l) => l
    }.distinct
    val enc: Map[String, Int] = dict.encodeTerms(constants)

    // Group-context pattern dispatcher: patterns inside OPTIONAL / UNION /
    // MINUS / EXISTS / bound-GRAPH groups route through the SAME path
    // planners as required patterns (closures via the BFS fixpoint,
    // sequences, negated sets) instead of silently encoding a composite
    // path token to nothing.
    def planGroupPattern(st: Store)(p: TriplePattern, idx: Int): DataFrame =
      p.p match {
        case Constant(l) if isClosurePath(l) => planPathPattern(p, st, enc)
        case Constant(l) if seqPath(l).isDefined => planSeqPathPattern(p, st, enc)
        case Constant(l) if negPreds(l).isDefined =>
          val v = s"__gneg$idx"
          val ids = negPreds(l).get.flatMap(enc.get)
          val base = planPattern(TriplePattern(p.s, Variable(v), p.o), idx, st, enc)
          (if (ids.isEmpty) base else base.filter(!col(v).isin(ids: _*))).drop(v)
        case _ => planPattern(p, idx, st, enc)
      }

    val planned = scanPatterns.zipWithIndex.map { case (pat, i) =>
      planPattern(pat, i, store, enc)
    } ++ negPatterns.zipWithIndex.map { case (pat, i) =>
      // the `__path` prefix keeps the synthetic predicate variable out of
      // star projections; it is dropped before the joins regardless
      val v = s"__pathneg$i"
      val ids = negPreds(pat.p.asInstanceOf[Constant].lexical).get.flatMap(enc.get)
      val base = planPattern(TriplePattern(pat.s, Variable(v), pat.o),
        900000 + i, store, enc)
      (if (ids.isEmpty) base else base.filter(!col(v).isin(ids: _*))).drop(v)
    } ++ pathPatterns.map(p => planPathPattern(p, store, enc)) ++
      seqPatterns.map(p => planSeqPathPattern(p, store, enc))

    // Join patterns left-to-right on shared variables; disjoint patterns
    // cross-join (correct per SPARQL semantics, logged as a scale hazard).
    def joinGroup(dfs: Seq[DataFrame]): DataFrame = dfs.reduceLeft { (acc, next) =>
      val shared = acc.columns.toSet.intersect(next.columns.toSet).toSeq.sorted
      if (shared.isEmpty) acc.crossJoin(next)
      else acc.join(next, shared, "inner")
    }
    // GRAPH groups (named graphs): a bound graph term filters the quad
    // store to that graph (a point predicate Catalyst pushes into the
    // scan — with a graph-partitioned quad layout this is partition
    // pruning) and the patterns plan as ordinary triple patterns over the
    // filtered store; a graph VARIABLE plans each pattern as a QUAD
    // pattern carrying the graph column as a binding — all patterns of
    // one group share the variable, so "same graph" is the ordinary
    // shared-variable equi-join.
    val graphPlanned = query.graphGroups.zipWithIndex.flatMap {
      case ((gTerm, pats), gi) =>
        val q = quads.getOrElse(throw new IllegalArgumentException(
          "GRAPH requires a registered quad store"))
        gTerm match {
          case Constant(l) =>
            val sub = enc.get(l) match {
              case Some(id) => q.filter(col(TripleSchema.graph) === lit(id))
              case None => q.limit(0) // unknown graph holds nothing
            }
            val st = SingleTable(sub.select(col(TripleSchema.subject),
              col(TripleSchema.predicate), col(TripleSchema.objekt)))
            pats.zipWithIndex.map { case (p, i) =>
              planGroupPattern(st)(p, 300000 * (gi + 1) + i) }
          case Variable(gv) =>
            pats.zipWithIndex.map { case (p, i) =>
              planQuadPattern(p, gv, 300000 * (gi + 1) + i, q, enc) }
        }
    }
    // Subqueries (SPARQL 1.1 SubSelect): each plans RECURSIVELY as a full
    // query — aggregates, modifiers and all — and its projected columns
    // join the enclosing group like any other pattern relation (shared
    // variables ⇒ equi-join; none ⇒ cross join per SPARQL semantics).
    val subDfs = query.subqueries.map(sq => plan(sq, store, dict, quads))
    // Top-level UNION (SPARQL Union): each arm is its own BGP join plan;
    // arms are combined with bag semantics, and a variable unbound in an
    // arm pads to null — `unionByName(allowMissingColumns)` gives exactly
    // the SPARQL multiset-union-with-null-padding, and each arm stays an
    // independently optimized subtree (filters pushed per arm).
    val required =
      if (query.unionArms.isEmpty) joinGroup(planned ++ graphPlanned ++ subDfs)
      else query.unionArms.zipWithIndex.map { case (arm, a) =>
        joinGroup(arm.zipWithIndex.map { case (p, i) =>
          planGroupPattern(store)(p, 100000 * (a + 1) + i)
        })
      }.reduceLeft(_.unionByName(_, allowMissingColumns = true))

    // OPTIONAL groups: each planned as its own BGP, then LEFT-joined to the
    // accumulated result on the shared variables (SPARQL LeftJoin) — rows
    // without a match keep the optional variables null. Using-column join
    // keeps the left side's binding for shared variables, which is exactly
    // the compatible-mapping semantics.
    // Variables whose value is a NUMBER (BIND arithmetic results), not a
    // dictionary id: comparisons against numeric literals apply to them
    // directly. Every other variable holds an encoded id, and a numeric
    // literal comparison goes through the dictionary VALUE join below.
    val arithVars: Set[String] =
      query.binds.collect { case (BindArith(_, _, _), alias) => alias }.toSet

    // DECODED-VALUE comparisons: a NUMERIC literal against an id-valued
    // variable compares the variable's decoded lexical form AS A NUMBER
    // (SPARQL operand semantics), not its encoded id. Planned as ONE left
    // join per distinct variable against the dictionary projected to
    // `try_cast(term AS DOUBLE)` (the cast runs once per VOCABULARY entry,
    // never per solution row); the resulting `__val_<var>` column then
    // composes freely inside &&/||/IF Column trees. Semantics per row:
    //   mapped, numeric lexical  -> compare the decoded number
    //   mapped, non-numeric      -> SPARQL type error (null -> excluded,
    //                               under every operator including !=)
    //   UNMAPPED id              -> the id IS the value: in this engine an
    //     id absent from the dictionary denotes the integer literal itself
    //     (the reference's data model — opaque ints ARE the values,
    //     MyOpVisitorBase.java:69-78), so it compares as its own number.
    //   null (OPTIONAL-unbound)  -> expression error (excluded)
    // Double compare: exact for integral terms within 2^53.
    def needsValueCmp(f: FilterCond): Boolean = f.op match {
      case FilterEq | FilterNeq | FilterLt | FilterLe | FilterGt | FilterGe =>
        (f.value match {
          case Constant(l) => l.toLongOption.isDefined
          case _ => false
        }) && !arithVars.contains(f.variable)
      case _ => false
    }
    def valCol(v: String): String = s"__val_$v"
    def withDecodedVals(df: DataFrame, vars: Seq[String]): DataFrame =
      vars.distinct.filterNot(v => df.columns.contains(valCol(v)))
        .foldLeft(df) { (acc, v) =>
          val idC = s"__vid_$v"
          val numC = s"__vnum_$v"
          val vocab = dict.entries.toDF(idC, "__vterm")
            .select(col(idC), expr("try_cast(__vterm AS DOUBLE)").as(numC))
          acc.join(vocab, acc(v) === col(idC), "left")
            .withColumn(valCol(v),
              when(col(idC).isNull, col(v).cast("double")).otherwise(col(numC)))
            .drop(idC, numC)
        }

    // One FILTER atom as a Column predicate (everything except regex —
    // string-function dictionary joins cannot compose inside an &&/||
    // Column tree; numeric VALUE comparisons CAN, via the pre-joined
    // `__val_<var>` column above).
    // Comparison RHS resolution: dictionary term → its encoded id (term
    // ordering = id ordering is the documented layout contract for ordered
    // term comparisons, matching the reference's id domain); bare numeric
    // literal on an id-valued variable → DECODED-VALUE comparison (the
    // caller pre-joins `__val_<var>`); bare numeric literal on a
    // BIND-arithmetic variable → plain numeric comparison; unknown
    // non-numeric term → SPARQL expression error: `!=` keeps the row
    // (true), every other op drops it (false).
    def condColumn(df: DataFrame, f: FilterCond): Column = {
      require(df.columns.contains(f.variable),
        s"FILTER variable ?${f.variable} not bound " +
          s"(bound: ${df.columns.mkString(", ")})")
      f.op match {
        case FilterBound => col(f.variable).isNotNull
        case FilterNotBound => col(f.variable).isNull
        case op if FilterOp.isLexical(op) => throw new IllegalArgumentException(
          "regex()/string-function filters cannot appear inside &&/|| in the subset")
        // [NOT] IN over constant terms → a single pushdown-friendly `isin`
        // on the encoded ids. Terms absent from the dictionary (and
        // non-numeric) can never equal a bound value — dropped from the id
        // list, which realizes SPARQL's `=`-per-element semantics. A null
        // (OPTIONAL-unbound) variable is an expression error → the null
        // isin result drops the row under IN and NOT IN alike.
        case FilterIn | FilterNotIn =>
          val ids: Seq[Any] = f.values.collect {
            case Constant(l) => enc.get(l).map(_.asInstanceOf[Any])
              .orElse(l.toLongOption.map(n =>
                (if (n.isValidInt) n.toInt else n): Any))
          }.flatten
          if (f.op == FilterIn) {
            if (ids.isEmpty) lit(false) else col(f.variable).isin(ids: _*)
          } else {
            if (ids.isEmpty) col(f.variable).isNotNull
            else !col(f.variable).isin(ids: _*)
          }
        case cmp =>
          val sides: Option[(Column, Column)] = f.value match {
            case Variable(v) =>
              require(df.columns.contains(v), s"FILTER variable ?$v not bound")
              Some((col(f.variable), col(v)))
            case Constant(l) =>
              l.toLongOption match {
                case Some(n) if !arithVars.contains(f.variable) =>
                  // decoded-value comparison over the pre-joined column
                  // (see withDecodedVals) — a null value (non-numeric term
                  // or unbound variable) is a type error: the comparison
                  // yields null and the row drops under every operator
                  require(df.columns.contains(valCol(f.variable)),
                    s"internal: decoded-value column for ?${f.variable} " +
                      "not pre-joined (withDecodedVals)")
                  Some((col(valCol(f.variable)), lit(n.toDouble)))
                case Some(n) =>
                  // BIND-arithmetic variable: already a number; int-width
                  // literal stays int (keeps the pushdown literal in the
                  // int store's type), beyond-int promotes to long
                  Some((col(f.variable),
                    if (n.isValidInt) lit(n.toInt) else lit(n)))
                case None =>
                  enc.get(l).map(id => (col(f.variable), lit(id)))
              }
          }
          sides match {
            case None => if (cmp == FilterNeq) lit(true) else lit(false)
            case Some((x, r)) => cmp match {
              case FilterEq => x === r
              case FilterNeq => !(x === r)
              case FilterLt => x < r
              case FilterLe => x <= r
              case FilterGt => x > r
              case FilterGe => x >= r
              case other => throw new IllegalStateException(s"unreachable: $other")
            }
          }
      }
    }

    def applyFilter(df: DataFrame, f: FilterCond): DataFrame = {
      // [!]regex / [!]STRSTARTS / [!]STRENDS / [!]CONTAINS / STRLEN-cmp:
      // the variable's DECODED lexical form satisfies the string predicate
      // — planned as a semi-join (anti for the negated forms) against the
      // predicate-filtered dictionary, so matching stays distributed and
      // the predicate is evaluated once per VOCABULARY entry, not per
      // solution row. No broadcast hint: a broad predicate can match a
      // large id set — Catalyst/AQE picks the join side from size stats.
      def lex = f.value.asInstanceOf[Constant].lexical
      val term = col("__rx_term")
      // (vocabulary predicate, plan as anti-join?) — STRLEN folds its
      // comparison (including !=) into the predicate itself, so it always
      // semi-joins
      val dictPred: Option[(Column, Boolean)] = f.op match {
        case FilterRegex => Some((term.rlike(lex), false))
        case FilterNotRegex => Some((term.rlike(lex), true))
        case FilterStrStarts => Some((term.startsWith(lex), false))
        case FilterNotStrStarts => Some((term.startsWith(lex), true))
        case FilterStrEnds => Some((term.endsWith(lex), false))
        case FilterNotStrEnds => Some((term.endsWith(lex), true))
        case FilterStrContains => Some((term.contains(lex), false))
        case FilterNotStrContains => Some((term.contains(lex), true))
        case FilterStrLen(cmp) =>
          val n = lit(lex.toInt)
          val len = length(term)
          Some((cmp match {
            case FilterEq => len === n
            case FilterNeq => !(len === n)
            case FilterLt => len < n
            case FilterLe => len <= n
            case FilterGt => len > n
            case FilterGe => len >= n
            case other => throw new IllegalStateException(s"unreachable: $other")
          }, false))
        case _ => None
      }
      dictPred match {
        case Some((pred, negated)) =>
          val ids = dict.entries.toDF("__rx_id", "__rx_term")
            .filter(pred).select(col("__rx_id"))
          val joinType = if (negated) "left_anti" else "left_semi"
          // SPARQL error semantics: a null (OPTIONAL-unbound) variable is
          // an expression error — the row drops under the positive AND the
          // negated form (an anti join alone would keep nulls)
          val base = if (negated) df.filter(col(f.variable).isNotNull) else df
          base.join(ids, base(f.variable) === col("__rx_id"), joinType)
        case None if needsValueCmp(f) =>
          // decoded-value numeric comparison (see withDecodedVals): one
          // left join against the numeric-cast vocabulary, predicate on
          // the decoded column, helper column dropped after
          val pre = withDecodedVals(df, Seq(f.variable))
          pre.filter(condColumn(pre, f)).drop(valCol(f.variable))
        case None => df.filter(condColumn(df, f))
      }
    }

    def applyFilterExpr(df: DataFrame, e: FilterExpr): DataFrame = {
      // pre-join decoded-value columns for every numeric-literal
      // comparison leaf, so value comparisons compose inside &&/||
      def leaves(x: FilterExpr): Seq[FilterCond] = x match {
        case FilterLeaf(c) => Seq(c)
        case FilterAnd(l, r) => leaves(l) ++ leaves(r)
        case FilterOr(l, r) => leaves(l) ++ leaves(r)
      }
      val valVars = leaves(e).filter(needsValueCmp).map(_.variable).distinct
      val pre = withDecodedVals(df, valVars)
      def toCol(x: FilterExpr): Column = x match {
        case FilterLeaf(c) => condColumn(pre, c)
        case FilterAnd(l, r) => toCol(l) && toCol(r)
        case FilterOr(l, r) => toCol(l) || toCol(r)
      }
      pre.filter(toCol(e)).drop(valVars.map(valCol): _*)
    }

    val joined = query.optionals.zipWithIndex.foldLeft(required) {
      case (acc, (optPatterns, g)) =>
        val optBase = joinGroup(optPatterns.zipWithIndex.map { case (p, i) =>
          planGroupPattern(store)(p, 1000 * (g + 1) + i)
        })
        // group-scoped FILTERs restrict the optional side BEFORE the left
        // join (their variables are bound inside the group — subset rule),
        // so Catalyst pushes constant equalities into the group's scans
        val opt = query.optionalFilters.lift(g).getOrElse(Nil)
          .foldLeft(optBase)(applyFilter)
        val shared = acc.columns.toSet.intersect(opt.columns.toSet).toSeq.sorted
        if (shared.isEmpty) acc.join(opt, lit(true), "left")
        else acc.join(opt, shared, "left")
    }

    // MINUS (SPARQL negation): solutions compatible with the minus group on
    // the SHARED variables are removed — a left ANTI join. With no shared
    // variable no solution is minus-compatible (SPARQL spec), so the group
    // is a no-op.
    val afterMinus = query.minuses.zipWithIndex.foldLeft(joined) {
      case (acc, (mPats, g)) =>
        val m = joinGroup(mPats.zipWithIndex.map { case (p, i) =>
          planGroupPattern(store)(p, 500000 * (g + 1) + i)
        })
        val shared = acc.columns.toSet.intersect(m.columns.toSet).toSeq.sorted
        if (shared.isEmpty) acc else acc.join(m, shared, "left_anti")
    }

    // Variables bound by a REQUIRED pattern (every arm, for a union) are
    // provably non-null; OPTIONAL-only variables are nullable. Needed by
    // EXISTS (below) and the VALUES compatibility rule (further below).
    val nonNullVars: Set[String] =
      if (query.unionArms.nonEmpty)
        query.unionArms.map(_.flatMap(p => Seq(p.s, p.p, p.o)
          .collect { case Variable(v) => v }).toSet).reduce(_ intersect _)
      else (plainPatterns.flatMap(p => Seq(p.s, p.p, p.o)
          .collect { case Variable(v) => v }) ++
        query.graphGroups.flatMap { case (g, pats) =>
          (g +: pats.flatMap(p => Seq(p.s, p.p, p.o)))
            .collect { case Variable(v) => v } } ++
        (pathPatterns ++ seqPatterns).flatMap(p =>
          Seq(p.s, p.o).collect { case Variable(v) => v })).toSet

    // FILTER [NOT] EXISTS: a correlated semi-join (anti-join when negated)
    // on the SHARED variables. With NO shared variable the test is the
    // group's global non-emptiness — planned as a semi/anti join against
    // LocalLimit(1) of the group (a one-row probe, never a count), which
    // is exactly where EXISTS and MINUS diverge: a disjoint-domain MINUS
    // is a no-op, a disjoint-domain NOT EXISTS can remove everything.
    // SPARQL substitution semantics: an OPTIONAL-bound variable that is
    // null in a solution stays FREE inside EXISTS (the group can still
    // match) — a null-rejecting equi key would wrongly drop (EXISTS) or
    // keep (NOT EXISTS) those rows, so nullable shared variables get the
    // null-tolerant `isNull || =` condition instead. Required variables
    // keep the plain equi key (hash semi/anti join); the group side is
    // deduplicated on the shared variables so the null-tolerant probe
    // stays bounded by the distinct binding count.
    val afterExists = query.existsFilters.zipWithIndex.foldLeft(afterMinus) {
      case (acc, ((ePats, negated), g)) =>
        val e = joinGroup(ePats.zipWithIndex.map { case (p, i) =>
          planGroupPattern(store)(p, 700000 * (g + 1) + i)
        })
        val shared = acc.columns.toSet.intersect(e.columns.toSet).toSeq.sorted
        val joinType = if (negated) "left_anti" else "left_semi"
        if (shared.isEmpty) acc.join(e.limit(1), lit(true), joinType)
        else if (shared.forall(nonNullVars.contains)) acc.join(e, shared, joinType)
        else {
          val probe = e.select(shared.map(col): _*).distinct()
          val renamed = shared.foldLeft(probe)(
            (d, v) => d.withColumnRenamed(v, s"__ex_$v"))
          val cond = shared.map { v =>
            if (nonNullVars.contains(v)) col(v) === col(s"__ex_$v")
            else col(v).isNull || col(v) === col(s"__ex_$v")
          }.reduce(_ && _)
          acc.join(renamed, cond, joinType)
        }
    }

    // VALUES (single-variable inline bindings): semantically Join(P, data).
    // When the variable is bound by a REQUIRED pattern it can never be
    // null, and the join degenerates to an `isin` predicate that Catalyst
    // pushes into the pattern's scan — the cheapest correct plan. When the
    // variable is only OPTIONAL-bound (nullable), the full SPARQL
    // compatibility rule applies: an unbound solution is compatible with
    // every VALUES row and survives WITH the variable bound to it — a join
    // against the (tiny, broadcast) literal table with null-extension.
    // An unknown term binds nothing (it cannot match any encoded id).
    val withValues = query.inlineValues.foldLeft(afterExists) { case (acc, (v, terms)) =>
      require(acc.columns.contains(v),
        s"VALUES variable ?$v not bound by the BGP (bound: ${acc.columns.mkString(", ")})")
      // keep the MULTISET: a term listed twice doubles its solutions (VALUES
      // is Join(P, data) over a bag) — the isin fast path applies only when
      // the encoded list is duplicate-free
      val rawIds = terms.flatMap(t => enc.get(t.lexical))
      val ids = rawIds.distinct
      if (rawIds.isEmpty) acc.filter(lit(false))
      else if (nonNullVars.contains(v) && rawIds.length == ids.length)
        acc.filter(col(v).isin(ids: _*))
      else {
        val spark = acc.sparkSession
        import spark.implicits._
        val vdf = rawIds.toDF("__graft_val")
        acc.join(vdf, col(v).isNull || col(v) === col("__graft_val"))
          .withColumn(v, coalesce(col(v), col("__graft_val")))
          .drop("__graft_val")
      }
    }

    // Multi-variable VALUES: Join(P, data) against the (tiny, broadcast)
    // literal tuple table under the compatibility rule — a solution matches
    // a tuple when every shared variable is unbound or equal, and unbound
    // variables come out bound to the tuple's value. Tuples containing a
    // term absent from the dictionary are dropped (they cannot match any
    // bound solution — subset deviation for the unbound-var case, as in
    // the single-variable path). For all-required variables Catalyst
    // simplifies the null-tolerant condition to a plain equi-join.
    val withValuesMulti = query.inlineValuesMulti.foldLeft(withValues) {
      case (acc, (vars, rows)) =>
        vars.foreach(v => require(acc.columns.contains(v),
          s"VALUES variable ?$v not bound by the BGP (bound: ${acc.columns.mkString(", ")})"))
        // per-cell: Some(id) = bound term, None = UNDEF (wildcard for that
        // variable in that row). A DEFINED term absent from the dictionary
        // drops its row (it cannot match any bound solution).
        val encRows: Seq[Seq[Option[Int]]] = rows.flatMap { r =>
          val ids = r.map(_.map(c => enc.get(c.lexical)))
          if (ids.exists(o => o.isDefined && o.get.isEmpty)) None
          else Some(ids.map(_.flatten))
        }
        if (encRows.isEmpty) acc.filter(lit(false))
        else {
          val spark = acc.sparkSession
          val tmpCols = vars.map(v => s"__graft_val_$v")
          // a column is nullable only if some row leaves it UNDEF — keeps
          // the no-UNDEF case's tight non-null schema
          val hasUndef = vars.indices.map(i => encRows.exists(r => r(i).isEmpty))
          val schema = org.apache.spark.sql.types.StructType(
            tmpCols.zipWithIndex.map { case (c, i) =>
              org.apache.spark.sql.types.StructField(
                c, org.apache.spark.sql.types.IntegerType, nullable = hasUndef(i)) })
          val vdf = spark.createDataFrame(
            java.util.Arrays.asList(encRows.map(r =>
              org.apache.spark.sql.Row.fromSeq(
                r.map(_.map(x => x: java.lang.Integer).orNull))): _*), schema)
          // required variables are provably non-null: emit the plain
          // equality so Catalyst plans a Broadcast HASH join on the tuple
          // (the null-tolerant OR would force a nested-loop probe — the
          // scan's nullable column type hides the invariant from the
          // optimizer). An UNDEF-bearing column wraps ITS condition in a
          // null-tolerant disjunct (the wildcard), leaving UNDEF-free
          // columns as plain hash-join keys.
          val cond = vars.zip(tmpCols).zipWithIndex.map { case ((v, c), i) =>
            val base =
              if (nonNullVars.contains(v)) col(v) === col(c)
              else col(v).isNull || col(v) === col(c)
            if (hasUndef(i)) col(c).isNull || base else base
          }.reduce(_ && _)
          val joined = acc.join(broadcast(vdf), cond)
          // extension: an unbound solution variable takes the tuple's value
          // (null for UNDEF — no extension)
          vars.zip(tmpCols).foldLeft(joined) { case (df, (v, c)) =>
            df.withColumn(v, coalesce(col(v), col(c)))
          }.drop(tmpCols: _*)
        }
    }

    // BIND: new visible bindings over the joined solutions — a variable
    // alias copies the column; a constant binds its encoded id (an unknown
    // term binds the error value, null — SPARQL expression-error
    // semantics). Evaluated before FILTER so filters can reference them.
    val withBinds = query.binds.foldLeft(withValuesMulti) {
      case (acc, (bexpr, alias)) =>
        require(!acc.columns.contains(alias),
          s"BIND alias ?$alias is already bound")
        // arithmetic operand: variable → column, term → encoded id, bare
        // integer → itself, unknown → null (expression error); widened to
        // long so id-space arithmetic cannot overflow the int domain
        def operand(t: Term): Column = t match {
          case Variable(v) =>
            require(acc.columns.contains(v), s"BIND source ?$v not bound")
            col(v).cast("long")
          case Constant(l) =>
            enc.get(l).map(id => lit(id.toLong))
              .orElse(l.toLongOption.map(n => lit(n)))
              .getOrElse(lit(null).cast("long"))
        }
        bexpr match {
          case BindTerm(Variable(v)) =>
            require(acc.columns.contains(v), s"BIND source ?$v not bound")
            acc.withColumn(alias, col(v))
          case BindTerm(Constant(l)) =>
            acc.withColumn(alias,
              enc.get(l).map(id => lit(id)).getOrElse(lit(null).cast("int")))
          case BindArith(l, op, r) =>
            val e = op match {
              case '+' => operand(l) + operand(r)
              case '-' => operand(l) - operand(r)
              case '*' => operand(l) * operand(r)
              case other => throw new IllegalArgumentException(
                s"unsupported BIND operator '$other'")
            }
            acc.withColumn(alias, e)
          // COALESCE: first non-error argument — operand() already maps
          // unbound variables and unknown terms to null, so Spark's
          // null-skipping coalesce IS the SPARQL first-non-error fold
          case BindCoalesce(ts) =>
            ts.foreach { case Variable(v) =>
              require(acc.columns.contains(v), s"COALESCE source ?$v not bound")
            case _ => () }
            acc.withColumn(alias, coalesce(ts.map(operand): _*))
          // IF: a null condition (error) nulls the whole expression —
          // when() without otherwise-on-null gives exactly that. A
          // numeric-literal condition on an id variable pre-joins its
          // decoded value (withDecodedVals) so value semantics hold
          // inside IF exactly as in FILTER.
          case BindIf(c, t, e) =>
            val pre =
              if (needsValueCmp(c)) withDecodedVals(acc, Seq(c.variable))
              else acc
            pre.withColumn(alias,
                when(condColumn(pre, c), operand(t))
                  .when(!condColumn(pre, c), operand(e)))
              .drop(valCol(c.variable))
        }
    }

    // FILTER conditions: plain Column predicates over the joined variable
    // columns — Catalyst pushes an equality on a single pattern's variable
    // down into that pattern's scan (encoded point predicate), so a FILTER
    // costs the same as writing the constant inside the pattern. An unknown
    // constant matches nothing: `=` → false, `!=` → true.
    // Top-level FILTERs evaluate over the merged solution: BOUND/!BOUND on
    // an OPTIONAL-bound variable are null predicates over the LeftJoin
    // encoding (!BOUND = negation-as-failure, evaluated streaming above the
    // join probe); constant equalities on required variables push into the
    // pattern scans.
    val filtered = query.filterExprs.foldLeft(
      query.filters.foldLeft(withBinds)(applyFilter))(applyFilterExpr)

    // ASK: boolean existence — LocalLimit(1) stops each partition at the
    // first matching row, the count-over-limit aggregate folds to a single
    // boolean; nothing beyond one solution is ever computed.
    if (query.ask)
      return filtered.limit(1).agg((count(lit(1)) > 0).as("result"))

    // CONSTRUCT: instantiate each template triple per solution, union, and
    // dedup (an RDF graph is a SET of triples). A template constant that is
    // missing from the dictionary can instantiate nothing.
    if (query.constructTemplate.nonEmpty) {
      val built = query.constructTemplate.map { t =>
        def termCol(term: Term) = term match {
          case Variable(v) =>
            require(filtered.columns.contains(v),
              s"CONSTRUCT template variable ?$v not bound by the BGP")
            col(v)
          case Constant(l) => enc.get(l) match {
            case Some(id) => lit(id)
            case None => lit(null).cast("int")
          }
        }
        filtered.select(
          termCol(t.s).as(TripleSchema.subject),
          termCol(t.p).as(TripleSchema.predicate),
          termCol(t.o).as(TripleSchema.objekt))
          .filter(col(TripleSchema.subject).isNotNull &&
            col(TripleSchema.predicate).isNotNull &&
            col(TripleSchema.objekt).isNotNull)
      }
      return built.reduceLeft(_.unionAll(_)).distinct()
    }

    // SPARQL 1.1 aggregation: COUNT aggregates in the projection group the
    // solution sequence by the GROUP BY variables (one hash aggregate,
    // map-side combinable — the same plan a SQL GROUP BY produces).
    val aggregated =
      if (query.countAggs.isEmpty && query.havings.isEmpty) filtered
      else {
        val plainVars = query.projection.filterNot(query.countAggs.map(_.alias).contains)
        require(plainVars.forall(query.groupByVars.contains),
          s"projected variables ${plainVars.mkString(",")} must appear in GROUP BY")
        // HAVING aggregates compute as hidden columns in the SAME hash
        // aggregate (no second pass), filter, then drop
        val havingCols = query.havings.zipWithIndex.map { case (h, i) =>
          val c = (h.fn, h.variable) match {
            case ("COUNT", None) => count(lit(1))
            case ("COUNT", Some(v)) => count(col(v))
            case ("SUM", Some(v)) => sum(col(v))
            case ("MIN", Some(v)) => min(col(v))
            case ("MAX", Some(v)) => max(col(v))
            case ("AVG", Some(v)) => avg(col(v))
            case other => throw new IllegalArgumentException(s"unsupported HAVING aggregate: $other")
          }
          c.as(s"__having_$i")
        }
        val aggCols = query.countAggs.map { a =>
          val c = (a.fn, a.variable, a.distinct) match {
            case ("COUNT", None, _) => count(lit(1))
            case ("COUNT", Some(v), false) => count(col(v))
            case ("COUNT", Some(v), true) => countDistinct(col(v))
            case ("SUM", Some(v), false) => sum(col(v))
            case ("SUM", Some(v), true) => sum_distinct(col(v))
            case ("MIN", Some(v), _) => min(col(v))
            case ("MAX", Some(v), _) => max(col(v))
            case ("AVG", Some(v), false) => avg(col(v))
            // SPARQL SAMPLE returns an ARBITRARY value per group; picking
            // MIN is a valid refinement that makes the result deterministic
            // across partitionings and engines
            case ("SAMPLE", Some(v), _) => min(col(v))
            // GROUP_CONCAT with the default separator; the SPARQL spec
            // leaves element order undefined — pinned to ascending value
            // order (array_sort before join) for cross-engine determinism
            case ("GROUP_CONCAT", Some(v), false) =>
              array_join(transform(array_sort(collect_list(col(v))),
                x => x.cast("string")), ",")
            case other => throw new IllegalArgumentException(s"unsupported aggregate: $other")
          }
          c.as(a.alias)
        } ++ havingCols
        val grouped =
          if (query.groupByVars.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
          else filtered.groupBy(query.groupByVars.map(col): _*)
            .agg(aggCols.head, aggCols.tail: _*)
        val kept = query.havings.zipWithIndex.foldLeft(grouped) {
          case (df, (h, i)) =>
            val c = col(s"__having_$i")
            df.filter(h.op match {
              case "<" => c < h.value
              case "<=" => c <= h.value
              case ">" => c > h.value
              case ">=" => c >= h.value
              case "=" => c === h.value
              case "!=" => c =!= h.value
            })
        }
        kept.drop(query.havings.indices.map(i => s"__having_$i"): _*)
      }

    val projection =
      if (query.projection.nonEmpty) query.projection
      // hide existence markers AND path-internal fresh variables (`__path*`
      // from sequence/inverse rewrites — not visible bindings in SPARQL)
      else aggregated.columns.toSeq
        .filterNot(c => c.startsWith("__exists_") || c.startsWith("__path")).sorted
    val projected =
      if (projection.isEmpty) aggregated // fully-bound BGP: non-empty iff it matches
      else aggregated.select(projection.map(col): _*)
    // DISTINCT over the projected solution sequence (set semantics) — a
    // hash aggregate on the projected columns, before LIMIT per SPARQL
    // solution-modifier order
    val modified = if (query.distinct) projected.distinct() else projected
    // ORDER BY → OFFSET → LIMIT (SPARQL solution-modifier order). With a
    // LIMIT, Catalyst turns the sort into a TakeOrderedAndProject (top-k,
    // no total sort-exchange); OFFSET composes as skip-then-take.
    //
    // DECODED-VALUE ordering (round-7, closing the last id-order leak):
    // `ORDER BY ?x` sorts solutions by the variable's DECODED term, not its
    // encoded id — numeric terms by numeric value, non-numeric terms by
    // lexical form, with the SPARQL total-order classes composed as one
    // rank column: unbound < numeric < other terms (ascending; DESC
    // reverses the whole order, so unbound lands last). An id ABSENT from
    // the dictionary denotes the integer literal itself (the engine's data
    // model, as in FILTER), so it sorts among the numerics by its own
    // value; BIND-arithmetic variables are already plain numbers and sort
    // directly. Each ordering variable costs ONE left join against the
    // vocabulary (broadcast-sized) before the sort — the same shape as
    // withDecodedVals — and the helper columns drop right after, so with a
    // LIMIT the plan is still join → TakeOrderedAndProject.
    // Variables that hold PLAIN NUMBERS, not encoded ids: BIND arithmetic
    // AND aggregate aliases (a COUNT/SUM value must never round-trip the
    // dictionary — a count that numerically collides with a real id would
    // "decode" to that id's term and sort lexically). They sort directly.
    val directSortVars: Set[String] = arithVars ++ query.countAggs.map(_.alias)
    def lexCol(v: String): String = s"__olex_$v"
    def withDecodedSortKeys(df: DataFrame, vars: Seq[String]): DataFrame =
      vars.distinct.filterNot(directSortVars.contains)
        .filterNot(v => df.columns.contains(valCol(v)))
        .foldLeft(df) { (acc, v) =>
          val idC = s"__oid_$v"
          val vocab = dict.entries.toDF(idC, lexCol(v))
            .withColumn(s"__onum_$v", expr(s"try_cast(${lexCol(v)} AS DOUBLE)"))
          acc.join(vocab, acc(v) === col(idC), "left")
            .withColumn(valCol(v),
              when(col(idC).isNull, col(v).cast("double"))
                .otherwise(col(s"__onum_$v")))
            // a numeric term sorts by value, never lexically ("9" < "10")
            .withColumn(lexCol(v),
              when(col(valCol(v)).isNotNull, lit(null).cast("string"))
                .otherwise(col(lexCol(v))))
            .drop(idC, s"__onum_$v")
        }
    val ordered =
      if (query.orderBy.isEmpty) modified
      else {
        val sortVars = query.orderBy.map(_._1)
        val pre = withDecodedSortKeys(modified, sortVars)
        val keys = query.orderBy.flatMap { case (v, asc) =>
          val ks: Seq[Column] =
            if (directSortVars.contains(v)) Seq(col(v))
            else Seq(
              when(col(v).isNull, 0)
                .when(col(valCol(v)).isNotNull, 1).otherwise(2),
              col(valCol(v)), col(lexCol(v)))
          ks.map(k => if (asc) k.asc else k.desc)
        }
        val helperCols = sortVars.distinct.filterNot(directSortVars.contains)
          .flatMap(v => Seq(valCol(v), lexCol(v)))
        pre.orderBy(keys: _*).drop(helperCols: _*)
      }
    val offsetted = query.offset.fold(ordered)(ordered.offset)
    query.limit.fold(offsetted)(offsetted.limit)
  }

  /** A property-path pattern `<bound subject> (:p|:q)+ ?var` → the set of
    * nodes reachable from the subject in one or more steps over edges whose
    * predicate is in the alternation — planned as the semi-naive BFS
    * fixpoint ([[graft.operators.Graph.reachableFrom]]): per iteration one
    * frontier⋈edges equi-join + one anti-join, lineage truncated per round.
    * Path solutions are DISTINCT endpoints, exactly the closure's output
    * (SPARQL's arbitrary-length-path semantics). The closure spans both
    * sign tables (a path crosses entity classes), so the split store scans
    * their union.
    */
  private def planPathPattern(
      pat: TriplePattern, store: Store, enc: Map[String, Int]): DataFrame = {
    val lex = pat.p.asInstanceOf[Constant].lexical
    quantPreds(lex).foreach { case (preds, lo, hi) =>
      return planQuantPath(pat, store, enc, preds, lo, hi)
    }
    // Three closure families share one fixpoint: positive `(:p|:q)+`,
    // inverse-bearing `(^:p|:q)+` (each ^-member contributes reversed
    // edges), and negated-set `(!(:p|:q))+` (the complement edge set; an
    // un-encodable negated term excludes nothing, per SPARQL: it cannot
    // occur in the data, so every predicate survives the NOT-IN).
    val (members, mod, negated) =
      pathPreds(lex).map { case (p, m) => (p.map((_, false)), m, false) }
        .orElse(invClosurePreds(lex).map { case (p, m) => (p, m, false) })
        .orElse(negClosurePreds(lex).map { case (p, m) => (p.map((_, false)), m, true) })
        .get
    val zeroStep = mod == '*' || mod == '?'
    val base = store match {
      case SingleTable(df) => df
      case SplitTables(pos, neg) => pos.unionAll(neg)
    }
    val fwdIds = members.collect { case (p, false) => p }.flatMap(enc.get)
    val invIds = members.collect { case (p, true) => p }.flatMap(enc.get)
    val edges0 =
      if (negated) {
        val ids = fwdIds
        if (ids.isEmpty) base
        else base.filter(!col(TripleSchema.predicate).isin(ids: _*))
      } else if (invIds.isEmpty)
        base.filter(col(TripleSchema.predicate).isin(fwdIds: _*))
      else {
        val fwd = base.filter(col(TripleSchema.predicate).isin(fwdIds: _*))
          .select(col(TripleSchema.subject), col(TripleSchema.objekt))
        val inv = base.filter(col(TripleSchema.predicate).isin(invIds: _*))
          .select(col(TripleSchema.objekt).as(TripleSchema.subject),
            col(TripleSchema.subject).as(TripleSchema.objekt))
        if (fwdIds.isEmpty) inv else fwd.unionAll(inv)
      }
    // BOTH ends variable (`?s :p+ ?o`): the full pairwise closure via the
    // provenance-carrying BFS (Graph.reachablePairs) — state = the closure
    // itself, per-round hash equi-joins, no driver involvement. The result
    // relation joins the rest of the BGP on either/both variables. Same
    // variable twice (`?x :p+ ?x`) keeps only cycle members.
    (pat.s, pat.o) match {
      case (Variable(sv), Variable(ov)) =>
        val oneOrMore =
          if (mod == '?')
            edges0.select(col(TripleSchema.subject).as("root"),
              col(TripleSchema.objekt).as("node")).distinct()
          else graft.operators.Graph.reachablePairs(edges0,
            budgetRows = graft.operators.Graph.DefaultClosureBudget)
        val withZero =
          if (!zeroStep) oneOrMore
          else {
            // zero step: every node occurring in the path's edge set
            val nodes = edges0.select(col(TripleSchema.subject).as("n"))
              .unionAll(edges0.select(col(TripleSchema.objekt)))
              .distinct()
            oneOrMore.unionAll(nodes.select(col("n").as("root"), col("n").as("node")))
              .distinct()
          }
        val out =
          if (sv == ov) withZero.filter(col("root") === col("node")).select(col("root").as(sv))
          else withZero.select(col("root").as(sv), col("node").as(ov))
        return out
      case _ =>
    }
    // Direction: `<bound> :p+ ?v` closes FORWARD from the subject;
    // `?v :p+ <bound>` closes over REVERSED edges from the object (the set
    // of nodes that REACH it) — same fixpoint, edge projection swapped.
    val forward = (pat.s, pat.o) match {
      case (Constant(_), Variable(_)) => true
      case (Variable(_), Constant(_)) => false
      case _ => throw new IllegalArgumentException(
        "property path needs both or one end(s) variable in the subset")
    }
    val edges =
      if (forward) edges0
      else edges0.select(col(TripleSchema.objekt).as(TripleSchema.subject),
        col(TripleSchema.subject).as(TripleSchema.objekt))
    val oVar = (if (forward) pat.o else pat.s).asInstanceOf[Variable].name
    val seedId = (if (forward) pat.s else pat.o) match {
      case Constant(l) => enc.get(l)
      case _ => throw new IllegalStateException("unreachable")
    }
    // one-or-more: seed the closure with the subject's DIRECT successors
    // (the `+` semantics — the subject itself only appears if reached by a
    // cycle); an unknown subject term reaches nothing. Zero-or-more (`*`)
    // additionally includes the zero-step binding ?o = subject — SUBSET
    // DEVIATION: full SPARQL would emit the zero step even for a term
    // absent from the dictionary, but this planner's output is encoded
    // ids, so an un-encodable term yields the empty result instead
    // (pinned by SparqlSpec).
    val direct = edges
      .filter(col(TripleSchema.subject) === lit(seedId.getOrElse(Int.MinValue)))
      .select(col(TripleSchema.objekt).as("node")).distinct()
    // zero-or-one needs no fixpoint: at most one step from the seed
    val closure =
      if (mod == '?') direct
      else graft.operators.Graph.reachableFrom(edges, direct)
    val withZero =
      if (!zeroStep) closure
      else seedId match {
        case Some(id) =>
          val spark = edges.sparkSession
          import spark.implicits._
          closure.unionAll(Seq(id).toDF("node")).distinct()
        case None => closure
      }
    withZero.select(col("node").as(oVar))
  }

  /** Bounded path repetition `:p{n,m}` — the depth-WINDOWED composition:
    * level set F_k = nodes reachable by a path of length EXACTLY k (a
    * plain relational composition F_k = F_{k-1} ⋈ edges, distinct; NOT a
    * visited-set BFS, which keeps only the SHORTEST depth per node and
    * would miss a node whose only in-window path is longer than its
    * shortest one). Answer = ∪ F_k for k in [n, m], plus the zero step
    * (the seed / node identity) when n = 0; `{n,}` composes the exact-n
    * level with the unbounded closure fixpoint. Each level is one hash
    * equi-join; m is syntax-capped at 20 and lineage is truncated every
    * few levels, so the plan stays bounded at any data scale.
    */
  private def planQuantPath(pat: TriplePattern, store: Store,
      enc: Map[String, Int], preds: Seq[String], lo: Int,
      hi: Option[Int]): DataFrame = {
    val base = store match {
      case SingleTable(df) => df
      case SplitTables(pos, neg) => pos.unionAll(neg)
    }
    val ids = preds.flatMap(enc.get)
    val edges0 =
      (if (ids.isEmpty) base.limit(0)
       else base.filter(col(TripleSchema.predicate).isin(ids: _*)))
        .select(col(TripleSchema.subject), col(TripleSchema.objekt))

    // BOTH ends variable: depth-windowed PAIR composition.
    (pat.s, pat.o) match {
      case (Variable(sv), Variable(ov)) =>
        val p1 = edges0.select(col(TripleSchema.subject).as("root"),
          col(TripleSchema.objekt).as("node")).distinct().localCheckpoint()
        var level = p1 // exact-k pair set
        var acc: DataFrame = null
        def keep(k: Int): Boolean = k >= math.max(lo, 1) && hi.forall(_ >= k)
        if (keep(1)) acc = level
        var k = 2
        while (hi.forall(k <= _) && (hi.isDefined || k <= lo)) {
          level = level.join(
              edges0.select(col(TripleSchema.subject).as("node"),
                col(TripleSchema.objekt).as("__next")), "node")
            .select(col("root"), col("__next").as("node")).distinct()
          if (k % 4 == 0) level = level.localCheckpoint()
          if (keep(k)) acc = if (acc == null) level else acc.unionAll(level)
          k += 1
        }
        // {n,}: exact-n pairs composed with the closure (zero-or-more steps
        // beyond) — P_n ∪ (P_n ⋈ reachablePairs)
        if (hi.isEmpty) {
          val pn = (if (lo <= 1) p1 else level).localCheckpoint()
          val beyond = pn.join(
              graft.operators.Graph.reachablePairs(edges0,
                  budgetRows = graft.operators.Graph.DefaultClosureBudget)
                .select(col("root").as("node"), col("node").as("__far")), "node")
            .select(col("root"), col("__far").as("node"))
          acc = pn.unionAll(beyond)
        }
        val withZero =
          if (lo > 0) acc
          else {
            val nodes = edges0.select(col(TripleSchema.subject).as("n"))
              .unionAll(edges0.select(col(TripleSchema.objekt))).distinct()
            val idPairs = nodes.select(col("n").as("root"), col("n").as("node"))
            if (acc == null) idPairs else acc.unionAll(idPairs)
          }
        val dedup = withZero.distinct()
        return (
          if (sv == ov) dedup.filter(col("root") === col("node")).select(col("root").as(sv))
          else dedup.select(col("root").as(sv), col("node").as(ov)))
      case _ =>
    }

    // One end bound: depth-windowed frontier from the seed (reversed edges
    // when the OBJECT is the bound end — same windowed walk).
    val forward = (pat.s, pat.o) match {
      case (Constant(_), Variable(_)) => true
      case (Variable(_), Constant(_)) => false
      case _ => throw new IllegalArgumentException(
        "property path needs both or one end(s) variable in the subset")
    }
    val edges =
      if (forward) edges0
      else edges0.select(col(TripleSchema.objekt).as(TripleSchema.subject),
        col(TripleSchema.subject).as(TripleSchema.objekt))
    val oVar = (if (forward) pat.o else pat.s).asInstanceOf[Variable].name
    val seedId = (if (forward) pat.s else pat.o) match {
      case Constant(l) => enc.get(l)
      case _ => throw new IllegalStateException("unreachable")
    }
    val spark = edges.sparkSession
    import spark.implicits._
    val seedDf = seedId.toSeq.toDF("node")
    var frontier = edges
      .filter(col(TripleSchema.subject) === lit(seedId.getOrElse(Int.MinValue)))
      .select(col(TripleSchema.objekt).as("node")).distinct().localCheckpoint()
    var acc: DataFrame = if (math.max(lo, 1) <= 1 && hi.forall(_ >= 1)) frontier else null
    var k = 2
    while (hi.forall(k <= _) && (hi.isDefined || k <= lo)) {
      frontier = frontier.join(
          edges.select(col(TripleSchema.subject).as("node"),
            col(TripleSchema.objekt).as("__next")), "node")
        .select(col("__next").as("node")).distinct()
      if (k % 4 == 0) frontier = frontier.localCheckpoint()
      if (k >= lo) acc = if (acc == null) frontier else acc.unionAll(frontier)
      k += 1
    }
    if (hi.isEmpty) {
      // {n,}: close over the exact-n frontier (reachableFrom includes its
      // seeds — exactly "n or more"; the loop above left `frontier` at the
      // exact-max(n,1) level)
      acc = graft.operators.Graph.reachableFrom(edges, frontier)
    }
    val withZero =
      if (lo > 0) (if (acc == null) seedDf.limit(0) else acc)
      else if (acc == null) seedDf
      else acc.unionAll(seedDf)
    withZero.distinct().select(col("node").as(oVar))
  }

  /** A sequence property path with closure steps — `<bound subject>
    * :p/:q+ ?var` or `<bound subject> (:p/:q)+ ?var` — evaluated
    * left-to-right over a FRONTIER of reached nodes:
    *  - a plain step is one frontier⋈edges equi-join (edge side filtered to
    *    the step's predicate alternation, reversed for `^`);
    *  - a closure step (`+`/`*`/`?`) runs the semi-naive BFS fixpoint
    *    ([[graft.operators.Graph.reachableFrom]]) over that step's edge
    *    set, seeded by the current frontier (`*` keeps the frontier as the
    *    zero-step case, `?` is frontier ∪ one-step — no fixpoint);
    *  - the group-closure form composes the whole sequence into ONE edge
    *    relation (a chain of equi-joins — the composed relation is
    *    bounded by the join of the per-step edge sets; at scale the
    *    per-step predicate filters keep it far below |E|²) and closes
    *    over it.
    * Solutions are DISTINCT endpoints (SPARQL arbitrary-length-path
    * semantics). The closure spans both sign tables, so the split store
    * scans their union. Intermediate frontier nodes are existential — they
    * never surface as bindings — which is what licenses the frontier
    * evaluation (no provenance to the seed is required beyond reachability).
    */
  private def planSeqPathPattern(
      pat: TriplePattern, store: Store, enc: Map[String, Int]): DataFrame = {
    val parsed = seqPath(pat.p.asInstanceOf[Constant].lexical).get
    val base = store match {
      case SingleTable(df) => df
      case SplitTables(pos, neg) => pos.unionAll(neg)
    }
    val spark = base.sparkSession
    import spark.implicits._
    // `?v seq <bound>`: evaluate the INVERSE path — steps reversed and each
    // step's direction flipped (`(a/b)⁻¹ = b⁻¹/a⁻¹`; closure modifiers
    // commute with inversion) — seeded at the bound object, binding the
    // subject variable.
    val forward = (pat.s, pat.o) match {
      case (Constant(_), Variable(_)) => true
      case (Variable(_), Constant(_)) => false
      case _ => throw new IllegalArgumentException(
        "property path needs exactly one bound end in the subset " +
          "(all-pairs closure is not planned)")
    }
    val (steps, outerMod) =
      if (forward) parsed
      else (parsed._1.reverse.map(st => st.copy(inverse = !st.inverse)), parsed._2)
    val oVar = (if (forward) pat.o else pat.s).asInstanceOf[Variable].name
    val seedId = (if (forward) pat.s else pat.o) match {
      case Constant(l) => enc.get(l)
      case _ => throw new IllegalStateException("unreachable")
    }
    // src→dst edge set of one step: predicate-filtered scan, reversed for ^
    def stepEdges(st: PathStep): DataFrame = {
      val ids = st.preds.flatMap(enc.get)
      val e = base.filter(col(TripleSchema.predicate).isin(ids: _*))
      if (st.inverse)
        e.select(col(TripleSchema.objekt).as("src"), col(TripleSchema.subject).as("dst"))
      else
        e.select(col(TripleSchema.subject).as("src"), col(TripleSchema.objekt).as("dst"))
    }
    def oneStep(frontier: DataFrame, edges: DataFrame): DataFrame =
      frontier.join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
    val seed = seedId.toSeq.toDF("node") // unknown subject term: empty seed
    val result = outerMod match {
      case Some(mod) =>
        // group closure: compose the sequence into one edge relation, then
        // close over it (reachableFrom includes its seeds — exactly the
        // zero-step case `*` needs)
        val composed = steps.map(stepEdges).reduceLeft { (a, b) =>
          a.join(b, a("dst") === b("src")).select(a("src"), b("dst"))
        }
        mod match {
          case '+' => graft.operators.Graph.reachableFrom(
            composed.select(col("src").as(TripleSchema.subject), col("dst").as(TripleSchema.objekt)),
            oneStep(seed, composed))
          case '*' => graft.operators.Graph.reachableFrom(
            composed.select(col("src").as(TripleSchema.subject), col("dst").as(TripleSchema.objekt)),
            seed)
          case _ => seed.unionAll(oneStep(seed, composed)).distinct() // '?'
        }
      case None =>
        steps.foldLeft(seed) { (frontier, st) =>
          val edges = stepEdges(st)
          val asTriples = edges.select(
            col("src").as(TripleSchema.subject), col("dst").as(TripleSchema.objekt))
          st.mod match {
            case None => oneStep(frontier, edges)
            case Some('+') =>
              graft.operators.Graph.reachableFrom(asTriples, oneStep(frontier, edges))
            case Some('*') =>
              graft.operators.Graph.reachableFrom(asTriples, frontier)
            case Some(_) => // '?': zero-or-one, no fixpoint
              frontier.unionAll(oneStep(frontier, edges)).distinct()
          }
        }
    }
    result.select(col("node").as(oVar))
  }

  /** One QUAD pattern (a GRAPH-variable group member) → filtered scan of
    * the quad store projected to its variable columns, the graph column
    * bound to the group's graph variable.
    */
  private def planQuadPattern(pat: TriplePattern, gVar: String, idx: Int,
      quads: DataFrame, enc: Map[String, Int]): DataFrame = {
    val positions = Seq(
      (pat.s, TripleSchema.subject),
      (pat.p, TripleSchema.predicate),
      (pat.o, TripleSchema.objekt),
      (Variable(gVar): Term, TripleSchema.graph))
    val filters: Seq[Column] = positions.collect {
      case (Constant(l), c) => enc.get(l) match {
        case Some(id) => col(c) === lit(id)
        case None => lit(false)
      }
    }
    val varCols = positions.collect { case (Variable(v), c) => (v, c) }
    val selfEq: Seq[Column] = varCols.groupBy(_._1).values.collect {
      case vs if vs.size > 1 => vs.map(_._2).sliding(2).map {
        case Seq(a, b) => col(a) === col(b)
      }.reduce(_ && _)
    }.toSeq
    val filtered = (filters ++ selfEq).foldLeft(quads)(_.filter(_))
    val distinctVars = varCols.distinctBy(_._1)
    filtered.select(distinctVars.map { case (v, c) => col(c).as(v) }: _*)
  }

  /** One pattern → filtered scan projected to its variable columns. */
  private def planPattern(
      pat: TriplePattern, idx: Int, store: Store, enc: Map[String, Int]): DataFrame = {

    val base: DataFrame = (store, pat.s) match {
      case (SingleTable(df), _) => df
      case (SplitTables(pos, neg), Constant(l)) =>
        // sign routing on the bound subject (MyOpVisitorBase.java:81-86)
        enc.get(l) match {
          case Some(id) if id >= 0 => pos
          case Some(_) => neg
          case None => pos.limit(0) // unknown term: empty
        }
      case (SplitTables(pos, neg), _: Variable) => pos.unionAll(neg)
    }

    val positions = Seq(
      (pat.s, TripleSchema.subject),
      (pat.p, TripleSchema.predicate),
      (pat.o, TripleSchema.objekt))

    val filters: Seq[Column] = positions.collect {
      case (Constant(l), c) =>
        enc.get(l) match {
          case Some(id) => col(c) === lit(id)
          case None => lit(false)
        }
    }
    // Same variable twice in one pattern (e.g. ?x p ?x) ⇒ intra-pattern equality.
    val varCols = positions.collect { case (Variable(v), c) => (v, c) }
    val selfEq: Seq[Column] = varCols.groupBy(_._1).values.collect {
      case vs if vs.size > 1 => vs.map(_._2).sliding(2).map {
        case Seq(a, b) => col(a) === col(b)
      }.reduce(_ && _)
    }.toSeq

    val filtered = (filters ++ selfEq).foldLeft(base)(_.filter(_))
    // project to variable columns named after the variables (dedup repeats)
    val distinctVars = varCols.distinctBy(_._1)
    if (distinctVars.isEmpty)
      // fully-bound pattern: existence check; keep a marker column set
      filtered.select(lit(1).as(s"__exists_$idx")).limit(1)
    else
      filtered.select(distinctVars.map { case (v, c) => col(c).as(v) }: _*)
  }
}

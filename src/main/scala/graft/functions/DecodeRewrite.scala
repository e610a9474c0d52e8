package graft.functions

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, NamedExpression, Unevaluable, UnaryExpression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StringType}

/** `graft_decode(intCol)` — declarative dictionary decode.
  *
  * The reference decodes result rows on the driver with a broadcast
  * `HashMap` inside `mapPartitions`
  * (`/root/reference/src/main/java/com/github/nkoutroumanis/PartitionQueryingSubject.java:136-151`).
  * Here decode is a MARKER EXPRESSION that an injected analyzer rule
  * ([[DecodeRewriteRule]]) rewrites into a left-outer join against the
  * session's registered dictionary view — so users write
  * `SELECT graft_decode(Subject) FROM t` and Catalyst plans a (typically
  * broadcast) join, which scales past both driver memory and the broadcast
  * threshold. This is the SURVEY §4 "optional nicety": a
  * `Rule[LogicalPlan]` realizing decode-as-join.
  */
case class DecodeTerm(child: Expression) extends UnaryExpression with Unevaluable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode"
  override protected def withNewChildInternal(newChild: Expression): DecodeTerm =
    copy(child = newChild)
}

/** Analyzer rule: rewrite every `DecodeTerm` in a Project into a reference
  * to the dictionary's `term` column, joining the child plan against the
  * view `graft_dictionary(id, term)` once per decoded expression. Injected
  * via [[graft.GraftExtensions]] (`injectResolutionRule`); the remaining
  * analyzer batches resolve the introduced `UnresolvedRelation`s and
  * deduplicate repeated dictionary scans.
  */
class DecodeRewriteRule extends Rule[LogicalPlan] {

  val DictView = "graft_dictionary"

  /** Replace every DecodeTerm inside `expr` with a dictionary `term`
    * reference, threading one left-outer dictionary join per decode under
    * `plan`. `freshAlias` is PLAN-LOCAL (allocated per `apply`): aliases
    * need uniqueness only within one rewritten plan — the nearest-alias
    * scoping of subquery names makes reuse across plans safe — and a
    * JVM-global counter would leak monotonically across sessions.
    * CONTRACT: `graft_dictionary` must map id -> term uniquely (a
    * dimension key); duplicate ids would fan out the joined rows.
    */
  private def rewriteDecodes(expr: Expression, plan: LogicalPlan,
      freshAlias: () => String): (Expression, LogicalPlan) = {
    var joined = plan
    val newExpr = expr.transformUp {
      case DecodeTerm(e) if e.resolved =>
        val a = freshAlias()
        joined = Join(
          joined,
          SubqueryAlias(a, UnresolvedRelation(Seq(DictView))),
          LeftOuter,
          Some(EqualTo(e, UnresolvedAttribute(Seq(a, "id")))),
          JoinHint.NONE)
        UnresolvedAttribute(Seq(a, "term"))
    }
    (newExpr, joined)
  }

  /** Decoded child expressions occurring OUTSIDE aggregate functions
    * (decodes inside an aggregate function, e.g. COUNT(graft_decode(x)),
    * rewrite safely and are excluded).
    */
  private def topLevelDecodes(e: Expression): Seq[Expression] = e match {
    case DecodeTerm(c) => Seq(c.canonicalized)
    case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
      Seq.empty
    case other => other.children.flatMap(topLevelDecodes)
  }

  /** Hoistable shape: decodes OF PLAIN GROUPING KEYS in the aggregate list
    * (`SELECT graft_decode(k), COUNT(*) ... GROUP BY k`). The decode moves
    * ABOVE the aggregate — the grouping value is aliased out of the
    * Aggregate and decoded in a Project on top, which the Project rule then
    * turns into a dictionary join on the NEXT analyzer pass. Decoding after
    * aggregation is also the efficient plan: one join per GROUP, not per
    * input row.
    */
  private def hoistableShape(agg: Aggregate): Boolean = {
    val grouping = agg.groupingExpressions.map(_.canonicalized)
    val tl = agg.aggregateExpressions.flatMap(topLevelDecodes)
    tl.nonEmpty && tl.forall(grouping.contains) &&
      agg.groupingExpressions.forall(!_.exists(_.isInstanceOf[DecodeTerm])) &&
      // an entry mixing a top-level decode WITH an aggregate function
      // (e.g. concat(graft_decode(k), count(*))) would leave the aggregate
      // function naked in the hoisted Project — not hoistable
      agg.aggregateExpressions.forall { ne =>
        topLevelDecodes(ne).isEmpty || !ne.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])
      }
  }

  private def decodeGroupShapeOk(agg: Aggregate): Boolean = {
    val noAggInsideDecode = (agg.groupingExpressions ++ agg.aggregateExpressions)
      .forall(!_.exists {
        case DecodeTerm(c) =>
          c.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])
        case _ => false
      })
    val groupingDecodes = agg.groupingExpressions.flatMap(topLevelDecodes).toSet
    val aggListCovered = agg.aggregateExpressions.flatMap(topLevelDecodes)
      .forall(groupingDecodes.contains)
    noAggInsideDecode && aggListCovered
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    var counter = 0
    val freshAlias = () => { counter += 1; s"__graft_dict_$counter" }
    plan.resolveOperatorsUp {
      case p @ Project(projectList, child)
          if child.resolved && projectList.exists(_.exists(_.isInstanceOf[DecodeTerm])) =>
        var joined: LogicalPlan = child
        val newList = projectList.map { ne =>
          val (rewritten, j) = rewriteDecodes(ne, joined, freshAlias)
          joined = j
          rewritten.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
        }
        Project(newList, joined)

      // decode in a WHERE clause: join below the Filter, substitute the term
      case f @ Filter(cond, child)
          if child.resolved && cond.exists(_.isInstanceOf[DecodeTerm]) =>
        val (newCond, joined) = rewriteDecodes(cond, child, freshAlias)
        // project back to the child's columns so the join stays invisible
        Project(child.output, Filter(newCond, joined))

      // decode in GROUP BY keys / aggregate list (decode-then-group, the
      // common reporting shape): join below the Aggregate. Occurrences of
      // the SAME decoded child expression are memoized onto ONE join +
      // attribute, so the grouping key and its select-list twin resolve to
      // the same attribute (the semantic-equality check between grouping
      // and aggregate expressions requires it).
      //
      // Guarded to the shapes the join rewrite can legally produce:
      // (a) no decode OF an aggregate result — graft_decode(MIN(x)) would
      //     put an aggregate function into the join condition below the
      //     Aggregate; (b) every decode at the top level of the aggregate
      //     list must also be a grouping decode — otherwise the rewritten
      //     `term` attribute is a non-grouping non-aggregate column
      //     (MISSING_AGGREGATION). Unsupported shapes fall through to
      //     DecodeCheckRule's clear error instead of a cryptic one.
      // decode of a plain grouping key in the select list: hoist the decode
      // above the aggregate (see hoistableShape) — the emitted Project still
      // carries DecodeTerm and is rewritten into the dictionary join by the
      // Project case on the next analyzer pass.
      case agg: Aggregate if agg.resolved && hoistableShape(agg) =>
        val memo = scala.collection.mutable.Map.empty[Expression, NamedExpression]
        val innerExtra = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
        def hoist(e: Expression): Expression = e match {
          case DecodeTerm(c) =>
            val inner = memo.getOrElseUpdate(c.canonicalized, {
              val a = org.apache.spark.sql.catalyst.expressions.Alias(
                c, freshAlias())()
              innerExtra += a
              a
            })
            DecodeTerm(inner.toAttribute)
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
            ae // decodes inside aggregate functions stay below (memo-join case)
          case other => other.mapChildren(hoist)
        }
        // hoist ONLY entries with a top-level decode; an entry whose decodes
        // all sit inside aggregate functions (COUNT(graft_decode(x))) stays
        // in the Aggregate — the memo-join case rewrites it on the next
        // analyzer pass (hoisting it would strand a naked aggregate in the
        // Project: confirmed MISSING_GROUP_BY when combined with a
        // grouping-key decode)
        val outer = agg.aggregateExpressions.map {
          case a: org.apache.spark.sql.catalyst.expressions.Alias
              if topLevelDecodes(a).nonEmpty =>
            org.apache.spark.sql.catalyst.expressions.Alias(
              hoist(a.child), a.name)(exprId = a.exprId, qualifier = a.qualifier)
          case ne if topLevelDecodes(ne).nonEmpty =>
            hoist(ne).asInstanceOf[NamedExpression]
          case ne => ne.toAttribute
        }
        val inner = agg.aggregateExpressions.filter(
          topLevelDecodes(_).isEmpty) ++ innerExtra
        Project(outer, agg.copy(aggregateExpressions = inner))

      case agg: Aggregate
          if agg.child.resolved &&
            (agg.groupingExpressions ++ agg.aggregateExpressions)
              .exists(_.exists(_.isInstanceOf[DecodeTerm])) &&
            decodeGroupShapeOk(agg) =>
        var joined: LogicalPlan = agg.child
        val memo = scala.collection.mutable.Map.empty[Expression, UnresolvedAttribute]
        def rewrite(e: Expression): Expression = e.transformUp {
          case DecodeTerm(c) if c.resolved =>
            memo.getOrElseUpdate(c.canonicalized, {
              val a = freshAlias()
              joined = Join(
                joined,
                SubqueryAlias(a, UnresolvedRelation(Seq(DictView))),
                LeftOuter,
                Some(EqualTo(c, UnresolvedAttribute(Seq(a, "id")))),
                JoinHint.NONE)
              UnresolvedAttribute(Seq(a, "term"))
            })
        }
        val newGrouping = agg.groupingExpressions.map(rewrite)
        val newAggs = agg.aggregateExpressions
          .map(rewrite(_).asInstanceOf[NamedExpression])
        agg.copy(groupingExpressions = newGrouping,
          aggregateExpressions = newAggs, child = joined)
    }
  }
}

/** Clear analysis-time error for graft_decode uses the rewrite doesn't
  * reach (aggregates, joins conditions, sorts, ...): without this the
  * Unevaluable marker would survive to execution and fail there.
  */
class DecodeCheckRule extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = {
    plan.foreach { node =>
      node.expressions.foreach { e =>
        if (e.exists(_.isInstanceOf[DecodeTerm])) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "_LEGACY_ERROR_TEMP_3071", // template is exactly <msg>
            messageParameters = Map("msg" ->
              ("graft_decode is supported in SELECT projections, WHERE " +
                "filters, and GROUP BY aggregates (each decoded select " +
                "column must be a grouping expression or its decode, the " +
                "decoded expression must contain no aggregate function, " +
                "and a decode cannot share one select expression with an " +
                "aggregate function); found an unsupported use in: " +
                node.nodeName)))
        }
      }
    }
  }
}

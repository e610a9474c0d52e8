package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DecodeCheckRule, DecodeRewriteRule, DecodeTerm, DotProductExpr}

/** Spark plugin entry point: registers graft's native expressions in every
  * session at startup.
  *
  * ```
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * ```
  *
  * This is the deployment path for a real cluster (one registration,
  * catalog-visible everywhere, survives session cloning); the programmatic
  * [[graft.functions.VectorExpressions.register]] covers ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        DotProductExpr(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_decode"),
      new ExpressionInfo(classOf[DecodeTerm].getName, "graft_decode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_decode takes exactly 1 argument")
        DecodeTerm(exprs.head)
      }))
    ext.injectResolutionRule(_ => new DecodeRewriteRule)
    ext.injectCheckRule(_ => new DecodeCheckRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRule)
  }
}

package graft.operators

import graft.plans.TopKPerGroup
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** Public API for the native top-k-per-group operator
  * ([[graft.plans.TopKPerGroup]] / [[graft.plans.TopKPerGroupExec]]).
  *
  * `orderBy` entries are (columnName, ascending); include a unique
  * tie-break column for a deterministic result set (same contract as the
  * `ROW_NUMBER` window form this operator replaces). Requires the
  * TopKPerGroupStrategy to be registered — automatic under
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    // resolve with the session's resolver (honors spark.sql.caseSensitive,
    // like Dataset column resolution) and refuse ambiguity instead of
    // silently binding to the first case-insensitive match
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(n: String) = plan.output.filter(a => resolver(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column $n is ambiguous: matches ${many.map(_.name).mkString(", ")}")
    }
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), order, k, plan))
  }
}

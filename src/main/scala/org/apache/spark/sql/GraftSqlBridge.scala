package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Library escape hatch for constructing a DataFrame from a custom logical
  * plan node ([[graft.plans.TopKPerGroup]]): `Dataset.ofRows` is
  * `private[sql]`, so this one-liner lives in the `org.apache.spark.sql`
  * package — the standard pattern used by Spark-extension libraries that
  * inject their own operators (no Spark internals are modified).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `TaskContext.taskMemoryManager()` is `private[spark]`; the native
    * top-k operator needs it to account its heap store with the task's
    * execution-memory arbitration ([[graft.plans.TopKPerGroupExec]]).
    */
  def taskMemoryManager(ctx: org.apache.spark.TaskContext): org.apache.spark.memory.TaskMemoryManager =
    ctx.taskMemoryManager()
}

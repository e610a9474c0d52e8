package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (a hot user,
  * a null-ish default id), the hash partition owning it becomes the straggler.
  * Salting splits the hot key's left-side rows across `salt` partitions
  * (random-ish but DETERMINISTIC salt derived from other columns) and
  * replicates the right side `salt` times, turning one straggler partition
  * into `salt` even ones.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) does this automatically for sort-merge joins at runtime; this
  * operator is for the cases AQE can't see — e.g. a skewed broadcast-side or
  * pre-AQE planning decisions — and to make the technique explicit and
  * testable. Result is exactly equal to the plain join (spec-verified).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, with the left side
    * salted into `salt` buckets and the right side replicated `salt` times.
    *
    * The salt mixes the row's content hash with a per-row ordinal
    * (`monotonically_increasing_id`): content alone would send a hot key's
    * BIT-IDENTICAL duplicate rows (the classic dedup-input skew) all to one
    * bucket, restoring the straggler. The ordinal is deterministic for a
    * given partitioning of `left` within a run — and correctness never
    * depends on WHICH bucket a left row lands in (each joins the matching
    * right replica), so re-runs produce identical results regardless.
    *
    * The working column gets a fresh unique name so an existing `__salt`
    * column in either input is never overwritten or dropped.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltName = s"__graft_salt_${java.util.UUID.randomUUID.toString.take(8)}"
    val saltCol: Column = saltExpr(left, salt)
    val saltedLeft = left.withColumn(saltName, saltCol)
    val replicatedRight = right.withColumn(saltName,
      explode(lit((0 until salt).toArray)))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft(saltName) === replicatedRight(saltName))
      .drop(replicatedRight(key))
      .drop(saltName)
  }

  /** The salt assignment for rows of `left` (exposed for the spread spec). */
  private[graft] def saltExpr(left: DataFrame, salt: Int): Column =
    pmod(
      hash((left.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
      lit(salt))
}

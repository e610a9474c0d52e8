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
    * Deterministic: the salt is a hash of the left row's full content, not
    * rand(), so re-runs and retried tasks produce identical partitioning.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltCol: Column = pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt))
    val saltedLeft = left.withColumn("__salt", saltCol)
    val replicatedRight = right.withColumn("__salt",
      explode(lit((0 until salt).toArray)))
    saltedLeft
      .join(replicatedRight,
        saltedLeft(key) === replicatedRight(key) &&
          saltedLeft("__salt") === replicatedRight("__salt"))
      .drop(replicatedRight(key))
      .drop("__salt")
  }
}

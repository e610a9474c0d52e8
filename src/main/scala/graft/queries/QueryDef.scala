package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query over
  * the same parquet tables. Column names/types are aligned on both sides —
  * the driver's compare sorts columns by name and hashes values.
  *
  * Float discipline for oracle parity: every SUM over doubles goes through
  * CAST(x AS DECIMAL(18,2)) (exact, order-independent) and the result is cast
  * back to DOUBLE; both engines then produce bit-identical values. Plain
  * double summation would differ in the low bits between engines/orders.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def unoracled(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

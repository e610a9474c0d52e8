package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One dictionary row: integer id <-> lexical form. */
final case class DictEntry(id: Int, term: String)

/** Dictionary-encoded vocabulary with both encode and decode directions.
  *
  * Capability parity with the reference's driver-side `HashMap` decode map
  * (`/root/reference/src/main/java/com/github/nkoutroumanis/PartitionQueryingSubject.java:62-70`)
  * and the translator's lazily inverted encode map
  * (`MyOpVisitorBase.java:56-66`) — but held as a `Dataset[DictEntry]` so the
  * decode of large result sets is a broadcast (or shuffle) JOIN instead of a
  * driver map. At 100 TB a vocabulary no longer fits on the driver; only the
  * handful of literals appearing in a query text ever need driver-side
  * encoding, and those are fetched with a pushed-down `isin` filter.
  */
final class Dictionary(val entries: Dataset[DictEntry]) extends Serializable {

  /** Decode the given integer columns of `df` to lexical forms via joins —
    * one join per column (parity with the reference's
    * `mapPartitions`+broadcast decode, `PartitionQueryingSubject.java:136-151`).
    *
    * `broadcastDict = true` (default) hints the dictionary side for a
    * BroadcastHashJoin — right for vocabularies that fit an executor. Pass
    * `false` for a vocabulary too large to broadcast: the hint is OMITTED
    * and Catalyst plans a shuffle join instead of OOMing on the broadcast.
    *
    * Contract: dictionary ids must be unique — a duplicated id would fan
    * out result rows once per duplicate (joins are not lookups). Ids from
    * [[Dictionary.load]]/[[RdfBridge.dictionary]] are unique by
    * construction; assert with [[requireUniqueIds]] for untrusted inputs.
    */
  def decode(df: DataFrame, cols: Seq[String], broadcastDict: Boolean = true): DataFrame = {
    val dict0 = entries.toDF("__dict_id", "__dict_term")
    val dict = if (broadcastDict) broadcast(dict0) else dict0
    cols.foldLeft(df) { (acc, c) =>
      acc
        .join(dict, acc(c) === col("__dict_id"), "left")
        .withColumn(c, col("__dict_term"))
        .drop("__dict_id", "__dict_term")
    }
  }

  /** One distributed pass asserting id uniqueness (decode's fan-out
    * contract); throws with the first few offending ids.
    */
  def requireUniqueIds(): Unit = {
    val dups = entries.groupBy(col("id")).count()
      .filter(col("count") > 1).limit(5).collect()
    require(dups.isEmpty,
      s"duplicate dictionary ids: ${dups.map(_.get(0)).mkString(", ")}")
  }

  /** Driver-side encode of a small set of query literals. Pushes an `isin`
    * filter into the dictionary scan, so only matching rows ever reach the
    * driver — never the whole vocabulary.
    */
  def encodeTerms(terms: Seq[String]): Map[String, Int] = {
    if (terms.isEmpty) Map.empty
    else entries
      .filter(col("term").isin(terms: _*))
      .collect()
      .map(e => e.term -> e.id)
      .toMap
  }

  /** Encode one SPARQL term to its dictionary id, applying the reference's
    * normalization rules (`MyOpVisitorBase.java:69-78`): unbound variables
    * (`?x`) encode as the sentinel 0; quoted literals are stripped of quotes;
    * angle-bracketed URIs are stripped of `<`/`>` and reduced to the segment
    * after the last `/` (prefixed names like `:node_...` pass through).
    */
  def encodeTerm(raw: String): Option[Int] = {
    val t = Dictionary.normalizeTerm(raw)
    if (t == null) Some(TripleSchema.VariableSentinel)
    else encodeTerms(Seq(t)).get(t)
  }
}

object Dictionary {

  /** Load a reference-format dictionary: TSV `id<TAB>lexical-form`, one term
    * per line, split on the first tab only (the lexical form may itself
    * contain tabs/spaces — parity with `split("\t", 2)` at
    * `PartitionQueryingSubject.java:66`).
    */
  def load(spark: SparkSession, path: String): Dictionary = {
    import spark.implicits._
    val df = spark.read.text(path)
      .select(
        substring_index(col("value"), "\t", 1).cast("int").as("id"),
        expr("substring(value, instr(value, '\t') + 1)").as("term"),
      )
      .as[DictEntry]
    new Dictionary(df)
  }

  def fromPairs(spark: SparkSession, pairs: Seq[(Int, String)]): Dictionary = {
    import spark.implicits._
    new Dictionary(pairs.map { case (i, t) => DictEntry(i, t) }.toDS())
  }

  /** From an existing two-column DataFrame (id: int, term: string). */
  def fromDF(df: DataFrame): Dictionary = {
    val spark = df.sparkSession
    import spark.implicits._
    new Dictionary(df.select(
      col(df.columns(0)).cast("int").as("id"),
      col(df.columns(1)).cast("string").as("term")).as[DictEntry])
  }

  /** Normalization rules of the reference translator
    * (`MyOpVisitorBase.java:69-78`). Returns null for a variable.
    */
  def normalizeTerm(raw: String): String = raw match {
    case v if v.startsWith("?") => null // unbound variable
    case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
      q.substring(1, q.length - 1)
    case u if u.startsWith("<") && u.endsWith(">") =>
      val inner = u.substring(1, u.length - 1)
      val slash = inner.lastIndexOf('/')
      if (slash >= 0) inner.substring(slash + 1) else inner
    case other => other
  }
}

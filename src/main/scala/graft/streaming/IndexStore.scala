package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** THE streaming index-store layout, shared by every index family the
  * streaming gates maintain (MinHash band keys, LSH vector buckets, IVF-PQ
  * codes, deletion tombstones): a parquet directory PARTITIONED BY a
  * derived bucket of the store's key column, so that
  *
  *  - APPEND is per-partition (no rewrite of prior state),
  *  - PROBE reads only the partitions the probe keys can live in (static
  *    partition pruning — per-batch serve cost tracks the probe's key
  *    subset, never the accumulated store size), and
  *  - COMPACTION (keys-only stores) anti-joins new keys against the same
  *    pruned slice, keeping the store the distinct-key set.
  *
  * `buckets > 0` partitions by `pmod(hash(key), buckets)` — the layout for
  * high-cardinality key domains (band keys, LSH buckets), where the bucket
  * count is sized to store volume (gate scale: 8; a corpus-sized store:
  * e.g. 4096, so a batch's probe reads a thin slice). `buckets == 0`
  * partitions by the RAW key value — the layout for model-sized key
  * domains (IVF cells), where the partition list IS the cell list and a
  * static probe set prunes once for the whole query lifetime.
  *
  * Reads take an EXPLICIT schema (including the partition column):
  * a store whose first batch appended nothing has no data files to infer
  * from, and zero keys is a valid store state.
  */
final class IndexStore(ss: SparkSession, val dir: String, keyCol: String,
    buckets: Int) {

  /** Derived-bucket column name (hash-bucket layouts only). */
  val bucketCol = "__sb"

  private def partCol: String = if (buckets > 0) bucketCol else keyCol

  /** Rows extended with the store's partition column (no-op for raw-key
    * layouts — the key itself partitions). */
  def bucketed(df: DataFrame): DataFrame =
    if (buckets > 0) df.withColumn(bucketCol, pmod(hash(col(keyCol)), lit(buckets)))
    else df

  /** The store schema for a given row schema (partition column included,
    * at the end — where partitioned reads surface it). */
  def storeSchema(rows: StructType): StructType =
    if (buckets > 0) StructType(rows.fields :+
      org.apache.spark.sql.types.StructField(bucketCol,
        org.apache.spark.sql.types.IntegerType))
    else rows

  /** Per-partition append: rows land in their bucket's directory; nothing
    * existing is rewritten. Rows are bucket-sorted within tasks so each
    * task streams one open writer per bucket it touches. */
  def append(rows: DataFrame): Unit =
    bucketed(rows).sortWithinPartitions(partCol)
      .write.partitionBy(partCol).mode("append").parquet(dir)

  /** The partition values a key set hashes into — driver-side model state
    * (≤ `buckets` values, or the distinct raw keys), the input to a pruned
    * [[read]]. */
  def partsOf(keys: DataFrame): Seq[Any] =
    bucketed(keys).select(partCol).distinct().collect().map(_.get(0)).toSeq

  /** Partition-pruned read: only the named partitions are listed/scanned —
    * the plan carries them as PartitionFilters, so per-batch probe cost
    * tracks the probe's bucket subset, not the store size. */
  def read(schema: StructType, parts: Seq[Any]): DataFrame =
    ss.read.schema(schema).parquet(dir).filter(col(partCol).isin(parts: _*))

  /** Whole-store read (tombstone-sized stores only — anything corpus-sized
    * must go through the pruned [[read]]). */
  def readAll(schema: StructType): DataFrame =
    ss.read.schema(schema).parquet(dir)
}

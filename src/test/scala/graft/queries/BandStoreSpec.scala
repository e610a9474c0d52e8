package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The ingestion band-key STORE contract (round-9 compaction): the store
  * holds exactly the DISTINCT band-key set (merge-compacted appends), and
  * the per-batch probe is a PARTITION-PRUNED scan (static pruning on the
  * hash-bucket partition column) — the 100 TB state-management shape the
  * streaming ingest gates run on.
  */
class BandStoreSpec extends SparkTestBase {

  private def bands(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "bk")
  }

  test("store stays exactly the distinct band-key set across merges") {
    val idx = Files.createTempDirectory("bandstore").toString + "/idx"
    val b0 = bands(1L -> "a", 2L -> "a", 3L -> "b")
    val (s0, m0) = Streams.bandStoreProbe(spark, b0, idx, 0L)
    assert(s0.isEmpty, "first batch must not probe a store")
    m0()
    // overlapping second batch: "b" is already stored, "c" is new
    val b1 = bands(4L -> "b", 5L -> "c", 6L -> "c")
    val (s1, m1) = Streams.bandStoreProbe(spark, b1, idx, 1L)
    assert(s1.isDefined)
    m1()
    val store = spark.read.parquet(idx)
    assert(store.count() == 3, "exactly the distinct keys {a,b,c}")
    assert(store.select("bk").distinct().count() == 3)
    // third batch fully covered by the store: merge must append nothing
    val (_, m2) = Streams.bandStoreProbe(spark, bands(7L -> "a", 8L -> "c"), idx, 2L)
    m2()
    assert(spark.read.parquet(idx).count() == 3, "covered batch appends no rows")
  }

  test("probe slice is partition-pruned to the batch's hash buckets") {
    val idx = Files.createTempDirectory("bandstore").toString + "/idx"
    // seed a store with many keys spread across buckets
    val seed = bands((1L to 64L).map(i => i -> s"k$i"): _*)
    val (_, m0) = Streams.bandStoreProbe(spark, seed, idx, 0L)
    m0()
    val nParts = new java.io.File(idx).listFiles().count(_.getName.startsWith("bkb="))
    assert(nParts > 1, "seed must span multiple bucket partitions")
    // a single-key batch hashes into exactly one bucket
    val (slice, _) = Streams.bandStoreProbe(spark, bands(99L -> "k1"), idx, 1L)
    val plan = slice.get.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"probe must carry partition filters:\n$plan")
    // the pruned scan reads a strict subset of the store
    val prunedFiles = slice.get.select(input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(idx).select(input_file_name()).distinct().count()
    assert(prunedFiles < allFiles,
      s"pruned scan must read fewer files ($prunedFiles) than the full store ($allFiles)")
  }
}

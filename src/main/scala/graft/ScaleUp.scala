package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an ~sf1 dataset by replicating sf0.1 `factor`
  * times with per-replica key shifts (foreign keys shifted consistently, so
  * join cardinalities scale linearly and the RdfBridge id spaces stay
  * disjoint). Shared small dims (region, nation) are NOT replicated — as in
  * TPC-H, they are scale-invariant.
  *
  * Purpose: measured scaling curves for SCALE.md (the driver ships no sf1
  * parquet). Usage:
  *   sbt "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/sfscale 10"
  * then bench with SPARK_GRAFT_SF_DIR=/tmp/sfscale.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key shift: replica i adds i*stride to every key in that key space;
    // strides are per-key-space constants chosen past each space's max so
    // replicas never collide, and SMALL enough that the RdfBridge encoding
    // offsets (part +5e8, supplier +1e9, nation +2e9) stay disjoint.
    val orderStride = 10000000L  // sf0.1 max o_orderkey ~600k
    val custStride = 1000000L    // sf0.1 max c_custkey ~15k
    val partStride = 1000000L    // sf0.1 max p_partkey ~20k
    val suppStride = 100000L     // sf0.1 max s_suppkey ~1k
    val docStride = 10000000L
    val vecStride = 10000000L
    val userStride = 10000000L
    val eventStride = 100000000L

    def replicate(table: String, shifts: Map[String, Long]): Unit = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val out = (0 until factor).map { i =>
        shifts.foldLeft(df) { case (acc, (c, stride)) =>
          if (acc.columns.contains(c)) acc.withColumn(c, col(c) + lit(i * stride))
          else acc
        }
      }.reduceLeft(_.unionAll(_))
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[scaleup] $table: ${df.count()} -> ${spark.read.parquet(s"$dst/$table.parquet").count()}")
    }

    def copy(table: String): Unit = {
      spark.read.parquet(s"$src/$table.parquet")
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[scaleup] $table: copied (scale-invariant dim)")
    }

    // `randvec` mode: embeddings ONLY, with replica vectors REDRAWN from a
    // deterministic hash (replica 0 keeps the originals). Key-shift
    // replication leaves every replica's embedding bit-identical to its
    // original — 100× data but only N distinct vectors — which piles 100
    // exact copies into each LSH bucket and turns any bucket self-join
    // probe into a fixture artifact. An ANN BUILD probe needs genuinely
    // distinct vectors; near-dup structure is irrelevant to build cost.
    if (args.length > 3 && args(3) == "randvec") {
      val df = spark.read.parquet(s"$src/embeddings.parquet")
      val dim = df.selectExpr("size(embedding)").first().getInt(0)
      val out = (0 until factor).map { i =>
        if (i == 0) df
        else df.withColumn("vec_id", col("vec_id") + lit(i * vecStride))
          .withColumn("embedding", expr(
            s"""transform(sequence(1, $dim), j ->
               |  CAST((((vec_id * 2654435761 + $i * 40503 + j * 97
               |    + vec_id * j * 19349663) % 7919) % 2001 - 1000)
               |    / 1000.0 AS FLOAT))""".stripMargin))
      }.reduceLeft(_.unionAll(_))
      out.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scaleup] embeddings(randvec): -> " +
        s"${spark.read.parquet(s"$dst/embeddings.parquet").count()}")
      spark.stop(); return
    }

    // `randtext` mode: documents ONLY, with a HEAPS-LAW vocabulary — the
    // honest fixture for the tokenizer-trainer claims. Key-shift
    // replication keeps the word-TYPE set constant (SCALE.md round-11
    // caveat: "trainer cost is type-bounded" was demonstrated only on a
    // constant-vocab corpus), so this mode grows types ~√factor instead:
    // replica 0 keeps the original text; in replica i > 0 a token is kept
    // VERBATIM when its hash lands in the shared head (1 in 4 types — the
    // stopword/common-word head real corpora share) and otherwise becomes
    // the replica-family variant `w~(i mod K)`, K = ceil(√factor). Types
    // grow ≈ V0·(1/4 + 3/4·min(factor, K)) ~ Heaps with β ≈ 0.5 while
    // token counts grow ×factor. Deterministic (Murmur3 token hash).
    if (args.length > 3 && args(3) == "randtext") {
      val df = spark.read.parquet(s"$src/documents.parquet")
      val k = math.ceil(math.sqrt(factor.toDouble)).toLong
      val out = (0 until factor).map { i =>
        if (i == 0) df
        else {
          val withText = df.withColumn("doc_id", col("doc_id") + lit(i * docStride))
            .withColumn("text", expr(
              s"""array_join(transform(split(text, ' '), w ->
                 |  CASE WHEN w = '' OR abs(hash(w)) % 4 = 0 THEN w
                 |  ELSE concat(w, '~', CAST(${i % k} AS STRING)) END), ' ')"""
                .stripMargin))
          if (withText.columns.contains("n_chars"))
            withText.withColumn("n_chars", length(col("text")).cast("long"))
          else withText
        }
      }.reduceLeft(_.unionAll(_))
      out.write.mode("overwrite").parquet(s"$dst/documents.parquet")
      val types = spark.read.parquet(s"$dst/documents.parquet")
        .selectExpr("explode(split(text, ' ')) AS w").filter(col("w") =!= "")
        .distinct().count()
      val baseTypes = df
        .selectExpr("explode(split(text, ' ')) AS w").filter(col("w") =!= "")
        .distinct().count()
      println(f"[scaleup] documents(randtext): types $baseTypes -> $types " +
        f"(x${types.toDouble / baseTypes}%.1f), K=$k")
      spark.stop(); return
    }

    copy("region"); copy("nation")
    replicate("customer", Map("c_custkey" -> custStride))
    replicate("supplier", Map("s_suppkey" -> suppStride))
    replicate("part", Map("p_partkey" -> partStride))
    replicate("orders", Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))
    replicate("lineitem", Map("l_orderkey" -> orderStride,
      "l_partkey" -> partStride, "l_suppkey" -> suppStride))
    replicate("events", Map("event_id" -> eventStride, "user_id" -> userStride))
    replicate("documents", Map("doc_id" -> docStride))
    replicate("embeddings", Map("vec_id" -> vecStride))
    spark.stop()
  }
}

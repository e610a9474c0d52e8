package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level timing of the n-gram Jaccard pipeline (the
  * board's heaviest gate) — times each materialization boundary
  * separately so a regression can be localized without the Spark UI.
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // `sbt "runMain graft.Probe tri"` → triangle-kernel stage profile
    // (q50 runs over the staged co-purchase edge parquet; this times each
    // materialization boundary of Graph.triangleCountsCanonical)
    if (args.headOption.contains("tri")) {
      // the gate's OWN fixture staging — shared so the profiler cannot
      // drift from the plan it claims to measure
      val edgeDir = graft.queries.Relational.copurchaseEdgesDir(spark, dir)
      (1 to 2).foreach { round =>
        val und = spark.read.parquet(edgeDir)
        timed(s"[$round] edge scan")(println(s"         rows=${und.count()}"))
        val oriented = graft.operators.Graph
          .orientCanonical(und, broadcastDeg = true)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed(s"[$round] orient bc (+persist)")(println(s"         rows=${oriented.count()}"))
        val tri = graft.operators.Graph.enumerateTriangles(oriented, broadcastAdj = true)
        timed(s"[$round] enumerate+agg bc") {
          val c = tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
            .groupBy("node").agg(count(lit(1)).as("n_tri"))
          println(s"         rows=${c.count()}")
        }
        oriented.unpersist()
        spark.catalog.clearCache()
      }
      (1 to 6).foreach { round =>
        timed(s"[$round] full gate (noop write)") {
          graft.queries.Relational.defs.find(_.name == "q50_triangle_count").get
            .run(spark, dir).write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }

    // `sbt "runMain graft.Probe bfs"` → one semi-naive BFS round, plan +
    // timing: is the frontier⋈edges join shuffling the edge list every
    // round (SMJ both sides) or reusing the bucketed layout / broadcasting
    // the frontier? Plus repeated full-gate timings of the iterative family.
    if (args.headOption.contains("bfs")) {
      val tbl = graft.plans.Layouts.persistedLayout(
        graft.sources.RdfBridge.triples(spark, dir), dir,
        graft.plans.Layouts.BySubject, signPartitioned = false)
      val triples = spark.table(tbl)
      val edges = triples.select(
          col(graft.core.TripleSchema.subject).as("src"),
          col(graft.core.TripleSchema.objekt).as("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[probe] edges rows=${edges.count()}")
      val seeds = triples.filter(col("Predicate") === graft.sources.RdfBridge.Placed)
        .agg(min(col("Subject")).as("node")).localCheckpoint()
      val round1 = seeds.join(edges, seeds("node") === edges("src"))
        .select(col("dst").as("node")).distinct()
      println("[probe] round-1 frontier-join executed plan:")
      round1.write.format("noop").mode("overwrite").save()
      println(round1.queryExecution.executedPlan.toString.take(4000))
      Seq("rdf_reachability", "rdf_shortest_path", "rdf_pagerank").foreach { g =>
        val d = graft.queries.Rdf.defs.find(_.name == g).get
        (1 to 3).foreach { i =>
          timed(s"[$i] $g")(
            d.run(spark, dir).write.format("noop").mode("overwrite").save())
          spark.catalog.clearCache()
        }
      }
      spark.stop(); return
    }

    // `sbt "runMain graft.Probe idxstore"` → streaming-index-store layout
    // probe (round-10): the pruned serve's cost must track the PROBED
    // partitions' volume, NOT the store size. Store A: 4 cells × 250k code
    // rows. Store B: identical cell-0 content, cells 1–3 inflated 10×
    // (7.75M rows total). A serve probing cell 0 must cost the same on
    // both — the partition-pruned read never lists or scans the inflated
    // partitions — while a full-store scan pays B's full size.
    if (args.headOption.contains("idxstore")) {
      val base = java.nio.file.Files.createTempDirectory("idxprobe").toString
      // pseudo-random payload (defeats RLE/delta: the scan pays real decode
      // + aggregate work per row, as a PQ-code store does)
      val rowsOf = (c: Int, n: Long) => spark.range(n).select(
        (col("id") * 2654435761L % 1000003L).as("nid"), lit(c).as("cell"),
        ((col("id") * 19349663L) % 8).cast("int").as("m"),
        ((col("id") * 40503L) % 8).cast("int").as("cid"))
      def build(name: String, otherFactor: Int): graft.streaming.IndexStore = {
        val store = new graft.streaming.IndexStore(spark, s"$base/$name", "cell", 0)
        (0 to 3).foreach { c =>
          store.append(rowsOf(c, if (c == 0) 2000000L else 2000000L * otherFactor))
        }
        store
      }
      val schema = rowsOf(0, 1L).schema
      val a = build("a", 1)  //  8M rows, balanced
      val b = build("b", 10) // 62M rows, non-probed cells inflated 10x
      def consume(df: org.apache.spark.sql.DataFrame): Unit = {
        val files = df.select(input_file_name()).distinct().count()
        val agg = df.groupBy("m", "cid").agg(sum("nid")).count()
        println(s"         files=$files groups=$agg")
      }
      (1 to 3).foreach { r =>
        timed(s"[$r] probe cell0 | store A  8M rows")(consume(a.read(schema, Seq(0))))
        timed(s"[$r] probe cell0 | store B 62M rows")(consume(b.read(schema, Seq(0))))
        timed(s"[$r] FULL scan   | store B 62M rows")(consume(b.readAll(schema)))
      }
      spark.stop(); return
    }

    // `sbt "runMain graft.Probe knn"` → sim_knn_graph_auto stage profile:
    // where does the build spend — the per-row plane-fold hashing, the
    // bucket self-join + rank, or the mutuality join?
    if (args.headOption.contains("knn")) {
      import graft.functions.{Formulas => F, SparkDialect}
      import graft.queries.Pipeline
      graft.functions.VectorExpressions.register(spark)
      graft.sources.Tables.load(spark, dir, "embeddings")
        .createOrReplaceTempView("embeddings")
      val n = timed("count")(spark.table("embeddings").count())
      val planes = Pipeline.autoPlanes(n)
      println(s"[probe] n=$n planes=$planes")
      val e = timed("hash+checkpoint") {
        spark.sql(
          s"""SELECT vec_id, embedding,
             |  ${F.norm(SparkDialect, "embedding", 64)} AS nrm,
             |  ${F.lshBucketExpr(SparkDialect, "embedding", 64, planes.toString)} AS bkt
             |FROM embeddings""".stripMargin).localCheckpoint()
      }
      e.createOrReplaceTempView("probe_knn_e")
      timed("bucket histogram") {
        spark.sql(
          """SELECT COUNT(*) AS n_buckets, MAX(k) AS max_k,
            |  CAST(SUM(k*k) AS BIGINT) AS sum_k2,
            |  CAST(percentile_approx(k, 0.5) AS BIGINT) AS med_k
            |FROM (SELECT bkt, COUNT(*) AS k FROM probe_knn_e GROUP BY bkt) b""".stripMargin)
          .show(false)
        spark.sql(
          """SELECT bkt, COUNT(*) AS k FROM probe_knn_e GROUP BY bkt
            |ORDER BY k DESC LIMIT 5""".stripMargin).show(false)
      }
      val knn = timed("scored+rank+checkpoint") {
        spark.sql(
          s"""SELECT qid, nid, score FROM (
             |  SELECT qid, nid, score,
             |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
             |  FROM (SELECT a.vec_id AS qid, b.vec_id AS nid,
             |      CASE WHEN a.nrm * b.nrm > 0
             |        THEN graft_dot(a.embedding, b.embedding) / (a.nrm * b.nrm)
             |        ELSE 0.0 END AS score
             |    FROM probe_knn_e a JOIN probe_knn_e b
             |      ON a.bkt = b.bkt AND b.vec_id <> a.vec_id) sc) r
             |WHERE rnk <= 3""".stripMargin).localCheckpoint()
      }
      knn.createOrReplaceTempView("probe_knn_knn")
      timed("mutual join") {
        spark.sql(
          """SELECT x.qid AS u, x.nid AS v, x.score
            |FROM probe_knn_knn x JOIN probe_knn_knn y
            |  ON x.qid = y.nid AND x.nid = y.qid
            |WHERE x.qid < x.nid""".stripMargin)
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }

    graft.sources.Tables.load(spark, dir, "documents")
      .createOrReplaceTempView("documents")

    // stage 1: shingle explode (materialized count)
    val sh = spark.sql(graft.queries.Pipeline.debugShingleExplodeSql).persist()
    timed("shingle explode")(println(s"         rows=${sh.count()}"))
    sh.createOrReplaceTempView("graft_sh")

    // stage 2: per-doc sorted distinct hash sets
    val sets = spark.sql(graft.queries.Pipeline.debugNgramSetFromView).persist()
    timed("sets (vocab hash + collect)")(println(s"         rows=${sets.count()}"))
    sets.createOrReplaceTempView("ngram_sets")

    // stage 3: full prefix join (df + window + candidates + verify)
    val pairs = spark.sql(graft.queries.Pipeline.debugNgramPairsSql)
    timed("prefix join end-to-end")(println(s"         rows=${pairs.count()}"))

    // stage 3a: candidate generation only (no verify) — explode + df +
    // window + self-join + pair dedup
    val cand = spark.sql(graft.queries.Pipeline.debugNgramCandidatesSql)
    timed("candidates only")(println(s"         rows=${cand.count()}"))

    // minhash branch (dedup_minhash_lsh stages, from the same shingle view)
    val sigs = spark.sql(graft.queries.Pipeline.debugMinhashSigFromView).persist()
    timed("minhash signatures")(println(s"         rows=${sigs.count()}"))
    sigs.createOrReplaceTempView("minhash_sigs_probe")
    val mpairs = spark.sql(
      graft.queries.Pipeline.debugMinhashPairsSql("minhash_sigs_probe"))
    timed("band join + estimate")(println(s"         rows=${mpairs.count()}"))

    sigs.unpersist(); sets.unpersist(); sh.unpersist()
    spark.stop()
  }
}

package graft.queries

import graft.sources.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** GATE-VERIFIED Structured Streaming operators (beyond reference parity —
  * the reference is batch-only): each runs a real `readStream` →
  * transform → `writeStream` pipeline to completion with
  * `Trigger.AvailableNow` over a multi-file staging of the events table
  * (several genuine micro-batches, watermark progression, cross-batch
  * state), then returns the sink contents for the driver's DuckDB compare.
  *
  * Each gate is DETERMINISTIC by construction:
  *  - stream_filter_sink passes every row through (no watermark-dependent
  *    emission), so the sink holds exactly the batch filter result;
  *  - stream_dedup holds all ids in state (30-day watermark ≫ data span),
  *    so the sink holds exactly the distinct events;
  *  - stream_sessionize stages files in GLOBAL time order, so the emitted
  *    (closed) sessions are exactly the batch gaps-and-islands sessions
  *    minus each user's final (never-flushed) session — both facts pinned
  *    by StreamingSpec.
  */
object Streams {

  /** Remove-and-return a fixed scratch dir (bounded disk across runs). */
  private def cleanScratch(spark: SparkSession, name: String): String = {
    val dir = Tables.scratchDir(name)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  private val stageCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def seedKey(spark: SparkSession, sfDir: String, kind: String): String =
    s"${System.identityHashCode(spark)}/$kind/${sfDir.hashCode & 0x7fffffff}"

  /** Run the three staged-batch writes with PINNED, strictly increasing
    * modification times on each batch's files: FileStreamSource orders
    * arrival by mtime, and sequential `coalesce(1)` writes can land inside
    * one filesystem timestamp tick — pin the batch order instead of racing
    * the clock (same discipline `landArrival` applies to the restart
    * gates). */
  private def stageOrdered(spark: SparkSession, dir: String)(
      write: Int => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var seen = Set.empty[String]
    Seq(0, 1, 2).foreach { i =>
      write(i)
      fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).foreach { st =>
        if (!seen(st.getPath.getName)) {
          fs.setTimes(st.getPath, 1000000000000L + i * 100000L, -1)
          seen += st.getPath.getName
        }
      }
    }
  }

  /** Stage the events table as THREE time-ordered parquet files (memoized
    * per session + dataset): `maxFilesPerTrigger=1` then yields three
    * micro-batches whose event times genuinely advance the watermark.
    */
  private def stagedEventsDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "stage"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_${sfDir.hashCode & 0x7fffffff}")
      val all = Tables.load(spark, sfDir, "events")
      val n = all.count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().orderBy("ts", "event_id")
      // persist the globally-sorted numbering: each of the three split
      // writes reads the cached rows instead of re-running the sort
      val withIdx = all.withColumn("__rn", row_number().over(w)).persist()
      stageOrdered(spark, dir) { i =>
        withIdx.filter(col("__rn") > i * n / 3 && col("__rn") <= (i + 1) * n / 3)
          .drop("__rn")
          .coalesce(1).write.mode("append").parquet(dir)
      }
      withIdx.unpersist()
      dir
    })

  /** The staged dir with every file DUPLICATED (distinct filenames), so each
    * event arrives twice in different micro-batches.
    */
  private def duplicatedEventsDir(spark: SparkSession, sfDir: String): String = {
    // resolve the source staging BEFORE entering computeIfAbsent: a nested
    // computeIfAbsent on the same map from inside a mapping function is a
    // recursive update (IllegalStateException when the keys share a bin)
    val src = stagedEventsDir(spark, sfDir)
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "dup"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_dup_${sfDir.hashCode & 0x7fffffff}")
      // Hadoop FS throughout (same as cleanScratch) — works on any scheme,
      // no java.nio directory-stream handle to leak
      val conf = spark.sparkContext.hadoopConfiguration
      val dstPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dstPath.getFileSystem(conf)
      fs.mkdirs(dstPath)
      val srcPath = new org.apache.hadoop.fs.Path(src)
      srcPath.getFileSystem(conf).listStatus(srcPath).foreach { st =>
        val name = st.getPath.getName
        if (name.endsWith(".parquet")) {
          Seq("a_", "b_").foreach { prefix =>
            org.apache.hadoop.fs.FileUtil.copy(
              st.getPath.getFileSystem(conf), st.getPath,
              fs, new org.apache.hadoop.fs.Path(dstPath, prefix + name),
              false, conf)
          }
        }
      }
      dir
    })
  }

  /** The staged dir plus a FINAL sentinel file holding one far-future event
    * (max ts + 240 h, aligned 1 s past an hour boundary): processed last, it
    * advances the watermark past every real event's window, so an
    * append-mode windowed aggregation emits ALL real windows before the
    * AvailableNow run terminates — deterministic emission that does not
    * depend on where the real data's own watermark stops. The sentinel's
    * own window never closes (nothing later arrives) and is never emitted.
    */
  private def sentinelEventsDir(spark: SparkSession, sfDir: String): String = {
    val src = stagedEventsDir(spark, sfDir) // resolve OUTSIDE computeIfAbsent
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "sentinel"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_wm_${sfDir.hashCode & 0x7fffffff}")
      val conf = spark.sparkContext.hadoopConfiguration
      val dstPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dstPath.getFileSystem(conf)
      fs.mkdirs(dstPath)
      val srcPath = new org.apache.hadoop.fs.Path(src)
      // copy in modification-time order, then EXPLICITLY re-stamp each copy
      // with strictly increasing times: the file stream source batches by
      // mod time at millisecond resolution, and sequential small copies can
      // tie on one millisecond — an out-of-order tie would process a later
      // time range first and drop the earlier chunk's rows as late
      val base = System.currentTimeMillis()
      val copied = srcPath.getFileSystem(conf).listStatus(srcPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getModificationTime).zipWithIndex.map { case (st, i) =>
          val dst = new org.apache.hadoop.fs.Path(dstPath, st.getPath.getName)
          org.apache.hadoop.fs.FileUtil.copy(
            st.getPath.getFileSystem(conf), st.getPath, fs, dst, false, conf)
          fs.setTimes(dst, base + i * 1000L, -1)
          dst.getName
        }.toSet
      val all = Tables.load(spark, sfDir, "events")
      val schema = all.schema
      all.agg(max(col("ts")).as("m"))
        .select(schema.fields.map { f =>
          (f.name match {
            case "ts" => expr("date_trunc('hour', m) + INTERVAL 240 HOURS 1 SECOND")
            case "event_id" | "user_id" => lit(-1L)
            case "event_type" => lit("sentinel")
            case other => lit(null).cast(schema(other).dataType)
          }).cast(f.dataType).as(f.name)
        }: _*)
        .coalesce(1).write.mode("append").parquet(dir)
      // stamp the sentinel (the one parquet that is not a copied chunk)
      // strictly after every chunk's timestamp
      fs.listStatus(dstPath)
        .filter(st => st.getPath.getName.endsWith(".parquet") &&
          !copied.contains(st.getPath.getName))
        .foreach(st => fs.setTimes(st.getPath, base + 100 * 1000L, -1))
      dir
    })
  }

  /** The sentinel staging with a SECOND 'sentinel'-typed file at +480 h,
    * its own final micro-batch. Chained stateful operators need it: batch
    * k's state eviction uses the watermark computed at the END of batch
    * k-1, and with TWO stateful operators the LAST real windows emitted by
    * the upstream aggregate enter the downstream aggregate's state only in
    * the first sentinel's batch — a single sentinel would leave them
    * buffered when AvailableNow terminates. The +480 h batch evicts with
    * the +240 h sentinel's already-advanced watermark, flushing the
    * downstream windows deterministically. Both sentinels keep the
    * 'sentinel' event type (no event-type pre-filter exists in the agg
    * pipelines, so they reach the watermark operator) and are dropped by
    * type at the sink.
    */
  private def dualSentinelEventsDir(spark: SparkSession, sfDir: String): String = {
    val src = sentinelEventsDir(spark, sfDir) // resolve OUTSIDE computeIfAbsent
    // NB: key/dir must not collide with joinSentinelEventsDir's "sentinel2"
    // / events_stream_wm2_ — a collision hands the join gates THIS staging,
    // whose 'sentinel'-typed rows their event-type pushed filters prune at
    // the scan, silently freezing their watermark (debugged round 5)
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "sentinel_chain"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_wmc_${sfDir.hashCode & 0x7fffffff}")
      val conf = spark.sparkContext.hadoopConfiguration
      val dstPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dstPath.getFileSystem(conf)
      fs.mkdirs(dstPath)
      val srcPath = new org.apache.hadoop.fs.Path(src)
      // copy the single-sentinel staging preserving its batch order
      // (re-stamped with fresh strictly-increasing times, ties broken)
      val base = System.currentTimeMillis()
      val copied = srcPath.getFileSystem(conf).listStatus(srcPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getModificationTime).zipWithIndex.map { case (st, i) =>
          val dst = new org.apache.hadoop.fs.Path(dstPath, st.getPath.getName)
          org.apache.hadoop.fs.FileUtil.copy(
            st.getPath.getFileSystem(conf), st.getPath, fs, dst, false, conf)
          fs.setTimes(dst, base + i * 1000L, -1)
          dst.getName
        }.toSet
      val all = Tables.load(spark, sfDir, "events")
      val schema = all.schema
      all.agg(max(col("ts")).as("m"))
        .select(schema.fields.map { f =>
          (f.name match {
            case "ts" => expr("date_trunc('hour', m) + INTERVAL 480 HOURS 1 SECOND")
            case "event_id" | "user_id" => lit(-2L)
            case "event_type" => lit("sentinel")
            case other => lit(null).cast(schema(other).dataType)
          }).cast(f.dataType).as(f.name)
        }: _*)
        .coalesce(1).write.mode("append").parquet(dir)
      fs.listStatus(dstPath)
        .filter(st => st.getPath.getName.endsWith(".parquet") &&
          !copied.contains(st.getPath.getName))
        // stamp strictly AFTER the copied files whatever their count —
        // a fixed offset would silently break ordering if the source
        // staging ever grew past it
        .foreach(st => fs.setTimes(st.getPath, base + (copied.size + 1) * 1000L, -1))
      dir
    })
  }

  /** TWO sentinel files (+240 h and +480 h, each its own final micro-batch),
    * each holding one 'purchase' and one 'click' row with NEGATIVE user ids.
    * Stream-stream joins need both properties:
    *
    *  - REAL event types (not the 'sentinel' type): the join pre-filters
    *    each side on event_type, and Catalyst pushes that predicate below
    *    the EventTimeWatermark node into the parquet scan — a
    *    'sentinel'-typed row is pruned by row-group stats at the SCAN, never
    *    reaches the watermark operator, and the clock never advances
    *    (measured: numInputRows=0 for the sentinel batches while a
    *    filter-free probe stream read them fine). Negative user ids keep the
    *    sentinels out of the join result instead (real keys are >= 0;
    *    gates filter `user_id >= 0` on the sink).
    *  - a SECOND sentinel: batch k's state eviction uses the watermark
    *    computed at the END of batch k-1, so a single sentinel leaves the
    *    last ~delay of unmatched rows buffered when AvailableNow terminates
    *    (measured: the final 2 h of null-padded purchases never emitted).
    *    The +480 h batch evicts with the +240 h sentinel's watermark
    *    (+238 h), flushing every real row's result deterministically.
    */
  private def joinSentinelEventsDir(spark: SparkSession, sfDir: String): String = {
    val src = stagedEventsDir(spark, sfDir) // resolve OUTSIDE computeIfAbsent
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "sentinel2"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_wm2_${sfDir.hashCode & 0x7fffffff}")
      val conf = spark.sparkContext.hadoopConfiguration
      val dstPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dstPath.getFileSystem(conf)
      fs.mkdirs(dstPath)
      val srcPath = new org.apache.hadoop.fs.Path(src)
      val base = System.currentTimeMillis()
      val copied = srcPath.getFileSystem(conf).listStatus(srcPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getModificationTime).zipWithIndex.map { case (st, i) =>
          val dst = new org.apache.hadoop.fs.Path(dstPath, st.getPath.getName)
          org.apache.hadoop.fs.FileUtil.copy(
            st.getPath.getFileSystem(conf), st.getPath, fs, dst, false, conf)
          fs.setTimes(dst, base + i * 1000L, -1)
          dst.getName
        }.toSet
      val all = Tables.load(spark, sfDir, "events")
      val schema = all.schema
      Seq(240, 480).zipWithIndex.foreach { case (hours, si) =>
        val before = fs.listStatus(dstPath)
          .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet
        all.agg(max(col("ts")).as("m"))
          .select(col("m"),
            explode(array(lit("purchase"), lit("click"))).as("st"))
          .select(schema.fields.map { f =>
            (f.name match {
              case "ts" => expr(s"date_trunc('hour', m) + INTERVAL $hours HOURS 1 SECOND")
              case "event_id" | "user_id" => lit(-1L - si)
              case "event_type" => col("st")
              case other => lit(null).cast(schema(other).dataType)
            }).cast(f.dataType).as(f.name)
          }: _*)
          .coalesce(1).write.mode("append").parquet(dir)
        fs.listStatus(dstPath)
          .filter(st => st.getPath.getName.endsWith(".parquet") &&
            !before.contains(st.getPath.getName))
          .foreach(st => fs.setTimes(st.getPath, base + (si + 1) * 100 * 1000L, -1))
      }
      dir
    })
  }

  /** Hash-bucket width of the ingestion band-key store. Gate-scale value;
    * on a real cluster this is sized to the store volume (e.g. 4096) so a
    * batch's probe reads a thin partition slice of a corpus-sized store.
    */
  private val IngestStoreBuckets = 8

  /** Per-batch probe + merge-compact of the ingestion band-key STORE
    * (round-9 rework; round-10: on the shared [[graft.streaming.IndexStore]]
    * layout). The store holds DISTINCT band keys only — it is probed as
    * `rid = -1`, so per-doc multiplicity was dead weight. Each batch
    * (1) collects the ≤[[IngestStoreBuckets]] bucket ids its own keys hash
    * into (driver model state) and reads ONLY those store partitions
    * (static partition pruning — the probe cost tracks the batch's bucket
    * subset, not the corpus), and (2) appends only keys NOT already in
    * that slice (left_anti on the same pruned scan — a key can only
    * collide inside its own bucket), keeping the store exactly the
    * distinct band-key set, vocabulary-bounded.
    *
    * Returns the pruned store slice (None on the first batch) and a thunk
    * that performs the compacted append — call it AFTER the batch output
    * is written, so a batch never probes its own keys through the store
    * (the within-batch rule handles same-batch dups exactly).
    */
  private[queries] def bandStoreProbe(ss: SparkSession, bands: DataFrame,
      idxDir: String, batchId: Long): (Option[DataFrame], () => Unit) = {
    val store = new graft.streaming.IndexStore(ss, idxDir, "bk", IngestStoreBuckets)
    val bkeys = store.bucketed(bands.select(col("bk")).distinct()).localCheckpoint()
    // REPLAY SAFETY: the probe reads STRICTLY-EARLIER batches only, and the
    // compacted append OVERWRITES this batch's own partition — so a
    // replayed micro-batch (foreachBatch is at-least-once under mid-batch
    // failure) sees exactly the state its first attempt saw and rewrites
    // identical results instead of doubling keys or flagging its own docs.
    val slice =
      if (batchId == 0) None
      else Some(store.readBefore(
        store.batchSchema(bands.select(col("bk")).schema),
        store.partsOf(bkeys), batchId))
    val append = () => {
      val newKeys = slice match {
        case None     => bkeys
        case Some(st) => bkeys.join(st.select("bk"), Seq("bk"), "left_anti")
      }
      store.appendBatch(newKeys, batchId)
    }
    (slice, append)
  }

  /** Sketch formulas — shared with the batch set-operations gate via
    * [[graft.functions.Formulas]]. */
  private val F2 = graft.functions.Formulas
  private def hllHash(d: graft.functions.Dialect, u: String): String =
    graft.functions.Formulas.hllHash(d, u)
  private def hllRho(d: graft.functions.Dialect, w: String): String =
    graft.functions.Formulas.hllRho(d, w)
  private val HllAlphaScale: Double = graft.functions.Formulas.hllAlphaScale64

  /** Replay-idempotent micro-batch SINK: overwrite the batch's own
    * `batch=<id>` partition instead of appending — foreachBatch is
    * at-least-once under mid-batch failure, and a replayed batch must
    * rewrite itself, not double the sink. Readers discover `batch` as a
    * partition column and project it away with their explicit final
    * selects. */
  private implicit class BatchSink(private val df: DataFrame) {
    def sinkBatch(out: String, batchId: Long): Unit =
      df.write.mode("overwrite").parquet(s"$out/batch=$batchId")
  }

  /** Disk-memoized STATIC MODEL STATE (per session + dataset): built once,
    * each relation written to a scratch parquet, and every later gate run
    * re-registers temp views from disk — the staged-fixture discipline.
    * In-memory memoization (cached localCheckpoint DataFrames) would break
    * under the bench's deterministic RDD reaping: a truncated-lineage
    * checkpoint cannot be recomputed once unpersisted. The gates this
    * serves train rarely and serve constantly BY DESIGN (their own
    * production-cadence contract); the bench's untimed warmup pays the
    * training once, and timed runs measure the steady-state serve path.
    */
  private def stagedModel(s: SparkSession, dir: String, kind: String)(
      build: => Seq[(String, DataFrame)]): Unit = {
    val base = stageCache.computeIfAbsent(seedKey(s, dir, kind), { _ =>
      val root = cleanScratch(s, s"${kind}_${dir.hashCode & 0x7fffffff}")
      build.foreach { case (name, df) =>
        df.coalesce(1).write.parquet(s"$root/$name")
      }
      root
    })
    new java.io.File(base).listFiles().filter(_.isDirectory).foreach { d =>
      s.read.parquet(d.toString).createOrReplaceTempView(d.getName)
    }
  }

  /** Versioned upsert-serve oracle — shared by stream_ann_upsert and its
    * checkpoint-restart twin (exactly-once means identical final output):
    * version v's index is exactly the vectors with `vec_id % 3 < v` (the
    * staged arrival schedule, replayed relationally). */
  private def annUpsertOracle: String = {
    val dd = graft.functions.DuckDialect
    val F = graft.functions.Formulas
    val dim = 64
    val cos = s"CASE WHEN qn * en > 0 THEN (${F.dot(dd, "qv", "ev", dim)}) / (qn * en) ELSE 0.0 END"
    s"""WITH e AS (SELECT vec_id, embedding,
       |    ${F.norm(dd, "embedding", dim)} AS nrm,
       |    ${F.lshBucket(dd, "embedding", dim, 8)} AS bkt,
       |    vec_id % 3 AS m FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn, bkt FROM e
       |  WHERE vec_id % 50 = 0),
       |vs AS (SELECT unnest(range(1, 4)) AS version),
       |scored AS (SELECT vs.version, q.qid, e.nid, $cos AS score
       |  FROM vs
       |  JOIN (SELECT vec_id AS nid, embedding AS ev, nrm AS en, bkt, m FROM e) e
       |    ON e.m < vs.version
       |  JOIN q ON q.bkt = e.bkt AND e.nid <> q.qid)
       |SELECT CAST(version AS BIGINT) AS version, CAST(qid AS BIGINT) AS qid,
       |  CAST(nid AS BIGINT) AS nid, score, CAST(rnk AS BIGINT) AS rnk
       |FROM (SELECT version, qid, nid, score,
       |    ROW_NUMBER() OVER (PARTITION BY version, qid ORDER BY score DESC, nid) AS rnk
       |  FROM scored) s
       |WHERE rnk <= 3""".stripMargin
  }

  /** Static model-side state of the ANN upsert gates: the broadcast query
    * set (computed once) and its store-bucket subset — the vector store is
    * the shared IndexStore layout (256 raw bkt values hash-fold into 8
    * partition dirs; direct partitionBy(bkt) would be the 256-tiny-file
    * pathology at batch scale, a corpus-sized store raises the bucket
    * count instead), and since the query set is STATIC the prunable bucket
    * subset is known before the stream starts. */
  private def annQueryState(s: SparkSession, dir: String,
      idxDir: String): (DataFrame, Seq[Any]) = {
    val F = graft.functions.Formulas
    val d = graft.functions.SparkDialect
    val queries = broadcast(Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .selectExpr("vec_id AS qid", "embedding AS qv",
        s"${F.norm(d, "embedding", 64)} AS qn",
        s"CAST(${F.lshBucket(d, "embedding", 64, 8)} AS LONG) AS bkt")
      .localCheckpoint())
    val qParts = new graft.streaming.IndexStore(s, idxDir, "bkt", 8)
      .partsOf(queries.select("bkt"))
    (queries, qParts)
  }

  /** One micro-batch of the streaming ANN upsert: fold the BATCH's
    * bucket/norm rows into the store's bucket partitions (append-only),
    * then re-serve the static queries against the refreshed index,
    * partition-pruned to the queries' bucket subset. Shared by
    * stream_ann_upsert and stream_ann_restart. */
  private def annUpsertBatch(queries: DataFrame, qParts: Seq[Any],
      idxDir: String, out: String)(bdf: DataFrame, batchId: Long): Unit = {
    val F = graft.functions.Formulas
    val d = graft.functions.SparkDialect
    val vecStore = new graft.streaming.IndexStore(bdf.sparkSession, idxDir, "bkt", 8)
    val rows = bdf.selectExpr("vec_id AS nid", "embedding AS ev",
      s"${F.norm(d, "embedding", 64)} AS en",
      s"CAST(${F.lshBucket(d, "embedding", 64, 8)} AS LONG) AS bkt")
    vecStore.appendBatch(rows, batchId)
    vecStore.readBatches(vecStore.batchSchema(rows.schema), qParts)
      .join(queries, "bkt")
      .filter(col("nid") =!= col("qid"))
      .select(lit(batchId + 1).cast("long").as("version"),
        col("qid"), col("nid"),
        when(col("qn") * col("en") > 0,
          expr("graft_dot(qv, ev)") / (col("qn") * col("en")))
          .otherwise(lit(0.0)).as("score"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("nid"))))
      .filter(col("rnk") <= 3)
      .sinkBatch(out, batchId)
  }

  private def annReadOut(s: SparkSession, out: String): DataFrame =
    s.read.parquet(out)
      .select(col("version").cast("long").as("version"),
        col("qid").cast("long").as("qid"), col("nid").cast("long").as("nid"),
        col("score"), col("rnk").cast("long").as("rnk"))

  /** Copy the i-th arrival file (mtime order) of a staged stream directory
    * into `src` under a deterministic name + strictly-increasing mtime, so
    * the file source admits arrivals in the staged order on every pass —
    * the staging half of the checkpoint-restart gates. */
  private def landArrival(s: SparkSession, staged: String, src: String, i: Int): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(staged).getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(staged))
      .filter(st => st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getModificationTime)
    fs.mkdirs(new org.apache.hadoop.fs.Path(src))
    val dst = new org.apache.hadoop.fs.Path(src, f"arrival-$i%02d.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, files(i).getPath, fs, dst, false, conf)
    fs.setTimes(dst, 1000000000000L + i * 100000L, -1)
  }

  /** One micro-batch of the production ingestion pipeline — quality gate →
    * accepted-band near-dup check against the compacted store → one status
    * row per doc ('quality' | 'dup' | 'ok') — shared by the single-run gate
    * (stream_ingest_e2e) and the checkpoint-restart gate
    * (stream_ingest_restart): exactly-once across a restart is only
    * meaningful if both runs execute the identical batch body.
    */
  private def ingestE2eBatch(idxDir: String, out: String)(
      bdf: DataFrame, batchId: Long): Unit = {
    val ss = bdf.sparkSession
    // qual is consumed twice (pass filter + status join): ONE
    // localCheckpoint beats recomputing the tokenize/stopword fold
    // per reference — measured 12.7s vs 14.3s median-of-3 at 10×
    // batch size, within noise at sf0.1 (PLANS.md round-9)
    val qual = Pipeline.qualityKeep(ss, bdf).localCheckpoint()
    val pass = bdf.join(qual.filter(col("keep") === 1), Seq("doc_id"))
    val bands = Pipeline.ingestBands(ss, pass).localCheckpoint()
    val within = bands.select(col("bk").as("rbk"), col("doc_id").as("rid"))
    val (slice, mergeStore) = bandStoreProbe(ss, bands, idxDir, batchId)
    val rivals = slice match {
      case None     => within
      case Some(st) => within.union(
        st.select(col("bk").as("rbk"), lit(-1L).as("rid")))
    }
    val dups = bands
      .join(rivals, col("rbk") === col("bk") && col("rid") < col("doc_id"),
        "left_semi")
      .select(col("doc_id")).distinct().withColumn("__dup", lit(1L))
    bdf.select(col("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .select(lit(batchId + 1).cast("long").as("version"),
        col("doc_id").cast("long").as("doc_id"),
        when(col("keep") === 0, lit("quality"))
          .when(col("__dup").isNotNull, lit("dup"))
          .otherwise(lit("ok")).as("status"))
      .sinkBatch(out, batchId)
    mergeStore()
  }

  private def await(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    assert(q.awaitTermination(300000), "streaming gate timed out")
    // batch-level trace for debugging watermark/eviction timing issues
    // (opt-in: SPARK_GRAFT_STREAM_DEBUG=1)
    if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
      q.recentProgress.foreach { p =>
        System.err.println(s"[stream-debug] ${q.name} batch=${p.batchId} " +
          s"rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
      }
  }

  /** Stage the RdfBridge triple set as THREE parquet files (memoized per
    * session + dataset): with `maxFilesPerTrigger=1` the triple STREAM
    * arrives in three genuine micro-batches. Slices are a deterministic
    * hash partition of the rows — batch boundaries carry no semantics for
    * the stateless stream-static match, so any split verifies the same.
    */
  /** The sim_ann_lsh QUERY SUBSET (vec_id % 50 = 0) staged as three
    * parquet chunks — the arriving query stream of the ANN serving gate.
    */
  private def stagedEmbQueriesDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "embq"), { _ =>
      val dir = cleanScratch(spark,
        s"embq_stream_${sfDir.hashCode & 0x7fffffff}")
      val qs = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 50 === 0)
      stageOrdered(spark, dir) { i =>
        qs.filter(pmod(hash(col("vec_id")), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  /** Corpus-vector arrival stream for the upsert-index gate: three files
    * appended in deterministic order (`vec_id % 3` = 0, 1, 2), so the
    * index version after micro-batch b is exactly `{v : v.vec_id % 3 < b}`
    * — an SQL-expressible arrival schedule the oracle replays.
    */
  private def stagedEmbCorpusDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "embc"), { _ =>
      val dir = cleanScratch(spark,
        s"embc_stream_${sfDir.hashCode & 0x7fffffff}")
      val all = Tables.load(spark, sfDir, "embeddings")
      stageOrdered(spark, dir) { i =>
        all.filter(col("vec_id") % 3 === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  /** Document arrival stream for the ingestion-dedup gate: three files in
    * deterministic `doc_id % 3` order (same schedule as the corpus-vector
    * stream, so the oracle can replay arrival relationally).
    */
  /** The TOMBSTONE stream for the ANN-delete gate: delete requests
    * (`vec_id % 97 = 0`) staged as three files in `vec_id % 3` arrival
    * order, so the oracle can replay deletion visibility relationally.
    */
  private def stagedEmbDeletesDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "embdel"), { _ =>
      val dir = cleanScratch(spark,
        s"embdel_stream_${sfDir.hashCode & 0x7fffffff}")
      val all = Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 97 === 0).select("vec_id")
      stageOrdered(spark, dir) { i =>
        all.filter(col("vec_id") % 3 === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  private def stagedDocsDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "docs"), { _ =>
      val dir = cleanScratch(spark,
        s"docs_stream_${sfDir.hashCode & 0x7fffffff}")
      val all = Tables.load(spark, sfDir, "documents")
      stageOrdered(spark, dir) { i =>
        all.filter(col("doc_id") % 3 === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  /** The events table staged OUT OF TIME ORDER (split by user_id % 3, each
    * file spanning the full time range) — the late-data fixture: once
    * batch 0 has advanced the watermark to its own max event time, most of
    * batches 1–2 arrive behind it. */
  private def stagedEventsByUserDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "byuser"), { _ =>
      val dir = cleanScratch(spark,
        s"events_stream_byuser_${sfDir.hashCode & 0x7fffffff}")
      val all = Tables.load(spark, sfDir, "events")
      stageOrdered(spark, dir) { i =>
        all.filter(col("user_id") % 3 === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  private def stagedTriplesDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "triples"), { _ =>
      val dir = cleanScratch(spark,
        s"triples_stream_${sfDir.hashCode & 0x7fffffff}")
      val all = graft.sources.RdfBridge.triples(spark, sfDir)
      val cols = all.columns.map(col)
      stageOrdered(spark, dir) { i =>
        all.filter(pmod(hash(cols: _*), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    })

  /** Run `f` with a reduced shuffle-partition count. Streaming STATE is
    * partitioned by `spark.sql.shuffle.partitions` captured at query start;
    * at gate scale (10⁵ rows, local) 32 partitions mean 32–64 state-store
    * instances committing per micro-batch — pure overhead. 8 keeps the
    * per-batch state commit cost proportionate; results are independent of
    * partitioning. On a real cluster this knob is sized to executor count ×
    * state volume, not lowered.
    */
  private def withStatePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }

  /** Scope the RocksDB state-store provider (transformWithState refuses the
    * default HDFS-backed store) with changelog checkpointing: each commit
    * appends a delta instead of uploading a full RocksDB snapshot — the
    * right production setting for frequent small commits, and locally it
    * removes a per-partition-per-batch snapshot copy. Both confs restored
    * on exit. */
  private def withRocksDb[T](s: SparkSession)(f: => T): T = {
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The image-ingest oracle (shared verbatim by the single-run gate and
    * the checkpoint-restart gate — exactly-once means identical output). */
  private def imageIngestOracle: String = {
    val dd = graft.functions.DuckDialect
    val ham = s"(${dd.bitCount(dd.xor("x.phash_hi", "y.phash_hi"))} + " +
      s"${dd.bitCount(dd.xor("x.phash_lo", "y.phash_lo"))})"
    s"""WITH ${Pipeline.phashOracleCtesFor("doc_id % 97")},
       |pv AS (SELECT doc_id, doc_id % 3 AS m, phash_hi, phash_lo FROM ph
       |  WHERE phash_hi >= 0),
       |pb AS (
       |  SELECT doc_id, m, phash_hi, phash_lo,
       |    ${dd.shiftRight("phash_hi", "16")} AS bk FROM pv
       |  UNION ALL SELECT doc_id, m, phash_hi, phash_lo,
       |    65536 + phash_hi % 65536 FROM pv
       |  UNION ALL SELECT doc_id, m, phash_hi, phash_lo,
       |    131072 + ${dd.shiftRight("phash_lo", "16")} FROM pv
       |  UNION ALL SELECT doc_id, m, phash_hi, phash_lo,
       |    196608 + phash_lo % 65536 FROM pv),
       |dup AS (SELECT DISTINCT x.doc_id
       |  FROM pb x JOIN pb y ON x.bk = y.bk
       |    AND (y.m < x.m OR (y.m = x.m AND y.doc_id < x.doc_id))
       |  WHERE $ham <= 10)
       |SELECT CAST(p.m + 1 AS BIGINT) AS version,
       |  CAST(p.doc_id AS BIGINT) AS doc_id,
       |  CASE WHEN d.doc_id IS NULL THEN 'ok' ELSE 'dup' END AS status
       |FROM pv p LEFT JOIN dup d ON p.doc_id = d.doc_id""".stripMargin
  }

  private val imageStoreSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bk",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ah",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("al",
      org.apache.spark.sql.types.LongType)))

  /** One micro-batch of the image ingestion boundary — decode + aHash,
    * band-store near-dup check, status sink, compacted store merge.
    * Shared by stream_image_ingest and stream_image_restart (the shared
    * body is what makes exactly-once-across-restart meaningful). */
  private def imageIngestBatch(idxDir: String, out: String)(
      bdf: DataFrame, batchId: Long): Unit = {
    val d = graft.functions.SparkDialect
    val ss = bdf.sparkSession
    import ss.implicits._
    val ham = s"(${d.bitCount(d.xor("x.ah", "y.ah"))} + " +
      s"${d.bitCount(d.xor("x.al", "y.al"))})"
    // the store handle must live on the BATCH session: temp views
    // and reads resolve in the micro-batch clone's catalog
    val store = new graft.streaming.IndexStore(ss, idxDir, "bk", 8)
    // decode + hash ONCE per arriving image, executor-side
    val imgs = bdf.select(col("doc_id")).as[Long].mapPartitions(_.map(
      id => graft.operators.Multimodal.ImageRow(
        id, graft.operators.Multimodal.pngBytes(id % 97))))
    graft.operators.Multimodal.imagePHash(imgs)
      .filter(col("phash_hi") >= 0)
      .localCheckpoint()
      .createOrReplaceTempView("graft_img_ph")
    val bands = ss.sql(
      s"""SELECT doc_id, CAST(bk AS BIGINT) AS bk,
         |  phash_hi AS ah, phash_lo AS al FROM (
         |  SELECT doc_id, phash_hi, phash_lo,
         |    ${d.shiftRight("phash_hi", "16")} AS bk FROM graft_img_ph
         |  UNION ALL SELECT doc_id, phash_hi, phash_lo,
         |    65536 + phash_hi % 65536 FROM graft_img_ph
         |  UNION ALL SELECT doc_id, phash_hi, phash_lo,
         |    131072 + ${d.shiftRight("phash_lo", "16")} FROM graft_img_ph
         |  UNION ALL SELECT doc_id, phash_hi, phash_lo,
         |    196608 + phash_lo % 65536 FROM graft_img_ph) b""".stripMargin)
      .localCheckpoint()
    bands.createOrReplaceTempView("graft_img_bands")
    // rivals: the store's pruned slice (strictly earlier batches —
    // replay-safe) plus lower-id same-batch arrivals. Both sides are
    // compressed to DISTINCT hash triples (Hamming depends on the
    // hash values, never the rival's identity): a batch with k copies
    // of one image contributes ONE rival group carrying its min id,
    // not k²/2 candidate pairs, and the store stays bounded by the
    // distinct-image set instead of the arrival count — the
    // bandStoreProbe compaction lesson generalized to keyed rows.
    val parts = store.partsOf(bands.select("bk"))
    val slice = store
      .readBefore(store.batchSchema(imageStoreSchema), parts, batchId)
      .select("bk", "ah", "al").localCheckpoint()
    slice.createOrReplaceTempView("graft_img_store")
    ss.sql(
      s"""WITH riv AS (
         |  SELECT bk, ah, al, CAST(-1 AS BIGINT) AS rid
         |  FROM graft_img_store
         |  UNION ALL SELECT bk, ah, al, MIN(doc_id) AS rid
         |  FROM graft_img_bands GROUP BY bk, ah, al),
         |dup AS (SELECT DISTINCT x.doc_id
         |  FROM graft_img_bands x JOIN riv y ON x.bk = y.bk
         |    AND (y.rid = -1 OR y.rid < x.doc_id)
         |  WHERE $ham <= 10)
         |SELECT CAST(${batchId + 1} AS BIGINT) AS version,
         |  CAST(p.doc_id AS BIGINT) AS doc_id,
         |  CASE WHEN d.doc_id IS NULL THEN 'ok' ELSE 'dup' END AS status
         |FROM graft_img_ph p LEFT JOIN dup d ON p.doc_id = d.doc_id"""
        .stripMargin)
      .sinkBatch(out, batchId)
    store.appendBatch(
      bands.select(col("bk"), col("ah"), col("al")).distinct()
        .join(slice, Seq("bk", "ah", "al"), "left_anti"), batchId)
  }


  def defs: Seq[QueryDef] = Seq(

    // ---- stream source → filter → parquet STREAMING SINK → read back:
    // every purchase passes through regardless of watermark, so the sink
    // equals the batch filter exactly. ----
    QueryDef("stream_filter_sink",
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
      val src = stagedEventsDir(s, dir)
      val out = cleanScratch(s, s"stream_sink_out_${dir.hashCode & 0x7fffffff}")
      val ckpt = cleanScratch(s, s"stream_sink_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
    },

    // ---- cross-batch streaming dedup: doubled input (each file staged
    // twice), dropDuplicates state keyed on (event_id, ts) with a watermark
    // far past the data span → exactly the distinct events come out. ----
    QueryDef("stream_dedup",
      "SELECT event_id, ts, user_id, event_type, value FROM events") { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = duplicatedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dedup_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 2)
        .withWatermark("ts", "30 days")
        .dropDuplicates("event_id", "ts")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .writeStream.format("memory").queryName("g_stream_dedup")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_dedup")
      }
    },

    // ---- BOUNDED-STATE streaming dedup (dropDuplicatesWithinWatermark):
    // unlike dropDuplicates, state for a key is EVICTED once the watermark
    // passes its event time + delay — at 100 TB/day this is the only dedup
    // whose state doesn't grow without bound; the trade is that a duplicate
    // arriving after eviction re-emits (StreamingSpec pins exactly that).
    // Here the 30-day delay dwarfs the data span, so every staged duplicate
    // is within-watermark and the sink holds exactly the distinct events —
    // keyed on event_id alone (the production dedup-by-id shape). ----
    QueryDef("stream_dedup_within_wm",
      "SELECT event_id, ts, user_id, event_type, value FROM events") { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = duplicatedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dwm_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 2)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .writeStream.format("memory").queryName("g_stream_dwm")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_dwm")
      }
    },

    // ---- WATERMARK-DRIVEN windowed aggregation in append mode: tumbling
    // 1-hour windows close and emit as the 30-minute watermark passes them
    // across micro-batches; the final sentinel file pushes the watermark
    // past every real window, so the emitted set is exactly the batch
    // GROUP BY (real windows only — the sentinel's window never closes,
    // and its rows are excluded by event_type on both sides). ----
    QueryDef("stream_windowed_agg",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY window_start, event_type""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = sentinelEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_wm_ckpt_${dir.hashCode & 0x7fffffff}")
      // data in one batch, sentinel its own (mtime-later) batch: the
      // append-mode window SET closed by the final watermark is identical,
      // at half the state commits — the sentinel batch still demonstrates
      // cross-batch watermark progression
      val q = EventStreams.windowedCounts(
          EventStreams.readEventStream(s, src, maxFilesPerTrigger = 3),
          "1 hour", "30 minutes")
        .writeStream.format("memory").queryName("g_stream_wm")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_wm").filter(col("event_type") =!= "sentinel")
      }
    },

    // ---- CHAINED STATEFUL OPERATORS (Spark 3.4+/4 multi-stateful append
    // pipelines): a 10-minute windowed pre-aggregate feeds a SECOND
    // stateful aggregate that re-windows the window column to 1 hour —
    // the streaming rollup shape (fine-grain near-real-time tier, coarse
    // tier derived IN the same query, not by a second job re-reading the
    // sink). Counts/sums compose exactly (sum of 10-min counts = hourly
    // count), so the oracle is the plain hourly batch GROUP BY. Needs the
    // dual sentinel: the downstream aggregate's state evicts with the
    // PREVIOUS batch's watermark, so the first sentinel flushes level 1
    // and the second flushes level 2 (see dualSentinelEventsDir). ----
    QueryDef("stream_chained_agg",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY window_start, event_type""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = dualSentinelEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_chain_ckpt_${dir.hashCode & 0x7fffffff}")
      // all data in one batch; the two sentinels stay their own batches
      // (each level's flush rides one sentinel's watermark) — emitted set
      // identical, two stateful levels commit 3 batches instead of 6
      val lvl1 = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 3)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("v"))
      val q = lvl1
        .groupBy(window(col("window"), "1 hour"), col("event_type"))
        .agg(sum(col("n")).as("n"), sum(col("v")).cast("double").as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("total_value"))
        .writeStream.format("memory").queryName("g_stream_chain")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_chain").filter(col("event_type") =!= "sentinel")
      }
    },

    // ---- COMPLETE output mode: unwindowed running totals per event type —
    // the live-dashboard shape. No watermark and no eviction: the state is
    // one row per event type (bounded by the KEY domain, not the stream
    // length — the only situation where complete mode scales), and every
    // micro-batch re-emits the whole table; the memory sink's final
    // snapshot after AvailableNow therefore equals the batch aggregate
    // over all files regardless of how the stream was batched — no
    // sentinels needed, determinism by construction. ----
    QueryDef("stream_complete_agg",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  CAST(MAX(ts) AS TIMESTAMP) AS last_ts
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_cagg_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)").cast("double").as("total_value"),
          max(col("ts")).as("last_ts"))
        .writeStream.format("memory").queryName("g_stream_cagg")
        .outputMode("complete").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_cagg")
      }
    },

    // ---- stream-stream INTERVAL JOIN: purchases ⋈ same-user clicks in the
    // preceding hour, watermarks on BOTH sides bounding the buffered state.
    // Deterministic because staging is globally time-ordered and the
    // watermark delay (2 h) exceeds the join interval (1 h): when a
    // purchase arrives, every click it can match is still within the
    // state-retention horizon, so the emitted set equals the batch interval
    // join exactly (also pinned by StreamingSpec). ----
    QueryDef("stream_interval_join",
      """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ssj_ckpt_${dir.hashCode & 0x7fffffff}")
      // one micro-batch for ALL data files (the join's emitted SET is
      // batch-insensitive; fewer batches = fewer state commits, the
      // dominant cost at this scale — the staging's mtime order still
      // sequences any sentinel batches after the data)
      val stream = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 3)
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
        .withWatermark("p_ts", "2 hours")
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
        .withWatermark("c_ts", "2 hours")
      val q = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"))
        .select("user_id", "p_id", "c_id")
        .writeStream.format("memory").queryName("g_stream_ssj")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_ssj")
      }
    },

    // ---- stream-stream LEFT OUTER interval join: like the inner interval
    // join, but purchases with NO click in the preceding hour are ALSO
    // emitted (null click id) — and that emission is watermark-driven:
    // Spark holds an unmatched left row in state until the watermark
    // passes its join-interval upper bound, then evicts it and emits the
    // null-padded row. Deterministic ONLY because the DOUBLE-sentinel
    // staging pushes the final watermark past every real purchase's
    // interval AND forces one more batch to apply it (eviction uses the
    // previous batch's watermark — see joinSentinelEventsDir, including
    // why the sentinels carry REAL event types and negative user ids),
    // so every unmatched row is flushed before the AvailableNow run
    // terminates. Without the sentinels, the last ~2 h of unmatched
    // purchases would stay buffered and the sink would depend on where
    // the data happens to end. The sink filter `user_id >= 0` removes
    // the sentinels' own join rows. ----
    QueryDef("stream_outer_join",
      """SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 4) {
      val src = joinSentinelEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_soj_ckpt_${dir.hashCode & 0x7fffffff}")
      // all 3 data files in ONE batch; the two sentinel files (stamped
      // later) stay their own watermark-advancing batches — the emitted
      // set is identical, at half the state commits
      val stream = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 3)
      val purchases = stream.withWatermark("ts", "2 hours")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val clicks = stream.withWatermark("ts", "2 hours")
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val q = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "left_outer")
        .select("user_id", "p_id", "c_id")
        .writeStream.format("memory").queryName("g_stream_soj")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_soj").filter(col("user_id") >= 0)
      }
    },

    // ---- stream-stream FULL OUTER interval join: both unmatched sides
    // emit on eviction — purchases with no click in the preceding hour
    // (null c_id) AND clicks followed by no purchase within the hour
    // (null p_id). Same dual-sentinel determinism argument as the left
    // outer join, applied symmetrically: each side's state evicts when
    // the watermark passes its interval bound, and the second sentinel
    // batch applies the first's watermark. COALESCE recovers the shared
    // key from whichever side is present; sentinels (negative user ids)
    // filter out at the sink. ----
    QueryDef("stream_full_outer_join",
      """SELECT COALESCE(p.user_id, c.user_id) AS user_id,
        |  p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 4) {
      val src = joinSentinelEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_foj_ckpt_${dir.hashCode & 0x7fffffff}")
      // all 3 data files in ONE batch (see the left outer join note)
      val stream = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 3)
      val purchases = stream.withWatermark("ts", "2 hours")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      val clicks = stream.withWatermark("ts", "2 hours")
        .filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val q = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "full_outer")
        .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
          col("p_id"), col("c_id"))
        .writeStream.format("memory").queryName("g_stream_foj")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_foj").filter(col("user_id") >= 0)
      }
    },

    // ---- STREAM-STATIC broadcast join (stateless enrichment — the most
    // common production streaming shape): each micro-batch of purchases
    // joins the static customer dimension; no watermark and NO STATE at
    // all (the static side is re-planned per batch, broadcast at this
    // size). Sink = exactly the batch join. ----
    QueryDef("stream_static_join",
      """SELECT e.event_id, e.ts, CAST(e.user_id AS BIGINT) AS user_id,
        |  CAST(c.c_nationkey AS INTEGER) AS nation
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'""".stripMargin) { (s, dir) =>
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dim_ckpt_${dir.hashCode & 0x7fffffff}")
      val dim = broadcast(Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")))
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
        .filter(col("event_type") === "purchase")
        .join(dim, col("user_id") === col("c_custkey"))
        .select(col("event_id"), col("ts"),
          col("user_id").cast("long").as("user_id"),
          col("c_nationkey").cast("int").as("nation"))
        .writeStream.format("memory").queryName("g_stream_dim")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_dim")
    },

    // ---- foreachBatch UPSERT sink (the CDC "apply changes" pattern): each
    // micro-batch MERGES into a keyed parquet store — union with the
    // current state, keep the latest row per user (the native top-k
    // operator, k=1), atomically swap directories. Deterministic because
    // latest-per-key merge is associative and insensitive to batch
    // boundaries: the final store equals the batch latest-state compaction
    // regardless of how the stream was chunked. ----
    QueryDef("stream_upsert_sink",
      """SELECT CAST(user_id AS BIGINT) AS user_id, ts,
        |  CAST(event_id AS BIGINT) AS event_id, event_type, value
        |FROM (SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnk
        |  FROM events) t WHERE rnk = 1""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ups_ckpt_${dir.hashCode & 0x7fffffff}")
      val store = cleanScratch(s, s"stream_ups_store_${dir.hashCode & 0x7fffffff}")
      val conf = s.sparkContext.hadoopConfiguration
      val storePath = new org.apache.hadoop.fs.Path(store)
      val fs = storePath.getFileSystem(conf)
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
        .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            val cols = Seq("user_id", "ts", "event_id", "event_type", "value")
            val incoming = batch.selectExpr(cols: _*)
            val merged =
              if (fs.exists(storePath))
                s.read.parquet(store).unionByName(incoming)
              else incoming
            val latest = graft.operators.TopK.perGroup(merged,
              Seq("user_id"), Seq("ts" -> false, "event_id" -> false), k = 1)
            // materialize to a sibling dir, then swap via TWO RENAMES (the
            // old store moves aside before the new one moves in — a
            // delete-then-rename would lose the whole store if the process
            // died between the two; the remaining rename-pair window is
            // what a transactional lakehouse MERGE target closes fully)
            val tmp = new org.apache.hadoop.fs.Path(store + "__tmp")
            latest.write.mode("overwrite").parquet(tmp.toString)
            val old = new org.apache.hadoop.fs.Path(store + "__old")
            if (fs.exists(old)) fs.delete(old, true)
            if (fs.exists(storePath))
              require(fs.rename(storePath, old), s"rename aside failed: $storePath")
            require(fs.rename(tmp, storePath), s"rename in failed: $tmp")
            fs.delete(old, true)
          }
          (): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(store)
        .select(col("user_id").cast("long").as("user_id"), col("ts"),
          col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value"))
      }
    },

    // ---- stream-static ANTI join (incremental dedup against a HISTORICAL
    // corpus): arriving events whose key already exists in the static
    // "previously ingested" set are dropped — stateless (no watermark/state
    // store; the static side broadcasts), the streaming twin of
    // dedup_incremental's batch anti-join. Static set here = the lower half
    // of the user key space (half the MAX user id, so the gate splits
    // non-trivially at every scale factor). ----
    QueryDef("stream_dedup_static",
      """SELECT CAST(event_id AS BIGINT) AS event_id, ts,
        |  CAST(user_id AS BIGINT) AS user_id, event_type
        |FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                  WHERE c.c_custkey = e.user_id
        |                    AND c.c_custkey < (SELECT MAX(user_id) / 2 FROM events))""".stripMargin) { (s, dir) =>
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dedupst_ckpt_${dir.hashCode & 0x7fffffff}")
      val half = Tables.load(s, dir, "events")
        .agg((max(col("user_id")) / 2).as("h")).head().getDouble(0)
      val seen = broadcast(Tables.load(s, dir, "customer")
        .filter(col("c_custkey") < half).select(col("c_custkey")))
      val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
        .join(seen, col("user_id") === col("c_custkey"), "left_anti")
        .select(col("event_id").cast("long").as("event_id"), col("ts"),
          col("user_id").cast("long").as("user_id"), col("event_type"))
        .writeStream.format("memory").queryName("g_stream_dedupst")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_dedupst")
    },

    // ---- TRUE streaming sessionization through flatMapGroupsWithState:
    // state carries open sessions across micro-batches; emitted sessions =
    // gaps-and-islands sessions minus each user's final one (never flushed
    // — see EventStreams.sessionize emission semantics). ----
    QueryDef("stream_sessionize",
      """WITH x AS (SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
        |y AS (SELECT user_id, ts, value,
        |    SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x),
        |sess AS (SELECT CAST(user_id AS BIGINT) AS user_id, MIN(ts) AS session_start,
        |    MAX(ts) AS session_end,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM y GROUP BY user_id, sid),
        |last AS (SELECT user_id, MAX(session_start) AS session_start FROM sess GROUP BY user_id)
        |SELECT s.* FROM sess s
        |LEFT JOIN last l ON s.user_id = l.user_id AND s.session_start = l.session_start
        |WHERE l.user_id IS NULL""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 8) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_sess_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = EventStreams.sessionize(
          EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
            .as[EventStreams.Event], 30L * 60 * 1000)
        .writeStream.format("memory").queryName("g_stream_sess")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_sess")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"),
          col("total_value").cast("decimal(18,2)").cast("double").as("total_value"))
      }
    },

    // ---- transformWithState (Spark 4's arbitrary-stateful-processing
    // API, RocksDB-backed): per-user running (count, cents) ValueState,
    // one cumulative row emitted per (user, batch-with-input) in update
    // mode. Deterministic because the staging fixes the file→batch
    // mapping (global (ts, event_id) order split in thirds) and the fold
    // is order-insensitive within a batch; the oracle reconstructs the
    // same batches with a ROW_NUMBER over the identical order and the
    // identical integer thresholds (Scala's `(i+1)*n/3` = floor = `//`),
    // then prefix-sums per user. The RocksDB provider conf is scoped to
    // this gate and restored (transformWithState refuses the default
    // HDFS-backed store). ----
    // State partitioning: 2 (not the shared 8) — the keyed state is
    // per-user and tiny, and every extra partition is a whole RocksDB
    // instance opened + committed PER MICRO-BATCH; at 4 batches the
    // store-lifecycle cost dominates the fold itself (measured: 8→2
    // partitions cut the gate ~35% with identical output; the outer-join
    // audit found the same shape). Changelog checkpointing replaces the
    // per-commit full-snapshot upload with an append-only delta — the
    // production-correct setting for frequent small commits.
    QueryDef("stream_tws_running",
      """WITH r AS (SELECT user_id, value,
        |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER () AS n FROM events),
        |bt AS (SELECT user_id, value,
        |    CASE WHEN rn <= n // 3 THEN 0
        |         WHEN rn <= (2 * n) // 3 THEN 1 ELSE 2 END AS bi FROM r),
        |c AS (SELECT user_id, bi, CAST(COUNT(*) AS BIGINT) AS bn,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS bc
        |  FROM bt GROUP BY user_id, bi)
        |SELECT CAST(user_id AS BIGINT) AS user_id,
        |  CAST(SUM(bn) OVER (PARTITION BY user_id ORDER BY bi) AS BIGINT) AS n_events,
        |  CAST(SUM(bc) OVER (PARTITION BY user_id ORDER BY bi) AS BIGINT) AS sum_cents
        |FROM c""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_tws_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(new EventStreams.RunningStatsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream.format("memory").queryName("g_stream_tws")
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_tws")
      }
    },

    // ---- transformWithState with MAP state (keyed sub-state): per user,
    // event_type → count entries updated individually; each batch with
    // input emits the user's DISTINCT-types-so-far (map size — order-
    // insensitive, so within-batch row order cannot change the output).
    // Oracle: first-batch-of-each-type ≤ current batch, counted per
    // (user, batch-with-input), using the same deterministic thirds
    // split as stream_tws_running. Rows are (user, n_types) WITHOUT the
    // batch id (the processor does not know batch numbers); duplicate
    // rows across no-new-type batches are part of the expected multiset.
    // ----
    QueryDef("stream_tws_distinct",
      """WITH r AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER () AS n FROM events),
        |bt AS (SELECT user_id, event_type,
        |    CASE WHEN rn <= n // 3 THEN 0
        |         WHEN rn <= (2 * n) // 3 THEN 1 ELSE 2 END AS bi FROM r),
        |firsts AS (SELECT user_id, event_type, MIN(bi) AS fb
        |  FROM bt GROUP BY user_id, event_type),
        |batches AS (SELECT DISTINCT user_id, bi FROM bt)
        |SELECT CAST(b.user_id AS BIGINT) AS user_id,
        |  CAST(COUNT(*) AS INTEGER) AS n_types
        |FROM batches b JOIN firsts f
        |  ON f.user_id = b.user_id AND f.fb <= b.bi
        |GROUP BY b.user_id, b.bi""".stripMargin) { (s, dir) =>
      // 1 state partition (vs the family's 2): after the ValueState
      // rewrite the per-event work is a set union in memory, so the gate's
      // cost IS the store lifecycle — one RocksDB instance opened+committed
      // per micro-batch instead of two. Keyed output is partition-count-
      // insensitive.
      withStatePartitions(s, 1) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_twsd_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(new EventStreams.DistinctTypesProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream.format("memory").queryName("g_stream_twsd")
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_twsd")
      }
    },

    // ---- transformWithState with EVENT-TIME TIMERS (round-7): session
    // close by inactivity timer. Each batch folds rows into per-user
    // session state (inline close + emit when the 30-min gap is exceeded)
    // and re-points ONE timer at the session end + gap; when the watermark
    // passes it, handleExpiredTimer emits the session and clears state —
    // so the FINAL dangling sessions flush too, the exact hole
    // stream_sessionize's oracle must carve out (it excludes each user's
    // last session; this oracle is plain batch sessionization, every
    // session included — batch-structure-insensitive). Sentinel rows only
    // advance the watermark (filtered after the watermark node, before
    // the typed processor); double sentinel so the last timers fire
    // before AvailableNow terminates. Exact integer cents. ----
    QueryDef("stream_tws_timer_sessions",
      """WITH x AS (SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
        |y AS (SELECT user_id, ts, value,
        |    SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT CAST(user_id AS BIGINT) AS user_id, MIN(ts) AS session_start,
        |  MAX(ts) AS session_last, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM y GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = dualSentinelEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_twst_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        // Sentinels must REACH the watermark operator: a pre-watermark
        // row filter pushes down into the scan and silently freezes the
        // watermark (debugged this round: the last ~2.5 h of sessions'
        // timers never fired). So sentinel rows flow through the
        // processor — their null value coalesced for the typed encoder,
        // their user -1 sessions dropped from the OUTPUT, where the
        // filter cannot push through the stateful operator.
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .withWatermark("ts", "2 hours")
          .withColumn("value", coalesce(col("value"), lit(0.0)))
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new EventStreams.TimerSessionProcessor(30L * 60 * 1000000),
            org.apache.spark.sql.streaming.TimeMode.EventTime(),
            org.apache.spark.sql.streaming.OutputMode.Append())
          .toDF()
          .filter(col("user_id") >= 0)
          .writeStream.format("memory").queryName("g_stream_twst")
          .outputMode("append").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_twst")
      }
    },

    // ---- STREAMING ANN SERVING (round-7): a stream of query vectors
    // answered against the static indexed corpus — the online-serving twin
    // of sim_ann_lsh (whose SQL is this gate's oracle verbatim). Each
    // micro-batch of queries computes its LSH bucket, probes the
    // BROADCAST bucketed corpus (stateless stream-static equi-join, no
    // state store), and foreachBatch ranks top-3 per query — legal there
    // because the batch is a plain DataFrame, and exact because every
    // query appears in exactly one batch (batching carries no semantics).
    // The 100 TB shape: corpus-side buckets are the index; queries only
    // ever touch their bucket. ----
    QueryDef("stream_ann_serve", Pipeline.simAnnLsh(graft.functions.DuckDialect)) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val F = graft.functions.Formulas
      val d = graft.functions.SparkDialect
      val dim = 64 // TESTDATA embeddings dimension (Pipeline.DIM)
      val src = stagedEmbQueriesDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ann_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_ann_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      // the indexed corpus is computed ONCE (localCheckpoint): without it
      // every micro-batch re-runs the norm/bucket folds over the whole
      // corpus and re-builds the broadcast (measured 4.5s -> 3.2s)
      val static = broadcast(emb.selectExpr("vec_id AS nid", "embedding AS ev",
        s"${F.norm(d, "embedding", dim)} AS en",
        s"${F.lshBucket(d, "embedding", dim, 8)} AS bkt")
        .localCheckpoint())
      val q = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .selectExpr("vec_id AS qid", "embedding AS qv",
          s"${F.norm(d, "embedding", dim)} AS qn",
          s"${F.lshBucket(d, "embedding", dim, 8)} AS bkt")
        .join(static, "bkt")
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          when(col("qn") * col("en") > 0,
            expr("graft_dot(qv, ev)") / (col("qn") * col("en")))
            .otherwise(lit(0.0)).as("score"))
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          bdf.withColumn("rnk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("qid")
                .orderBy(col("score").desc, col("nid"))))
            .filter(col("rnk") <= 3)
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("qid").cast("long").as("qid"), col("nid").cast("long").as("nid"),
          col("score"), col("rnk").cast("long").as("rnk"))
    },

    // ---- STREAMING ANN INDEX MAINTENANCE (round-8): the upsert twin of
    // stream_ann_serve — there the corpus is static; here the CORPUS is
    // the stream. Each micro-batch of late-arriving vectors merges into a
    // bucket-partitioned parquet index (foreachBatch append — the
    // bucket-keyed layout a production store compacts per bucket), then
    // the STATIC query set re-probes the refreshed index, so vectors that
    // arrived in batch b appear in version-b results and not before. The
    // oracle replays the arrival schedule relationally: version v's index
    // = vectors with vec_id % 3 < v. 100 TB shape: merge is append-only
    // per bucket partition (no rewrite of the existing index), serving
    // prunes to the query's bucket partition; per-batch bucket/norm folds
    // run over the BATCH only. ----
    QueryDef("stream_ann_upsert", annUpsertOracle) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val src = stagedEmbCorpusDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_annu_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_annu_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_annu_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      val (queries, qParts) = annQueryState(s, dir, idxDir)
      val q = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          annUpsertBatch(queries, qParts, idxDir, out)(b, id) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      annReadOut(s, out)
    },

    // ---- ANN-UPSERT CHECKPOINT RESTART (round-10): exactly-once for the
    // SECOND store family — the vector index. Pass 1 drains arrival file 0
    // into the bucket-partitioned store and serves version 1; then files 1
    // and 2 land (file 0 still present) and a NEW query restarts from the
    // SAME checkpoint: no re-append of file 0's vectors (the store would
    // double and every later version's top-k could tie-break differently),
    // no replayed version-1 output. Oracle = stream_ann_upsert's verbatim
    // (exactly-once means identical final output); the shared batch body
    // guarantees both gates run the same per-batch plan. ----
    QueryDef("stream_ann_restart", annUpsertOracle) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val staged = stagedEmbCorpusDir(s, dir)
      val src = cleanScratch(s, s"stream_anr_src_${dir.hashCode & 0x7fffffff}")
      val ckpt = cleanScratch(s, s"stream_anr_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_anr_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_anr_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      val (queries, qParts) = annQueryState(s, dir, idxDir)
      def drainOnce(): Unit = {
        val q = s.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            annUpsertBatch(queries, qParts, idxDir, out)(b, id) }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      landArrival(s, staged, src, 0)
      drainOnce()                            // version 1, then clean stop
      landArrival(s, staged, src, 1)
      landArrival(s, staged, src, 2)         // file 0 REMAINS present
      drainOnce()                            // versions 2, 3 — no replay
      annReadOut(s, out)
    },

    // ---- STREAMING INDEX DELETION (round-9): the right-to-be-forgotten
    // twin of stream_ann_upsert — the INDEX is static, DELETE requests are
    // the stream. Each micro-batch of tombstones merges into the tombstone
    // store FIRST (a delete takes effect in its own version), then the
    // static query set re-serves: the precomputed bucket-pruned candidate
    // scores (static × static, computed ONCE) minus the accumulated
    // tombstones — per-batch work is one anti-join + rank, never a rescore.
    // Oracle replays deletion visibility relationally (version v excludes
    // deletes with vec_id % 3 < v). 100 TB shape: tombstones are a tiny
    // id set (broadcast anti-join at serve; compaction folds them into the
    // index offline); the candidate relation is the serving index itself.
    QueryDef("stream_ann_delete", {
      val dd = graft.functions.DuckDialect
      val F = graft.functions.Formulas
      val dim = 64
      val cos = s"CASE WHEN qn * en > 0 THEN (${F.dot(dd, "qv", "ev", dim)}) / (qn * en) ELSE 0.0 END"
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${F.norm(dd, "embedding", dim)} AS nrm,
         |    ${F.lshBucket(dd, "embedding", dim, 8)} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn, bkt FROM e
         |  WHERE vec_id % 50 = 0),
         |del AS (SELECT vec_id AS did, vec_id % 3 AS m FROM embeddings
         |  WHERE vec_id % 97 = 0),
         |vs AS (SELECT unnest(range(1, 4)) AS version),
         |scored AS (SELECT vs.version, q.qid, e.nid, $cos AS score
         |  FROM vs CROSS JOIN q
         |  JOIN (SELECT vec_id AS nid, embedding AS ev, nrm AS en, bkt FROM e) e
         |    ON q.bkt = e.bkt AND e.nid <> q.qid
         |  LEFT JOIN del ON del.did = e.nid AND del.m < vs.version
         |  WHERE del.did IS NULL)
         |SELECT CAST(version AS BIGINT) AS version, CAST(qid AS BIGINT) AS qid,
         |  CAST(nid AS BIGINT) AS nid, score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT version, qid, nid, score,
         |    ROW_NUMBER() OVER (PARTITION BY version, qid ORDER BY score DESC, nid) AS rnk
         |  FROM scored) s
         |WHERE rnk <= 3""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val F = graft.functions.Formulas
      val d = graft.functions.SparkDialect
      val dim = 64
      val src = stagedEmbDeletesDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_adel_ckpt_${dir.hashCode & 0x7fffffff}")
      val tombDir = cleanScratch(s, s"stream_adel_tomb_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_adel_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      // static index × static queries: the full bucket-pruned candidate
      // scores are computed ONCE; every version re-serves from this
      // relation minus tombstones
      val e = emb.selectExpr("vec_id AS nid", "embedding AS ev",
        s"${F.norm(d, "embedding", dim)} AS en",
        s"${F.lshBucket(d, "embedding", dim, 8)} AS bkt")
      val queries = emb.filter(col("vec_id") % 50 === 0)
        .selectExpr("vec_id AS qid", "embedding AS qv",
          s"${F.norm(d, "embedding", dim)} AS qn",
          s"${F.lshBucket(d, "embedding", dim, 8)} AS bkt")
      val scored = queries.join(e, "bkt")
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          when(col("qn") * col("en") > 0,
            expr("graft_dot(qv, ev)") / (col("qn") * col("en")))
            .otherwise(lit(0.0)).as("score"))
        .localCheckpoint()
      // tombstone store on the shared IndexStore layout: one bucket —
      // tombstones are a tiny id set, read whole at serve (compaction
      // folds them into the index offline at scale)
      val delSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          emb.schema("vec_id").dataType)))
      val tombStore = new graft.streaming.IndexStore(s, tombDir, "vec_id", 1)
      val q = s.readStream
        .schema(delSchema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          // merge tombstones FIRST: a delete takes effect in its version
          tombStore.appendBatch(bdf.select(col("vec_id")), batchId)
          val tombs = tombStore.readAll(tombStore.batchSchema(delSchema))
            .select(col("vec_id").as("__del"))
          scored.join(tombs, col("nid") === col("__del"), "left_anti")
            .withColumn("rnk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("qid")
                .orderBy(col("score").desc, col("nid"))))
            .filter(col("rnk") <= 3)
            .select(lit(batchId + 1).cast("long").as("version"),
              col("qid").cast("long").as("qid"),
              col("nid").cast("long").as("nid"),
              col("score"), col("rnk").cast("long").as("rnk"))
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("qid").cast("long").as("qid"), col("nid").cast("long").as("nid"),
          col("score"), col("rnk").cast("long").as("rnk"))
    },

    // ---- TOMBSTONE GC (round-10): the offline compaction job that closes
    // the deletion story — stream_ann_delete's tombstones are LOGICAL (an
    // anti-join at every serve, forever); right-to-be-forgotten is only
    // discharged when the bytes are physically gone. The store is built
    // through the SAME appendBatch path the upsert stream uses (identical
    // batch=i/bucket=v layout), tombstones accumulate, then ONE GC pass
    // rewrites ONLY the tombstoned keys' bucket partitions (survivors
    // materialized read-before-delete, older generations of those buckets
    // dropped, one compacted generation written) — untouched buckets'
    // files are never read or rewritten, so GC cost tracks the deleted-key
    // subset, not the store size. The serve afterwards needs NO anti-join:
    // oracle = plain LSH top-3 over the survivor corpus. StreamingSpec
    // pins the physical claims (store row count = N − deleted, zero
    // deleted ids on disk, untouched buckets byte-identical, post-GC serve
    // == pre-GC tombstone-anti-join serve). ----
    QueryDef("stream_ann_gc", {
      val dd = graft.functions.DuckDialect
      val F = graft.functions.Formulas
      val dim = 64
      val cos = s"CASE WHEN qn * en > 0 THEN (${F.dot(dd, "qv", "ev", dim)}) / (qn * en) ELSE 0.0 END"
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${F.norm(dd, "embedding", dim)} AS nrm,
         |    ${F.lshBucket(dd, "embedding", dim, 8)} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn, bkt FROM e
         |  WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, e.nid, $cos AS score
         |  FROM q
         |  JOIN (SELECT vec_id AS nid, embedding AS ev, nrm AS en, bkt FROM e
         |        WHERE vec_id % 97 <> 0) e
         |    ON q.bkt = e.bkt AND e.nid <> q.qid)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT qid, nid, score,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
         |  FROM scored) s
         |WHERE rnk <= 3""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val F = graft.functions.Formulas
      val d = graft.functions.SparkDialect
      val idxDir = cleanScratch(s, s"stream_agc_idx_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      val store = new graft.streaming.IndexStore(s, idxDir, "bkt", 8)
      val rows = emb.selectExpr("vec_id AS nid", "embedding AS ev",
        s"${F.norm(d, "embedding", 64)} AS en",
        s"CAST(${F.lshBucket(d, "embedding", 64, 8)} AS LONG) AS bkt")
      Seq(0, 1, 2).foreach { i =>
        store.appendBatch(rows.filter(col("nid") % 3 === i), i.toLong)
      }
      val tombs = emb.filter(col("vec_id") % 97 === 0)
        .selectExpr("vec_id AS nid",
          s"CAST(${F.lshBucket(d, "embedding", 64, 8)} AS LONG) AS bkt")
      store.gcCompact(tombs, "nid", rows.schema, gcBatchId = 3L)
      val (queries, qParts) = annQueryState(s, dir, idxDir)
      store.readBatches(store.batchSchema(rows.schema), qParts)
        .join(queries, "bkt")
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          when(col("qn") * col("en") > 0,
            expr("graft_dot(qv, ev)") / (col("qn") * col("en")))
            .otherwise(lit(0.0)).as("score"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("score").desc, col("nid"))))
        .filter(col("rnk") <= 3)
        .select(col("qid").cast("long").as("qid"),
          col("nid").cast("long").as("nid"),
          col("score"), col("rnk").cast("long").as("rnk"))
    },

    // ---- STORE GENERATION COMPACTION (round-10): the small-files half
    // of streaming-store maintenance (stream_ann_gc is the deletion
    // half). Per-batch appends are the right WRITE shape (no rewrite of
    // prior state) but the wrong READ shape after enough batches: every
    // probe opens one file per generation per bucket. The offline
    // compaction folds all generations into one (content bit-identical,
    // spec-pinned file-count drop); the serve afterwards is the plain
    // bucket-pruned LSH top-3 — oracle = the full-corpus serve relation.
    QueryDef("stream_store_compact", {
      val dd = graft.functions.DuckDialect
      val F = graft.functions.Formulas
      val dim = 64
      val cos = s"CASE WHEN qn * en > 0 THEN (${F.dot(dd, "qv", "ev", dim)}) / (qn * en) ELSE 0.0 END"
      s"""WITH e AS (SELECT vec_id, embedding,
         |    ${F.norm(dd, "embedding", dim)} AS nrm,
         |    ${F.lshBucket(dd, "embedding", dim, 8)} AS bkt FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qv, nrm AS qn, bkt FROM e
         |  WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.qid, e.nid, $cos AS score
         |  FROM q
         |  JOIN (SELECT vec_id AS nid, embedding AS ev, nrm AS en, bkt FROM e) e
         |    ON q.bkt = e.bkt AND e.nid <> q.qid)
         |SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
         |  score, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT qid, nid, score,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rnk
         |  FROM scored) s
         |WHERE rnk <= 3""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val F = graft.functions.Formulas
      val d = graft.functions.SparkDialect
      val idxDir = cleanScratch(s, s"stream_cmp_idx_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      val store = new graft.streaming.IndexStore(s, idxDir, "bkt", 8)
      val rows = emb.selectExpr("vec_id AS nid", "embedding AS ev",
        s"${F.norm(d, "embedding", 64)} AS en",
        s"CAST(${F.lshBucket(d, "embedding", 64, 8)} AS LONG) AS bkt")
      Seq(0, 1, 2).foreach { i =>
        store.appendBatch(rows.filter(col("nid") % 3 === i), i.toLong)
      }
      store.compactGenerations(rows.schema, gcBatchId = 3L)
      val (queries, qParts) = annQueryState(s, dir, idxDir)
      store.readBatches(store.batchSchema(rows.schema), qParts)
        .join(queries, "bkt")
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          when(col("qn") * col("en") > 0,
            expr("graft_dot(qv, ev)") / (col("qn") * col("en")))
            .otherwise(lit(0.0)).as("score"))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("score").desc, col("nid"))))
        .filter(col("rnk") <= 3)
        .select(col("qid").cast("long").as("qid"),
          col("nid").cast("long").as("nid"),
          col("score"), col("rnk").cast("long").as("rnk"))
    },

    // ---- STREAMING IVF-PQ INDEX MAINTENANCE (round-9): the upsert path
    // for the SECOND index family — at 100 TB you retrain centroids rarely
    // but upsert PQ codes constantly. The model (coarse centroids + PQ
    // codebooks, trained once on the corpus with the sim_ivf_pq Lloyd
    // chains) is static broadcast-sized state; each micro-batch of
    // late-arriving vectors is quantized, lane-exploded, assigned to its
    // nearest coarse cell, PQ-encoded (all batch-sized, per-vector work),
    // and append-merged into the cell-keyed code store; then the STATIC
    // query set re-serves by ADC against the refreshed store — vectors
    // that arrived in batch b appear in version-b results and not before.
    // The oracle replays arrival relationally (version v's candidates =
    // vec_id % 3 < v over the full-corpus encode — per-vector assignment
    // is independent of arrival, so batch-wise and corpus-wide encodes are
    // bit-identical). 100 TB shape: store rows are M-code tuples keyed by
    // cell; the serve is probe(cell)-pruned + an M-lookup ADC join, never
    // full vectors; merge is append-only. ----
    QueryDef("stream_ivfpq_upsert", {
      val dd = graft.functions.DuckDialect
      s"""WITH ${Pipeline.quantCte(dd)}, x AS (${Pipeline.duckPqX}),
         |${Pipeline.ivf2CoarseCtes(dd, "x")},
         |${Pipeline.pqTrainCtes(dd, "x", "pq", 8, 8)},
         |${Pipeline.pqAssignCtes(dd, "x", "pq", 2, "pqc2")},
         |${Pipeline.ivfPqServeStaticCtes(dd, "x", "cvc2", "pqc2")},
         |cand AS (SELECT p.qid, a.vec_id AS nid
         |  FROM probe p JOIN cva2 a ON a.cid = p.cid WHERE a.vec_id <> p.qid),
         |vs AS (SELECT unnest(range(1, 4)) AS version),
         |vadc AS (SELECT vs.version, cd.qid, cd.nid,
         |    CAST(SUM(l.pd) AS BIGINT) AS adist
         |  FROM vs JOIN cand cd ON cd.nid % 3 < vs.version
         |  JOIN pqa2 a ON a.vec_id = cd.nid
         |  JOIN lut l ON l.qid = cd.qid AND l.m = a.m AND l.cid = a.cid
         |  GROUP BY vs.version, cd.qid, cd.nid)
         |SELECT CAST(version AS BIGINT) AS version, CAST(qid AS BIGINT) AS qid,
         |  CAST(nid AS BIGINT) AS nid, adist, CAST(rnk AS BIGINT) AS rnk
         |FROM (SELECT version, qid, nid, adist,
         |    ROW_NUMBER() OVER (PARTITION BY version, qid ORDER BY adist, nid) AS rnk
         |  FROM vadc) r
         |WHERE rnk <= 5""".stripMargin
    }) { (s, dir) =>
      val d = graft.functions.SparkDialect
      val src = stagedEmbCorpusDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ipu_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_ipu_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_ipu_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      emb.createOrReplaceTempView("embeddings")
      // ---- static model state, trained ONCE on the corpus (the production
      // cadence: centroids retrain rarely, codes upsert constantly) —
      // disk-memoized per dataset, so timed runs measure the serve path ----
      stagedModel(s, dir, "ipumodel") {
        s.sql(s"WITH ${Pipeline.quantCte(d)} SELECT vec_id, qv FROM qz")
          .localCheckpoint().createOrReplaceTempView("graft_ipu_qz")
        s.sql("SELECT vec_id, posexplode(qv) AS (i, x) FROM graft_ipu_qz")
          .localCheckpoint().createOrReplaceTempView("graft_ipu_x")
        // two-level auto-K coarse model: BOTH levels' centroids are model
        // state (the per-batch encode routes super-then-sub)
        val k0 = Pipeline.autoCoarseCells(s.table("graft_ipu_qz").count()).toString
        val coarse = Pipeline.ivf2CoarseCtes(d, "graft_ipu_x", k0)
        val s1c2 = s.sql(s"WITH $coarse SELECT cid, m, i, c FROM s1c2")
          .localCheckpoint()
        s1c2.createOrReplaceTempView("graft_ipu_s1c2")
        val cvc2 = s.sql(s"WITH $coarse SELECT cid, m, i, c FROM cvc2")
          .localCheckpoint()
        cvc2.createOrReplaceTempView("graft_ipu_cvc2")
        val pqc2 = s.sql(s"WITH ${Pipeline.pqTrainCtes(d, "graft_ipu_x", "pq", 8, 8)} SELECT cid, m, i, c FROM pqc2")
          .localCheckpoint()
        pqc2.createOrReplaceTempView("graft_ipu_pqc2")
        // query-side serve state: cell probes (nq×3) and the ADC lookup
        // table (nq×M×K) — broadcast-sized, computed once
        val serveCtes = Pipeline.ivfPqServeStaticCtes(
          d, "graft_ipu_x", "graft_ipu_cvc2", "graft_ipu_pqc2")
        Seq(
          "graft_ipu_s1c2" -> s1c2,
          "graft_ipu_cvc2" -> cvc2,
          "graft_ipu_pqc2" -> pqc2,
          "graft_ipu_probe" -> s.sql(s"WITH $serveCtes SELECT qid, cid FROM probe"),
          "graft_ipu_lut" -> s.sql(s"WITH $serveCtes SELECT qid, m, cid, pd FROM lut"))
      }
      // the code store is partitioned BY CELL (raw-key IndexStore layout:
      // the cell domain is model-sized), and the probe set is STATIC — so
      // the prunable cell subset is known ONCE, before the stream starts;
      // every batch's serve reads only those partitions instead of the
      // whole accumulated store (the bandStoreProbe fix, applied to the
      // second index family)
      val probeCells = new graft.streaming.IndexStore(s, idxDir, "cell", 0)
        .partsOf(s.table("graft_ipu_probe").select(col("cid").as("cell")))
      val q = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          // 1. encode THE BATCH: quantize + lane-explode + nearest-cell
          //    assign + PQ-encode against the broadcast-sized centroids
          bdf.createOrReplaceTempView("graft_ipu_b")
          ss.sql(
            s"""WITH ${Pipeline.quantCte(d, "graft_ipu_b")}
               |SELECT vec_id, posexplode(qv) AS (i, x) FROM qz""".stripMargin)
            .localCheckpoint().createOrReplaceTempView("graft_ipu_bx")
          val codes = ss.sql(
            s"""WITH ${Pipeline.ivf2EncodeCtes(d, "graft_ipu_bx",
                  "graft_ipu_s1c2", "graft_ipu_cvc2")},
               |${Pipeline.pqAssignCtes(d, "graft_ipu_bx", "pq", 2, "graft_ipu_pqc2")}
               |SELECT c.vec_id AS nid, c.cid AS cell, p.m, p.cid
               |FROM cva2 c JOIN pqa2 p ON p.vec_id = c.vec_id""".stripMargin)
          // 2. merge: append-only into the cell-partitioned store (per-cell
          //    directories; nothing existing is rewritten). The store
          //    handle binds to the BATCH session: the temp view below must
          //    land in the catalog the per-batch SQL resolves against.
          val codeStore = new graft.streaming.IndexStore(ss, idxDir, "cell", 0)
          codeStore.appendBatch(codes, batchId)
          // 3. serve: static probes × the refreshed store's PROBED CELLS
          //    ONLY (partition-pruned read — serve cost tracks probe-cell
          //    volume, not store size) — cell equi-join + M-lookup ADC,
          //    exactly the sim_ivf_pq scoring arithmetic
          codeStore.readBatches(codeStore.batchSchema(codes.schema), probeCells)
            .createOrReplaceTempView("graft_ipu_store")
          ss.sql(
            """SELECT p.qid, st.nid, CAST(SUM(l.pd) AS BIGINT) AS adist
              |FROM graft_ipu_probe p
              |JOIN graft_ipu_store st ON st.cell = p.cid AND st.nid <> p.qid
              |JOIN graft_ipu_lut l ON l.qid = p.qid AND l.m = st.m AND l.cid = st.cid
              |GROUP BY p.qid, st.nid""".stripMargin)
            .withColumn("rnk", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("qid")
                .orderBy(col("adist"), col("nid"))))
            .filter(col("rnk") <= 5)
            .select(lit(batchId + 1).cast("long").as("version"),
              col("qid").cast("long").as("qid"), col("nid").cast("long").as("nid"),
              col("adist"), col("rnk").cast("long").as("rnk"))
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("qid").cast("long").as("qid"), col("nid").cast("long").as("nid"),
          col("adist"), col("rnk").cast("long").as("rnk"))
    },

    // ---- STREAMING MINI-BATCH K-MEANS (round-9, Sculley 2010 shape):
    // the CENTROIDS themselves as maintained streaming state — the third
    // index-maintenance family after the LSH band store (keys) and the
    // IVF-PQ code store (codes). Seeds are an offline snapshot (the
    // corpus's KM lowest vec_ids, the kmeansBodySql convention); each
    // micro-batch assigns its vectors to the CURRENT centroids (exact
    // int64 milli-unit argmin — the pqAssignCtes recurrence), folds the
    // batch's per-cluster lane sums + counts into cumulative state, and
    // re-derives centroids as exact truncating integer means (the
    // pqTrainCtes divide discipline), emitting the post-update centroids
    // as that batch's version. The oracle replays the identical
    // 3-batch recurrence relationally (arrival = vec_id % 3). Clusters
    // that have received no vectors hold their seed centroid. 100 TB
    // shape: state is model-sized (KM × DIM sums + counts, never
    // corpus-sized); per batch = one broadcast-sized centroid join over
    // batch lanes + one map-side-combinable aggregate; assignment work is
    // batch-bounded. ----
    streamKmeansUpdateDef,
    streamTopkHhDef,

    // ---- STREAMING CEP (round-8): the view→click→purchase within-window
    // pattern as per-key transformWithState — two longs of state per user,
    // emit on match. The oracle is the BATCH funnel's per-conversion
    // relation: the processor folds the identical running-max recurrence
    // over the identical (ts, event_id) total order (staging is globally
    // time-ordered across batches; within a batch the processor sorts), so
    // the multisets agree exactly. 100 TB shape: state O(1) per user, one
    // shuffle on user_id per batch, no joins. ----
    QueryDef("stream_funnel_match",
      s"""WITH ${Pipeline.eventsFunnelChainCtes(graft.functions.DuckDialect)}
         |SELECT CAST(user_id AS BIGINT) AS user_id,
         |  CAST(tus AS BIGINT) AS purchase_us,
         |  CAST(tus - chain_view AS BIGINT) AS span_us
         |FROM f""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_cep_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new EventStreams.FunnelProcessor(Pipeline.FunnelWindowMicros),
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream.format("memory").queryName("g_stream_cep")
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_cep")
        .select(col("user_id").cast("long").as("user_id"),
          col("purchase_us").cast("long").as("purchase_us"),
          col("span_us").cast("long").as("span_us"))
      }
    },

    // ---- STREAMING A/B READOUT (round-10): the experiment metrics
    // pipeline as it actually runs — one Welch readout PER MICRO-BATCH
    // over everything seen so far. Per batch: one map-side-combinable
    // per-arm aggregate over the BATCH only (n, Σx, Σx² in exact integer
    // cents), appended to a 2-rows-per-batch partials store; the cumulative
    // readout is a sum over that store (model-sized: arms × batches), a
    // 2-row pivot, and the shared Welch scalar tree. No corpus re-scan,
    // no state store — the model IS the per-arm sums. Oracle replays each
    // version as the batch formula over the first v time-ordered thirds
    // (the staging's own row-number boundaries); integer sums are
    // associative, so cumulative = prefix bit-for-bit. ----
    QueryDef("stream_ab_test", Pipeline.eventsAbTestVersionedOracle) { (s, dir) =>
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_sab_ckpt_${dir.hashCode & 0x7fffffff}")
      val pdir = cleanScratch(s, s"stream_sab_m_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_sab_out_${dir.hashCode & 0x7fffffff}")
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          bdf.createOrReplaceTempView("graft_sab_b")
          ss.sql(
            s"""SELECT arm, ${Pipeline.abMomentAggs}
               |FROM (SELECT ${Pipeline.abArmSelect} FROM graft_sab_b) b
               |GROUP BY arm""".stripMargin)
            .sinkBatch(pdir, batchId)
          ss.read.parquet(pdir).createOrReplaceTempView("graft_sab_parts")
          ss.sql(
            s"""SELECT CAST(${batchId + 1} AS BIGINT) AS version,
               |  ${Pipeline.welchReadoutCols}
               |FROM (SELECT ${Pipeline.abPivotCols}
               |  FROM (SELECT arm, CAST(SUM(n) AS BIGINT) AS n,
               |      CAST(SUM(sx) AS BIGINT) AS sx,
               |      CAST(SUM(sxx) AS DECIMAL(25,0)) AS sxx
               |    FROM graft_sab_parts GROUP BY arm) m) w""".stripMargin)
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
          col("mean_a_cents"), col("mean_b_cents"), col("lift_cents"),
          col("welch_z"))
    },

    // ---- STREAMING RETENTION COHORTS (round-10): cohort bookkeeping as
    // per-user transformWithState — two longs of state per user (first-seen
    // time, highest age-day emitted). Because staging is globally
    // time-ordered, t0 is final on first sight and age-days are
    // non-decreasing, so emitting on `age > maxEmitted` yields each
    // occurring (user, age_day) EXACTLY once — the emitted increments ARE
    // the batch gate's DISTINCT (user, age) relation, and the final
    // matrix is one aggregate over them (the global cohort epoch = min
    // emitted t0). Batch-equivalent by construction; oracle = the batch
    // retention gate verbatim. 100 TB shape: O(1) state/user, one shuffle
    // on user_id per batch, matrix-sized output aggregate. ----
    QueryDef("stream_retention_cohorts",
      Pipeline.eventsRetentionCohorts(graft.functions.DuckDialect)) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ret_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new EventStreams.RetentionProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream.format("memory").queryName("g_stream_ret")
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_ret").createOrReplaceTempView("graft_ret_hits")
      s.sql(
        """SELECT CAST((t0_us - g.g0) div 86400000000 AS BIGINT) AS cohort_day,
          |  CAST(age_day AS BIGINT) AS age_day,
          |  CAST(COUNT(*) AS BIGINT) AS active_users
          |FROM graft_ret_hits
          |CROSS JOIN (SELECT MIN(t0_us) AS g0 FROM graft_ret_hits) g
          |GROUP BY 1, 2""".stripMargin)
      }
    },

    // ---- STREAMING SCD2 MAINTENANCE as CDC (round-10): the warehouse
    // dimension-history loop — each arriving event closes its user's open
    // row (emit valid_to) and opens its own (emit the insert). State =
    // ONE open row per user (transformWithState); the emitted change
    // stream, applied close-over-open, reconstructs the batch events_scd2
    // relation exactly (spec-pinned). Oracle replays opens (= all events)
    // and closes (= events with a successor) relationally. 100 TB shape:
    // O(1) state/key, one user_id shuffle per batch, changes-only output
    // (the CDC contract: downstream applies deltas, never rescans). ----
    QueryDef("stream_scd2_cdc",
      """WITH ev AS (SELECT user_id, event_id, event_type, value,
        |    epoch_us(ts) AS tus,
        |    LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT 'open' AS op, CAST(user_id AS BIGINT) AS user_id,
        |  CAST(event_id AS BIGINT) AS event_id, event_type, value,
        |  CAST(tus AS BIGINT) AS valid_from_us,
        |  CAST(NULL AS BIGINT) AS valid_to_us
        |FROM ev
        |UNION ALL
        |SELECT 'close', CAST(user_id AS BIGINT), CAST(event_id AS BIGINT),
        |  event_type, value, CAST(tus AS BIGINT), CAST(nxt AS BIGINT)
        |FROM ev WHERE nxt IS NOT NULL""".stripMargin) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_scd_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_scd_out_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        // changes land in a batch-partitioned parquet sink (the replay-
        // idempotent sinkBatch), NOT a memory sink: the change stream is
        // corpus-sized, and a driver-materialized sink was the measured
        // 10× bottleneck (2.6 → 16.9s; parquet sink: tracks batch volume)
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new EventStreams.ScdCdcProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) => b.sinkBatch(out, id) }
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.read.parquet(out)
        .select(col("op"), col("user_id").cast("long").as("user_id"),
          col("event_id").cast("long").as("event_id"),
          col("event_type"), col("value"),
          col("valid_from_us").cast("long").as("valid_from_us"),
          col("valid_to_us").cast("long").as("valid_to_us"))
      }
    },

    // ---- LATE-DATA ROUTING / DEAD-LETTER QUEUE (round-10): the
    // production answer to out-of-order data that a watermark would
    // silently DROP — route it to a side sink instead, so nothing is
    // lost and the backfill job has an input. The fixture stages events
    // OUT of time order (split by user, each file spanning the full
    // range); state is ONE value (the max event time over strictly
    // earlier batches — the watermark at delay 0, replay-safe via the
    // batch-partitioned store); each arriving row routes 'late' when it
    // sits behind that mark, 'ok' otherwise, and the two routes land in
    // separate sinks. Oracle replays the arrival split relationally.
    // 100 TB shape: O(1) state, one scalar read + one map-side routing
    // predicate per batch — no shuffle at all. ----
    QueryDef("stream_late_dlq",
      """WITH ev AS (SELECT event_id, ts, user_id % 3 AS m FROM events),
        |wm AS (SELECT m, MAX(ts) AS mx FROM ev GROUP BY m),
        |prior AS (SELECT a.m, MAX(b.mx) AS wm FROM wm a
        |  JOIN wm b ON b.m < a.m GROUP BY a.m)
        |SELECT CAST(ev.m + 1 AS BIGINT) AS version,
        |  CAST(ev.event_id AS BIGINT) AS event_id,
        |  CASE WHEN p.wm IS NOT NULL AND ev.ts < p.wm
        |    THEN 'late' ELSE 'ok' END AS route
        |FROM ev LEFT JOIN prior p ON p.m = ev.m""".stripMargin) { (s, dir) =>
      val src = stagedEventsByUserDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dlq_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_dlq_out_${dir.hashCode & 0x7fffffff}")
      val dlq = cleanScratch(s, s"stream_dlq_side_${dir.hashCode & 0x7fffffff}")
      val okd = cleanScratch(s, s"stream_dlq_ok_${dir.hashCode & 0x7fffffff}")
      val wmd = cleanScratch(s, s"stream_dlq_wm_${dir.hashCode & 0x7fffffff}")
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          // the watermark state: ONE value — max event time of strictly
          // earlier batches (replay-safe: a replayed batch recomputes the
          // identical mark)
          val prior: Option[Any] =
            if (batchId == 0) None
            else Option(ss.read.parquet(wmd).filter(col("batch") < batchId)
              .agg(max("mx")).collect()(0).get(0))
          val routed = bdf.withColumn("route",
            prior.map(w => when(col("ts") < lit(w), "late").otherwise("ok"))
              .getOrElse(lit("ok")))
            .localCheckpoint()
          routed.filter(col("route") === "late").drop("route")
            .sinkBatch(dlq, batchId)
          routed.filter(col("route") === "ok").drop("route")
            .sinkBatch(okd, batchId)
          routed.select(lit(batchId + 1).cast("long").as("version"),
            col("event_id").cast("long").as("event_id"), col("route"))
            .sinkBatch(out, batchId)
          bdf.agg(max("ts").as("mx")).sinkBatch(wmd, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("event_id").cast("long").as("event_id"), col("route"))
    },

    // ---- STREAMING ANOMALY DETECTION (round-10): the events_anomaly
    // rolling z-score as per-user transformWithState — state is a 6-long
    // ring (the trailing 5 cents values), O(1) per key regardless of
    // history; each batch folds its rows in (ts, event_id) order and
    // emits the >= 2-sigma flags with the batch gate's exact arithmetic.
    // Globally time-ordered staging makes the fold order the global order,
    // so the emitted relation is batch-equivalent by construction: oracle
    // = the batch SQL verbatim. ----
    QueryDef("stream_anomaly",
      Pipeline.eventsAnomaly(graft.functions.DuckDialect)) { (s, dir) =>
      withStatePartitions(s, 2) {
      import s.implicits._
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_anm_ckpt_${dir.hashCode & 0x7fffffff}")
      withRocksDb(s) {
        val q = EventStreams.readEventStream(s, src, maxFilesPerTrigger = 1)
          .as[EventStreams.Event]
          .groupByKey(_.user_id)
          .transformWithState(
            new EventStreams.AnomalyProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(),
            org.apache.spark.sql.streaming.OutputMode.Update())
          .toDF()
          .writeStream.format("memory").queryName("g_stream_anom")
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      s.table("g_stream_anom")
        .select(col("event_id").cast("long").as("event_id"),
          col("user_id").cast("long").as("user_id"),
          col("value_cents").cast("long").as("value_cents"), col("zscore"))
      }
    },

    // ---- STREAMING FREQUENCY SKETCH (round-10): count-min over the event
    // stream — the 100 TB way to track per-key frequencies WITHOUT
    // per-key state. The sketch is a fixed 3×256 integer counter matrix
    // whose update is an associative sum — mergeable across batches,
    // executors, and days — so the maintained state is model-sized no
    // matter how many distinct keys flow past (per-key exact counts would
    // be key-cardinality state, the thing that dies first at scale). Each
    // micro-batch folds its own (row, cell) counts into the partials
    // store; the STATIC probe set (user_id % 37 = 0) then reads its
    // point-frequency estimates: est = MIN over the 3 rows' accumulated
    // cells — an upper bound on the true count, exact when no key
    // collides with the probe in all 3 rows. Exact BIGINT arithmetic in
    // both engines; the oracle replays the prefix-batch recurrence
    // relationally. ----
    QueryDef("stream_cms_freq",
      s"""WITH kh AS (SELECT user_id,
         |    ${F2.cmsHash(graft.functions.DuckDialect, "user_id")} AS h
         |  FROM (SELECT DISTINCT user_id FROM events) k),
         |ev AS (SELECT e.user_id, kh.h,
         |    ROW_NUMBER() OVER (ORDER BY e.ts, e.event_id) AS rn,
         |    COUNT(*) OVER () AS nn
         |  FROM events e JOIN kh ON kh.user_id = e.user_id),
         |vs AS (SELECT CAST(1 AS BIGINT) AS version
         |  UNION ALL SELECT 2 UNION ALL SELECT 3),
         |rr AS (SELECT CAST(0 AS BIGINT) AS r
         |  UNION ALL SELECT 1 UNION ALL SELECT 2),
         |cells AS (SELECT vs.version, rr.r,
         |    ${F2.cmsCellFromHash(graft.functions.DuckDialect, "ev.h", "rr.r")} AS cell, COUNT(*) AS c
         |  FROM vs JOIN ev ON ev.rn <= (vs.version * ev.nn) // 3
         |  CROSS JOIN rr GROUP BY 1, 2, 3),
         |probes AS (SELECT user_id, h FROM kh WHERE user_id % 37 = 0),
         |pc AS (SELECT user_id, rr.r, ${F2.cmsCellFromHash(graft.functions.DuckDialect, "h", "rr.r")} AS cell
         |  FROM probes CROSS JOIN rr)
         |SELECT vs.version, CAST(pc.user_id AS BIGINT) AS user_id,
         |  CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS est
         |FROM vs CROSS JOIN pc
         |LEFT JOIN cells c
         |  ON c.version = vs.version AND c.r = pc.r AND c.cell = pc.cell
         |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_cms_ckpt_${dir.hashCode & 0x7fffffff}")
      val pdir = cleanScratch(s, s"stream_cms_m_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_cms_out_${dir.hashCode & 0x7fffffff}")
      Tables.load(s, dir, "events").createOrReplaceTempView("events")
      // static probe set + its 3 sketch cells per key — broadcast model state
      val probes = s.sql(
        s"""SELECT user_id, r, ${F2.cmsCellFromHash(graft.functions.SparkDialect, "h", "r")} AS cell
           |FROM (SELECT user_id, ${F2.cmsHash(graft.functions.SparkDialect, "user_id")} AS h
           |      FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 37 = 0) p0) p
           |CROSS JOIN (SELECT explode(array(CAST(0 AS BIGINT), 1, 2)) AS r) rr"""
          .stripMargin).localCheckpoint()
      probes.createOrReplaceTempView("graft_cms_probes")
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          bdf.createOrReplaceTempView("graft_cms_b")
          // hash the batch's DISTINCT keys (key-cardinality work), then
          // join back — the md5 fold per EVENT row was the measured cost
          ss.sql(
            s"""WITH kh AS (SELECT user_id,
               |    ${F2.cmsHash(graft.functions.SparkDialect, "user_id")} AS h
               |  FROM (SELECT DISTINCT user_id FROM graft_cms_b) k)
               |SELECT r, ${F2.cmsCellFromHash(graft.functions.SparkDialect, "h", "r")} AS cell, COUNT(*) AS c
               |FROM graft_cms_b e JOIN kh ON kh.user_id = e.user_id
               |CROSS JOIN (SELECT explode(array(CAST(0 AS BIGINT), 1, 2)) AS r) rr
               |GROUP BY 1, 2""".stripMargin)
            .sinkBatch(pdir, batchId)
          ss.read.parquet(pdir).createOrReplaceTempView("graft_cms_parts")
          ss.sql(
            s"""SELECT CAST(${batchId + 1} AS BIGINT) AS version,
               |  CAST(p.user_id AS BIGINT) AS user_id,
               |  CAST(MIN(COALESCE(sk.c, 0)) AS BIGINT) AS est
               |FROM graft_cms_probes p
               |LEFT JOIN (SELECT r, cell, SUM(c) AS c FROM graft_cms_parts
               |           GROUP BY r, cell) sk
               |  ON sk.r = p.r AND sk.cell = p.cell
               |GROUP BY p.user_id""".stripMargin)
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("user_id").cast("long").as("user_id"),
          col("est").cast("long").as("est"))
    },

    // ---- STREAMING CARDINALITY SKETCH (round-10): HyperLogLog-shaped
    // distinct-user count as maintained state — 64 registers, each the MAX
    // of a rank statistic, so the per-batch update is an associative MAX
    // (the mergeability that makes HLL THE distinct-count at 100 TB:
    // register vectors union across batches, partitions, and datasets
    // with no key state). Hash = one md5-backed 31-bit fold; register j =
    // low 6 bits, rank = 25 − bit_length of the next 24 bits (bit_length
    // via an exact shift-OR smear + bit_count — no float log anywhere).
    // The readout keeps the harmonic sum EXACT: Z = Σ 2^(25−M[j]) as
    // BIGINT, and the only float op is one final literal-constant
    // multiply/divide — bit-identical cross-engine. Oracle replays the
    // prefix-batch recurrence. ----
    QueryDef("stream_hll_distinct", {
      val d = graft.functions.DuckDialect
      s"""WITH ev AS (SELECT user_id,
         |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         |    COUNT(*) OVER () AS nn FROM events),
         |vs AS (SELECT CAST(1 AS BIGINT) AS version
         |  UNION ALL SELECT 2 UNION ALL SELECT 3),
         |du AS (SELECT vs.version, ev.user_id
         |  FROM vs JOIN ev ON ev.rn <= (vs.version * ev.nn) // 3
         |  GROUP BY 1, 2),
         |hh AS (SELECT version, ${hllHash(d, "user_id")} AS h FROM du),
         |hw AS (SELECT version, h % 64 AS j,
         |    ${d.shiftRight("h", "6")} % 16777216 AS w FROM hh),
         |regs AS (SELECT version, j, MAX(${hllRho(d, "w")}) AS m
         |  FROM hw GROUP BY 1, 2),
         |js AS (SELECT unnest(range(0, 64)) AS j),
         |full0 AS (SELECT vs.version, js.j, COALESCE(r.m, 0) AS m
         |  FROM vs CROSS JOIN js
         |  LEFT JOIN regs r ON r.version = vs.version AND r.j = js.j),
         |agg AS (SELECT version,
         |  CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
         |  CAST(SUM(${d.shiftLeft1("25 - m")}) AS BIGINT) AS z_sum
         |FROM full0 GROUP BY version)
         |SELECT version, n_active, z_sum,
         |  $HllAlphaScale / CAST(z_sum AS DOUBLE) AS hll_est,
         |  ${graft.functions.Formulas.hllEstimateCorrected(d, "z_sum", "n_active")} AS hll_corrected
         |FROM agg""".stripMargin
    }) { (s, dir) =>
      val d = graft.functions.SparkDialect
      val src = stagedEventsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_hll_ckpt_${dir.hashCode & 0x7fffffff}")
      val pdir = cleanScratch(s, s"stream_hll_m_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_hll_out_${dir.hashCode & 0x7fffffff}")
      val schema = s.read.parquet(src).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          bdf.createOrReplaceTempView("graft_hll_b")
          // MAX over registers is idempotent — hash the batch's DISTINCT
          // keys only (key-cardinality work, never per-event)
          ss.sql(
            s"""WITH hh AS (SELECT ${hllHash(d, "user_id")} AS h
               |  FROM (SELECT DISTINCT user_id FROM graft_hll_b) k),
               |hw AS (SELECT h % 64 AS j,
               |    ${d.shiftRight("h", "6")} % 16777216 AS w FROM hh)
               |SELECT j, MAX(${hllRho(d, "w")}) AS m
               |FROM hw GROUP BY j""".stripMargin)
            .sinkBatch(pdir, batchId)
          ss.read.parquet(pdir).createOrReplaceTempView("graft_hll_parts")
          ss.sql(
            s"""WITH regs AS (SELECT j, MAX(m) AS m FROM graft_hll_parts
               |    GROUP BY j),
               |full0 AS (SELECT js.j, COALESCE(r.m, 0) AS m
               |  FROM (SELECT explode(sequence(0, 63)) AS j) js
               |  LEFT JOIN regs r ON r.j = js.j),
               |agg AS (SELECT
               |  CAST(SUM(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
               |  CAST(SUM(${d.shiftLeft1("25 - m")}) AS BIGINT) AS z_sum
               |FROM full0)
               |SELECT CAST(${batchId + 1} AS BIGINT) AS version,
               |  n_active, z_sum,
               |  $HllAlphaScale / CAST(z_sum AS DOUBLE) AS hll_est,
               |  ${graft.functions.Formulas.hllEstimateCorrected(d, "z_sum", "n_active")} AS hll_corrected
               |FROM agg""".stripMargin)
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("n_active").cast("long").as("n_active"),
          col("z_sum").cast("long").as("z_sum"), col("hll_est"),
          col("hll_corrected"))
    },

    // ---- STREAMING INGESTION DEDUP (round-8): near-dup detection AT THE
    // INGESTION BOUNDARY — the shape a pipeline actually runs (dedup
    // against everything already accepted, not a batch re-scan). Each
    // micro-batch of documents computes its MinHash/LSH band keys (the
    // dedup_minhash_lsh pipeline over the batch only), flags docs sharing
    // a band with the accumulated fingerprint STORE (prior batches) or
    // with a lower-id doc in the same batch, then merges its own bands
    // into the store. The store keeps every SEEN doc's bands (as DISTINCT
    // keys — see bandStoreProbe) — a near-dup's fingerprint differs from
    // its keeper's, and dropping it would let its own near-dups re-enter.
    // Oracle replays arrival relationally. 100 TB shape: the store is the
    // DISTINCT band-key set, hash-bucket partitioned; the dup check is one
    // equi-join on band key per batch against the batch's partition-pruned
    // store slice, the within-batch self-join is band-bounded, and
    // per-batch signature work touches the batch only. ----
    QueryDef("stream_dedup_ingest", Pipeline.ingestDedupOracle) { (s, dir) =>
      // batch-scoped shuffle width: each micro-batch runs the signature
      // pipeline over a CORPUS THIRD, and 32-wide exchanges on a few
      // thousand rows ×3 batches are pure task-launch tax (same rationale
      // as the tws gates' state width)
      withStatePartitions(s, 8) {
      val src = stagedDocsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ding_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_ding_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_ding_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      val q = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          val bands = Pipeline.ingestBands(ss, bdf).localCheckpoint()
          // ONE rival relation covers both dup rules: within-batch rows keep
          // their doc_id (earlier = lower id), store rows take rid = -1
          // (any store hit is earlier) — so `rid < doc_id` is the whole
          // predicate, and one semi-join + distinct replaces the former
          // two-distinct union
          val within = bands.select(col("bk").as("rbk"), col("doc_id").as("rid"))
          val (slice, mergeStore) = bandStoreProbe(ss, bands, idxDir, batchId)
          val rivals = slice match {
            case None     => within
            case Some(st) => within.union(
              st.select(col("bk").as("rbk"), lit(-1L).as("rid")))
          }
          val dups = bands
            .join(rivals, col("rbk") === col("bk") && col("rid") < col("doc_id"),
              "left_semi")
            .select(col("doc_id")).distinct().withColumn("__dup", lit(1L))
          bdf.select(col("doc_id"))
            .join(dups, Seq("doc_id"), "left")
            .select(lit(batchId + 1).cast("long").as("version"),
              col("doc_id").cast("long").as("doc_id"),
              coalesce(col("__dup"), lit(0L)).as("is_dup"))
            .sinkBatch(out, batchId)
          // store merge AFTER the check: a batch never dedups against itself
          // through the store (the within-batch rule handles that exactly)
          mergeStore()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"),
          col("is_dup").cast("long").as("is_dup"))
      }
    },

    // ---- STREAMING INGEST E2E (round-8): the production ingestion
    // pipeline at the streaming boundary — each document micro-batch is
    // quality-gated (text_quality's keep predicate), survivors are
    // near-dup-checked against the ACCEPTED-band store (the
    // stream_dedup_ingest semi-join), and only quality-passing docs' bands
    // enter the store (a quality-reject never pollutes dedup state). One
    // status row per doc per batch: 'quality' | 'dup' | 'ok'. 100 TB
    // shape: per-batch signature work is batch-sized, the store probe is a
    // band-key equi-join against the partition-pruned distinct-key store
    // (bandStoreProbe), quality is a pure Column predicate. ----
    QueryDef("stream_ingest_e2e", Pipeline.ingestE2eOracle) { (s, dir) =>
      withStatePartitions(s, 8) {
      val src = stagedDocsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_ie2e_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_ie2e_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_ie2e_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      val q = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) => ingestE2eBatch(idxDir, out)(b, id) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"), col("status"))
      }
    },

    // ---- CHECKPOINT-RESTART / EXACTLY-ONCE (round-10, verdict item): the
    // SAME ingestion pipeline, killed after its first micro-batch and
    // RESTARTED FROM THE CHECKPOINT with the already-processed file still
    // present in the source directory — the recovery path every production
    // ingest exercises. Pass 1 sees only arrival file 0 and drains it
    // (batch 0); then files 1 and 2 land and a NEW query starts on the
    // SAME checkpoint: the file-source log must skip file 0 (no replay,
    // no duplicate statuses, no double-inserted band keys) and continue
    // batch numbering at 1. The gate's output is oracle-compared to the
    // single-run result (ingestE2eOracle — identical by exactly-once), and
    // StreamingSpec additionally asserts the band STORE equals the
    // single-run store (no dup keys, no loss). ----
    QueryDef("stream_ingest_restart", Pipeline.ingestE2eOracle) { (s, dir) =>
      withStatePartitions(s, 8) {
      val staged = stagedDocsDir(s, dir)
      val src = cleanScratch(s, s"stream_irs_src_${dir.hashCode & 0x7fffffff}")
      val ckpt = cleanScratch(s, s"stream_irs_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_irs_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_irs_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      def land(i: Int): Unit = landArrival(s, staged, src, i)
      def drainOnce(): Unit = {
        val q = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) => ingestE2eBatch(idxDir, out)(b, id) }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      land(0)
      drainOnce()                // pass 1: batch 0 only, then clean stop
      land(1); land(2)           // file 0 REMAINS present
      drainOnce()                // restart from ckpt: batches 1, 2 — no replay
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"), col("status"))
      }
    },

    // ---- STREAMING LEARNED FILTER (round-9): the batch-trained quality
    // classifier applied at the INGESTION boundary — train the hashed-
    // feature linear probe OFFLINE on the static corpus (the
    // text_quality_classifier GD chain, exact integer fixed-point), then
    // score each arriving micro-batch against the BROADCAST 65-row weight
    // relation and admit at the 0.5 decision boundary. The model-handoff
    // pattern every production ingest runs: retrain rarely in batch,
    // serve per batch at hash+dot cost. Per-batch work = one batch-sized
    // feature aggregate + a broadcast join; no state store at all
    // (the model IS the state, and it is read-only at serve time).
    // Oracle: weights are arrival-independent (trained on the full
    // corpus), so the full-corpus chain + the doc_id%3 schedule replays
    // every version exactly. ----
    QueryDef("stream_learned_filter", Pipeline.learnedFilterOracle) { (s, dir) =>
      val src = stagedDocsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_lf_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_lf_out_${dir.hashCode & 0x7fffffff}")
      // the model-handoff contract: retrain rarely in batch, serve per
      // batch — the trained weight relation is disk-memoized model state
      stagedModel(s, dir, "lfmodel") {
        Seq("graft_lf_w" -> Pipeline.qcTrainWeights(s, dir))
      }
      val docs = Tables.load(s, dir, "documents")
      val q = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          bdf.createOrReplaceTempView("graft_lf_batch")
          Pipeline.learnedFilterScore(ss, "graft_lf_batch", "graft_lf_w")
            .select(lit(batchId + 1).cast("long").as("version"),
              col("doc_id").cast("long").as("doc_id"),
              col("score_micro"), col("admitted"))
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"),
          col("score_micro"), col("admitted"))
    },

    // ---- STREAMING DECONTAMINATION (round-10): the third admission stage
    // of a production ingest (after quality and near-dup) — flag arriving
    // TRAINING docs that share any word-3-shingle with the static EVAL
    // split. Model state = the eval split's distinct shingles + their
    // bloom filter (benchmark-sized, disk-memoized like every trained
    // model); per batch the arriving docs' shingles are bloom-prefiltered
    // MAP-SIDE (graft_might_contain — no false negatives, so the exact
    // join still sees every true hit and removes false positives), then
    // exact-joined against the eval set. Per-doc hits are independent of
    // other training docs, so each doc reports once, in its arrival
    // version — the oracle replays versions relationally (doc_id % 3 + 1).
    // 100 TB shape: the corpus-sized side is touched once per batch
    // (batch-sized), shuffled only at the bloom's pass rate. ----
    QueryDef("stream_decontaminate", {
      val dd = graft.functions.DuckDialect
      s"""WITH sh AS (${Pipeline.shingleExplode(dd)}),
         |eval AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         |hits AS (SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_hits
         |  FROM sh JOIN eval ON sh.s = eval.s
         |  WHERE sh.doc_id % 20 <> 0
         |  GROUP BY sh.doc_id)
         |SELECT CAST(doc_id % 3 + 1 AS BIGINT) AS version,
         |  CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(n_hits AS BIGINT) AS n_eval_ngrams
         |FROM hits""".stripMargin
    }) { (s, dir) =>
      graft.functions.VectorExpressions.register(s)
      val d = graft.functions.SparkDialect
      val src = stagedDocsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_sdc_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_sdc_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      docs.createOrReplaceTempView("documents")
      stagedModel(s, dir, "sdcmodel") {
        val evalSh = s.sql(
          s"""SELECT DISTINCT s FROM (${Pipeline.shingleExplode(d)}) sh
             |WHERE doc_id % 20 = 0""".stripMargin)
        evalSh.createOrReplaceTempView("graft_sdc_eval_build")
        val bloom = s.sql(
          """SELECT graft_bloom_agg(xxhash64(s),
            |    CAST(20000 AS BIGINT), CAST(400000 AS BIGINT)) AS bf
            |FROM graft_sdc_eval_build""".stripMargin)
        Seq("graft_sdc_eval" -> evalSh, "graft_sdc_bloom" -> bloom)
      }
      val q = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          bdf.createOrReplaceTempView("graft_sdc_b")
          ss.sql(
            s"""WITH sh AS (${Pipeline.shingleExplode(d, "graft_sdc_b")}),
               |cand AS (SELECT doc_id, s FROM sh
               |  WHERE doc_id % 20 <> 0
               |    AND graft_might_contain((SELECT bf FROM graft_sdc_bloom),
               |          xxhash64(s))),
               |hits AS (SELECT cand.doc_id, COUNT(DISTINCT cand.s) AS n_hits
               |  FROM cand JOIN graft_sdc_eval ev ON cand.s = ev.s
               |  GROUP BY cand.doc_id)
               |SELECT CAST(${batchId + 1} AS BIGINT) AS version,
               |  CAST(doc_id AS BIGINT) AS doc_id,
               |  CAST(n_hits AS BIGINT) AS n_eval_ngrams
               |FROM hits""".stripMargin)
            .sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"),
          col("n_eval_ngrams").cast("long").as("n_eval_ngrams"))
    },

    // ---- MULTIMODAL INGESTION BOUNDARY (round-10): image near-dup
    // screening AT INGEST — the pipeline shape a vision corpus actually
    // runs: every arriving image is decoded ONCE (real PNG codec,
    // executor-side), aHashed, band-keyed (4×16-bit bands of the 64-bit
    // hash), checked against the accumulated band STORE (everything
    // already seen) plus lower-id same-batch arrivals with a Hamming ≤ 10
    // verify, then its own bands merge into the store. The fixture
    // re-crawls content under many arrival ids (pixels keyed by
    // doc_id % 97), so genuine exact and near duplicates arrive in later
    // batches. Oracle replays arrival relationally (batch = doc_id % 3)
    // with every hash bit rebuilt from the pixel generator formula. 100 TB
    // shape: decode + hash are one executor pass over the BATCH, the dup
    // check is a band equi-join against the store's partition-pruned
    // bucket slice, and the store is bucket-partitioned appends — per-batch
    // cost tracks the batch, never the corpus. ----
    QueryDef("stream_image_ingest", imageIngestOracle) { (s, dir) =>
      val src = stagedDocsDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_img_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_img_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_img_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      // batch 0 probes BEFORE the first append: an empty store is a valid
      // state, but the directory must exist for the explicit-schema read
      new org.apache.hadoop.fs.Path(idxDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(idxDir))
      val q = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (b: DataFrame, id: Long) =>
          imageIngestBatch(idxDir, out)(b, id) }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"), col("status"))
    },

    // ---- IMAGE-INGEST CHECKPOINT RESTART (round-10): exactly-once for
    // the MULTIMODAL store family — the fourth restart gate. Pass 1
    // drains arrival file 0 (decode + hash + store merge), then files 1
    // and 2 land with file 0 still present and a NEW query restarts from
    // the SAME checkpoint: no re-decode or re-append of file 0's bands
    // (the compacted store would stay correct — the anti-join — but the
    // version-1 statuses must not replay), and the later batches dedup
    // against exactly the state the single run saw. Oracle =
    // stream_image_ingest's verbatim; the shared batch body guarantees
    // both gates run the same per-batch plan. ----
    QueryDef("stream_image_restart", imageIngestOracle) { (s, dir) =>
      val staged = stagedDocsDir(s, dir)
      val src = cleanScratch(s, s"stream_imr_src_${dir.hashCode & 0x7fffffff}")
      val ckpt = cleanScratch(s, s"stream_imr_ckpt_${dir.hashCode & 0x7fffffff}")
      val idxDir = cleanScratch(s, s"stream_imr_idx_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_imr_out_${dir.hashCode & 0x7fffffff}")
      val docs = Tables.load(s, dir, "documents")
      new org.apache.hadoop.fs.Path(idxDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .mkdirs(new org.apache.hadoop.fs.Path(idxDir))
      def drainOnce(): Unit = {
        val q = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            imageIngestBatch(idxDir, out)(b, id) }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      landArrival(s, staged, src, 0)
      drainOnce()                            // version 1, then clean stop
      landArrival(s, staged, src, 1)
      landArrival(s, staged, src, 2)         // file 0 REMAINS present
      drainOnce()                            // versions 2, 3 — no replay
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("doc_id").cast("long").as("doc_id"), col("status"))
    },

    // ---- STREAMING RDF: continuous BGP match over an arriving triple
    // stream. The streamed pattern (`?c :placed ?o`) filters each
    // micro-batch; the static pattern (`?c :in_nation ?n`) is the indexed
    // graph side, broadcast once — so every new order triple emits its
    // (customer, order, nation) solutions incrementally with NO state store
    // and no shuffle (filter + broadcast hash join per batch, the streaming
    // twin of the batch BGP chain join). Result set is batch-equivalent by
    // construction: the match is stateless, so batching carries no
    // semantics. ----
    QueryDef("stream_rdf_match",
      graft.sources.RdfBridge.oracleCte + """
        |SELECT t1.Subject AS c, t1.Object AS o, t2.Object AS n
        |FROM triples t1 JOIN triples t2 ON t1.Subject = t2.Subject
        |WHERE t1.Predicate = -2 AND t2.Predicate = -31""".stripMargin) { (s, dir) =>
      import graft.core.TripleSchema
      import graft.sources.RdfBridge
      val src = stagedTriplesDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_rdf_ckpt_${dir.hashCode & 0x7fffffff}")
      val static = broadcast(RdfBridge.triples(s, dir)
        .filter(col(TripleSchema.predicate) === RdfBridge.InNation)
        .select(col(TripleSchema.subject).as("__c2"),
          col(TripleSchema.objekt).as("n")))
      val schema = RdfBridge.triples(s, dir).schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(col(TripleSchema.predicate) === RdfBridge.Placed)
        .join(static, col(TripleSchema.subject) === col("__c2"))
        .select(col(TripleSchema.subject).as("c"),
          col(TripleSchema.objekt).as("o"), col("n"))
        .writeStream.format("memory").queryName("g_stream_rdf")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_rdf")
    },

    // ---- STREAMING DSv2 (round-9): the graft-triples V2 source read as a
    // STREAM — files are the offset space, one file per micro-batch
    // (source-side throttling), Trigger.AvailableNow drains to the
    // query-start snapshot. The point predicate and 2-column projection
    // are NEGOTIATED INTO THE STREAMING READER (same ScanBuilder as the
    // batch path — SourcesSpec pins the description), so rejected lines
    // never materialize a row in any batch. Stateless filter+project ⇒
    // batching carries no semantics; oracle = the static SQL. ----
    QueryDef("stream_dsv2_triples",
      graft.sources.RdfBridge.oracleCte +
        "SELECT Subject, Object FROM triples WHERE Predicate = -2") { (s, dir) =>
      val src = stagedTripleTextDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_dsv2_ckpt_${dir.hashCode & 0x7fffffff}")
      val q = s.readStream.format("graft-triples").load(src)
        .filter(col("Subject").isNotNull && col("Predicate") === -2)
        .select("Subject", "Object")
        .writeStream.format("memory").queryName("g_stream_dsv2")
        .outputMode("append").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.table("g_stream_dsv2")
    },

    // ---- DSv2 SOURCE CHECKPOINT RESTART (round-10): exactly-once for the
    // CUSTOM source's own offset implementation — file-NAME high-water
    // marks (not indices), checkpointed and recovered across a query
    // restart. Pass 1 drains f00.txt; f01/f02 then land (f00 still
    // present) and a new query restarts from the same checkpoint: the
    // recovered mark must skip f00 (no replay) and admit exactly the two
    // new files. Oracle = the static SQL over the full corpus (the union
    // across both passes is the whole filtered set iff no line is lost or
    // doubled). ----
    QueryDef("stream_dsv2_restart",
      graft.sources.RdfBridge.oracleCte +
        "SELECT Subject, Object FROM triples WHERE Predicate = -2") { (s, dir) =>
      val staged = stagedTripleTextDir(s, dir)
      val src = cleanScratch(s, s"stream_dsv2r_src_${dir.hashCode & 0x7fffffff}")
      val ckpt = cleanScratch(s, s"stream_dsv2r_ckpt_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_dsv2r_out_${dir.hashCode & 0x7fffffff}")
      new java.io.File(src).mkdirs()
      def land(i: Int): Unit = {
        val from = new java.io.File(staged, f"f$i%02d.txt")
        java.nio.file.Files.copy(from.toPath,
          new java.io.File(src, from.getName).toPath)
      }
      def drainOnce(): Unit = {
        // memory sink refuses checkpoint recovery; foreachBatch supports it
        val q = s.readStream.format("graft-triples").load(src)
          .filter(col("Subject").isNotNull && col("Predicate") === -2)
          .select("Subject", "Object")
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.sinkBatch(out, id) }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
      }
      land(0)
      drainOnce()                 // f00 only, then clean stop
      land(1); land(2)            // f00 REMAINS present
      drainOnce()                 // restart: marks skip f00, drain f01+f02
      s.read.parquet(out).select("Subject", "Object")
    },
  )

  /** Triple TEXT staging for the streaming DSv2 gate: the corpus split
    * into three name-ordered text files (the source's offset space), each
    * written by [[graft.sources.TripleIO.writeText]] then renamed into the
    * shared directory.
    */
  private def stagedTripleTextDir(spark: SparkSession, sfDir: String): String =
    stageCache.computeIfAbsent(seedKey(spark, sfDir, "tritext"), { _ =>
      val dir = cleanScratch(spark,
        s"tritext_stream_${sfDir.hashCode & 0x7fffffff}")
      new java.io.File(dir).mkdirs()
      val all = graft.sources.RdfBridge.triples(spark, sfDir)
      val cols = all.columns.map(col)
      Seq(0, 1, 2).foreach { i =>
        val tmp = cleanScratch(spark,
          s"tritext_tmp_${sfDir.hashCode & 0x7fffffff}")
        graft.sources.TripleIO.writeText(
          all.filter(pmod(hash(cols: _*), lit(3)) === i).coalesce(1), tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-")).get
        val dst = new java.io.File(dir, f"f$i%02d.txt")
        val ok = part.renameTo(dst)
        require(ok, s"staging rename failed for $part")
        // pin strictly increasing mtimes — FileStreamSource orders by them
        dst.setLastModified(1000000000000L + i * 100000L)
      }
      dir
    })

  // -------------------------------------------- streaming top-k heavy hitters

  /** Misra-Gries summary capacity — the bounded state size. The MERGE
    * guarantee (Agarwal et al., Mergeable Summaries, PODS 2012 §3): after
    * any sequence of merges, every key's summary count undercounts its
    * true prefix frequency by at most n/(cap+1), so every key with
    * f > n/(cap+1) is PRESENT with a positive count — the SpaceSaving
    * guarantee, as a deterministic associative recurrence both engines
    * can replay. */
  private val MgCap = 8

  /** One Misra-Gries MERGE step as CTEs: fold the batch's exact counts
    * `bRel(user_id, c)` into the summary `sRel(user_id, c)` — sum by key,
    * subtract the (cap+1)-th largest combined count (0 when ≤ cap keys
    * remain), keep strictly positive survivors. Emits `${p}s(user_id, c)`
    * with ≤ cap rows. Model-sized relational algebra: the summary never
    * exceeds cap rows, the batch side is its distinct-key counts, and the
    * subtraction threshold is one window rank over ≤ cap + |batch keys|
    * rows — at 100 TB the per-batch fold is a map-side-combinable count
    * plus a broadcast-sized merge, no key-cardinality state anywhere. */
  private def mgStepCtes(bRel: String, sRel: String, p: String): String =
    s"""${p}m AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS c
       |  FROM (SELECT user_id, c FROM $sRel
       |        UNION ALL SELECT user_id, c FROM $bRel) z GROUP BY user_id),
       |${p}d AS (SELECT COALESCE(MAX(CASE WHEN rn = ${MgCap + 1} THEN c END),
       |      CAST(0 AS BIGINT)) AS d
       |  FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rn
       |        FROM ${p}m) r),
       |${p}s AS (SELECT user_id, c - ${p}d.d AS c FROM ${p}m CROSS JOIN ${p}d
       |  WHERE c - ${p}d.d > 0)""".stripMargin

  /** STREAMING TOP-K HEAVY HITTERS (round-11): "what ARE the hot keys" —
    * the question stream_cms_freq (point estimates over a STATIC probe
    * set) cannot answer. A Misra-Gries summary of capacity [[MgCap]] is
    * maintained across micro-batches via the PODS-2012 merge rule
    * (sum counts → subtract the (cap+1)-th largest → drop non-positive):
    * deterministic, associative, and state-bounded, so a replayed batch
    * reproduces its version bit-for-bit and the summary never grows past
    * cap entries no matter how many distinct keys flow by. Each version
    * emits the surviving entries ranked by summary count (a LOWER bound
    * on true frequency — the MG deduction is the documented error, at
    * most prefix_n/(cap+1)). The oracle replays the three-batch
    * recurrence relationally over the staged time-ordered thirds.
    */
  private def streamTopkHhDef: QueryDef = {
    val oracle = {
      val b = (v: Int) =>
        s"""b$v AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM ev
           |  WHERE rn > ((${v - 1} * nn) // 3) AND rn <= (($v * nn) // 3)
           |  GROUP BY user_id)""".stripMargin
      s"""WITH ev AS (SELECT user_id,
         |    ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
         |    COUNT(*) OVER () AS nn FROM events),
         |${b(1)}, ${b(2)}, ${b(3)},
         |s0 AS (SELECT CAST(NULL AS BIGINT) AS user_id,
         |    CAST(NULL AS BIGINT) AS c WHERE 1 = 0),
         |${mgStepCtes("b1", "s0", "g1")},
         |${mgStepCtes("b2", "g1s", "g2")},
         |${mgStepCtes("b3", "g2s", "g3")}
         |SELECT CAST(v AS BIGINT) AS version, CAST(user_id AS BIGINT) AS user_id,
         |  CAST(c AS BIGINT) AS mg_count,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, user_id)
         |    AS BIGINT) AS rnk
         |FROM (SELECT 1 AS v, user_id, c FROM g1s
         |      UNION ALL SELECT 2, user_id, c FROM g2s
         |      UNION ALL SELECT 3, user_id, c FROM g3s) u""".stripMargin
    }
    QueryDef("stream_topk_hh", oracle) { (s, dir) =>
      withStatePartitions(s, 8) {
        val src = stagedEventsDir(s, dir)
        val ckpt = cleanScratch(s, s"stream_hh_ckpt_${dir.hashCode & 0x7fffffff}")
        val stateDir = cleanScratch(s, s"stream_hh_state_${dir.hashCode & 0x7fffffff}")
        val out = cleanScratch(s, s"stream_hh_out_${dir.hashCode & 0x7fffffff}")
        val schema = s.read.parquet(src).schema
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .writeStream
          .foreachBatch { (bdf: DataFrame, batchId: Long) =>
            val ss = bdf.sparkSession
            bdf.createOrReplaceTempView("graft_hh_b")
            // replay-safe state read: version v{batchId} is strictly
            // earlier state — a replayed batch sees what its first
            // attempt saw and overwrites its own outputs
            val prev =
              if (batchId == 0)
                ss.sql("""SELECT CAST(NULL AS BIGINT) AS user_id,
                         |  CAST(NULL AS BIGINT) AS c WHERE 1 = 0""".stripMargin)
              else ss.read.parquet(s"$stateDir/v$batchId")
            prev.createOrReplaceTempView("graft_hh_s")
            ss.sql(
              s"""WITH bc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
                 |  FROM graft_hh_b GROUP BY user_id),
                 |${mgStepCtes("bc", "graft_hh_s", "g")}
                 |SELECT user_id, c FROM gs""".stripMargin)
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$stateDir/v${batchId + 1}")
            ss.read.parquet(s"$stateDir/v${batchId + 1}")
              .createOrReplaceTempView("graft_hh_sn")
            ss.sql(
              s"""SELECT CAST(${batchId + 1} AS BIGINT) AS version,
                 |  CAST(user_id AS BIGINT) AS user_id,
                 |  CAST(c AS BIGINT) AS mg_count,
                 |  CAST(ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rnk
                 |FROM graft_hh_sn""".stripMargin)
              .coalesce(1).sinkBatch(out, batchId)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        await(q)
        s.read.parquet(out)
          .select(col("version").cast("long").as("version"),
            col("user_id").cast("long").as("user_id"),
            col("mg_count").cast("long").as("mg_count"),
            col("rnk").cast("long").as("rnk"))
      }
    }
  }

  // -------------------------------------------- streaming mini-batch kmeans

  /** One mini-batch update step as CTEs: assign `batchRel` (a lane matrix
    * `(vec_id, i, x)`) to the centroids in `kRel` (`(cid, m, i, c)` — the
    * pqAssignCtes contract) and aggregate the batch's per-(cluster, lane)
    * milli-unit sums + member counts. Emits `${p}t(cid, i, s, n)`.
    */
  private def smkBatchCtes(d: graft.functions.Dialect, batchRel: String,
      kRel: String, p: String): String =
    s"""${Pipeline.pqAssignCtes(d, batchRel, p, 1, kRel)},
       |${p}t AS (SELECT a.cid, x.i, CAST(SUM(x.x) AS BIGINT)*1000 AS s,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM $batchRel x JOIN ${p}a1 a ON x.vec_id = a.vec_id
       |  GROUP BY a.cid, x.i)""".stripMargin

  /** Centroids from cumulative state: exact truncating integer mean over
    * `uRel(cid, i, s, n)` (the pqTrainCtes divide discipline — subtract the
    * C-semantics remainder first so floor and truncation agree across
    * engines), seed centroid where a cluster has no members yet.
    */
  private def smkCentroidSelect(d: graft.functions.Dialect, seedRel: String,
      uRel: String): String = {
    val idiv = if (d == graft.functions.SparkDialect) "div" else "//"
    s"""SELECT k.cid, k.m, k.i,
       |  CASE WHEN u.n IS NULL THEN k.c
       |       ELSE (u.s - (u.s % u.n)) $idiv u.n END AS c
       |FROM $seedRel k LEFT JOIN $uRel u ON u.cid = k.cid AND u.i = k.i""".stripMargin
  }

  private def streamKmeansUpdateDef: QueryDef = {
    val dd = graft.functions.DuckDialect
    val oracle = {
      val b = (v: Int) => s"b$v AS (SELECT vec_id, i, x FROM x WHERE vec_id % 3 = ${v - 1})"
      val vSel = (v: Int) =>
        s"""SELECT CAST($v AS BIGINT) AS version, CAST(cid AS BIGINT) AS cid,
           |  CAST(i AS BIGINT) AS i, CAST(c AS BIGINT) AS c FROM k$v""".stripMargin
      s"""WITH ${Pipeline.quantCte(dd)}, x AS (${Pipeline.duckPqX}),
         |${b(1)}, ${b(2)}, ${b(3)},
         |k0 AS (SELECT vec_id AS cid, CAST(0 AS BIGINT) AS m, i,
         |    CAST(x*1000 AS BIGINT) AS c FROM x WHERE vec_id < ${Pipeline.KM}),
         |${smkBatchCtes(dd, "b1", "k0", "m1")},
         |u1 AS (SELECT cid, i, s, n FROM m1t),
         |k1 AS (${smkCentroidSelect(dd, "k0", "u1")}),
         |${smkBatchCtes(dd, "b2", "k1", "m2")},
         |u2 AS (SELECT cid, i, CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
         |  FROM (SELECT cid, i, s, n FROM u1 UNION ALL SELECT cid, i, s, n FROM m2t) z
         |  GROUP BY cid, i),
         |k2 AS (${smkCentroidSelect(dd, "k0", "u2")}),
         |${smkBatchCtes(dd, "b3", "k2", "m3")},
         |u3 AS (SELECT cid, i, CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
         |  FROM (SELECT cid, i, s, n FROM u2 UNION ALL SELECT cid, i, s, n FROM m3t) z
         |  GROUP BY cid, i),
         |k3 AS (${smkCentroidSelect(dd, "k0", "u3")})
         |${vSel(1)} UNION ALL ${vSel(2)} UNION ALL ${vSel(3)}""".stripMargin
    }
    QueryDef("stream_kmeans_update", oracle) { (s, dir) =>
      withStatePartitions(s, 8) {
      val d = graft.functions.SparkDialect
      val src = stagedEmbCorpusDir(s, dir)
      val ckpt = cleanScratch(s, s"stream_smk_ckpt_${dir.hashCode & 0x7fffffff}")
      val stateDir = cleanScratch(s, s"stream_smk_state_${dir.hashCode & 0x7fffffff}")
      val out = cleanScratch(s, s"stream_smk_out_${dir.hashCode & 0x7fffffff}")
      val emb = Tables.load(s, dir, "embeddings")
      emb.createOrReplaceTempView("embeddings")
      // offline seed snapshot: the KM lowest vec_ids' quantized lanes
      // (model-sized — KM × DIM rows)
      s.sql(s"WITH ${Pipeline.quantCte(d)} SELECT vec_id, qv FROM qz WHERE vec_id < ${Pipeline.KM}")
        .localCheckpoint().createOrReplaceTempView("graft_smk_seedqz")
      s.sql(
        """SELECT vec_id AS cid, CAST(0 AS BIGINT) AS m, i, CAST(x*1000 AS BIGINT) AS c
          |FROM (SELECT vec_id, posexplode(qv) AS (i, x) FROM graft_smk_seedqz) t""".stripMargin)
        .localCheckpoint().createOrReplaceTempView("graft_smk_k0")
      val q = s.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream
        .foreachBatch { (bdf: DataFrame, batchId: Long) =>
          val ss = bdf.sparkSession
          // 1. quantize + lane-explode THE BATCH
          bdf.createOrReplaceTempView("graft_smk_b")
          ss.sql(
            s"""WITH ${Pipeline.quantCte(d, "graft_smk_b")}
               |SELECT vec_id, posexplode(qv) AS (i, x) FROM qz""".stripMargin)
            .localCheckpoint().createOrReplaceTempView("graft_smk_bx")
          // 2. current centroids = seeds folded with cumulative state
          //    (model-sized — KM × DIM rows; referenced once per batch, so
          //    no checkpoint: the plan inlines the tiny state read)
          val kCur =
            if (batchId == 0) ss.table("graft_smk_k0")
            else {
              ss.read.parquet(s"$stateDir/v$batchId")
                .createOrReplaceTempView("graft_smk_u")
              ss.sql(smkCentroidSelect(d, "graft_smk_k0", "graft_smk_u"))
            }
          kCur.createOrReplaceTempView("graft_smk_k")
          // 3. assign the batch, fold its sums/counts into the state
          ss.sql(
            s"""WITH ${smkBatchCtes(d, "graft_smk_bx", "graft_smk_k", "mb")}
               |SELECT cid, i, s, n FROM mbt""".stripMargin)
            .createOrReplaceTempView("graft_smk_t")
          val merged =
            if (batchId == 0) ss.table("graft_smk_t")
            else ss.sql(
              """SELECT cid, i, CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(n) AS BIGINT) AS n
                |FROM (SELECT cid, i, s, n FROM graft_smk_u
                |      UNION ALL SELECT cid, i, s, n FROM graft_smk_t) z
                |GROUP BY cid, i""".stripMargin)
          // model-sized state: one file, one task (32 near-empty shuffle
          // outputs otherwise dominate the per-batch cost)
          merged.coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v${batchId + 1}")
          // 4. emit the POST-update centroids as this batch's version
          ss.read.parquet(s"$stateDir/v${batchId + 1}")
            .createOrReplaceTempView("graft_smk_un")
          ss.sql(smkCentroidSelect(d, "graft_smk_k0", "graft_smk_un"))
            .select(lit(batchId + 1).cast("long").as("version"),
              col("cid").cast("long").as("cid"),
              col("i").cast("long").as("i"), col("c").cast("long").as("c"))
            .coalesce(1).sinkBatch(out, batchId)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      await(q)
      s.read.parquet(out)
        .select(col("version").cast("long").as("version"),
          col("cid").cast("long").as("cid"),
          col("i").cast("long").as("i"), col("c").cast("long").as("c"))
      }
    }
  }
}

package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Round-9 curation additions: hard-negative mining, triplet mining, the
  * Gopher rule battery, CCNet head/middle/tail bucketing, and the annealed
  * mixture schedule. Exact value parity vs DuckDB is the driver's t2 gate
  * (replicated by tools/oracle_check.py); these specs assert the SEMANTIC
  * properties the hash compare cannot see — label disjointness, rank
  * monotonicity, rule consistency, tercile balance, and mixture
  * flattening.
  */
class CurationSpec extends SparkTestBase {

  private def gate(name: String) = SparkEntry.queries(name)(spark, sf)

  test("emb_hard_negatives: negatives have a different label than the anchor") {
    val hn = gate("emb_hard_negatives")
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("neg_id"), col("label").as("neg_label"))
    assert(hn.join(labels, "neg_id")
      .filter(col("label") === col("neg_label")).count() == 0)
  }

  test("emb_hard_negatives: <= 3 per anchor, ranks consecutive, scores non-increasing") {
    val hn = gate("emb_hard_negatives").cache()
    assert(hn.groupBy("anchor").count().filter(col("count") > 3).count() == 0)
    // rank r per anchor is exactly 1..n (ROW_NUMBER contract)
    val ranks = hn.groupBy("anchor")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"), min("rnk").as("mn"))
    assert(ranks.filter(col("mx") =!= col("n") || col("mn") =!= 1).count() == 0)
    // score at rank 1 >= score at rank n (cosine DESC ordering)
    val s1 = hn.filter(col("rnk") === 1).select(col("anchor"), col("score").as("top"))
    val sn = hn.join(ranks.select("anchor", "mx"), "anchor")
      .filter(col("rnk") === col("mx")).select(col("anchor"), col("score").as("bot"))
    assert(s1.join(sn, "anchor").filter(col("top") < col("bot")).count() == 0)
    hn.unpersist()
  }

  test("emb_hard_negatives: mined negatives are HARDER than random negatives") {
    // the point of the upgrade over emb_negative_sample: the mined
    // negatives' mean cosine must exceed the corpus-wide cross-label mean
    // (random negatives approximate that mean by construction)
    val hn = gate("emb_hard_negatives")
    val mined = hn.agg(avg("score")).collect()(0).getDouble(0)
    assert(mined > 0.0, s"mean mined-negative cosine $mined should be clearly positive " +
      "(random cross-label pairs of this corpus center near 0)")
  }

  test("text_gopher_rules: pass is the AND of the four rules, flags are 0/1") {
    val g = gate("text_gopher_rules").cache()
    val flags = Seq("r_word_count", "r_mean_word_len", "r_stopwords", "r_repetition")
    flags.foreach { f =>
      assert(g.filter(!col(f).isin(0L, 1L)).count() == 0, s"$f must be 0/1")
    }
    val and = flags.map(col).reduce(_ * _)
    assert(g.filter(col("gopher_pass") =!= and).count() == 0)
    // the battery must discriminate on this corpus: both verdicts present
    assert(g.filter(col("gopher_pass") === 1).count() > 0)
    assert(g.filter(col("gopher_pass") === 0).count() > 0)
    g.unpersist()
  }

  test("text_ccnet_buckets: per-language terciles are balanced to within 1") {
    val b = gate("text_ccnet_buckets")
    val spread = b.groupBy("lang", "bucket").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"),
        countDistinct("bucket").as("k"))
    assert(spread.filter(col("d") > 1 || col("k") =!= 3).count() == 0,
      "NTILE(3) must yield 3 buckets per language, sizes within 1")
  }

  test("emb_triplet_mine: one triplet per anchor, correct label sides") {
    val t = gate("emb_triplet_mine").cache()
    assert(t.groupBy("anchor").count().filter(col("count") > 1).count() == 0)
    val lbl = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label").as("l2"))
    assert(t.join(lbl, col("pos_id") === col("vec_id"))
      .filter(col("label") =!= col("l2")).count() == 0, "positive must share the label")
    assert(t.join(lbl, col("neg_id") === col("vec_id"))
      .filter(col("label") === col("l2")).count() == 0, "negative must differ in label")
    assert(t.filter(col("pos_id") === col("anchor") ||
      col("neg_id") === col("anchor")).count() == 0)
    t.unpersist()
  }

  test("corpus_anneal_mixture: 4 epochs, normalized weights, annealing flattens early epochs") {
    val m = gate("corpus_anneal_mixture").cache()
    val langs = m.select("lang").distinct().count()
    assert(m.count() == 4 * langs)
    // per-epoch weights sum to 1e6 minus at most S floor losses
    val sums = m.groupBy("epoch").agg(sum("weight_micro").as("s")).collect()
    sums.foreach { r =>
      val s = r.getLong(1)
      assert(s <= 1000000L && s >= 1000000L - langs, s"epoch ${r.get(0)} sum $s")
    }
    // epoch 1 (α=0.25) is flatter than epoch 4 (α=1, natural shares)
    def spread(e: Int): Double = {
      val w = m.filter(col("epoch") === e).agg(
        max("weight_micro").cast("double"), min("weight_micro").cast("double"))
        .collect()(0)
      w.getDouble(0) / w.getDouble(1)
    }
    assert(spread(1) < spread(4), "annealing must flatten the early-epoch mixture")
    m.unpersist()
  }

  test("events_retention_cohorts: day-0 activity is each cohort's maximum") {
    val r = gate("events_retention_cohorts").cache()
    assert(r.filter(col("cohort_day") < 0 || col("age_day") < 0).count() == 0)
    val day0 = r.filter(col("age_day") === 0)
      .select(col("cohort_day"), col("active_users").as("c0"))
    val mx = r.groupBy("cohort_day").agg(max("active_users").as("mx"))
    assert(day0.join(mx, "cohort_day").filter(col("c0") =!= col("mx")).count() == 0,
      "every user is active on day 0 of their own cohort")
    r.unpersist()
  }

  test("corpus_span_corruption: token conservation and sentinel pairing") {
    val c = gate("corpus_span_corruption").cache()
    val counted = c.withColumn("in_toks", split(col("input_text"), " "))
      .withColumn("tgt_toks", split(col("target_text"), " "))
      .withColumn("in_sent", size(filter(col("in_toks"), t => t.startsWith("<x_"))))
      .withColumn("tgt_sent", size(filter(col("tgt_toks"), t => t.startsWith("<x_"))))
      .withColumn("in_plain", size(col("in_toks")) - col("in_sent"))
      .withColumn("tgt_plain", size(col("tgt_toks")) - col("tgt_sent"))
    // masked tokens all land in the target; unmasked all stay in the input
    assert(counted.filter(col("in_plain") + col("n_masked") =!= col("n_tokens")).count() == 0)
    assert(counted.filter(col("tgt_plain") =!= col("n_masked")).count() == 0)
    // one sentinel per span, mirrored between input and target
    assert(counted.filter(col("in_sent") =!= col("tgt_sent")).count() == 0)
    // the objective actually masks a meaningful fraction (~2/7 expected)
    val rate = c.agg(sum("n_masked").cast("double") / sum("n_tokens"))
      .collect()(0).getDouble(0)
    assert(rate > 0.15 && rate < 0.45, s"mask rate $rate out of range")
    c.unpersist()
  }

  test("sim_index_stats: occupancies partition the corpus, distortion non-negative") {
    val st = gate("sim_index_stats").cache()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(st.agg(sum("n_vecs")).collect()(0).getLong(0) == n,
      "every vector belongs to exactly one cell")
    assert(st.count() <= 4) // at most KM cells
    assert(st.filter(col("pq_distortion") < 0).count() == 0)
    st.unpersist()
  }

  test("corpus_fim_transform: PSM markers and token conservation") {
    val f = gate("corpus_fim_transform").cache()
    val marked = f.withColumn("toks", split(col("fim_text"), " "))
      .withColumn("markers", size(filter(col("toks"), t => t.startsWith("<fim_"))))
      .withColumn("plain", size(filter(col("toks"),
        t => !t.startsWith("<fim_") && t =!= lit(""))))
    // applied docs carry exactly the 3 PSM markers and every original token
    assert(marked.filter(col("fim_applied") === 1 && col("markers") =!= 3).count() == 0)
    assert(marked.filter(col("fim_applied") === 0 && col("markers") =!= 0).count() == 0)
    assert(marked.filter(col("plain") =!= col("n_tokens")).count() == 0,
      "FIM reorders tokens, never drops or duplicates them")
    f.unpersist()
  }

  test("corpus_preference_pairs: one pair per multi-doc source, non-negative margin") {
    val p = gate("corpus_preference_pairs").cache()
    assert(p.groupBy("source").count().filter(col("count") > 1).count() == 0)
    assert(p.filter(col("chosen_id") === col("rejected_id")).count() == 0)
    assert(p.filter(col("margin") < 0).count() == 0)
    p.unpersist()
  }

  test("corpus_length_buckets: batches of <= 8 within power-of-two buckets") {
    val b = gate("corpus_length_buckets").cache()
    assert(b.filter(col("slot") < 0 || col("slot") > 7).count() == 0)
    assert(b.groupBy("bucket", "batch_id").count().filter(col("count") > 8).count() == 0)
    // n fits its bucket: n <= 2^bucket, and n > 2^(bucket-1) above the floor bucket
    assert(b.filter(col("n_tokens") > pow(lit(2.0), col("bucket"))).count() == 0)
    assert(b.filter(col("bucket") > 3 &&
      col("n_tokens") <= pow(lit(2.0), col("bucket") - 1)).count() == 0)
    b.unpersist()
  }

  test("events_ab_test: one readout row, arms partition users, z consistent with lift") {
    val t = gate("events_ab_test").collect()
    assert(t.length == 1)
    val r = t(0)
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    assert(na + nb == n, "arms must partition all events")
    assert(na > 0 && nb > 0)
    val lift = r.getDouble(4); val z = r.getDouble(5)
    assert(lift == 0.0 && z == 0.0 || (lift > 0) == (z > 0),
      "z must carry the lift's sign")
  }

  test("text_ccnet_buckets: head scores dominate tail scores per language") {
    val b = gate("text_ccnet_buckets")
    val byB = b.groupBy("lang").pivot("bucket", Seq("head", "tail"))
      .agg(avg("lm_score_micro"))
    assert(byB.filter(col("head") <= col("tail")).count() == 0,
      "mean head lm score must exceed mean tail lm score in every language")
  }

  test("events_anomaly: flags equal an independent Scala replay of the trailing window") {
    val out = SparkEntry.queries("events_anomaly")(spark, sf)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("zscore")).toMap
    // replay: per user in (ts, event_id) order, trailing-5 exact moments
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("x"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2), r.getLong(3)))
    val expect = scala.collection.mutable.Map[Long, Double]()
    ev.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3.toString, r._1))
      for (i <- ordered.indices) {
        val win = ordered.slice(math.max(0, i - 5), i).map(_._4)
        if (win.length == 5) {
          val n = 5L
          val sx = win.sum
          val sxx = win.map(v => v * v).sum
          val x = ordered(i)._4
          val d = n * (n * sxx - sx * sx)
          if (n * sxx > sx * sx) {
            val z = (x * n - sx).toDouble / math.sqrt(d.toDouble / (n - 1))
            if (math.abs(z) >= 2.0) expect(ordered(i)._1) = z
          }
        }
      }
    }
    assert(out.keySet == expect.keySet,
      s"flag set mismatch: extra=${out.keySet -- expect.keySet}, missing=${expect.keySet -- out.keySet}")
    out.foreach { case (id, z) => assert(z == expect(id), s"z mismatch for $id") }
  }

  test("events_hll_setops: union registers dominate; intersection is inclusion-exclusion") {
    val r = SparkEntry.queries("events_hll_setops")(spark, sf).collect().head
    val (za, zb, zu) = (r.getAs[Long]("za"), r.getAs[Long]("zb"),
      r.getAs[Long]("z_union"))
    assert(zu <= math.min(za, zb),
      "union registers are per-j maxima, so the harmonic sum can only shrink")
    val (ea, eb, eu, ei) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"), r.getAs[Double]("est_intersect"))
    assert(eu >= math.max(ea, eb) && eu <= ea + eb,
      "union estimate sits between the larger side and the sum")
    assert(ei == ea + eb - eu, "intersection is exactly inclusion-exclusion")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a deterministic
  * k-means coarse quantizer partitions the corpus into `k` cells; a query
  * probes only its `nprobe` nearest cells and brute-forces within them.
  *
  * Scale shape: centroids are MODEL STATE (k × dim doubles — tiny) and live
  * on the driver/broadcast like any trained model; the corpus-side work is
  * one narrow assignment pass (broadcast centroids, argmin) and the search
  * is an equi-join on cell id — the same candidates-from-equi-join invariant
  * as the LSH/banding dedup operators. `nprobe = k` degrades gracefully to
  * exact brute force (spec-verified), giving a tunable recall/cost dial.
  *
  * Determinism: centroids initialize from the k lowest vec_ids and Lloyd
  * iterations are a fixed count with deterministic argmin tie-breaks, so
  * repeated training yields identical cells.
  */
object Ivf {

  final case class Model(centroids: Array[(Int, Array[Double])]) {
    def k: Int = centroids.length
  }

  private def toDouble(v: Seq[Float]): Array[Double] = v.map(_.toDouble).toArray

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0d; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Deterministic Lloyd k-means on the `embedding` column. */
  def train(emb: DataFrame, k: Int, iters: Int): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val data = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].rdd.map { case (id, v) => (id, toDouble(v)) }
    data.cache()

    // Seeds = the k lowest vec_ids. takeOrdered is a per-partition top-k
    // merged on the driver — no total-sort shuffle of the corpus for k rows
    // (the previous sortBy(_._1).take(k) paid one). Identical seeds.
    var centroids: Array[(Int, Array[Double])] = data
      .takeOrdered(k)(Ordering.by(_._1)).zipWithIndex
      .map { case ((_, v), i) => (i, v) }

    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val next = data
        .map { case (_, v) =>
          val cs = bc.value
          var best = 0; var bestD = Double.MaxValue
          cs.foreach { case (cid, c) =>
            val d = dist2(v, c)
            if (d < bestD || (d == bestD && cid < best)) { best = cid; bestD = d }
          }
          (best, (v, 1L))
        }
        .reduceByKey { (x: (Array[Double], Long), y: (Array[Double], Long)) =>
          val s = x._1.clone(); var i = 0
          while (i < s.length) { s(i) += y._1(i); i += 1 }
          (s, x._2 + y._2)
        }
        .mapValues { case (s, n) => s.map(_ / n) }
        .collect().sortBy(_._1)
      // keep centroids with no assigned points unchanged (stable ids)
      val updated = centroids.toMap ++ next.toMap
      centroids = updated.toArray.sortBy(_._1)
      bc.destroy()
    }
    data.unpersist()
    Model(centroids)
  }

  /** Assign each vector to its nearest centroid cell — a codegen'd
    * [[graft.functions.CentroidArgminExpr]] over the embedding column (the
    * centroid matrix is model state embedded in the expression), replacing
    * the earlier interpreted per-row closure. Same double arithmetic and
    * smallest-id tie-break: assignments are bit-identical (IvfSpec).
    */
  def assign(emb: DataFrame, model: Model): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val cell = GraftColumnBridge.column(graft.functions.CentroidArgminExpr(
      GraftColumnBridge.expression(col("embedding")),
      model.centroids.map(_._2), model.centroids.map(_._1)))
    emb.select(col("vec_id"), cell.as("cell"))
  }

  /** Top-k cosine search probing the query's `nprobe` nearest cells.
    * `queries` must have (qid, qv: array<float>). Returns
    * (qid, nid, score, rnk) with deterministic tie-breaks.
    */
  def search(emb: DataFrame, model: Model, queries: DataFrame,
      nprobe: Int, topk: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)

    val bc = spark.sparkContext.broadcast(model.centroids)
    val probes = queries.select(col("qid"), col("qv")).as[(Long, Seq[Float])]
      .flatMap { case (qid, qv) =>
        val dv = toDouble(qv)
        bc.value.map { case (cid, c) => (qid, cid, dist2(dv, c)) }
          .sortBy { case (_, cid, d) => (d, cid) }
          .take(nprobe).map { case (_, cid, _) => (qid, cid) }
      }.toDF("qid", "cell")

    val cells = assign(emb, model)
    val corpus = emb.join(cells, "vec_id")
      .select(col("vec_id").as("nid"), col("embedding").as("ev"), col("cell"))

    // zero-norm guard: a zero vector's cosine is NaN, and Spark sorts NaN as
    // the LARGEST double — unguarded it would rank as every query's top
    // neighbor. Define its score as 0 instead.
    val normProd = sqrt(expr("graft_dot(qv, qv)")) * sqrt(expr("graft_dot(ev, ev)"))
    queries.join(probes, "qid")
      .join(corpus, "cell")
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        when(normProd > 0, expr("graft_dot(qv, ev)") / normProd)
          .otherwise(lit(0.0)).as("score"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("score").desc, col("nid"))))
      .filter(col("rnk") <= topk)
  }
}

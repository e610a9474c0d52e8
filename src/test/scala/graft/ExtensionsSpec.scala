package graft

/** The SparkSessionExtensions plugin path: the shared test session is built
  * with `spark.sql.extensions=graft.GraftExtensions` (a STATIC conf, applied
  * at SparkContext creation — it cannot be added to a new session on an
  * existing context), so graft_dot must resolve without programmatic
  * registration.
  */
class ExtensionsSpec extends SparkTestBase {

  test("graft.GraftExtensions injects graft_dot at session build time") {
    val v = spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)))").head().getDouble(0)
    assert(v == 23.0)
  }

  test("injected function reports a clean type error on wrong input") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1), array(2))").head())
    assert(e.getMessage.contains("graft_dot expects (array<float>, array<float>)"))
  }

  test("BandJoinRule: an equi-key-less band join plans as a binned equi-join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = 600L
    // negatives included: the trunc-div bin cover must hold below zero too
    val probes = Seq((1L, 1000L), (2L, 2500L), (3L, 9999L), (4L, 100L))
    val builds = Seq((10L, 900L), (11L, 999L), (12L, 2400L), (13L, 2500L),
      (14L, 500L), (15L, -400L), (16L, 9999L))
    val probe = probes.toDF("pid", "p_us")
    val build = builds.toDF("bid", "b_us")
    val joined = probe.join(build,
      col("b_us") >= col("p_us") - w && col("b_us") < col("p_us"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"), s"rule did not fire:\n$physical")
    val expected = (for {
      (pid, p) <- probes; (bid, b) <- builds
      if b >= p - w && b < p
    } yield (pid, bid)).sorted
    val got = joined.select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == expected)
    // with a cross-side equality present the rule must NOT fire (the hash
    // key already exists; binning would be pure overhead)
    val keyed = probe.join(build,
      col("pid") + 9 === col("bid") &&
        col("b_us") >= col("p_us") - w && col("b_us") < col("p_us"))
    assert(!keyed.queryExecution.optimizedPlan.toString.contains("__band_bin"))
    val keyedExpected = (for {
      (pid, p) <- probes; (bid, b) <- builds
      if pid + 9 == bid && b >= p - w && b < p
    } yield (pid, bid)).sorted
    val keyedGot = keyed.select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(keyedGot.toSeq == keyedExpected)
  }
}

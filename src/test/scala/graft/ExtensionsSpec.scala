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
}

package graft.queries

import graft.{SparkEntry, SparkTestBase}

/** Smoke: every registered query runs and returns rows on sf0.001 (exact
  * value parity vs DuckDB is the driver's t2 gate; replicated locally by
  * tools/oracle_check.py).
  */
class QueriesSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has distinct, snake_case identifier") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  SparkEntry.all.foreach { q =>
    test(s"${q.name} runs non-empty on sf0.001") {
      assert(q.run(spark, sf).count() > 0, s"${q.name} returned 0 rows")
    }
  }
}

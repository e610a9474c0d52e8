package graft

import graft.sources.{Tables, TripleIO, RdfBridge}
import org.apache.spark.sql.functions._

/** DataSource V2 triple reader specs: result equivalence with the CSV
  * path, and — what the gate's hash compare cannot see — that projection
  * and predicates are genuinely negotiated INTO the reader (the scan
  * description advertises them, the output schema is the pruned one).
  */
class SourcesSpec extends SparkTestBase {

  private lazy val textDir: String = {
    val tmp = Tables.scratchDir("dsv2_spec")
    TripleIO.writeText(RdfBridge.triples(spark, sf), tmp)
    tmp
  }

  test("graft-triples full scan == readText CSV path") {
    val v2 = spark.read.format("graft-triples").load(textDir)
    val v1 = TripleIO.readText(spark, textDir)
    assert(v2.schema == v1.schema)
    assert(v2.count() == v1.count())
    assert(v2.exceptAll(v1).isEmpty && v1.exceptAll(v2).isEmpty)
  }

  test("graft-triples: filter and projection are pushed into the scan") {
    val df = spark.read.format("graft-triples").load(textDir)
      .filter(col("Predicate") === -2)
      .select("Subject", "Object")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-triples"), plan.take(500))
    assert(plan.contains("EqualTo(Predicate,-2)"),
      s"filter must reach the reader: ${plan.take(800)}")
    // pruned read schema: the scan's output carries only the 2 columns
    assert(df.schema.fieldNames.toSeq == Seq("Subject", "Object"))
    // and the pushed filter actually filters: every reference row matches
    val expect = RdfBridge.triples(spark, sf)
      .filter(col("Predicate") === -2).select("Subject", "Object")
    assert(df.exceptAll(expect).isEmpty && expect.exceptAll(df).isEmpty)
  }

  test("graft-triples: malformed lines are skipped like readText's null filter") {
    val tmp = Tables.scratchDir("dsv2_corrupt")
    val p = new java.io.File(tmp); p.mkdirs()
    val f = new java.io.PrintWriter(s"$tmp/part-00000")
    f.println("1 2 3"); f.println("not a triple"); f.println("4 5"); f.println("6 7 8")
    f.close()
    val rows = spark.read.format("graft-triples").load(tmp)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set((1, 2, 3), (6, 7, 8)))
  }

  test("graft-triples streaming: one file per micro-batch, batch-equivalent result") {
    // stage 3 small name-ordered files
    val tmp = Tables.scratchDir("dsv2_stream_spec")
    val d = new java.io.File(tmp); d.mkdirs()
    Seq(0, 1, 2).foreach { i =>
      val w = new java.io.PrintWriter(s"$tmp/f0$i.txt")
      (0 until 10).foreach(j => w.println(s"${i * 10 + j} -2 ${j}"))
      w.close()
    }
    val ckpt = java.nio.file.Files.createTempDirectory("dsv2_ckpt").toString
    val q = spark.readStream.format("graft-triples").load(tmp)
      .filter(col("Predicate") === -2)
      .writeStream.format("memory").queryName("dsv2_stream_spec")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val gotBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(gotBatches == 3, s"expected 3 one-file micro-batches, got $gotBatches")
    val rows = spark.table("dsv2_stream_spec").count()
    assert(rows == 30)
  }

  test("graft-triples write: V2 round-trip, overwrite truncates, commit leaves no temps") {
    val tmp = Tables.scratchDir("dsv2_write_spec")
    val in = RdfBridge.triples(spark, sf)
    in.write.format("graft-triples").mode("overwrite").save(tmp)
    // write twice: overwrite must truncate, not double
    in.write.format("graft-triples").mode("overwrite").save(tmp)
    val back = spark.read.format("graft-triples").load(tmp)
    assert(back.count() == in.count())
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
    // commit renamed every task temp into place
    val leftovers = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"uncommitted temps: ${leftovers.mkString(",")}")
  }

  test("graft-triples: one partition per file (parallel scan)") {
    val n = spark.read.format("graft-triples").load(textDir).rdd.getNumPartitions
    val files = new java.io.File(textDir).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(n == files, s"expected $files partitions, got $n")
  }
}

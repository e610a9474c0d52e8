package graft

import graft.core.{Dictionary, TripleSchema}
import graft.plans.Layouts
import graft.sparql.{BgpQuery, BindTerm, Constant, SparqlParser, TriplePattern, Variable}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties (SURVEY §5: decode∘encode = id,
  * routing invariance, parser round-trips). The scalatestplus bridge is not
  * in the offline dep set, so samples are drawn directly from Gen with a
  * fixed seed (deterministic). Pure-function properties run at full sample
  * counts; Spark-backed ones use reduced counts.
  */
class PropertySpec extends AnyFunSuite {

  private def forSamples[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 50) {
      g.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator too sparse: $produced/$n")
  }

  private lazy val spark = SparkTestBase.session

  private val term: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("property: normalizeTerm is idempotent on its own output") {
    forSamples(term, 200) { t =>
      val once = Dictionary.normalizeTerm(t)
      assert(Dictionary.normalizeTerm(once) == once)
    }
  }

  test("property: quoted literals round-trip through normalization") {
    forSamples(term, 200) { t =>
      assert(Dictionary.normalizeTerm(s"'$t'") == t)
    }
  }

  test("property: generated BGPs render to SPARQL and parse back") {
    val genTerm: Gen[graft.sparql.Term] = Gen.oneOf(
      Gen.identifier.suchThat(_.nonEmpty).map(v => Variable(v)),
      term.map(Constant(_)))
    val genPattern = for { s <- genTerm; p <- genTerm; o <- genTerm }
      yield TriplePattern(s, p, o)
    val genBgp = Gen.nonEmptyListOf(genPattern).map(ps => BgpQuery(Nil, ps.take(5)))

    def render(t: graft.sparql.Term): String = t match {
      case Variable(v) => s"?$v"
      case Constant(l) => s"'$l'"
    }
    forSamples(genBgp, 100) { bgp =>
      val text = "SELECT * WHERE { " +
        bgp.patterns.map(p => s"${render(p.s)} ${render(p.p)} ${render(p.o)}")
          .mkString(" . ") + " }"
      val parsed = SparqlParser.parse(text)
      assert(parsed.patterns == bgp.patterns)
    }
  }

  test("property: modifier clauses round-trip around a generated BGP") {
    // random combinations of the round-3 grammar: FILTER / BIND / VALUES /
    // LIMIT-OFFSET / HAVING never corrupt the pattern list they decorate
    val genVar = Gen.identifier.suchThat(_.nonEmpty)
    val genCase = for {
      v1 <- genVar; v2 <- genVar.suchThat(_ != v1); lit <- term
      limit <- Gen.choose(1, 99)
      pick <- Gen.choose(0, 4)
    } yield (v1, v2, lit, limit, pick)
    forSamples(genCase, 120) { case (v1, v2, lit, limit, pick) =>
      val base = s"?$v1 :p ?$v2"
      val (clause, tail) = pick match {
        case 0 => (s" . FILTER(?$v2 = '$lit')", "")
        case 1 => (s" . BIND(?$v2 AS ?${v2}_alias)", "")
        case 2 => (s" VALUES ?$v2 { '$lit' }", "")
        case 3 => ("", s" LIMIT $limit OFFSET $limit")
        case 4 => ("", s" GROUP BY ?$v1 HAVING (COUNT(?$v2) > $limit)")
      }
      val proj = if (pick == 4) s"?$v1" else "*"
      val q = SparqlParser.parse(s"SELECT $proj WHERE { $base$clause }$tail")
      assert(q.patterns == Seq(TriplePattern(Variable(v1), Constant(":p"), Variable(v2))),
        s"patterns corrupted by clause case $pick")
      pick match {
        case 0 => assert(q.filters.nonEmpty)
        case 1 => assert(q.binds == Seq((BindTerm(Variable(v2)), s"${v2}_alias")))
        case 2 => assert(q.inlineValues.nonEmpty)
        case 3 => assert(q.limit.contains(limit) && q.offset.contains(limit))
        case 4 => assert(q.havings.nonEmpty && q.groupByVars == Seq(v1))
      }
    }
  }

  test("property: dictionary encode is the inverse of the pair set") {
    forSamples(Gen.mapOf(Gen.zip(Gen.choose(1, 1000000), term)), 5) { m0 =>
        // distinct ids AND distinct terms (a dictionary is a bijection)
        val m = m0.toSeq.distinctBy(_._2).take(30)
        if (m.nonEmpty) {
          val dict = Dictionary.fromPairs(spark, m)
          val enc = dict.encodeTerms(m.map(_._2))
          assert(enc == m.map { case (i, t) => t -> i }.toMap)
        }
    }
  }

  test("property: rangeLayout preserves the row multiset") {
    import spark.implicits._
    forSamples(Gen.listOfN(50, Gen.zip(Gen.choose(-100, 100), Gen.choose(-5, 5),
        Gen.choose(-100, 100))), 5) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF(TripleSchema.subject, TripleSchema.predicate,
          TripleSchema.objekt)
        val laid = Layouts.rangeLayout(df, Layouts.BySubject, 4)
        val in = rows.sorted
        val out = laid.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
          .toList.sorted
        assert(out == in)
      }
    }
  }

  test("property: sign-split is a partition (disjoint, complete)") {
    import spark.implicits._
    forSamples(Gen.listOfN(40, Gen.zip(Gen.choose(-50, 50), Gen.const(1),
        Gen.const(1))), 5) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF(TripleSchema.subject, TripleSchema.predicate,
          TripleSchema.objekt)
        val split = Layouts.signSplit(df, Layouts.BySubject, 2)
        val pos = split.positive.collect().map(_.getInt(0))
        val neg = split.negative.collect().map(_.getInt(0))
        assert(pos.forall(_ >= 0) && neg.forall(_ < 0))
        assert(pos.length + neg.length == rows.length)
      }
    }
  }

  test("property: connectedComponents equals brute-force union-find") {
    import spark.implicits._
    val graphGen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    forSamples(graphGen, 5) { rawEdges =>
      val nodes = (0L to 11L).toSeq
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      rawEdges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(n => n -> {
        // canonical label = min member of the component
        val root = find(n)
        nodes.filter(m => find(m) == root).min
      }).toMap
      val got = graft.operators.Graph.connectedComponents(
          nodes.toDF("node"), rawEdges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"edges=$rawEdges")
    }
  }

  test("property: native top-k matches the window form on random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rowsGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 6), Gen.choose(0, 30), Gen.choose(0L, 10000L)))
    forSamples(rowsGen, 4) { raw =>
      // unique ids → total order under (v desc, id asc)
      val rows = raw.zipWithIndex.map { case ((g, v, _), i) => (g, v, i.toLong) }
      val df = rows.toDF("g", "v", "id")
      val native = graft.operators.TopK
        .perGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 4)
        .collect().map(_.toString).sorted
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val window = df.withColumn("r", row_number().over(w)).filter(col("r") <= 4)
        .drop("r").collect().map(_.toString).sorted
      assert(native.sameElements(window))
    }
  }

  test("property: corpus_chunk tiles every document per the stride formula") {
    import spark.implicits._
    val (chunk, stride) = graft.queries.Pipeline.chunkParams
    val docGen = Gen.listOfN(40, Gen.choose(1, 90)).map { lens =>
      lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"w${(i * 31 + j * 7) % 13}").mkString(" "))
      }
    }
    forSamples(docGen, 3) { docs =>
      docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
      val out = spark.sql(graft.queries.Pipeline.debugCorpusChunkSql)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val toks = text.split(" ")
        val l = toks.length
        val expected =
          if (l <= chunk) 1 else math.ceil((l - chunk).toDouble / stride).toInt + 1
        val chunks = out(id).sortBy(_._2)
        assert(chunks.map(_._2).toSeq == (0 until expected).map(_.toLong),
          s"doc $id: chunk indices")
        chunks.foreach { case (_, k, nTok, body) =>
          val start = k.toInt * stride // 0-based
          val slice = toks.slice(start, start + chunk)
          assert(nTok == slice.length && body == slice.mkString(" "),
            s"doc $id chunk $k content")
        }
        // tail coverage: the last chunk reaches the final token
        val (_, lastK, lastN, _) = chunks.last
        assert(lastK.toInt * stride + lastN == l, s"doc $id tail coverage")
      }
    }
  }

  test("property: CDC chunks cover the text and re-align after a prefix insert") {
    import spark.implicits._
    val docGen = for {
      lens <- Gen.listOfN(12, Gen.choose(20, 80))
      plen <- Gen.choose(3, 9)
    } yield (lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"w${(i * 31 + j * 7) % 13}").mkString(" "))
    }, (0 until plen).map(j => s"w${(j * 5) % 13}").mkString(" "))
    forSamples(docGen, 2) { case (docs, prefix) =>
      val pLen = prefix.split(" ").length
      val both = docs ++ docs.map { case (id, text) =>
        (id + 1000L, s"$prefix $text")
      }
      both.toDF("doc_id", "text").createOrReplaceTempView("documents")
      val out = spark.sql(graft.queries.Pipeline.debugCdcChunkSql)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
      docs.foreach { case (id, text) =>
        val orig = out(id)
        // 1. coverage: chunks concatenate back to the document
        assert(orig.map(_._4).mkString(" ") == text, s"doc $id coverage")
        assert(orig.map(_._3).sum == text.split(" ").length, s"doc $id token count")
        // 2. shift robustness: chunk STARTS (cumulative) after the junction
        // agree — prefixed chunks beyond position pLen+1 are byte-identical
        // to the original's chunks from its first boundary on
        def starts(cs: Seq[(Long, Long, Long, String)]): Seq[(Long, String)] =
          cs.scanLeft(1L)((s, c) => s + c._3).zip(cs.map(_._4)).map { case (s, b) => (s, b) }
        val shifted = out(id + 1000L)
        val origTail = starts(orig).drop(1) // drop the start-1 chunk
        val shiftTail = starts(shifted).filter(_._1 > pLen + 1)
          .map { case (s, b) => (s - pLen, b) }
        assert(origTail == shiftTail, s"doc $id shift re-alignment")
      }
    }
  }

  test("property: int8 quantization error is bounded by half a quantum") {
    import spark.implicits._
    val vecGen = Gen.listOfN(12, Gen.listOfN(64,
      Gen.choose(-1000000, 1000000).map(_ / 1000000.0f)))
    forSamples(vecGen, 2) { vecs =>
      val rows = vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong, if (i == 0) Array.fill(64)(0.0f) else v.toArray, 0)
      }
      rows.toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
      val out = spark.sql(graft.queries.Pipeline.debugEmbQuantizeSql)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
      rows.foreach { case (id, v, _) =>
        val (scale, qstr) = out(id)
        val q = qstr.split(" ").map(_.toInt)
        assert(q.length == 64)
        if (v.forall(_ == 0.0f)) {
          assert(scale == 0.0 && q.forall(_ == 0), s"zero vector $id")
        } else {
          assert(q.forall(x => x >= -127 && x <= 127), s"lane range $id")
          // at least one lane saturates at the absmax
          assert(q.exists(x => math.abs(x) == 127), s"absmax lane $id")
          v.zip(q).foreach { case (x, qi) =>
            assert(math.abs(x.toDouble - qi * scale) <= scale / 2 + 1e-9,
              s"vec $id: |${x} - $qi*$scale| exceeds half a quantum")
          }
        }
      }
    }
  }

  test("property: text_tfidf equals the brute-force top-3 per document") {
    import spark.implicits._
    val docGen = Gen.listOfN(25, Gen.listOfN(30, Gen.choose(0, 9))).map { ws =>
      ws.zipWithIndex.map { case (words, i) =>
        (i.toLong, words.map(w => s"t$w").mkString(" "))
      }
    }
    forSamples(docGen, 3) { docs =>
      docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
      val got = spark.sql(graft.queries.Pipeline.debugTfidfSql)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2))
      val tf = docs.flatMap { case (id, text) =>
        text.split(" ").groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) }
      }
      val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      val expect = tf.groupBy(_._1).toSeq.flatMap { case (id, terms) =>
        terms.map { case (_, t, f) => (id, t, f, df(t), f.toDouble / df(t).toDouble) }
          .sortBy { case (_, t, _, _, s) => (-s, t) }
          .take(3)
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == expect, "tfidf mismatch")
    }
  }
}

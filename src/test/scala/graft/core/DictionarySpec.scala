package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DictionarySpec extends SparkTestBase {

  private lazy val dict = Dictionary.fromPairs(spark, Seq(
    (-39, ":node_376609000_1451606409000_-9.15947_38.70289"),
    (-2, ":placed"),
    (7, "a"),
    (12, "term with spaces"),
  ))

  test("encodeTerms round-trips known terms") {
    val m = dict.encodeTerms(Seq(":placed", "a", "term with spaces"))
    assert(m == Map(":placed" -> -2, "a" -> 7, "term with spaces" -> 12))
  }

  test("variables encode to the 0 sentinel") {
    assert(dict.encodeTerm("?x").contains(TripleSchema.VariableSentinel))
  }

  test("term normalization: quotes, URIs, prefixes (MyOpVisitorBase.java:69-78 rules)") {
    assert(Dictionary.normalizeTerm("'a'") == "a")
    assert(Dictionary.normalizeTerm("<a>") == "a")
    assert(Dictionary.normalizeTerm("<http://ex.org/path/Node>") == "Node")
    assert(Dictionary.normalizeTerm(":pfx") == ":pfx")
    assert(Dictionary.normalizeTerm("?v") == null)
  }

  test("unknown terms encode to None, not an error") {
    assert(dict.encodeTerm("'nope'").isEmpty)
  }

  test("decode maps int columns to lexical via broadcast join") {
    import spark.implicits._
    val df = Seq((-39, -2), (7, 12)).toDF("s", "p")
    val dec = dict.decode(df, Seq("s", "p")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(dec == Set(
      (":node_376609000_1451606409000_-9.15947_38.70289", ":placed"),
      ("a", "term with spaces")))
  }

  test("decode(encode(x)) == x over the bridge dictionary") {
    val d = graft.sources.RdfBridge.dictionary(spark, sf)
    val terms = Seq(":placed", ":contains", "cust_3", "nation_0")
    val enc = d.encodeTerms(terms)
    assert(enc.keySet == terms.toSet)
    import spark.implicits._
    val back = d.decode(enc.values.toSeq.toDF("id"), Seq("id"))
      .collect().map(_.getString(0)).toSet
    assert(back == terms.toSet)
  }
}

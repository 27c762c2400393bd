package graft

import graft.canon.TopicMerge
import graft.lexicon.Lexicon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LexiconTopicSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("J1/F7 lemmatize: broadcast join, order preserved, identity fallback") {
    import spark.implicits._
    val df = Seq(("d1", Seq("alice", "uses", "spark", "queries")))
      .toDF("id", "toks")
    val out = Lexicon.lemmatize(spark, df, "toks").collect()
    assert(out.length == 1)
    assert(out(0).getSeq[String](2) == Seq("alice", "use", "spark", "query"))
  }

  test("J2/F18 synset -> gloss lookup") {
    import spark.implicits._
    val df = Seq("spark.n.01", "missing.n.01").toDF("synset")
    val out = Lexicon.withGloss(spark, df, "synset")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("spark.n.01").contains("a cluster compute engine"))
    assert(out("missing.n.01").isEmpty)
  }

  test("F19 hypernym closure: all ancestors at correct depth") {
    import spark.implicits._
    val edges = Lexicon.hypernyms.toDF("child", "parent")
    val c = Lexicon.hypernymClosure(spark, edges)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val forSpark = c.filter(_._1 == "spark.n.01").map(x => (x._2, x._3)).toSet
    assert(forSpark == Set(("engine.n.01", 1), ("system.n.01", 2),
      ("entity.n.01", 3)))
  }

  test("F19 lowest common hypernym") {
    import spark.implicits._
    val edges = Lexicon.hypernyms.toDF("child", "parent")
    assert(Lexicon.lowestCommonHypernym(spark, edges,
      "spark.n.01", "kafka.n.01").contains("system.n.01"))
    assert(Lexicon.lowestCommonHypernym(spark, edges,
      "spark.n.01", "engine.n.01").contains("engine.n.01"))
  }

  test("W6 topic merge: smallest merges into most-similar, reaches target") {
    import spark.implicits._
    // two big related topics + one tiny one lexically close to topic_a
    val docs = (
      (1 to 10).map(i => ("topic_a", "spark engine cluster compute")) ++
      (1 to 10).map(i => ("topic_b", "postgres database storage rows")) ++
      Seq(("topic_tiny", "spark engine compute"))
    ).toDF("topic", "text")
    val m = TopicMerge.mergeMap(spark, docs, targetTopics = 2)
    assert(m("topic_tiny") == "topic_a", s"merge map: $m")
    assert(m("topic_a") == "topic_a" && m("topic_b") == "topic_b")
    val relabeled = TopicMerge.relabel(spark, docs, m)
    assert(relabeled.select("merged_topic").distinct().count() == 2)
  }
}

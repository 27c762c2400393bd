package graft

import graft.functions.VecOps
import graft.gen.{TranscriptGen, Vocab}
import graft.link.EntityLink
import graft.metrics.PrecisionRecall
import graft.oracle.ReferenceOracle
import graft.pipeline.KgPipeline
import graft.schema.Entity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecMetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("VecOps: cosine/l2/pairFeatures/padTruncate agree with plain Scala") {
    import spark.implicits._
    val df = Seq((Seq(3.0f, 4.0f), Seq(4.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VecOps.cosine($"a", $"b").as("cos"),
      VecOps.l2Norm($"a").as("na"),
      VecOps.pairFeatures($"a", $"b").as("pf"),
      VecOps.padTruncate($"a", 4, 0.0).as("pad"),
      VecOps.padTruncate($"a", 1, 0.0).as("trunc")).head()
    assert(math.abs(r.getDouble(0) - 24.0 / 25.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
    assert(r.getSeq[Double](2) == Seq(3.0, 4.0, 4.0, 3.0, 1.0, 1.0))
    assert(r.getSeq[Double](3) == Seq(3.0, 4.0, 0.0, 0.0))
    assert(r.getSeq[Double](4) == Seq(3.0))
    // l2Normalize yields unit norm
    val n = df.select(VecOps.l2Norm(VecOps.l2Normalize($"a"))).head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("U-6: typed P/R Aggregator gates the pipeline (same result as " +
    "the plain computation)") {
    import spark.implicits._
    val turns = TranscriptGen.transcripts(spark, 50, 6, 0, 2)
    val got = KgPipeline.run(spark, turns.toDF(), shufflePartitions = 2)
      .triples.collect().toSeq
    val canon = ReferenceOracle.canonicalMap(Vocab.entities)
    val expected = ReferenceOracle.triples(turns.collect().toSeq)
      .map(t => t.copy(subj = canon(t.subj), obj = canon(t.obj)))
    def key(t: graft.schema.Triple) = (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj)
    val g = got.map(key).toSet
    val e = expected.map(key).toSet
    val flags = (g ++ e).toSeq
      .map(k => PrecisionRecall.Flags(g.contains(k), e.contains(k)))
    val pr = flags.toDS()
      .select(PrecisionRecall.aggregator.toColumn)
      .head()
    assert(pr.precision >= 0.95 && pr.recall >= 0.95)
    val (pp, rr) = ReferenceOracle.precisionRecall(got, expected)
    assert(math.abs(pr.precision - pp) < 1e-12)
    assert(math.abs(pr.recall - rr) < 1e-12)
  }

  test("ST1: incremental index add/remove then link") {
    val base = EntityLink.buildIndex(Vocab.entities)
    val updated = EntityLink.updateIndex(base,
      add = Seq(Entity("ent_new", "flink", Seq("apache flink"))),
      removeIds = Set("ent_redis"))
    assert(updated.exists(_._1 == "ent_new"))
    assert(!updated.exists(_._1 == "ent_redis"))
    assert(updated.map(_._1) == updated.map(_._1).sorted)
    val hit = graft.score.Embed.top1("apache flink", updated, 0.3)
    assert(hit.exists(_._1 == "ent_new"))
  }

  test("W1: length-sorted batching clusters surface lengths per partition") {
    import spark.implicits._
    val mentions = Seq(
      graft.schema.Mention("c", 0, 0, 1, "spark"),
      graft.schema.Mention("c", 0, 2, 1, "a"),
      graft.schema.Mention("c", 0, 4, 2, "apache spark"),
      graft.schema.Mention("c", 0, 7, 1, "db")).toDS().repartition(1)
    val sorted = EntityLink.lengthSorted(mentions).collect()
      .map(_.surface.length).toSeq
    assert(sorted == sorted.sorted)
  }
}

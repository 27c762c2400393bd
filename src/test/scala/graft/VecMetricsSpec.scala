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

  test("A10 spanMeanPool / A11 combineLayers agree with plain Scala") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val toks = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(5.0f, 6.0f),
      Array(7.0f, 8.0f))
    val df = Seq((1L, toks)).toDF("id", "tok_embs")
    // span [1, 3): tokens 1 and 2 -> mean = ((3+5)/2, (4+6)/2)
    val span = df.select(graft.functions.VecOps
        .spanMeanPool(col("tok_embs"), lit(1), lit(2)).as("v"))
      .head().getSeq[Double](0)
    assert(span == Seq(4.0, 5.0))
    val sum = df.select(graft.functions.VecOps
        .combineLayers(col("tok_embs"), "sum").as("v"))
      .head().getSeq[Double](0)
    assert(sum == Seq(16.0, 20.0))
    val avg = df.select(graft.functions.VecOps
        .combineLayers(col("tok_embs"), "avg").as("v"))
      .head().getSeq[Double](0)
    assert(avg == Seq(4.0, 5.0))
    // empty span -> null, not an error (ANSI-safe)
    val empty = df.select(graft.functions.VecOps
        .spanMeanPool(col("tok_embs"), lit(1), lit(0)).as("v"))
      .head()
    assert(empty.isNullAt(0))
  }

  test("P10 seeded sample and O5 seeded shuffle are deterministic per " +
    "seed and differ across seeds") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, s"row$i"))
      .toDF("id", "s").repartition(4).localCheckpoint()
    val s1 = graft.sources.Sources.seededSample(df, 0.2, 7L)
      .collect().map(_.getLong(0)).toSet
    val s2 = graft.sources.Sources.seededSample(df, 0.2, 7L)
      .collect().map(_.getLong(0)).toSet
    val s3 = graft.sources.Sources.seededSample(df, 0.2, 8L)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1 != s3 && s1.nonEmpty)
    val o1 = graft.sources.Sources.seededShuffle(df, 7L, "id")
      .collect().map(_.getLong(0)).toSeq
    val o2 = graft.sources.Sources.seededShuffle(df, 7L, "id")
      .collect().map(_.getLong(0)).toSeq
    val o3 = graft.sources.Sources.seededShuffle(df, 9L, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(o1 == o2 && o1 != o3)
    assert(o1.sorted == o3.sorted) // permutations of the same rows
  }
}

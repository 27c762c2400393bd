package graft

import graft.gen.TranscriptGen
import graft.plans.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted aggregation == direct aggregation on a skewed corpus") {
    import spark.implicits._
    // hot conversation = 400 turns vs 6 per normal conv
    val turns = TranscriptGen.transcripts(spark, 50, 6, hotTurns = 400,
      partitions = 4).toDF()
    val direct = turns.groupBy($"conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(turns, Seq($"conv_id"),
        rowSalt = $"turn_idx", saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(direct("conv_hot") == 400)
    val directSum = turns.groupBy($"conv_id")
      .agg(sum(length($"text"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedSum = Salting.saltedSum(turns, Seq($"conv_id"),
        length($"text").cast("long"), $"turn_idx", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedSum == directSum)
  }

  test("salted self-join pairs == plain self-join pairs, including a " +
    "degenerate bucket that engages the salt path") {
    import spark.implicits._
    // key "hot" holds 50 ids (> bound 16 -> salted); others are small
    val keys = ((0 until 50).map(i => (f"id_$i%03d", "hot")) ++
      Seq(("id_900", "a"), ("id_901", "a"), ("id_902", "b")))
      .toDF("entity_id", "band")
    val salted = Salting.saltedSelfJoinPairs(keys, "entity_id", "band",
        bucketBound = 16, saltFactor = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val plain = keys.alias("a").join(keys.alias("b"),
        col("a.band") === col("b.band") &&
          col("a.entity_id") < col("b.entity_id"))
      .select(col("a.entity_id"), col("b.entity_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(salted.size == 50 * 49 / 2 + 1)
  }
}

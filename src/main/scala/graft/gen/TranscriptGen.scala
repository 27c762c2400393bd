package graft.gen

import graft.schema.Turn
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed transcript synthesizer
  * (FIXTURES.md §1): columnar `spark.range` + hash-indexed template
  * choices, no driver-side collections, no wall clock, no unseeded
  * randomness — the same (nConvs, turnsPerConv, hotTurns) always produces
  * the identical table, at any parallelism.
  *
  * Emits the exact input_hint schema
  * (conv_id, turn_idx, role, text, tool, ts). Includes one hot
  * conversation (`conv_hot`) for skew tests (SURVEY.md §7.4.4), and
  * scrambles physical row order so stable-turn-ordering logic is actually
  * exercised (FIXTURES.md §1 "rows emitted shuffled").
  */
object TranscriptGen {

  /** Deterministic pick from a small literal array, keyed by
    * murmur3 hash of (conv_id, turn_idx, salt).
    */
  private def pick(arr: IndexedSeq[String], salt: Int): Column =
    element_at(
      lit(arr.toArray),
      pmod(hash(col("conv_id"), col("turn_idx"), lit(salt)), lit(arr.size)) + 1)

  def transcripts(
      spark: SparkSession,
      nConvs: Int,
      turnsPerConv: Int,
      hotTurns: Int = 0,
      partitions: Int = 8): Dataset[Turn] = {
    import spark.implicits._

    val base = spark.range(nConvs.toLong * turnsPerConv)
      .withColumn("conv_id",
        format_string("conv_%06d", ($"id" / turnsPerConv).cast("long")))
      .withColumn("turn_idx", ($"id" % turnsPerConv).cast("int"))
    val hot = spark.range(hotTurns.toLong)
      .withColumn("conv_id", lit("conv_hot"))
      .withColumn("turn_idx", $"id".cast("int"))
    val ids = base.unionByName(hot)

    val t = pmod(hash($"conv_id", $"turn_idx", lit(0)), lit(10))
    val subj = pick(Vocab.gazetteer, 1)
    val obj = pick(Vocab.gazetteer, 2)
    val pred = pick(Vocab.predicateTokens, 3)
    val fillA = pick(Vocab.fillers, 4)
    val fillB = pick(Vocab.fillers, 5)
    val fillC = pick(Vocab.fillers, 6)

    val text =
      when(t < 6, concat_ws(" ", fillA, subj, pred, obj, fillB))
        .when(t < 8, concat_ws(" ", fillA, subj, fillB))
        .otherwise(concat_ws(" ", fillA, fillB, fillC))
    val role = pick(Vocab.roles, 7)
    val tool = when(role === "tool", pick(Vocab.tools, 8)).otherwise(lit(""))
    val ts = expr(
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,turn_idx,0)")

    ids
      .select(
        $"conv_id",
        $"turn_idx",
        role.as("role"),
        text.as("text"),
        tool.as("tool"),
        ts.as("ts"))
      // scramble physical order/grouping: downstream window logic must not
      // depend on arrival order (FIXTURES.md §1)
      .repartition(partitions, hash($"text", $"turn_idx"))
      .as[Turn]
  }
}

package graft.triple

import graft.schema.{LinkedMention, Triple}
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dependency-pattern triple extraction (SURVEY.md §7.2).
  *
  * Pattern (mirrored exactly by the oracle): for each pair of CONSECUTIVE
  * linked mentions within a turn (ordered by token position — the stable
  * turn ordering window, SURVEY.md §2.5 W2), the first predicate-trigger
  * token in the gap between them yields
  * (subj_entity, pred, obj_entity, score = min of the two link scores).
  *
  * Reference analog: exploded POS-pattern span filters
  * (word_sense_multimodal_pipeline.py:239-277) — (noun, verb-pattern,
  * noun) windows re-expressed as a ranking window + array HOFs.
  *
  * Physical shape: one explicit repartition on conv_id (north rule) makes
  * both the window sort and the tokens join shuffle-light; the predicate
  * dictionary is a map literal (no join, no UDF).
  */
object TripleExtract {

  def triples(
      spark: SparkSession,
      turns: DataFrame,
      linked: Dataset[LinkedMention],
      predicates: Map[String, String],
      shufflePartitions: Int): Dataset[Triple] = {
    import spark.implicits._

    val predMap = typedlit(predicates)

    // (conv_id, turn_idx) hash partitioning: satisfies the window's
    // ClusteredDistribution (only a local sort remains), co-partitions
    // with KgPipeline's turn table for the tokens join, and spreads hot
    // conversations (skew) at turn granularity
    val lm = linked.toDF()
      .repartition(shufflePartitions, $"conv_id", $"turn_idx")
    val w = Window.partitionBy($"conv_id", $"turn_idx").orderBy($"token_pos")
    val pairs = lm
      .withColumn("next_pos", lead($"token_pos", 1).over(w))
      .withColumn("next_entity", lead($"entity_id", 1).over(w))
      .withColumn("next_score", lead($"score", 1).over(w))
      .filter($"next_pos".isNotNull)

    val toks = turns.select($"conv_id", $"turn_idx",
      TextOps.tokens($"text").as("toks"))

    val gapStart = $"token_pos" + $"token_len" // 0-based first gap token
    val gapLen = $"next_pos" - gapStart
    val joined = pairs.join(toks, Seq("conv_id", "turn_idx"))
      .withColumn("gap",
        when(gapLen > 0, slice($"toks", gapStart + 1, gapLen))
          .otherwise(array().cast("array<string>")))
      .withColumn("pred_tok",
        element_at(filter($"gap", t => map_contains_key(predMap, t)), 1))
      .filter($"pred_tok".isNotNull)

    joined.select(
      $"conv_id",
      $"turn_idx",
      $"entity_id".as("subj"),
      try_element_at(predMap, $"pred_tok").as("pred"),
      $"next_entity".as("obj"),
      least($"score", $"next_score").as("score")
    ).as[Triple]
  }
}

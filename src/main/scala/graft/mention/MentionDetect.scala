package graft.mention

import graft.schema.Mention
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Gazetteer mention detection (SURVEY.md §2.2 P3-P5).
  *
  * Reference behavior: exploded-token POS/NER span filters
  * (word_sense_multimodal_pipeline.py:239-277) + TextMatcher gazetteer
  * (:187-191). Spark-first design: candidate spans (unigrams + bigrams)
  * are built per row with array HOFs — zero shuffles — then matched with a
  * single broadcast hash join against the gazetteer. No window functions,
  * no UDFs; everything stays inside whole-stage codegen until the
  * broadcast join.
  *
  * Overlap rule (deterministic, mirrored by the oracle): a bigram match
  * wins over any unigram match at either of its two positions.
  */
object MentionDetect {

  /** turns(conv_id, turn_idx, text, ...) -> Dataset[Mention]. */
  def mentions(
      spark: SparkSession,
      turns: DataFrame,
      gazetteer: Seq[String]): Dataset[Mention] = {
    import spark.implicits._

    val gaz = gazetteer.toDF("surface")

    val toks = TextOps.tokens($"text")
    // shifted-by-one zip -> bigram strings aligned to their start pos
    val shifted = concat(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      array(lit(null).cast("string")))
    val bigrams = zip_with(toks, shifted,
      (a, b) => when(b.isNotNull, concat_ws(" ", a, b)))

    val spans = concat(
      // (pos, len, surface) for every unigram ...
      zip_with(toks, sequence(lit(0), greatest(size(toks) - 1, lit(0))),
        (tok, i) => struct(i.as("token_pos"), lit(1).as("token_len"),
          tok.as("surface"))),
      // ... and every bigram
      filter(
        zip_with(bigrams, sequence(lit(0), greatest(size(toks) - 1, lit(0))),
          (bg, i) => struct(i.as("token_pos"), lit(2).as("token_len"),
            bg.as("surface"))),
        s => s("surface").isNotNull))

    val candidates = turns
      .select($"conv_id", $"turn_idx", explode(spans).as("span"))
      .select($"conv_id", $"turn_idx",
        $"span.token_pos", $"span.token_len", $"span.surface")

    val matched = candidates
      .join(broadcast(gaz), Seq("surface"), "left_semi")

    // bigram-wins overlap resolution: drop unigram matches whose position
    // is covered by a bigram match in the same turn (self-join: aliased)
    val uni = matched.filter($"token_len" === 1).alias("u")
    val cover = matched.filter($"token_len" === 2)
      .select($"conv_id", $"turn_idx",
        explode(array($"token_pos", $"token_pos" + 1)).as("covered"))
      .distinct().alias("c")
    val unigrams = uni.join(cover,
      col("u.conv_id") === col("c.conv_id") &&
        col("u.turn_idx") === col("c.turn_idx") &&
        col("u.token_pos") === col("c.covered"),
      "left_anti")
    val out = unigrams.unionByName(matched.filter($"token_len" === 2))

    out.select($"conv_id", $"turn_idx", $"token_pos", $"token_len",
      $"surface").as[Mention]
  }
}

package graft.link

import graft.schema.{Entity, LinkedMention, Mention}
import graft.score.Embed
import org.apache.spark.sql.{Dataset, SparkSession}

/** Embedding-based entity-link scoring (SURVEY.md §3.1, §2.3 J3/J4).
  *
  * Reference behavior: encode the mention surface, cosine top-k against an
  * in-memory corpus index, keep the best hit above threshold
  * (search_pipeline.py:73-88, 105-145). The reference reuses one pooled
  * inference session across batches (search_pipeline.py:192-194); the
  * Spark-native equivalent is `mapPartitions` with scorer state
  * instantiated once per partition against a broadcast candidate index —
  * one executor-side object per task, zero per-row setup cost.
  *
  * Length-sorted batching (sentence_encoder.py:138-139,168) exists in the
  * reference to minimize transformer padding; with a hash scorer the
  * equivalent win is per-partition surface memoization (repeated surfaces
  * are embedded once), which dominates because gazetteer surfaces repeat
  * heavily in transcripts.
  */
object EntityLink {

  /** Pooled per-partition scorer: broadcast index + memo cache. */
  final class Scorer(
      index: IndexedSeq[(String, Array[Float])],
      minScore: Double) extends Serializable {
    private val memo = new java.util.HashMap[String, Option[(String, Double)]]()
    def link(surface: String): Option[(String, Double)] = {
      var r = memo.get(surface)
      if (r == null) {
        r = Embed.top1(surface, index, minScore)
        memo.put(surface, r)
      }
      r
    }
  }

  /** Build the broadcast candidate index: one L2-normalized mean-pooled
    * vector per entity over canonical + aliases (reference:
    * src/utils/utils.py:270-302 loads the same shape from disk).
    * Sorted by entity_id for deterministic scan order.
    */
  def buildIndex(entities: Seq[Entity]): IndexedSeq[(String, Array[Float])] =
    entities.sortBy(_.entity_id)
      .map(e => (e.entity_id, Embed.meanEmbed(e.canonical +: e.aliases)))
      .toIndexedSeq

  /** ST1: incremental index maintenance (reference: add_to_index /
    * remove_from_index, search_pipeline.py:154-175) — append/remove
    * candidate rows, rebuild the sorted broadcastable index.
    */
  def updateIndex(
      index: IndexedSeq[(String, Array[Float])],
      add: Seq[Entity],
      removeIds: Set[String] = Set.empty): IndexedSeq[(String, Array[Float])] =
    (index.filterNot { case (id, _) => removeIds.contains(id) } ++
      buildIndex(add)).sortBy(_._1).distinctBy(_._1).toIndexedSeq

  /** W1 (reference: length-sorted batching, sentence_encoder.py:138-139):
    * cluster same-length surfaces within partitions so a real batched
    * encoder pads minimally. Row order is irrelevant downstream — output
    * order is restored by (conv_id, turn_idx, token_pos) keys (W2).
    */
  def lengthSorted(mentions: Dataset[Mention]): Dataset[Mention] = {
    import org.apache.spark.sql.functions.{col, length}
    import mentions.sparkSession.implicits._
    mentions.toDF()
      .sortWithinPartitions(length(col("surface")))
      .as[Mention]
  }

  /** Linking runs over length-sorted partitions (W1): a real batched
    * transformer encoder sees same-length surfaces adjacently and pads
    * minimally; with the hash scorer it is a free within-partition sort
    * (no shuffle) plus the memo cache. Output order is restored
    * downstream by (conv_id, turn_idx, token_pos) keys (W2).
    */
  def link(
      spark: SparkSession,
      mentions: Dataset[Mention],
      entities: Seq[Entity],
      minScore: Double): Dataset[LinkedMention] = {
    import spark.implicits._
    val bcIndex = spark.sparkContext.broadcast(buildIndex(entities))
    lengthSorted(mentions).mapPartitions { it =>
      val scorer = new Scorer(bcIndex.value, minScore)
      it.flatMap { m =>
        scorer.link(m.surface).map { case (id, score) =>
          LinkedMention(m.conv_id, m.turn_idx, m.token_pos, m.token_len,
            m.surface, id, score)
        }
      }
    }
  }
}

package graft.extract

import graft.link.EntityLink
import graft.schema.{Entity, Triple}
import graft.score.Embed
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-turn extraction: overlap resolution + entity linking + predicate
  * pairing in ONE `mapPartitions` pass with pooled scorer state — the
  * north-star execution shape (reference: pooled inference session,
  * search_pipeline.py:192-194; span filters,
  * word_sense_multimodal_pipeline.py:239-277).
  *
  * Input rows are per-turn span groups produced by
  * MentionDetect.spanCandidates (Catalyst side: tokenize, candidate
  * explode, broadcast gazetteer join, groupBy collect). This stage owns
  * the sequential per-turn semantics, kept byte-compatible with
  * graft.oracle.ReferenceOracle:
  *
  *   1. bigram-wins overlap resolution over gazetteer matches
  *   2. cosine top-1 linking against the broadcast candidate index
  *      (per-partition memoized scorer)
  *   3. consecutive linked mentions + first predicate trigger in the gap
  *      -> (subj, pred, obj, min score)
  */
object TurnExtract {

  /** One candidate span: a gazetteer mention or a predicate trigger. */
  final case class Span(
      token_pos: Int,
      token_len: Int,
      surface: String,
      is_mention: Boolean)

  final case class TurnSpans(
      conv_id: String,
      turn_idx: Int,
      spans: Seq[Span])

  def triples(
      spark: SparkSession,
      turnSpans: DataFrame,
      entities: Seq[Entity],
      minScore: Double,
      predicates: Map[String, String]): Dataset[Triple] = {
    import spark.implicits._
    val bcIndex = spark.sparkContext.broadcast(EntityLink.buildIndex(entities))
    val bcPreds = spark.sparkContext.broadcast(predicates)

    turnSpans.as[TurnSpans].mapPartitions { it =>
      // pooled per-partition state: index + surface memo (reference:
      // reused inference session across batches)
      val scorer = new EntityLink.Scorer(bcIndex.value, minScore)
      val preds = bcPreds.value
      it.flatMap { t =>
        val spans = t.spans.sortBy(s => (s.token_pos, s.token_len))
        // bigram-wins overlap resolution (mirrors ReferenceOracle)
        val covered = spans.iterator
          .filter(s => s.is_mention && s.token_len == 2)
          .flatMap(s => Iterator(s.token_pos, s.token_pos + 1)).toSet
        val mentions = spans.filter(s => s.is_mention &&
          (s.token_len == 2 || !covered.contains(s.token_pos)))
        val predSpans = spans.filter(!_.is_mention)

        val linked = mentions.flatMap { m =>
          scorer.link(m.surface).map { case (id, score) =>
            (m.token_pos, m.token_len, id, score)
          }
        }
        linked.sliding(2).flatMap {
          case Seq((pos1, len1, id1, s1), (pos2, _, id2, s2)) =>
            val gapStart = pos1 + len1
            predSpans
              .find(p => p.token_pos >= gapStart && p.token_pos < pos2)
              .map { p =>
                Triple(t.conv_id, t.turn_idx, id1, preds(p.surface), id2,
                  math.min(s1, s2))
              }
          case _ => None
        }
      }
    }
  }
}

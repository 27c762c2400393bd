package graft.pipeline

import graft.canon.Canonicalize
import graft.ckpt.Checkpoint
import graft.gen.Vocab
import graft.graph.Materialize
import graft.link.EntityLink
import graft.mention.MentionDetect
import graft.schema._
import graft.triple.TripleExtract
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** End-to-end KG construction (SURVEY.md §7.2, north rule):
  *
  *   turns --mention detect--> mentions --pooled-scorer link--> linked
  *   --window pattern--> triples --LSH canon + connected components-->
  *   relabeled triples --> node/edge tables
  *
  * All stages are Dataset/DataFrame + Catalyst (no RDD API); the only
  * imperative region is the pooled scorer inside `mapPartitions`
  * (EntityLink), mirroring the reference's reused inference session
  * (search_pipeline.py:192-194).
  */
object KgPipeline {

  final case class Result(
      triples: Dataset[Triple],
      nodes: Dataset[NodeRow],
      edges: Dataset[EdgeRow],
      stats: Seq[Checkpoint.StageStats])

  def run(
      spark: SparkSession,
      turns: DataFrame,
      entities: Seq[Entity] = Vocab.entities,
      minLinkScore: Double = Vocab.minLinkScore,
      predicates: Map[String, String] = Vocab.predicates,
      checkpointRoot: Option[String] = None,
      shufflePartitions: Int = 32): Result = {
    import spark.implicits._

    val stats = scala.collection.mutable.ArrayBuffer[Checkpoint.StageStats]()
    def stage(name: String, inputs: Seq[String])(f: => DataFrame): DataFrame =
      checkpointRoot match {
        case Some(root) =>
          val (df, st) = Checkpoint.stage(spark, root, name, inputs)(f)
          stats += st
          df
        case None => f
      }

    val mentions = stage("mentions", Seq("turns")) {
      MentionDetect.mentions(spark, turns, Vocab.gazetteer).toDF()
    }.as[Mention]

    val linked = stage("linked", Seq("mentions", "entity_index")) {
      EntityLink.link(spark, mentions, entities, minLinkScore).toDF()
    }.as[LinkedMention]

    val rawTriples = stage("triples", Seq("linked", "turns")) {
      TripleExtract.triples(spark, turns, linked, predicates,
        shufflePartitions).toDF()
    }.as[Triple]

    val canonMap = stage("canonical_map", Seq("entity_index")) {
      Canonicalize.canonicalMap(spark, entities)
    }

    val relabeled = stage("triples_canonical", Seq("triples", "canonical_map")) {
      Materialize.relabel(spark, rawTriples, canonMap).toDF()
    }.as[Triple]

    val nodes = stage("nodes", Seq("canonical_map", "entity_index")) {
      Materialize.nodes(spark, entities, canonMap).toDF()
    }.as[NodeRow]

    val edges = stage("edges", Seq("triples_canonical")) {
      Materialize.edges(spark, relabeled).toDF()
    }.as[EdgeRow]

    Result(relabeled, nodes, edges, stats.toSeq)
  }
}

package graft.graph

import graft.schema.{EdgeRow, Entity, NodeRow, Triple}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Graph materialization into node/edge tables (SURVEY.md §7.1 `graph/`).
  *
  * Triples are relabeled through the canonicalization map with two
  * broadcast joins (the map is entity-cardinality — small by definition),
  * then edges aggregate support counts and nodes collect surface forms.
  * `sort_array(collect_set(...))` keeps outputs order-deterministic under
  * any parallelism.
  */
object Materialize {

  /** Relabel subj/obj through (entity_id -> canonical_id). */
  def relabel(
      spark: SparkSession,
      triples: Dataset[Triple],
      canonicalMap: DataFrame): Dataset[Triple] = {
    import spark.implicits._
    val subjMap = canonicalMap.select(
      col("entity_id").as("subj"), col("canonical_id").as("subj_canon"))
    val objMap = canonicalMap.select(
      col("entity_id").as("obj"), col("canonical_id").as("obj_canon"))
    triples.toDF()
      .join(broadcast(subjMap), Seq("subj"), "left")
      .join(broadcast(objMap), Seq("obj"), "left")
      .select(
        $"conv_id", $"turn_idx",
        coalesce($"subj_canon", $"subj").as("subj"),
        $"pred",
        coalesce($"obj_canon", $"obj").as("obj"),
        $"score")
      .as[Triple]
  }

  def nodes(
      spark: SparkSession,
      entities: Seq[Entity],
      canonicalMap: DataFrame): Dataset[NodeRow] = {
    import spark.implicits._
    val ent = entities
      .map(e => (e.entity_id, e.canonical, e.canonical +: e.aliases))
      .toDF("entity_id", "canonical", "surfaces")
    ent.join(broadcast(canonicalMap), Seq("entity_id"))
      .groupBy($"canonical_id")
      .agg(
        // canonical surface = the canonical of the representative
        // (min-id) member, deterministically
        min(struct($"entity_id", $"canonical"))("canonical").as("canonical"),
        sort_array(array_distinct(flatten(collect_list($"surfaces"))))
          .as("surface_forms"))
      .select($"canonical_id".as("entity_id"), $"canonical", $"surface_forms")
      .as[NodeRow]
  }

  def edges(spark: SparkSession, triples: Dataset[Triple]): Dataset[EdgeRow] = {
    import spark.implicits._
    triples.toDF()
      .groupBy($"subj".as("src"), $"pred", $"obj".as("dst"))
      .agg(count(lit(1)).as("support"))
      .as[EdgeRow]
  }
}

package graft.pipeline

import graft.canon.Canonicalize
import graft.ckpt.Checkpoint
import graft.extract.TurnExtract
import graft.gen.Vocab
import graft.graph.Materialize
import graft.link.EntityLink
import graft.mention.MentionDetect
import graft.schema._
import graft.triple.TripleExtract
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{array, avg, col, concat, count, lit, min}

/** End-to-end KG construction (SURVEY.md §7.2, north rule):
  *
  *   turns --mention detect--> spans --pooled-scorer link + pattern
  *   pairing--> triples --LSH canon + connected components--> relabeled
  *   triples --> node/edge tables (TableIO snapshots via materialize)
  *
  * All stages are Dataset/DataFrame + Catalyst (no RDD API); the only
  * imperative region is the pooled scorer inside `mapPartitions`
  * (TurnExtract), mirroring the reference's reused inference session
  * (search_pipeline.py:192-194). Extraction picks between two physical
  * paths by gazetteer size (see GazetteerFastPathMax); both are tested
  * equivalent. Stage checkpointing, per-partition extraction metrics,
  * and lineage manifests come from graft.ckpt.Checkpoint plus the
  * CollectionAccumulator wired here.
  */
object KgPipeline {

  final case class Result(
      triples: Dataset[Triple],
      nodes: Dataset[NodeRow],
      edges: Dataset[EdgeRow],
      stats: Seq[Checkpoint.StageStats],
      /** in-task per-partition extraction metrics; populated after the
        * first action that executes the triples stage (north rule:
        * mentions/sec + triples/partition alongside each commit)
        */
      extractionMetrics: () => Seq[TurnExtract.PartitionMetrics],
      /** plan-attached df.observe metrics over the canonical triples
        * (row count + link-score stats), collected for free by whatever
        * action the caller runs first; empty before any action
        */
      tripleStats: () => Map[String, Any])

  /** Gazetteer-size cutoff for the per-row fast path: below it the whole
    * extraction (candidate spans + gazetteer probe + resolution + link +
    * pairing) runs in ONE shuffle-free mapPartitions pass with the
    * gazetteer as a per-executor broadcast Set (measured 5.6x over the
    * staged path at bench scale). Above it, gazetteer matching must be a
    * join (a 1e8-surface set does not fit executor memory), so the
    * Catalyst candidates + broadcast/shuffle-join + span-group path
    * runs — the same size-based physical choice Spark makes for
    * broadcast joins. Both paths are asserted equivalent in
    * KgPipelineSpec.
    */
  val GazetteerFastPathMax = 100000

  def run(
      spark: SparkSession,
      turns: DataFrame,
      entities: Seq[Entity] = Vocab.entities,
      minLinkScore: Double = Vocab.minLinkScore,
      predicates: Map[String, String] = Vocab.predicates,
      checkpointRoot: Option[String] = None,
      shufflePartitions: Int = 32,
      gazetteerFastPathMax: Int = GazetteerFastPathMax,
      // gazetteer defaults to the surfaces of the provided entity index
      // (1-2 token phrases); pass explicitly to widen/narrow detection
      gazetteer: Seq[String] = null,
      // OPEN-entity-set canonicalization: a (entity_id, surfaces:
      // array<string>) DataFrame (e.g. corpus-derived provisional
      // entities) routed through the DataFrame-native
      // Canonicalize.canonicalMapDf — no driver-side Seq on the canon
      // path. Entities outside `entities` keep their own id as
      // canonical unless merged. NOTE: not folded into the checkpoint
      // fingerprint (it is data, not a parameter) — callers using
      // checkpointRoot with a custom entity table follow the same
      // one-root-per-corpus contract as the turns input.
      entitySurfacesDf: Option[DataFrame] = None): Result = {
    val gaz = Option(gazetteer).getOrElse(
      entities.flatMap(e => e.canonical +: e.aliases)
        .map(_.toLowerCase).distinct.sorted
        .filter(_.split(" ").length <= 2))
    import spark.implicits._

    // North-rule physical contract: ONE explicit hash repartition at
    // pipeline entry, at (conv_id, turn_idx) granularity. Every
    // downstream operator clusters by exactly (conv_id, turn_idx) —
    // overlap resolution, mention pairing, and the turns<->mentions join
    // are all within-turn — so HashPartitioning(conv_id, turn_idx)
    // satisfies every ClusteredDistribution with no further shuffle of
    // the turn table, AND it is the skew treatment: a hot conversation
    // (agent loop with 10^5 turns) partitioned by conv_id alone pins to
    // one task, measured as the scaling straggler; turn granularity
    // spreads it across the cluster. (An operator that genuinely needs
    // conversation-level co-location — e.g. cross-turn coref — must
    // repartition itself by conv_id with salting; none in this pipeline
    // does.) The explicit repartition also decouples parallelism from
    // input file-split packing (small parquet files otherwise coalesce
    // into a handful of splits via spark.sql.files.openCostInBytes,
    // capping the narrow chain's parallelism).
    val turnsP = turns.repartition(shufflePartitions,
      turns("conv_id"), turns("turn_idx"))

    val extractionAcc = spark.sparkContext
      .collectionAccumulator[TurnExtract.PartitionMetrics]("graft.extraction")

    // Input/parameter fingerprint: a committed stage is reused only if
    // the run's semantic parameters match the ones recorded at commit
    // time (Checkpoint rejects stale checkpoints otherwise). The turns
    // DATA itself is identified by the checkpoint root (callers use one
    // root per input corpus — documented contract); its schema is folded
    // in as a cheap drift signal. All components are JVM-stable hashes
    // (String/Seq/Map hashCode are specified murmur/31-based).
    val fingerprint = {
      // cheap DATA signal: the sorted input-file list of the turns scan
      // (empty for in-memory frames). Catches the silent-stale-reuse
      // case of re-pointing the same checkpoint root at a different
      // file-based corpus; mtimes/counts are deliberately NOT folded in
      // (a count() job per run is unaffordable at 10^12 rows) —
      // in-place rewrites of the same paths remain on the documented
      // one-root-per-corpus contract.
      val inputSig =
        try {
          val fs = turns.inputFiles
          s"${fs.length}:${fs.sorted.toSeq.hashCode}"
        } catch { case _: Exception => "na" }
      val desc = Seq(
        s"gaz:${gaz.size}:${gaz.hashCode}",
        s"entities:${entities.size}:${entities.hashCode}",
        s"minLinkScore:$minLinkScore",
        s"predicates:${predicates.hashCode}",
        s"turnsSchema:${turns.schema.map(f => f.name + ":" + f.dataType.sql)}",
        s"turnsFiles:$inputSig"
      ).mkString("|")
      java.security.MessageDigest.getInstance("MD5")
        .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }

    val stats = scala.collection.mutable.ArrayBuffer[Checkpoint.StageStats]()
    def stage(name: String, inputs: Seq[String])(f: => DataFrame): DataFrame =
      checkpointRoot match {
        case Some(root) =>
          val (df, st) =
            Checkpoint.stage(spark, root, name, inputs, fingerprint)(f)
          stats += st
          df
        case None => f
      }

    // Persisted candidate-index table (reference: hnswlib index
    // save/load, search_pipeline.py:105-124): with checkpointing on,
    // the index is committed as an `entity_index` stage and LOADED back
    // on resume (the build is skipped on a matching fingerprint); the
    // collect is driver-sized by design — this is the broadcast index.
    val index: IndexedSeq[(String, Array[Float])] = checkpointRoot match {
      case Some(_) =>
        val idxDf = stage("entity_index", Seq("entities")) {
          import spark.implicits._
          EntityLink.buildIndex(entities)
            .map { case (id, v) => (id, v.toSeq) }
            .toDF("entity_id", "vec")
        }
        idxDf.orderBy("entity_id").collect()
          .map(r => (r.getString(0), r.getSeq[Float](1).toArray))
          .toIndexedSeq
      case None => EntityLink.buildIndex(entities)
    }

    val rawTriples = (if (gaz.size <= gazetteerFastPathMax) {
      // fast path: whole extraction in one shuffle-free pooled
      // mapPartitions pass (north-star shape; gazetteer as broadcast Set)
      stage("triples", Seq("turns", "gazetteer", "entity_index")) {
        import spark.implicits._
        TurnExtract.timedTriplesFromTurns(spark, turnsP.as[Turn],
            gaz, entities, minLinkScore, predicates, Some(extractionAcc),
            prebuiltIndex = Some(index))
          .drop("ts")
      }
    } else {
      // scale path: Catalyst side (tokenize -> candidate explode ->
      // gazetteer JOIN -> per-turn span groups, no exchange past the
      // entry repartition), then pooled-scorer resolution/link/pairing.
      // The unfused operators (MentionDetect.mentions, EntityLink.link,
      // TripleExtract.triples) also remain as standalone library
      // operators; all paths asserted equivalent in KgPipelineSpec.
      val spans = stage("turn_spans", Seq("turns", "gazetteer")) {
        MentionDetect.spanCandidates(spark, turnsP, gaz, predicates)
      }
      stage("triples", Seq("turn_spans", "entity_index")) {
        TurnExtract.triples(spark, spans, entities, minLinkScore,
          predicates, Some(extractionAcc), prebuiltIndex = Some(index))
          .toDF()
      }
    }).as[Triple]

    val canonMap = stage("canonical_map", Seq("entity_index")) {
      entitySurfacesDf match {
        case Some(df) => Canonicalize.canonicalMapDf(spark, df)
        case None => Canonicalize.canonicalMap(spark, entities)
      }
    }

    // U-6: observed metrics ride the plan itself (zero extra jobs) —
    // any first action on the triples also delivers row count + score
    // stats, complementing the in-task accumulator metrics above
    val tripleObs = new org.apache.spark.sql.Observation()
    val relabeled = stage("triples_canonical", Seq("triples", "canonical_map")) {
      // closed path: the canonical map has exactly one row per entity
      // (every entry point maps every id), so the relabel broadcast
      // probe is free; a caller-supplied entity TABLE has unknown
      // cardinality and keeps the parallel count probe
      Materialize.relabel(spark, rawTriples, canonMap,
        knownMapSize =
          if (entitySurfacesDf.isEmpty) Some(entities.size.toLong)
          else None).toDF()
    }.as[Triple]
      .observe(tripleObs, count(lit(1)).as("triples"),
        min(col("score")).as("min_score"), avg(col("score")).as("avg_score"))

    val nodes = stage("nodes", Seq("canonical_map", "entity_index")) {
      Materialize.nodes(spark, entities, canonMap).toDF()
    }.as[NodeRow]

    val edges = stage("edges", Seq("triples_canonical")) {
      Materialize.edges(spark, relabeled).toDF()
    }.as[EdgeRow]

    val metricsFn = () => {
      import scala.jdk.CollectionConverters._
      extractionAcc.value.asScala.toSeq.sortBy(_.partition)
    }
    // extraction metrics land alongside the commits (the triples stage
    // has already run an action when checkpointing is on)
    checkpointRoot.foreach { root =>
      val m = metricsFn()
      if (m.nonEmpty) {
        val p = new org.apache.hadoop.fs.Path(root, "extraction_metrics.json")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val os = fs.create(p, true)
        os.write(m.map(_.json).mkString("[", ",", "]").getBytes("UTF-8"))
        os.close()
      }
    }
    Result(relabeled, nodes, edges, stats.toSeq, metricsFn,
      // non-blocking read of the observed row (Observation.get blocks
      // until an action; future.value is None before one)
      () => tripleObs.future.value match {
        case Some(scala.util.Success(row)) =>
          row.schema.fieldNames.zip(row.toSeq).toMap
        case _ => Map.empty
      })
  }

  final case class OpenResult(
      triples: Dataset[Triple],
      canonicalMap: DataFrame,
      /** distinct provisional (open) entity ids detected in the corpus */
      openEntities: DataFrame,
      /** which Canonicalize.canonicalMapDfTracked branch ran — "local",
        * "distributed-edge-local-uf", or "distributed-cc"; bench/ops
        * evidence that a run exercised the intended scale path
        */
      canonPath: String)

  /** OPEN-entity-set pipeline variant (the untrodden scale path of
    * VERDICT r3: corpus-DERIVED entity tables): gazetteer mentions are
    * detected and linked as in [[run]], and additionally every token
    * matching `shapePattern` (service/resource-style names outside the
    * gazetteer) becomes a PROVISIONAL entity `open:<surface>` with link
    * score 1.0. The provisional entity table — whose size is
    * corpus-dependent and therefore can never be a driver Seq — joins
    * the closed entities in ONE (entity_id, surfaces) DataFrame routed
    * through the DataFrame-native Canonicalize.canonicalMapDfTracked, so
    * near-identical spellings of the same open name (and open/closed
    * coreferences) merge by the same exact-jaccard semantics.
    *
    * Physical dispatch mirrors [[run]]: while the gazetteer fits a
    * per-executor Set (`gazetteerFastPathMax`), the whole extraction —
    * gazetteer spans, shape detection, open linking, pairing — runs in
    * ONE pooled shuffle-free mapPartitions pass
    * (TurnExtract.timedTriplesFromTurns with openShapePattern), closing
    * r4's ~6x per-triple gap vs the closed fast path. Above the knob
    * it composes the standalone library operators
    * (MentionDetect.mentions/openMentions, EntityLink.link,
    * TripleExtract.triples); both paths are pinned equal in
    * KgPipelineSpec and P/R-gated against ReferenceOracle.openTriples.
    *
    * Scale contracts (closed r4): iterative/reused frames cut via the
    * pluggable `cut` (a cluster run passes LineageCut.Reliable);
    * relabel falls back from broadcast to shuffle joins past
    * `relabelBroadcastMax` map entries (an unbounded open vocabulary
    * must not be broadcast).
    */
  def runOpen(
      spark: SparkSession,
      turns: DataFrame,
      entities: Seq[Entity] = Vocab.entities,
      minLinkScore: Double = Vocab.minLinkScore,
      predicates: Map[String, String] = Vocab.predicates,
      shufflePartitions: Int = 32,
      jaccardThreshold: Double = 0.5,
      shapePattern: String = MentionDetect.OpenShapePattern,
      gazetteerFastPathMax: Int = GazetteerFastPathMax,
      cut: graft.plans.LineageCut = graft.plans.LineageCut.Default,
      relabelBroadcastMax: Long = Materialize.RelabelBroadcastMaxEntities)
      : OpenResult = {
    import spark.implicits._
    val gaz = entities.flatMap(e => e.canonical +: e.aliases)
      .map(_.toLowerCase).distinct.sorted
      .filter(_.split(" ").length <= 2)
    val turnsP = turns.repartition(shufflePartitions,
      turns("conv_id"), turns("turn_idx"))

    val (rawTriples, openSurfSrc) =
      if (gaz.size <= gazetteerFastPathMax) {
        // fused fast path: detection + open linking + pairing in one
        // pooled pass; the entity table still needs the distinct open
        // surfaces — a Catalyst-only scan (tokenize -> explode -> rlike
        // -> anti-join -> distinct), no scorer, no span grouping
        val t = TurnExtract.timedTriplesFromTurns(spark, turnsP.as[Turn],
            gaz, entities, minLinkScore, predicates,
            openShapePattern = Some(shapePattern))
          .drop("ts").as[Triple]
        // raw `turns`, not turnsP: the surface scan is a separate
        // action, so a turnsP lineage would RE-EXECUTE the full-corpus
        // entry repartition (shuffle deps are not reused across jobs);
        // the output is partitioning-invariant and the distinct's own
        // exchange moves only the matching tokens
        val surf = MentionDetect.openMentions(spark, turns, gaz,
          shapePattern).toDF().select($"surface").distinct()
        (t, surf)
      } else {
        // staged scale path: composed standalone operators (a 1e8-surface
        // gazetteer forces the join-based mention detection)
        val closed = EntityLink.link(spark,
          MentionDetect.mentions(spark, turnsP, gaz), entities, minLinkScore)
        // raw `turns` for the same reason as the fused branch: mention
        // rows carry their own (conv_id, turn_idx); TripleExtract
        // repartitions the union itself
        val open = cut.cut(MentionDetect
          .openMentions(spark, turns, gaz, shapePattern)
          .toDF()) // reused: linked union + entity table
        val linkedOpen = open.select($"conv_id", $"turn_idx", $"token_pos",
            $"token_len", $"surface",
            concat(lit("open:"), $"surface").as("entity_id"),
            lit(1.0).as("score"))
          .as[LinkedMention]
        (TripleExtract.triples(spark, turnsP,
          closed.unionByName(linkedOpen), predicates, shufflePartitions),
          open.select($"surface").distinct())
      }

    val closedSurf = entities
      .map(e => (e.entity_id, e.canonical +: e.aliases))
      .toDF("entity_id", "surfaces")
    val openSurf = openSurfSrc
      .select(concat(lit("open:"), $"surface").as("entity_id"),
        array($"surface").as("surfaces"))
    val canonRes = Canonicalize.canonicalMapDfTracked(spark,
      closedSurf.unionByName(openSurf), jaccardThreshold, cut = cut)
    // the map is consumed twice by relabel; on the local path it is
    // already an in-memory LocalRelation (size known from the plan),
    // and on the distributed paths the size is OBSERVED during the
    // map's own cut — relabel never schedules a separate probe job
    val (canonMap, mapSize) =
      if (canonRes.path == "local")
        (canonRes.map,
          Some(canonRes.map.queryExecution.optimizedPlan match {
            case lr: org.apache.spark.sql.catalyst.plans.logical
                .LocalRelation => lr.data.length.toLong
            case _ => -1L
          }).filter(_ >= 0))
      else {
        val (m, n) = graft.plans.ObservedCount.attach(canonRes.map, cut)
        (m, Some(n()))
      }
    OpenResult(
      Materialize.relabel(spark, rawTriples, canonMap, relabelBroadcastMax,
        knownMapSize = mapSize),
      canonMap,
      openSurf.select($"entity_id"),
      canonRes.path)
  }

  /** Materialize the graph into snapshot-committed node/edge tables.
    * The format binding is pluggable (graft.io.KgTableFormat): the
    * sandbox default is snapshot-versioned Parquet; pass
    * `new IcebergTableFormat` plus catalog-qualified table names to
    * commit real Iceberg tables (config-only swap — see the mapping
    * table in KgTableFormat's scaladoc). Edges are partitioned by
    * predicate: low cardinality, and per-predicate reads (the common KG
    * access path) get partition pruning.
    */
  def materialize(
      spark: SparkSession,
      result: Result,
      dir: String,
      format: graft.io.KgTableFormat = graft.io.ParquetSnapshotFormat)
      : (Long, Long) = {
    val nv = format.write(spark, result.nodes.toDF(),
      format.tableName(dir, "nodes"), Nil,
      Seq("canonical_map", "entity_index"))
    val ev = format.write(spark, result.edges.toDF(),
      format.tableName(dir, "edges"), Seq("pred"),
      Seq("triples_canonical"))
    (nv, ev)
  }
}

package graft.tools

import graft.gen.TranscriptGen
import graft.pipeline.KgPipeline
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall breakdown of the OPEN pipeline on the wide
  * (merge-dense, distributed-canon) bench corpus — replicates
  * KgPipeline.runOpen's internals so each stage is timed in isolation
  * with a noop/count action per stage (guide §1.4).
  * Usage: runMain graft.tools.OpenProfile [convs] [cpus] [reps]
  */
object OpenProfile {
  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toInt).getOrElse(800000)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("openprofile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val path = s"$tmp/openprofile_wide"
    TranscriptGen.openTranscriptsWide(spark, convs, 8, 8000, cpus * 4)
      .write.mode("overwrite").parquet(path)

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"OPROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val entities = graft.gen.Vocab.entities
    val gaz = entities.flatMap(e => e.canonical +: e.aliases)
      .map(_.toLowerCase).distinct.sorted.filter(_.split(" ").length <= 2)
    val cut = graft.plans.LineageCut.Default

    (1 to reps).foreach { rep =>
      println(s"--- rep $rep (convs=$convs)")
      val turns = spark.read.parquet(path)
      val turnsP = turns.repartition(cpus, turns("conv_id"), turns("turn_idx"))

      // stage 1: fused extraction pass alone (noop sink)
      val raw = TurnExtract_triples(spark, turnsP, gaz, entities)
      t("fused-triples(noop)") {
        raw.write.format("noop").mode("overwrite").save()
      }

      // stage 2: open-surface scan + distinct
      val surf = t("openMentions+distinct") {
        val s = graft.mention.MentionDetect.openMentions(spark, turns, gaz)
          .toDF().select($"surface").distinct()
          .select(concat(lit("open:"), $"surface").as("entity_id"),
            array($"surface").as("surfaces")).localCheckpoint()
        println(s"  surfaces=${s.count()}")
        s
      }
      val closedSurf = entities
        .map(e => (e.entity_id, e.canonical +: e.aliases))
        .toDF("entity_id", "surfaces")
      val entSurf = closedSurf.unionByName(surf)

      // stage 3: canonicalization, broken down
      val shing = t("withShingles(ckpt)") {
        cut.cut(graft.canon.Canonicalize.withShingles(entSurf)
          .select($"entity_id", $"shingles"))
      }
      t("  shingles count") { println(s"  n=${shing.count()}") }
      val edges = t("candidateEdges(ckpt)") {
        val e = cut.cut(graft.dedup.Dedup.jaccardPairsOnSets(
          shing, "entity_id", "shingles", 0.5, cut)
          .select($"src", $"dst"))
        println(s"  edges=${e.count()}")
        e
      }
      val ids = entSurf.select($"entity_id")
      val ccMap = t("connectedComponentsFast") {
        val m = cut.cut(graft.canon.Canonicalize.connectedComponentsFast(
          spark, ids, edges, cut = cut))
        println(s"  map=${m.count()}")
        m
      }

      // stage 4: relabel + count
      t("relabel+count") {
        val n = graft.graph.Materialize.relabel(
          spark, raw, ccMap).toDF().count()
        println(s"  triples=$n")
      }

      // reference: the real entry point end-to-end
      t("runOpen end-to-end") {
        val r = KgPipeline.runOpen(spark, turns, shufflePartitions = cpus)
        println(s"  triples=${r.triples.count()} canon=${r.canonPath}")
      }
    }
    spark.stop()
  }

  private def TurnExtract_triples(
      spark: org.apache.spark.sql.SparkSession,
      turnsP: org.apache.spark.sql.DataFrame,
      gaz: Seq[String],
      entities: Seq[graft.schema.Entity])
      : org.apache.spark.sql.Dataset[graft.schema.Triple] = {
    import spark.implicits._
    graft.extract.TurnExtract.timedTriplesFromTurns(spark,
        turnsP.as[graft.schema.Turn], gaz, entities,
        graft.gen.Vocab.minLinkScore, graft.gen.Vocab.predicates,
        openShapePattern = Some(graft.mention.MentionDetect.OpenShapePattern))
      .drop("ts").as[graft.schema.Triple]
  }
}

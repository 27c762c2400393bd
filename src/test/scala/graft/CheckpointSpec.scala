package graft

import graft.ckpt.Checkpoint
import graft.gen.TranscriptGen
import graft.pipeline.KgPipeline
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Resumability gate (north rule: "resumable from per-partition
  * checkpoints with lineage + metrics written alongside each commit";
  * SURVEY.md §5.2.5).
  */
/** JVM-wide single-shot failure flag + attempt counter for the
  * task-retry drill (local mode: executor shares the JVM, so these are
  * visible in the task; a Spark accumulator would NOT work here — the
  * failed attempt's updates are discarded by design).
  */
object FailOnce {
  private val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val attempts = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
  def reset(): Unit = { armed.set(true); attempts.clear() }
  def shouldFail(): Boolean = armed.compareAndSet(true, false)
  def record(pid: Int): Unit =
    attempts.merge(pid, 1, (a, b) => a + b)
}

class CheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pipeline resumes: completed stages are skipped, output identical") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt").toString
    val turns = TranscriptGen.transcripts(spark, nConvs = 30,
      turnsPerConv = 6, hotTurns = 0, partitions = 2).toDF()

    // force the staged (large-gazetteer) path so multi-stage resume is
    // exercised; the fast path has fewer stages but the same mechanism
    val first = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0)
    val firstTriples = first.triples.collect().toSet
    assert(first.stats.nonEmpty && first.stats.forall(!_.skipped))

    // simulate a crash after the pipeline committed everything except the
    // last stage: delete the final output, keep the earlier commits
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root, "edges"), true)
    assert(!Checkpoint.wasCommitted(spark, root, "edges"))
    assert(Checkpoint.wasCommitted(spark, root, "turn_spans"))

    val second = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0)
    val byName = second.stats.map(s => s.name -> s.skipped).toMap
    assert(byName("entity_index"),
      "persisted candidate index should be loaded, not rebuilt")
    assert(byName("turn_spans"), "turn_spans should be resumed, not rerun")
    assert(byName("triples"), "triples should be resumed, not rerun")
    assert(!byName("edges"), "edges must be recomputed")
    assert(second.triples.collect().toSet == firstTriples)
  }

  test("the persisted entity index is genuinely LOADED on resume: " +
    "tampering the committed table changes re-extracted triples") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_ckpt_idx").toString
    val turns = TranscriptGen.transcripts(spark, nConvs = 40,
      turnsPerConv = 6, hotTurns = 0, partitions = 2).toDF()
    val first = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0)
    val firstTriples = first.triples.collect().toSet
    // victim: a linked subject that is its own singleton canonical
    // cluster, so relabeling can never re-introduce its id
    val canon = graft.oracle.ReferenceOracle.canonicalMap(
      graft.gen.Vocab.entities)
    val victim = firstTriples.map(_.subj)
      .find(s => canon.get(s).contains(s) &&
        canon.count(_._2 == s) == 1)
      .getOrElse(fail("no singleton-cluster subject in first triples"))

    // tamper: drop the victim's row from the COMMITTED index table
    // (keep the manifest so the fingerprint still matches)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idxDir = new org.apache.hadoop.fs.Path(root, "entity_index")
    val kept = spark.read.parquet(idxDir.toString)
      .filter(col("entity_id") =!= victim)
      .collect().map(r => (r.getString(0), r.getSeq[Float](1)))
    val tmpT = Files.createTempDirectory("graft_idx_tamper").toString
    kept.toSeq.toDF("entity_id", "vec")
      .coalesce(1).write.mode("overwrite").parquet(tmpT)
    fs.listStatus(idxDir).foreach { st =>
      if (!st.getPath.getName.startsWith("_")) fs.delete(st.getPath, false)
    }
    fs.listStatus(new org.apache.hadoop.fs.Path(tmpT)).foreach { st =>
      if (st.getPath.getName.startsWith("part-"))
        fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(idxDir, st.getPath.getName))
    }
    // drop downstream commits so extraction re-runs FROM the loaded index
    Seq("triples", "triples_canonical", "edges").foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s), true))

    val second = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0)
    val byName = second.stats.map(s => s.name -> s.skipped).toMap
    assert(byName("entity_index"), "tampered index must still be resumed")
    val secondTriples = second.triples.collect().toSet
    assert(!secondTriples.exists(t => t.subj == victim || t.obj == victim),
      s"victim $victim still linked — committed index not actually used")
    assert(secondTriples != firstTriples)
  }

  test("re-pointing the same checkpoint root at a DIFFERENT file-based " +
    "corpus invalidates committed stages (input-files data signal)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt_data").toString
    val dirA = Files.createTempDirectory("graft_turns_a").toString
    val dirB = Files.createTempDirectory("graft_turns_b").toString
    TranscriptGen.transcripts(spark, nConvs = 10, turnsPerConv = 4,
      hotTurns = 0, partitions = 2).write.mode("overwrite").parquet(dirA)
    TranscriptGen.transcripts(spark, nConvs = 20, turnsPerConv = 4,
      hotTurns = 0, partitions = 2).write.mode("overwrite").parquet(dirB)
    KgPipeline.run(spark, spark.read.parquet(dirA),
      checkpointRoot = Some(root), shufflePartitions = 2,
      gazetteerFastPathMax = 0).triples.count()
    // same schema, same parameters, different data files -> recompute
    val second = KgPipeline.run(spark, spark.read.parquet(dirB),
      checkpointRoot = Some(root), shufflePartitions = 2,
      gazetteerFastPathMax = 0)
    assert(second.stats.forall(!_.skipped),
      s"stale reuse: ${second.stats.filter(_.skipped).map(_.name)}")
  }

  test("manifest carries lineage and per-partition metrics") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt2").toString
    val turns = TranscriptGen.transcripts(spark, nConvs = 10,
      turnsPerConv = 4, hotTurns = 0, partitions = 2).toDF()
    val result = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0)
    result.triples.count()
    val manifest = Files.readString(
      java.nio.file.Paths.get(root, "triples", "_manifest.json"))
    assert(manifest.contains(""""stage":"triples""""))
    assert(manifest.contains(""""lineage":["turn_spans","entity_index"]"""))
    assert(manifest.contains(""""per_partition":["""))
    assert(manifest.contains(""""rows_per_sec":"""))
    // in-task extraction metrics: committed alongside and consistent
    val em = result.extractionMetrics()
    assert(em.nonEmpty)
    assert(em.map(_.triples).sum ==
      result.triples.count())
    assert(em.forall(m => m.wall_nanos > 0))
    val emJson = Files.readString(
      java.nio.file.Paths.get(root, "extraction_metrics.json"))
    assert(emJson.contains(""""mentions_per_sec":"""))
    assert(emJson.contains(""""triples":"""))
  }

  test("interrupted commit leaves no half-visible stage (tmp then rename)") {
    val root = Files.createTempDirectory("graft_ckpt3").toString
    val df = spark.range(10).toDF("id")
    // a compute that writes, then we check no .tmp dir survives a commit
    val (out, st) = Checkpoint.stage(spark, root, "s1", Seq("in"))(df)
    assert(out.count() == 10 && !st.skipped)
    assert(!Files.exists(java.nio.file.Paths.get(root, "s1.tmp")))
    // second call resumes
    val (_, st2) = Checkpoint.stage(spark, root, "s1", Seq("in"))(df)
    assert(st2.skipped)
  }

  test("fingerprint mismatch forces recompute instead of stale reuse") {
    val root = Files.createTempDirectory("graft_ckpt4").toString
    val (_, st1) = Checkpoint.stage(spark, root, "s", Seq("in"), "fpA")(
      spark.range(5).toDF("id"))
    assert(!st1.skipped)
    // same fingerprint -> resumed
    val (_, st2) = Checkpoint.stage(spark, root, "s", Seq("in"), "fpA")(
      spark.range(5).toDF("id"))
    assert(st2.skipped)
    // changed inputs/params -> recomputed, new data visible
    val (out3, st3) = Checkpoint.stage(spark, root, "s", Seq("in"), "fpB")(
      spark.range(9).toDF("id"))
    assert(!st3.skipped && out3.count() == 9)
    // manifest now records the new fingerprint (JSON-escaped round-trip)
    val (_, st4) = Checkpoint.stage(spark, root, "s", Seq("in"), "fpB")(
      spark.range(9).toDF("id"))
    assert(st4.skipped)
  }

  test("per-partition recovery inside a stage: an injected task failure " +
    "is retried alone; finished partitions are not recomputed") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_ckpt6").toString
    FailOnce.reset()
    import spark.implicits._
    val ds = spark.range(0, 40, 1, 4).toDF("id").as[Long]
    val mapped = ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      FailOnce.record(pid)
      if (pid == 2 && FailOnce.shouldFail())
        throw new RuntimeException("injected task failure")
      it
    }
    // the stage commits despite the mid-stage task death (local[4, 2]
    // retries the task; parquet task-commit discards the dead attempt)
    val (out, st) = Checkpoint.stage(spark, root, "flaky", Seq("in"))(
      mapped.toDF())
    assert(!st.skipped && out.count() == 40)
    val perPartition = FailOnce.attempts.asScala.toMap
    assert(perPartition(2) == 2, s"failed task not retried: $perPartition")
    assert(Seq(0, 1, 3).forall(p => perPartition(p) == 1),
      s"finished partitions recomputed: $perPartition")
  }

  test("changed pipeline parameters invalidate committed stages") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ckpt5").toString
    val turns = TranscriptGen.transcripts(spark, nConvs = 10,
      turnsPerConv = 4, hotTurns = 0, partitions = 2).toDF()
    KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0).triples.count()
    // a different minLinkScore must NOT reuse the old triples commit
    val second = KgPipeline.run(spark, turns, checkpointRoot = Some(root),
      shufflePartitions = 2, gazetteerFastPathMax = 0,
      minLinkScore = 0.99)
    assert(second.stats.forall(!_.skipped),
      s"stale reuse: ${second.stats.filter(_.skipped).map(_.name)}")
  }
}

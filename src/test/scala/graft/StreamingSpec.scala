package graft

import graft.gen.{TranscriptGen, Vocab}
import graft.oracle.ReferenceOracle
import graft.schema.Turn
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming parity: the stateless extraction stages must produce the
  * SAME triples on a stream as in batch (per-turn semantics are
  * order-independent), and stateful session summaries must accumulate
  * across micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture(): Seq[Turn] = {
    import spark.implicits._
    TranscriptGen.transcripts(spark, nConvs = 40, turnsPerConv = 6,
      hotTurns = 0, partitions = 2).collect().toSeq
  }

  test("streaming triples == batch oracle triples (two micro-batches)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val turns = fixture()
    val input = MemoryStream[Turn]
    val triples = StreamOps.streamingTriples(spark, input.toDF())
    val q = triples.writeStream
      .format("memory").queryName("stream_triples")
      .outputMode(OutputMode.Append()).start()
    try {
      val (a, b) = turns.splitAt(turns.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      val got = spark.table("stream_triples")
        .as[graft.schema.Triple].collect().toSeq
      val expected = ReferenceOracle.triples(turns)
      val (p, r) = ReferenceOracle.precisionRecall(got, expected)
      assert(p >= 0.95 && r >= 0.95,
        s"streaming P/R gate failed: p=$p r=$r")
    } finally q.stop()
  }

  test("restart drill: a query killed with a pending batch resumes from " +
    "checkpointLocation with no lost and no duplicated triples") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val turns = fixture()
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_out").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString
    val input = MemoryStream[Turn]
    def start() = StreamOps.streamingTriples(spark, input.toDF())
      .writeStream
      .format("parquet") // exactly-once file sink (commit log)
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode(OutputMode.Append())
      .start()

    val (a, b) = turns.splitAt(turns.size / 2)
    val q1 = start()
    input.addData(a)
    q1.processAllAvailable()
    // kill with batch b PENDING (added but never processed by q1)
    input.addData(b)
    q1.stop()

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir).as[graft.schema.Triple]
      .collect().toSeq
    val expected = ReferenceOracle.triples(turns)
    // exact multiset equality: any loss or replay-duplication fails
    def multiset(ts: Seq[graft.schema.Triple]) =
      ts.groupBy(t => (t.conv_id, t.turn_idx, t.subj, t.pred, t.obj))
        .map { case (k, v) => k -> v.size }
    assert(got.size == expected.size,
      s"row count drift: got ${got.size}, expected ${expected.size}")
    assert(multiset(got) == multiset(expected))
  }

  test("windowed counts with watermark produce rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Turn]
    val counts = StreamOps.windowedTripleCounts(spark, input.toDF())
    val q = counts.writeStream
      .format("memory").queryName("stream_windows")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(fixture())
      q.processAllAvailable()
      assert(spark.table("stream_windows").count() > 0)
    } finally q.stop()
  }

  test("mapGroupsWithState session summaries accumulate across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val turns = fixture()
    val input = MemoryStream[Turn]
    val sessions = StreamOps.conversationSessions(spark,
      StreamOps.streamingTriples(spark, input.toDF()))
    val q = sessions.writeStream
      .format("memory").queryName("stream_sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      val (a, b) = turns.splitAt(turns.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      val last = spark.table("stream_sessions")
        .as[StreamOps.ConvSummary].collect()
        .groupBy(_.conv_id).map { case (_, v) => v.maxBy(_.triples) }
      val expected = ReferenceOracle.triples(turns)
        .groupBy(_.conv_id).map { case (k, v) => k -> v.size }
      // every conversation that produced triples is summarized with the
      // full cross-batch count
      expected.foreach { case (conv, n) =>
        val s = last.find(_.conv_id == conv)
        assert(s.isDefined && s.get.triples == n,
          s"conv $conv: expected $n triples, got ${s.map(_.triples)}")
      }
    } finally q.stop()
  }
}

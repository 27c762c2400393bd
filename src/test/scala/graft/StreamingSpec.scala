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

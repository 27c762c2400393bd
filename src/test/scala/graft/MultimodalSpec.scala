package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture() = {
    import spark.implicits._
    (0L until 50L).map { i =>
      Multimodal.MediaRow(i,
        (s"MEDIA$i" * (3 + (i % 7)).toInt).getBytes("UTF-8"), "image/fake")
    }.toDS()
  }

  test("pooled batched feature extraction: shape, determinism, L2 norm") {
    val feats = Multimodal.extractFeatures(spark, fixture()).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.features.length == graft.score.Embed.Dim))
    // deterministic across runs
    val again = Multimodal.extractFeatures(spark, fixture()).collect()
    assert(feats.sortBy(_.doc_id).map(_.features.toSeq).toSeq ==
      again.sortBy(_.doc_id).map(_.features.toSeq).toSeq)
    // normalized (decode stub output contract)
    feats.foreach { f =>
      val n = math.sqrt(f.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }

  test("metadata extraction stays columnar (byte_len, header, md5)") {
    import spark.implicits._
    val meta = Multimodal.mediaMetadata(fixture().toDF()).collect()
    assert(meta.length == 50)
    val r0 = meta.find(_.getLong(0) == 0L).get
    assert(r0.getInt(1) == "MEDIA0".length * 3)
    assert(r0.getString(2) == "4D454449") // "MEDI"
  }

  test("frame sampling yields n deterministic windows") {
    import spark.implicits._
    val frames = Multimodal.frameSample(fixture().toDF(), 4).collect()
    assert(frames.forall(_.getSeq[String](1).size == 4))
    val again = Multimodal.frameSample(fixture().toDF(), 4).collect()
    assert(frames.map(_.getSeq[String](1)).toSeq ==
      again.map(_.getSeq[String](1)).toSeq)
  }
}

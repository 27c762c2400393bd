package graft

import graft.similarity.Similarity
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** ANN recall measurement (VERDICT r1 "What's missing" #2; reference
  * analog: hnswlib ef/M recall tuning, search_pipeline.py:105-124).
  * The multi-band OR-construction must recover >= 0.9 of the exact
  * brute-force top-k on a clustered fixture, and must dominate the
  * single-AND-bucket path it replaces as the recommended scale path.
  */
class SimilarityRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Dims = 16
  private val K = 5

  /** 30 clusters x 10 members, fixed seed: member = unit(center + 0.25*noise). */
  private def fixture(): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = (0 until 30).flatMap { c =>
      val center = Array.fill(Dims)(rnd.nextGaussian())
      (0 until 10).map { m =>
        val v = center.map(_ + 0.25 * rnd.nextGaussian())
        ((c * 10 + m).toLong, unit(v))
      }
    }
    rows.toDF("vec_id", "embedding")
  }

  test("multi-band LSH recall@5 >= 0.9 vs brute force, and beats the " +
    "single-band AND bucket") {
    import spark.implicits._
    val emb = fixture()
    val queries = emb.filter($"vec_id" % 10 === 0)
    val exact = Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", K).localCheckpoint()
    assert(Similarity.recallAtK(exact, exact) == 1.0)

    val multi = Similarity.lshTopKMultiBand(emb, queries,
      "vec_id", "embedding", K, planesPerBand = 4, numBands = 6, dims = Dims)
    val single = Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", K, numPlanes = 8, dims = Dims)
    val rMulti = Similarity.recallAtK(multi, exact)
    val rSingle = Similarity.recallAtK(single, exact)
    info(f"recall@$K multi-band=$rMulti%.3f single-band=$rSingle%.3f")
    assert(rMulti >= 0.9, f"multi-band recall $rMulti%.3f < 0.9")
    assert(rMulti >= rSingle,
      f"OR-construction ($rMulti%.3f) must not lose to one AND bucket " +
        f"($rSingle%.3f)")
  }

  test("multi-band candidates stay blocked (never all-pairs): candidate " +
    "count well below |corpus| * |queries|") {
    import spark.implicits._
    val emb = fixture()
    val queries = emb.filter($"vec_id" % 10 === 0)
    // k large enough to keep every scored candidate -> row count == #candidates
    val cand = Similarity.lshTopKMultiBand(emb, queries,
      "vec_id", "embedding", k = 1000000, planesPerBand = 4, numBands = 6,
      dims = Dims).count()
    val allPairs = emb.count() * queries.count()
    assert(cand < allPairs / 2,
      s"candidate set $cand not meaningfully blocked vs $allPairs")
  }
}

package graft

import graft.ml.DimReduce
import org.scalatest.funsuite.AnyFunSuite

/** SVD dimension reduction (reference utils.py:304-310):
  * norm -> TruncatedSVD(k) -> norm, re-expressed as a distributed Gram
  * matrix + local eigendecomposition + broadcast projection.
  */
class DimReduceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Dim = 8

  /** 200 vectors inside a rank-2 subspace spanned by e0+e1 and e2-e3.
    * The second direction carries much less variance (0.3x) so the two
    * top eigenvalues are well separated — with near-degenerate
    * eigenvalues the eigenbasis within the subspace is ill-conditioned
    * and FP summation order would rotate it, which is an artifact of
    * the fixture, not the operator.
    */
  private def fixture(parts: Int) = {
    import spark.implicits._
    val b1 = Array(1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val b2 = Array(0.0, 0.0, 1.0, -1.0, 0.0, 0.0, 0.0, 0.0)
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      val (a, b) = (rnd.nextGaussian(), 0.3 * rnd.nextGaussian())
      (i.toLong, Array.tabulate(Dim)(j => (a * b1(j) + b * b2(j)).toFloat))
    }.toDF("vec_id", "embedding").repartition(parts)
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("rank-2 data reduced to k=2 preserves pairwise cosine geometry; " +
    "outputs are unit-norm k-vectors") {
    val df = fixture(3)
    val orig = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val red = DimReduce.svdReduce(df, "vec_id", "embedding", 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(red.values.forall(_.length == 2))
    red.values.foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not unit norm: $n")
    }
    // cosine between any two rows is identical before/after (rank-2
    // subspace fits entirely in the top-2 singular directions)
    val ids = orig.keys.toSeq.sorted.take(30)
    for (a <- ids; b <- ids if a < b) {
      val c0 = cosine(orig(a), orig(b))
      val c1 = cosine(red(a), red(b))
      assert(math.abs(c0 - c1) < 1e-4, s"cosine drift $a-$b: $c0 vs $c1")
    }
  }

  test("input contract: array<double> accepted, NULL vectors propagate, " +
    "empty/all-NULL input fails fast with a clear message") {
    import spark.implicits._
    // double-typed embeddings (the ADVICE ClassCastException case)
    val dd = Seq(
      (1L, Some(Array(1.0, 0.0, 0.0))),
      (2L, Some(Array(0.0, 1.0, 0.0))),
      (3L, Option.empty[Array[Double]]))
      .toDF("vec_id", "embedding")
    val red = DimReduce.svdReduce(dd, "vec_id", "embedding", 2)
      .orderBy("vec_id").collect()
    assert(red.length == 3)
    assert(!red(0).isNullAt(1) && red(0).getSeq[Float](1).length == 2)
    assert(red(2).isNullAt(1), "NULL vector must propagate as NULL")
    // empty input: clear driver-side error, not a task NPE
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      DimReduce.fitV(empty, "embedding", 2)
    }
    assert(e.getMessage.contains("no non-null"))
    // non-array column: clear message
    val bad = Seq((1L, "x")).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      DimReduce.fitV(bad, "embedding", 1)
    }
    assert(e2.getMessage.contains("array type"))
  }

  test("result is invariant to input partitioning (deterministic sign " +
    "fix + order-stable accumulation)") {
    val r2 = DimReduce.svdReduce(fixture(2), "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val r5 = DimReduce.svdReduce(fixture(5), "vec_id", "embedding", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    r2.foreach { case (id, v) =>
      v.zip(r5(id)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-5, s"id=$id: $x vs $y")
      }
    }
  }
}

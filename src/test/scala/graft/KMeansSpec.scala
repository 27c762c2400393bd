package graft

import graft.ml.KMeansCluster
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic Lloyd's k-means (reference clustering.py:8-31):
  * blob recovery, partitioning invariance, empty-cluster handling.
  */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Dim = 8

  /** 3 well-separated blobs (centers 6 apart, sigma 0.3). */
  private def blobs(parts: Int) = {
    import spark.implicits._
    val centers = Seq(
      Array.tabulate(Dim)(j => if (j == 0) 6.0 else 0.0),
      Array.tabulate(Dim)(j => if (j == 1) 6.0 else 0.0),
      Array.tabulate(Dim)(j => if (j == 2) 6.0 else 0.0))
    val rnd = new scala.util.Random(13)
    (0 until 150).map { i =>
      val c = i % 3
      (i.toLong, c,
        centers(c).map(x => (x + 0.3 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "truth", "embedding").repartition(parts)
  }

  test("recovers well-separated blobs (assignment = a relabeling of " +
    "the true groups) and is invariant to input partitioning") {
    val df3 = blobs(3)
    val a3 = KMeansCluster.assign(df3, "vec_id", "embedding", 3, 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // each true blob maps to exactly one cluster and vice versa
    val truth = df3.select("vec_id", "truth").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mapping = truth.groupBy(_._2).map { case (tr, ids) =>
      tr -> ids.keys.map(a3).toSet
    }
    assert(mapping.values.forall(_.size == 1),
      s"blob split across clusters: $mapping")
    assert(mapping.values.map(_.head).toSet.size == 3,
      "two blobs merged into one cluster")
    // partitioning invariance (decimal-routed means are order-free)
    val a7 = KMeansCluster.assign(blobs(7), "vec_id", "embedding", 3, 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a3 == a7)
  }

  test("empty clusters keep their previous centroid; k > points fails " +
    "with a clear message; NULL vectors are excluded") {
    import spark.implicits._
    // two groups of IDENTICAL points, k=3: at least one centroid ties
    // with another (duplicate-seed or abandoned) and goes empty after
    // the id-tiebreak — it must keep its previous centroid (no NaN)
    val df = ((1L to 5L).map(i => (i, Some(Array(0.0f, 0.0f)))) ++
      (6L to 10L).map(i => (i, Some(Array(9.0f, 9.0f)))) :+
      (11L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val a = KMeansCluster.assign(df, "vec_id", "embedding", 3, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == 10, "NULL vector row must be excluded")
    // identical points always land in the same cluster (id tiebreak),
    // and the two groups land in different clusters
    assert((1L to 5L).map(a).toSet.size == 1)
    assert((6L to 10L).map(a).toSet.size == 1)
    assert(a(1L) != a(6L))
    val e = intercept[IllegalArgumentException] {
      KMeansCluster.fit(df, "vec_id", "embedding", 20, 1)
    }
    assert(e.getMessage.contains("non-null vectors"))
  }

  test("ragged embedding lengths fail fast with a clear message " +
    "(no silent zip_with NULL padding)") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      KMeansCluster.assign(df, "vec_id", "embedding", 2, 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ragged embedding length")),
      s"unexpected error: $e")
  }

  test("fit at iters=0 returns the seeded init (hash-ranked ids), " +
    "reproducibly") {
    val df = blobs(2)
    val c1 = KMeansCluster.fit(df, "vec_id", "embedding", 3, 0)
    val c2 = KMeansCluster.fit(df, "vec_id", "embedding", 3, 0)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 3 && c1.forall(_.length == Dim))
  }
}

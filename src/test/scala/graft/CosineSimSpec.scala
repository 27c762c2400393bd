package graft

import graft.functions.{CosineSim, VecOps}
import graft.score.Embed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("codegen expression == HOF form == plain-Scala Embed.cosine") {
    import spark.implicits._
    val pairs = (0 until 50).map { i =>
      (Embed.embed(s"surface $i"), Embed.embed(s"other ${i * 7}"))
    }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      CosineSim.cosine_sim($"a", $"b").as("cg"),
      VecOps.cosine($"a", $"b").as("hof")).collect()
    rows.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == r.getDouble(1), "codegen != HOF")
      // Embed.cosine returns the raw dot of float-normalized vectors
      // (norms are 1 +- float ulp); CosineSim divides by exact norms, so
      // they agree to ~1e-7, not bitwise
      assert(math.abs(r.getDouble(0) - Embed.cosine(a, b)) < 1e-6)
    }
  }

  test("SQL registration via function registry and via extensions") {
    import spark.implicits._
    CosineSim.register(spark)
    Seq((Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)), (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c")
      .as[Double].collect()
    assert(math.abs(r(0) - 0.0) < 1e-12 && math.abs(r(1) - 1.0) < 1e-12)
  }

  test("null safety and double arrays") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(2.0, 1.0))),
      (None, Some(Seq(1.0, 1.0)))).toDF("a", "b")
    val out = df.select(CosineSim.cosine_sim($"a", $"b")).collect()
    assert(math.abs(out(0).getDouble(0) - 0.8) < 1e-12)
    assert(out(1).isNullAt(0))
  }
}

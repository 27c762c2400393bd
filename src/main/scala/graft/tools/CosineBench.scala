package graft.tools

import graft.functions.{CosineSim, VecOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-bench: HOF cosine vs native codegen CosineSim on a
  * brute-force all-pairs scan.
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    emb.count()
    val q = emb.limit(40)
      .select($"vec_id".as("qid"), $"embedding".as("qe")).cache()
    q.count()

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    val pairs = emb.crossJoin(broadcast(q))
    time("hof     ") {
      pairs.select(sum(VecOps.cosine($"qe", $"embedding"))).head(); pairs.count()
    }
    time("codegen ") {
      pairs.select(sum(CosineSim.cosine_sim($"qe", $"embedding"))).head(); pairs.count()
    }
    // identical values?
    val a = pairs.select(round(VecOps.cosine($"qe", $"embedding"), 12).as("c"))
      .agg(sum($"c")).head().getDouble(0)
    val b = pairs.select(round(CosineSim.cosine_sim($"qe", $"embedding"), 12).as("c"))
      .agg(sum($"c")).head().getDouble(0)
    println(s"sum(hof)=$a sum(codegen)=$b equal=${a == b}")
    spark.stop()
  }
}

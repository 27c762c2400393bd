package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (round 6): A/B Spread.ensure on the ANN corpus side
  * (bruteForceTopK shape) in one session.
  */
object AnnSpreadProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    def brute(spread: Boolean): Long = {
      val corpus = if (spread)
        graft.plans.Spread.ensure(emb, col("vec_id")) else emb
      val q = emb.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("__qe"))
      val scored = corpus.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          round(graft.functions.CosineSim.cosine_sim(
            col("__qe"), col("embedding")), 6).as("cos_sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
    }
    brute(false); brute(true) // warmup
    (1 to 4).foreach { rep =>
      Seq(false, true).foreach { s =>
        val t0 = System.nanoTime()
        val n = brute(s)
        println(f"brute spread=$s rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    }
    spark.stop()
  }
}

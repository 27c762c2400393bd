package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): A/B the Spread.ensure on the jaccard doc table
  * (applied before the shingle projection) at both bench thresholds.
  */
object JacSpreadProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def run(spread: Boolean, t: Double): Long = {
      val src = if (spread) graft.plans.Spread.ensure(docs, col("doc_id"))
      else docs
      graft.dedup.Dedup.jaccardPairsOnSets(
        src.select(col("doc_id"),
          graft.dedup.Dedup.shingles(col("text")).as("__sh")),
        "doc_id", "__sh", t).count()
    }
    Seq(0.1, 0.7).foreach { t => run(false, t); run(true, t) } // warmup
    (1 to 3).foreach { rep =>
      Seq(0.1, 0.7).foreach { t =>
        Seq(false, true).foreach { s =>
          val t0 = System.nanoTime()
          val n = run(s, t)
          println(f"t=$t spread=$s rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
        }
      }
    }
    spark.stop()
  }
}

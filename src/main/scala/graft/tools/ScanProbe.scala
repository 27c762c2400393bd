package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 6): scan parallelism of the sf tables + steady-state
  * reps of individual queries, for isolating Spread/cut effects.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val qs = args.lift(1).map(_.split(",").toSeq).getOrElse(
      Seq("q_text_ctfidf", "q_cluster_kmeans", "q_ann_brute"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("documents", "embeddings", "lineitem", "events").foreach { t =>
      println(s"$t scan partitions: " +
        spark.read.parquet(s"$d/$t.parquet").rdd.getNumPartitions)
    }
    def time[T](n: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    qs.foreach { q =>
      (1 to 4).foreach { i =>
        time(s"$q rep$i") { graft.SparkEntry.queries(q)(spark, d).count() }
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query at a given sf dir. */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"QTIME $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): job-level breakdown of q_threshold_sweep —
  * where does ~1.1 s go (GlobalRank checkpoint, totals, final action)?
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SPROF $n%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val ev = time("scan+select (noop)") {
        val e = spark.read.parquet(s"$d/events.parquet")
          .select(col("event_id"), col("value"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("label"))
        e.write.format("noop").mode("overwrite").save()
        e
      }
      val ranged = time("range+ckpt") {
        ev.repartitionByRange(32, col("value").desc, col("event_id"))
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint()
      }
      time("window+offsets (noop)") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__pid"))
          .orderBy(col("value").desc, col("event_id"))
        val local = ranged
          .withColumn("rl", row_number().over(w))
          .withColumn("cl", sum(col("label")).over(
            w.rowsBetween(Long.MinValue, 0)))
        local.write.format("noop").mode("overwrite").save()
      }
      time("full query (count)") {
        graft.SparkEntry.queries("q_threshold_sweep")(spark, d).count()
      }
    }
    spark.stop()
  }
}

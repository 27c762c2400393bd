package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 6): A/B Spread.ensure on the lineitem fact scans
  * of q_agg_pricing / q_join_broadcast / q_join_star shapes.
  */
object RelSpreadProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sumd(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(18,4)")).cast("double")
    def li(spread: Boolean): DataFrame = {
      val t = spark.read.parquet(s"$d/lineitem.parquet")
      if (spread) graft.plans.Spread.ensure(t,
        col("l_orderkey"), col("l_linenumber")) else t
    }
    def pricing(s: Boolean): Long =
      li(s).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sumd(col("l_quantity")).as("sq"),
          sumd(col("l_extendedprice")).as("sp"),
          (sumd(col("l_discount")) / count(lit(1))).as("ad"),
          count(lit(1)).as("n")).count()
    def joinB(s: Boolean): Long =
      li(s).join(broadcast(spark.read.parquet(s"$d/part.parquet")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sumd(col("l_quantity")), count(lit(1))).count()
    Seq(false, true).foreach { s => pricing(s); joinB(s) } // warmup
    (1 to 3).foreach { rep =>
      Seq(false, true).foreach { s =>
        var t0 = System.nanoTime()
        pricing(s)
        println(f"pricing spread=$s rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
        t0 = System.nanoTime()
        joinB(s)
        println(f"joinB   spread=$s rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): does one CC round's neighbor-min join reuse the
  * pre-partitioned+pre-sorted checkpointed sym frame (no Exchange/Sort
  * above its scan), and what does a round cost on a mid-size graph?
  */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cut = graft.plans.LineageCut.Default
    // chain graph of n vertices (worst diameter) + some cross edges
    val edges = spark.range(0, n - 1)
      .select(concat(lit("e"), format_string("%08d", col("id"))).as("src"),
        concat(lit("e"), format_string("%08d", col("id") + 1)).as("dst"))
    val vertices = spark.range(0, n)
      .select(concat(lit("e"), format_string("%08d", col("id")))
        .as("entity_id"))
    // replicate the internal shapes
    val parts = spark.sessionState.conf.numShufflePartitions
    val sym = cut.cut(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("dst"))
      .sortWithinPartitions(col("dst")))
    val labels = cut.cut(vertices
      .select(col("entity_id"), col("entity_id").as("canonical_id")))
    val neighborMin = sym
      .join(labels, sym("dst") === labels("entity_id"))
      .groupBy(sym("src").as("entity_id"))
      .agg(min(col("canonical_id")).as("__nbr_min"))
    println("=== one-round neighborMin plan ===")
    println(neighborMin.queryExecution.executedPlan.toString.take(4000))
    // timed full CC
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val cc = graft.canon.Canonicalize.connectedComponentsFast(
        spark, vertices, edges)
      val cnt = cc.count()
      println(f"CC chain-$n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$cnt")
    }
    spark.stop()
  }
}

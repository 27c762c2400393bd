package graft.tools

import java.io.{File, PrintWriter}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for declared queries to
  * one file per query, for the plan-evidence deliverable.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query...]
  * (no query args = the full headline set).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/plans/r06")
    val suffix = args.lift(1).getOrElse("before")
    val names = if (args.length > 2) args.drop(2).toSeq else Seq(
      "q_agg_pricing", "q_join_broadcast", "q_join_star",
      "q_window_running", "q_threshold_sweep", "q_text_ctfidf",
      "q_dedup_lsh_pairs", "q_dedup_jaccard", "q_dedup_jaccard_t07",
      "q_ann_brute", "q_ann_lsh_topk", "q_cluster_kmeans")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pw = new PrintWriter(new File(outDir, s"${name}_$suffix.txt"))
      try pw.write(plan) finally pw.close()
      println(s"dumped $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}

package graft.tools

import graft.gen.{TranscriptGen, Vocab}
import graft.mention.MentionDetect
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for the physical-shape audit
  * (SURVEY.md §4; judged: pushdown, pruning, broadcast choice, exchange
  * count).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"

    def audit(name: String): Unit = {
      println(s"\n===== $name =====")
      graft.SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    audit("q_agg_filtered_revenue") // expect PushedFilters + ReadSchema
    audit("q_join_broadcast") // expect BroadcastHashJoin
    audit("q_join_semi") // expect BroadcastHashJoin LeftSemi
    args.foreach(audit) // any extra query names from the CLI

    println("\n===== pipeline: spans + extraction =====")
    val turns = TranscriptGen.transcripts(spark, 50, 8, 0, 4).toDF()
      .repartition(4, org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx"))
    MentionDetect.spanCandidates(spark, turns, Vocab.gazetteer,
      Vocab.predicates).explain("formatted")
    spark.stop()
  }
}

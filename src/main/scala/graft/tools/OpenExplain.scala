package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: plan audit of the fused runOpen's two passes —
  * verifies the open-surface scan prunes the turn table's columns at
  * the parquet reader. Usage: runMain graft.tools.OpenExplain
  */
object OpenExplain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("openexplain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = System.getProperty("java.io.tmpdir")
    val p = s"$tmp/openexplain_turns"
    graft.gen.TranscriptGen.transcripts(spark, 100, 4, 0, 2)
      .write.mode("overwrite").parquet(p)
    val turns = spark.read.parquet(p)
    val gaz = graft.gen.Vocab.entities
      .flatMap(e => e.canonical +: e.aliases).map(_.toLowerCase)
      .distinct.sorted.filter(_.split(" ").length <= 2)
    val surf = graft.mention.MentionDetect.openMentions(spark, turns, gaz)
      .toDF().select(col("surface")).distinct()
    val plan = surf.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan)
      .getOrElse("ReadSchema not found")
    println("OPEN_SURF_" + readSchema)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Dev harness: wall of the wide open-vocabulary canonicalization via
  * the library entry point. Usage: runMain graft.tools.CanonTime [cpus]
  */
object CanonTime {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("canontime")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.read.parquet(
      System.getProperty("java.io.tmpdir") + "/opentime_wide")
    val gaz = graft.gen.Vocab.entities
      .flatMap(e => e.canonical +: e.aliases).map(_.toLowerCase)
      .distinct.sorted.filter(_.split(" ").length <= 2)
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val surf = t("openMentions+distinct") {
      val s = graft.mention.MentionDetect.openMentions(spark, df, gaz)
        .toDF().select(col("surface")).distinct()
        .select(concat(lit("open:"), col("surface")).as("entity_id"),
          array(col("surface")).as("surfaces")).localCheckpoint()
      println("  surfaces=" + s.count()); s
    }
    (1 to 2).foreach { i =>
      t(s"canonicalMapDfTracked rep$i") {
        val r = graft.canon.Canonicalize.canonicalMapDfTracked(spark, surf)
        println("  path=" + r.path + " n=" + r.map.count())
      }
    }
    spark.stop()
  }
}

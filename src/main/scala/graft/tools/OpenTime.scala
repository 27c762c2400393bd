package graft.tools

import graft.gen.TranscriptGen
import graft.pipeline.KgPipeline

/** Dev harness: times runOpen fused vs composed on a bench-shaped open
  * corpus, plus the wide-vocabulary (distributed-canon) variant.
  * Usage: runMain graft.tools.OpenTime [convs] [cpus]
  */
object OpenTime {
  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("opentime")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = System.getProperty("java.io.tmpdir")
    val p1 = s"$tmp/opentime_small"
    val p2 = s"$tmp/opentime_wide"
    TranscriptGen.openTranscripts(spark, convs, 8,
      TranscriptGen.MaxOpenBases, cpus * 2).write.mode("overwrite").parquet(p1)
    TranscriptGen.openTranscriptsWide(spark, convs, 8, 8000, cpus * 2)
      .write.mode("overwrite").parquet(p2)
    def time(label: String, path: String, fastMax: Int): Unit = {
      val df = spark.read.parquet(path)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val r = KgPipeline.runOpen(spark, df, shufflePartitions = cpus,
          gazetteerFastPathMax = fastMax)
        val n = r.triples.count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"$label rep$i wall=$w%.2f s triples=$n tput=${n / w}%.0f/s canon=${r.canonPath}")
      }
    }
    time("fused   ", p1, KgPipeline.GazetteerFastPathMax)
    time("composed", p1, 0)
    time("wide-fused", p2, KgPipeline.GazetteerFastPathMax)
    spark.stop()
  }
}

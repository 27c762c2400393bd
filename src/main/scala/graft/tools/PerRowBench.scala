package graft.tools

import graft.extract.TurnExtract
import graft.gen.Vocab
import org.apache.spark.sql.SparkSession

/** Dev tool: per-row (stream-safe) extraction path vs the pipeline's
  * Catalyst-candidates path, on the standard bench corpus.
  */
object PerRowBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_bench_turns"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val turns = spark.read.parquet(path).as[graft.schema.Turn]
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val n = TurnExtract.timedTriplesFromTurns(spark, turns,
        Vocab.gazetteer, Vocab.entities, Vocab.minLinkScore,
        Vocab.predicates).count()
      println(f"PERROW cpus=$cpus rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s triples=$n")
    }
    spark.stop()
  }
}

package graft.tools

import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Dev tool: one fused KG run over a pre-generated corpus. */
object FusedRun {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val path = args.lift(1).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_bench_turns")
    // positional-order tolerant: "staged" and a numeric parts override
    // may appear in either of args(2)/args(3)
    val parts = args.drop(2).find(_.forall(_.isDigit)).map(_.toInt)
      .getOrElse(cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Hadoop vectored IO opens a fresh AsynchronousFileChannel (plus its
      // own thread pool) per read on RawLocalFileSystem — stack-sampled as
      // the dominant blocker at 32 threads. Plain positional reads win on
      // local disk.
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val staged = args.exists(_ == "staged")
    val turns = spark.read.parquet(path)
    val walls = (1 to 4).map { i =>
      val t0 = System.nanoTime()
      val n = KgPipeline.run(spark, turns, shufflePartitions = parts,
        gazetteerFastPathMax =
          if (staged) 0 else KgPipeline.GazetteerFastPathMax)
        .triples.count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"FUSED cpus=$cpus parts=$parts staged=$staged rep=$i " +
        f"triples=$n wall=$w%.2f s")
      w
    }
    println(f"FUSED cpus=$cpus parts=$parts staged=$staged " +
      f"min=${walls.drop(1).min}%.2f s")
    spark.stop()
  }
}

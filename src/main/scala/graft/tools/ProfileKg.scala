package graft.tools

import graft.gen.{TranscriptGen, Vocab}
import graft.link.EntityLink
import graft.mention.MentionDetect
import graft.schema._
import graft.triple.TripleExtract
import org.apache.spark.sql.SparkSession

/** Stage-level wall-clock profiler for the KG pipeline (dev tool). */
object ProfileKg {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val convs = args.lift(1).getOrElse("100000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Hadoop vectored IO opens a fresh AsynchronousFileChannel (plus its
      // own thread pool) per read on RawLocalFileSystem — stack-sampled as
      // the dominant blocker at 32 threads. Plain positional reads win on
      // local disk.
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val path = s"${System.getProperty("java.io.tmpdir")}/graft_profile_turns"
    time("gen+write") {
      TranscriptGen.transcripts(spark, convs, 8, convs / 5, cpus * 2)
        .write.mode("overwrite").parquet(path)
    }
    val turns = spark.read.parquet(path)
    val mentions = time("mentions") {
      MentionDetect.mentions(spark, turns, Vocab.gazetteer)
        .localCheckpoint()
    }
    println(s"  mentions rows: ${mentions.count()}")
    val linked = time("link") {
      EntityLink.link(spark, mentions, Vocab.entities, Vocab.minLinkScore)
        .localCheckpoint()
    }
    println(s"  linked rows: ${linked.count()}")
    val triples = time("triples") {
      TripleExtract.triples(spark, turns, linked, Vocab.predicates, cpus)
        .localCheckpoint()
    }
    println(s"  triples rows: ${triples.count()}")
    val canon = time("canon") {
      graft.canon.Canonicalize.canonicalMap(spark, Vocab.entities)
        .localCheckpoint()
    }
    time("relabel+edges") {
      val re = graft.graph.Materialize.relabel(spark, triples.as[Triple], canon)
      println(s"  edges: ${graft.graph.Materialize.edges(spark, re).count()}")
    }
    spark.stop()
  }
}

package graft.tools

import graft.text.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level wall breakdown of the prefix-filtered jaccard
  * operator on the documents table.
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"JPROF $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val df = spark.read.parquet(s"$sfDir/documents.parquet")
      val threshold = 0.1
      val docs = time("shingles") {
        df.select(col("doc_id"),
            graft.dedup.Dedup.shingles(col("text")).as("sh"))
          .filter(size(col("sh")) > 0).localCheckpoint()
      }
      val posting = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val dfreq = time("dfreq") {
        posting.groupBy(col("g")).agg(count(lit(1)).as("df")).localCheckpoint()
      }
      val ordered = time("order+prefix") {
        val o = posting.join(dfreq, "g")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("df"), col("g"))))
            .as("ord"), count(lit(1)).as("n_sh"))
        val prefixLen = (col("n_sh") -
          ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1).cast("int")
        o.select(col("doc_id"),
            explode(slice(col("ord.g"), lit(1), prefixLen)).as("g"))
          .localCheckpoint()
      }
      val cand = time("self-join") {
        ordered.alias("a")
          .join(ordered.alias("b").hint("shuffle_hash"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
          .distinct().localCheckpoint()
      }
      println(s"  candidates: ${cand.count()}")
      time("verify") {
        cand
          .join(docs.select(col("doc_id").as("src"), col("sh").as("sha")), "src")
          .join(docs.select(col("doc_id").as("dst"), col("sh").as("shb")), "dst")
          .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jaccard", col("common").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("common")))
          .filter(col("jaccard") >= threshold).count()
      }
    }
    spark.stop()
  }
}

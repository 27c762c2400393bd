package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-level wall breakdown + per-filter candidate counts
  * of the prefix-filtered jaccard operator on the documents table, at a
  * given threshold (arg 2, default 0.1).
  */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.1)
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
      println(s"--- rep $rep (t=$threshold)")
      val df = spark.read.parquet(s"$sfDir/documents.parquet")
      val docs = time("shingles") {
        df.select(col("doc_id"),
            sort_array(graft.dedup.Dedup.shingles(col("text"))).as("sh"))
          .filter(size(col("sh")) > 0).localCheckpoint()
      }
      val posting = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val dfreq = time("dfreq") {
        posting.groupBy(col("g")).agg(count(lit(1)).as("df")).localCheckpoint()
      }
      val prefixes = time("order+prefix") {
        val o = posting.join(dfreq, "g")
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("df"), col("g"))))
            .as("ord"), count(lit(1)).as("n_sh"))
        val prefixLen = (col("n_sh") -
          ceil(lit(threshold) * col("n_sh") - lit(1e-9) * col("n_sh")) + 1)
          .cast("int")
        o.select(col("doc_id"),
            posexplode(slice(col("ord.g"), lit(1), prefixLen))
              .as(Seq("pos0", "g")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("g"))
          .localCheckpoint()
      }
      println(s"  prefix postings: ${prefixes.count()} " +
        s"(full: ${posting.count()})")
      val cand = time("self-join") {
        prefixes.alias("a")
          .join(prefixes.alias("b").hint("shuffle_hash"),
            col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
          .agg(min(col("a.pos")).as("pa"), min(col("b.pos")).as("pb"))
          .localCheckpoint()
      }
      println(s"  candidate pairs: ${cand.count()}")
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
      val joined = cand
        .join(sizes.select(col("doc_id").as("src"), col("n").as("na")), "src")
        .join(sizes.select(col("doc_id").as("dst"), col("n").as("nb")), "dst")
        .localCheckpoint()
      val afterLen = joined
        .filter(least(col("na"), col("nb")).cast("double") >=
          (lit(threshold) - lit(1e-9)) * greatest(col("na"), col("nb")))
        .localCheckpoint()
      println(s"  after length filter: ${afterLen.count()}")
      val minOverlap =
        ceil(lit(threshold / (1.0 + threshold)) * (col("na") + col("nb"))
          - lit(1e-9) * (col("na") + col("nb")))
      val afterPos = afterLen
        .filter(lit(1) +
          least(col("na") - col("pa"), col("nb") - col("pb")) >= minOverlap)
        .localCheckpoint()
      println(s"  after positional filter: ${afterPos.count()}")
      val withArrays = afterPos
        .join(docs.select(col("doc_id").as("src"), col("sh").as("sha")),
          "src")
        .join(docs.select(col("doc_id").as("dst"), col("sh").as("shb")),
          "dst")
        .localCheckpoint()
      time("verify-plain") {
        val n = withArrays
          .withColumn("common",
            graft.functions.SortedIntersectSize.sorted_intersect_size(
              col("sha"), col("shb")))
          .withColumn("jaccard", col("common").cast("double") /
            (col("na") + col("nb") - col("common")))
          .filter(col("jaccard") >= threshold).count()
        println(s"  result pairs: $n")
      }
      time("verify-bounded") {
        val n = withArrays
          .withColumn("common",
            graft.functions.SortedIntersectSize.sorted_intersect_at_least(
              col("sha"), col("shb"), minOverlap.cast("int")))
          .filter(col("common") >= 0)
          .withColumn("jaccard", col("common").cast("double") /
            (col("na") + col("nb") - col("common")))
          .filter(col("jaccard") >= threshold).count()
        println(s"  result pairs: $n")
      }
    }
    spark.stop()
  }
}

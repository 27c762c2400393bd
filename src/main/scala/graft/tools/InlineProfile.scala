package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: decompose the inline-broadcast jaccard plan's single
  * codegen stage — (a) candidate join emissions only, (b) + lookup
  * verify, (c) full pipeline — over the documents table.
  * Usage: runMain graft.tools.InlineProfile [sfDir] [threshold]
  */
object InlineProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("inlineprofile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"IPROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val cut = graft.plans.LineageCut.Default
    for (rep <- 1 to 2) {
      println(s"--- rep $rep t=$threshold")
      val docs = cut.cut(df
        .select(col("doc_id"),
          sort_array(graft.dedup.Dedup.shingles(col("text"))).as("sh"))
        .filter(size(col("sh")) > 0))
      val posting = docs.select(col("doc_id"), explode(col("sh")).as("g"))
      val dfreq = posting.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val ordered = posting.join(dfreq, "g")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ord"),
          count(lit(1)).as("n_sh"))
      val prefixLen = (col("n_sh") -
        ceil(lit(threshold) * col("n_sh") - lit(1e-9) * col("n_sh")) + 1)
        .cast("int")
      val prefixes = cut.cut(ordered
        .select(col("doc_id"), col("n_sh").cast("int").as("n"),
          posexplode(slice(col("ord.g"), lit(1), prefixLen))
            .as(Seq("pos0", "g")))
        .select(col("doc_id"), col("n"), (col("pos0") + 1).as("pos"), col("g"))
        .repartition(32))
      val sets = graft.functions.IntersectSets.fromRows(
        docs.select(col("doc_id"), col("sh")).collect())
      val rowOverlapBound =
        ceil(lit(threshold / (1.0 + threshold)) * (col("a.n") + col("b.n"))
          - lit(1e-9) * (col("a.n") + col("b.n")))
      def joined = prefixes.alias("a")
        .join(broadcast(prefixes.alias("b")),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")).cast("double") >=
              (lit(threshold) - lit(1e-9)) * greatest(col("a.n"), col("b.n")) &&
            lit(1) + least(col("a.n") - col("a.pos"),
              col("b.n") - col("b.pos")) >= rowOverlapBound)
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
          col("a.n").as("na"), col("b.n").as("nb"))
      t("a: join+filters(noop)") {
        joined.write.format("noop").mode("overwrite").save()
      }
      val minOverlap =
        ceil(lit(threshold / (1.0 + threshold)) * (col("na") + col("nb"))
          - lit(1e-9) * (col("na") + col("nb")))
      def verified = joined
        .withColumn("common", graft.functions.EvalOnce.eval_once(
          graft.functions.SortedIntersectLookupAtLeast
            .sorted_intersect_lookup(
              col("src"), col("dst"), minOverlap.cast("int"), sets)))
        .filter(col("common") >= 0)
        .withColumn("jaccard", col("common").cast("double") /
          (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= threshold)
      t("b: +lookup verify(noop)") {
        verified.write.format("noop").mode("overwrite").save()
      }
      t("c: full (count)") {
        val n = graft.dedup.Dedup.jaccardPairs(df, "doc_id", "text",
          threshold).count()
        println(s"  pairs=$n")
      }
    }
    spark.stop()
  }
}

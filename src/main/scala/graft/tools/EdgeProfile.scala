package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: stage breakdown of the exact jaccard candidate/verify
  * pipeline over the OPEN entity surface table (the kg_open_large
  * canonicalization wall). Reads the corpus written by OpenProfile.
  * Usage: runMain graft.tools.EdgeProfile [cpus] [threshold]
  */
object EdgeProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("edgeprofile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val turns = spark.read.parquet(s"$tmp/openprofile_wide")
    val gaz = graft.gen.Vocab.entities
      .flatMap(e => e.canonical +: e.aliases).map(_.toLowerCase)
      .distinct.sorted.filter(_.split(" ").length <= 2)
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"EPROF $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val surf = graft.mention.MentionDetect.openMentions(spark, turns, gaz)
      .toDF().select($"surface").distinct()
      .select(concat(lit("open:"), $"surface").as("entity_id"),
        array($"surface").as("surfaces")).localCheckpoint()
    println(s"surfaces=${surf.count()}")
    val withSh = graft.canon.Canonicalize.withShingles(surf)
      .select($"entity_id", $"shingles")

    // the real operator entry under both physical dispatches
    for (rep <- 1 to 2) {
      t(s"pairsOnSets inline r$rep") {
        val n = graft.dedup.Dedup.jaccardPairsOnSets(
          withSh, "entity_id", "shingles", threshold).count()
        println(s"  pairs=$n")
      }
      t(s"pairsOnSets staged r$rep") {
        val n = graft.dedup.Dedup.jaccardPairsOnSets(
          withSh, "entity_id", "shingles", threshold,
          inlineMaxPostings = 0, inlineMaxDocs = 0).count()
        println(s"  pairs=$n")
      }
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep (t=$threshold)")
      val docs = t("shingles(ckpt)") {
        withSh.select($"entity_id",
            sort_array(array_distinct($"shingles")).as("sh"))
          .filter(size($"sh") > 0).localCheckpoint()
      }
      val posting = docs.select($"entity_id", explode($"sh").as("g"))
      val dfreq = posting.groupBy($"g").agg(count(lit(1)).as("df"))
      val prefixes = t("prefix(ckpt)") {
        val ordered = posting.join(dfreq, "g")
          .groupBy($"entity_id")
          .agg(sort_array(collect_list(struct($"df", $"g"))).as("ord"),
            count(lit(1)).as("n_sh"))
        val prefixLen = ($"n_sh" -
          ceil(lit(threshold) * $"n_sh" - lit(1e-9) * $"n_sh") + 1).cast("int")
        ordered.select($"entity_id", $"n_sh".cast("int").as("n"),
            posexplode(slice($"ord.g", lit(1), prefixLen))
              .as(Seq("pos0", "g")))
          .select($"entity_id", $"n", ($"pos0" + 1).as("pos"), $"g")
          .localCheckpoint()
      }
      println(s"  prefix postings=${prefixes.count()}")
      val rowOverlapBound =
        ceil(lit(threshold / (1.0 + threshold)) * ($"a.n" + $"b.n")
          - lit(1e-9) * ($"a.n" + $"b.n"))
      val candF = t("cand join+agg(ckpt)") {
        prefixes.alias("a")
          .join(prefixes.alias("b").hint("shuffle_hash"),
            $"a.g" === $"b.g" && $"a.entity_id" < $"b.entity_id" &&
              least($"a.n", $"b.n").cast("double") >=
                (lit(threshold) - lit(1e-9)) * greatest($"a.n", $"b.n") &&
              lit(1) + least($"a.n" - $"a.pos",
                $"b.n" - $"b.pos") >= rowOverlapBound)
          .groupBy($"a.entity_id".as("src"), $"b.entity_id".as("dst"))
          .agg(min($"a.n").as("na"), min($"b.n").as("nb"))
          .localCheckpoint()
      }
      println(s"  candidates=${candF.count()}")
      val minOverlap =
        ceil(lit(threshold / (1.0 + threshold)) * ($"na" + $"nb")
          - lit(1e-9) * ($"na" + $"nb"))
      t("verify(count)") {
        val n = candF
          .join(docs.select($"entity_id".as("src"), $"sh".as("sha")), "src")
          .join(docs.select($"entity_id".as("dst"), $"sh".as("shb")), "dst")
          .withColumn("common",
            graft.functions.SortedIntersectSize.sorted_intersect_at_least(
              $"sha", $"shb", minOverlap.cast("int")))
          .filter($"common" >= 0)
          .withColumn("jaccard", $"common".cast("double") /
            ($"na" + $"nb" - $"common"))
          .filter($"jaccard" >= threshold).count()
        println(s"  verified=$n")
      }
    }
    spark.stop()
  }
}

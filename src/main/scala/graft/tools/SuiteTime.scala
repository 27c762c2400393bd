package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (round 6): time the full headline query suite with the same
  * protocol shape as Bench.suitePass — one warmup query + throwaway
  * sentinel, then N passes over all 12 headline queries (sentinel before
  * each), min per query — in ONE JVM so optimization iterations don't
  * pay a bench run. Not a bench artifact; numbers quoted in
  * OPTIMIZATION_r06.md cite this tool explicitly.
  */
object SuiteTime {
  private val headline = Seq(
    "q_agg_pricing", "q_join_broadcast", "q_join_star", "q_window_running",
    "q_threshold_sweep", "q_text_ctfidf", "q_dedup_lsh_pairs",
    "q_dedup_jaccard", "q_dedup_jaccard_t07", "q_ann_brute",
    "q_ann_lsh_topk", "q_cluster_kmeans")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).map(_.split(",").toSet)
    val qs = only.map(o => headline.filter(o)).getOrElse(headline)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sentinel(): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        spark.range(0, 800000000L, 1, 32)
          .selectExpr("bit_xor(xxhash64(id))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    try graft.SparkEntry.queries("q_join_star")(spark, dir).count()
    catch { case _: Throwable => () }
    sentinel() // throwaway: JIT
    val results = scala.collection.mutable.Map[String, List[Double]]()
    (1 to passes).foreach { p =>
      val s = sentinel()
      println(f"PASS $p sentinel $s%.3f")
      qs.foreach { name =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        results(name) = t :: results.getOrElse(name, Nil)
        println(f"  $name%-22s $t%.3f s rows=$n")
      }
    }
    println("== MIN per query ==")
    var total = 0.0
    qs.foreach { name =>
      val m = results(name).min
      total += m
      println(f"MIN $name%-22s $m%.3f")
    }
    println(f"MIN-TOTAL (12q) $total%.3f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (round 6): A/B the cTfIdf physical variants —
  * baseline (no spread, no cut), spread-only, cut-only, spread+cut —
  * steady-state reps, to decide which plan ships.
  */
object CtfidfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.TextOps

    def variant(df: DataFrame, spread: Boolean, cutGrouped: Boolean)
        : DataFrame = {
      val cls = "lang"
      val src = if (spread)
        graft.plans.Spread.ensure(df, col("text")) else df
      val terms = src.select(col(cls),
        explode(TextOps.tokens(col("text"))).as("term"))
      val g0 = terms.groupBy(col(cls), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val grouped = if (cutGrouped)
        graft.plans.LineageCut.Default.cut(g0) else g0
      val totals = grouped.groupBy(col(cls))
        .agg(sum(col("cnt")).as("cls_total"))
      val dfreq = grouped.groupBy(col("term"))
        .agg(countDistinct(col(cls)).as("df"))
      val nCls = df.select(countDistinct(col(cls)).as("n_cls"))
      val scored = grouped
        .join(broadcast(totals), cls)
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(nCls))
        .withColumn("tf", col("cnt").cast("double") / col("cls_total"))
        .withColumn("ctfidf",
          col("tf") * log(lit(1.0) + col("n_cls").cast("double") / col("df")))
      val w = Window.partitionBy(col(cls))
        .orderBy(col("ctfidf").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col(cls), col("rn"), col("term"), col("cnt"),
          round(col("ctfidf"), 6).as("ctfidf"))
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val cases = Seq(
      ("baseline       ", false, false),
      ("spread         ", true, false),
      ("cut            ", false, true),
      ("spread+cut     ", true, true))
    // warmup all
    cases.foreach { case (_, s, c) => variant(docs, s, c).count() }
    (1 to 3).foreach { rep =>
      cases.foreach { case (name, s, c) =>
        val t0 = System.nanoTime()
        variant(docs, s, c).count()
        println(f"$name rep$rep ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}

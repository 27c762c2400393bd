package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): micro-timings of constituent stages of the
  * small headline queries, to separate per-job overhead from compute.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$n rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    import graft.text.TextOps
    // empty job baseline: pure scheduling cost of an N-task job
    time("empty job 32 tasks") {
      spark.range(0, 32, 1, 32).count()
    }
    time("empty job 1 task") {
      spark.range(0, 1, 1, 1).count()
    }
    // 1-task tokenize+agg (the no-spread shape)
    time("tokenize+agg 1task") {
      docs.select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term")).agg(count(lit(1))).count()
    }
    // spread tokenize+agg
    time("tokenize+agg spread") {
      docs.repartition(32, col("doc_id"))
        .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term")).agg(count(lit(1))).count()
    }
    // kmeans-ish: quant + localCheckpoint at 1 vs 32 partitions
    val quant = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), transform(col("embedding").cast("array<double>"),
        x => round(x, 6)).as("q"))
    time("quant ckpt 1task") {
      quant.localCheckpoint()
    }
    time("quant ckpt spread") {
      quant.repartition(32, col("vec_id")).localCheckpoint()
    }
    val pts1 = quant.localCheckpoint()
    val pts32 = quant.repartition(32, col("vec_id")).localCheckpoint()
    // one Lloyd's-iteration-shaped job on each
    val cents = Array.fill(4)(Array.fill(64)(0.1))
    def iterJob(pts: org.apache.spark.sql.DataFrame): Unit = {
      pts.withColumn("cluster",
          graft.ml.KMeansCluster.assignExprLiteral(col("q"), cents))
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(round(sum(col("v").cast("decimal(28,10)")).cast("double") /
          count(lit(1)), 6).as("c"))
        .collect()
    }
    time("kmeans iter 1task")(iterJob(pts1))
    time("kmeans iter spread")(iterJob(pts32))
    // cosine scan 1 vs 32
    val q = emb.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qe"))
    def cosScan(c: org.apache.spark.sql.DataFrame): Unit = {
      c.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("query_id"))
        .select(round(graft.functions.CosineSim.cosine_sim(
          col("__qe"), col("embedding")), 6).as("cs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("cosine scan 1task")(cosScan(emb))
    time("cosine scan spread")(cosScan(emb.repartition(32, col("vec_id"))))
    spark.stop()
  }
}

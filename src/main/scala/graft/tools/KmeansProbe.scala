package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): per-job wall breakdown of q_cluster_kmeans
  * (prepare/cut, init, 3 Lloyd's iterations, final assign+count).
  */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"KPROF $n%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val pts = time("prepare+cut") {
        graft.plans.LineageCut.Default.cut(
          emb.filter(col("embedding").isNotNull)
            .select(col("vec_id").as("__id"),
              transform(col("embedding").cast("array<double>"),
                x => round(x, 6)).as("q")))
      }
      var cents = time("init") {
        graft.ml.KMeansCluster.initCentroids(pts, "__id", "q", 4)
      }
      (1 to 3).foreach { it =>
        cents = time(s"iter$it") {
          val cells = pts
            .withColumn("cluster",
              graft.ml.KMeansCluster.assignExprLiteral(col("q"), cents))
            .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
            .groupBy(col("cluster"), col("pos"))
            .agg(round(sum(col("v").cast("decimal(28,10)")).cast("double") /
              count(lit(1)), 6).as("c"))
            .collect()
          val next = cents.map(_.clone())
          cells.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
          next
        }
      }
      time("final assign") {
        pts.select(col("__id"),
          graft.ml.KMeansCluster.assignExprLiteral(col("q"), cents)
            .as("cluster")).count()
      }
      // variants: loop-expr assignment and/or 64-column sums (no explode)
      def iterVariant(name: String, loop: Boolean, cols: Boolean): Unit = {
        time(name) {
          val assign =
            if (loop) graft.ml.KMeansCluster.assignExprLoop(col("q"), cents)
            else graft.ml.KMeansCluster.assignExprLiteral(col("q"), cents)
          if (!cols) {
            pts.withColumn("cluster", assign)
              .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
              .groupBy(col("cluster"), col("pos"))
              .agg(round(sum(col("v").cast("decimal(28,10)")).cast("double") /
                count(lit(1)), 6).as("c"))
              .collect()
          } else {
            val aggs = (0 until 64).map(i =>
              sum(col("q").getItem(i).cast("decimal(28,10)")).as(s"s$i"))
            pts.withColumn("cluster", assign)
              .groupBy(col("cluster"))
              .agg(count(lit(1)).as("n"), aggs: _*)
              .collect()
          }
        }
      }
      iterVariant("iterV loop+explode", loop = true, cols = false)
      iterVariant("iterV lit+cols", loop = false, cols = true)
      iterVariant("iterV loop+cols", loop = true, cols = true)
    }
    spark.stop()
  }
}

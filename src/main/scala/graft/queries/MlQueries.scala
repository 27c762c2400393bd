package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-clustering driver-contract queries (reference:
  * src/pipeline/clustering.py:8-31 — KMeans over the encoded corpus).
  *
  * q_cluster_kmeans runs graft.ml.KMeansCluster at a FIXED iteration
  * count with hash-seeded init, so the assignment is fully
  * deterministic; the DuckDB oracle unrolls the identical Lloyd's
  * iterations (same quantization, same DECIMAL-routed centroid means,
  * same rounded-distance argmin with cluster-id tiebreak).
  */
object MlQueries {
  import Queries.t

  val K = 4
  val Iters = 3
  private val Dim = 64

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_kmeans" -> ((s, d) => {
      graft.ml.KMeansCluster.assign(t(s, d, "embeddings"),
        "vec_id", "embedding", K, Iters).orderBy(col("vec_id"))
    }),
  )

  /** per-dimension DECIMAL-routed mean, the exact Spark formula:
    * round(cast(sum(cast(q[i] as decimal(28,10))) as double)/count, 6)
    */
  private def centExprs: String =
    (1 to Dim).map(i =>
      s"round(CAST(sum(CAST(q[$i] AS DECIMAL(28,10))) AS DOUBLE)" +
        s" / count(*), 6)")
      .mkString("[", ", ", "]")

  private def assignCte(n: Int, cent: String): String =
    s"""assign$n AS (
       SELECT vec_id, q, cluster FROM (
         SELECT p.vec_id, p.q, c.cluster,
           row_number() OVER (PARTITION BY p.vec_id ORDER BY
             round(list_aggregate(list_transform(list_zip(p.q, c.c),
               z -> (z[1]-z[2])*(z[1]-z[2])), 'sum'), 6), c.cluster) AS rn
         FROM pts p CROSS JOIN $cent c) WHERE rn = 1)"""

  private def centCtes(n: Int): String =
    s"""cent${n}n AS (
       SELECT cluster, $centExprs AS c FROM assign$n GROUP BY cluster),
       cent$n AS (
       SELECT p.cluster, COALESCE(nn.c, p.c) AS c
       FROM cent${n - 1} p LEFT JOIN cent${n}n nn ON p.cluster = nn.cluster)"""

  def oracle: Map[String, String] = Map(
    "q_cluster_kmeans" -> {
      val iterCtes = (1 to Iters).map(n =>
        assignCte(n, s"cent${n - 1}") + ",\n" + centCtes(n)).mkString(",\n")
      s"""WITH pts AS (
         SELECT vec_id,
           list_transform(CAST(embedding AS DOUBLE[]),
             x -> round(x, 6)) AS q
         FROM embeddings WHERE embedding IS NOT NULL),
         init AS (
         SELECT q, row_number() OVER (ORDER BY
             md5('km:' || CAST(vec_id AS VARCHAR)),
             CAST(vec_id AS VARCHAR)) - 1 AS cluster
         FROM pts),
         cent0 AS (SELECT cluster, q AS c FROM init WHERE cluster < $K),
         $iterCtes,
         ${assignCte(Iters + 1, s"cent$Iters")}
         SELECT vec_id, CAST(cluster AS INT) AS cluster
         FROM assign${Iters + 1} ORDER BY vec_id"""
    },
  )
}

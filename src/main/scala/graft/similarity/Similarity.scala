package graft.similarity

import graft.functions.CosineSim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing similarity search over an embedding column
  * (Array[Float]): brute-force cosine top-k (exactness baseline) and
  * random-hyperplane LSH bucketing (scale path — block with an equi-join
  * on bucket, score only within blocks). Cosine is the native codegen
  * expression (graft.functions.CosineSim). The driver-contract queries
  * in graft.queries.SimilarityQueries wrap these with pinned parameters.
  */
object Similarity {

  private val OddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** +/-1 hyperplane coefficient from md5 hex parity (deterministic,
    * reproducible in any engine with md5).
    */
  def coef(plane: Int, dim: Int): Double =
    if (OddHex.contains(md5hex(s"$plane:$dim").substring(0, 1))) 1.0 else -1.0

  /** Sign-bucket id over `numPlanes` hyperplanes for a `dims`-dim vector. */
  def lshBucket(e: Column, numPlanes: Int, dims: Int): Column =
    (0 until numPlanes).map { p =>
      val coefs = Array.tabulate(dims)(i => coef(p, i))
      when(aggregate(
        zip_with(e, lit(coefs), (v, c) => v.cast("double") * c),
        lit(0.0), (acc, x) => acc + x) >= 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k: broadcast the (small) query side, scan
    * candidates once (reference: search_pipeline.py:73-88).
    * Output: (query_id, rank, neighbor_id, cos_sim rounded to 6).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qe"))
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id).as("neighbor_id"),
        round(CosineSim.cosine_sim(col("__qe"), col(vec)), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"))
  }

  /** LSH-blocked top-k: equi-join on sign bucket, cosine only within
    * blocks — the 100 TB shape (candidate set per query ~ corpus /
    * 2^numPlanes).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, k: Int,
      numPlanes: Int, dims: Int): DataFrame = {
    val b = corpus.select(col(id), col(vec),
      lshBucket(col(vec), numPlanes, dims).as("__bucket"))
    val q = queries.select(col(id).as("query_id"), col(vec).as("__qe"),
      lshBucket(col(vec), numPlanes, dims).as("__bucket"))
    val scored = b.join(q, "__bucket")
      .filter(col(id) =!= col("query_id"))
      .select(col("query_id"), col(id).as("neighbor_id"),
        round(CosineSim.cosine_sim(col("__qe"), col(vec)), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos_sim"))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query registry (SURVEY.md §7.5): each entry is a
  * Spark-first implementation of one operator family from SURVEY.md §2,
  * runnable on the /root/testdata parquet tables, with a DuckDB-equivalent
  * oracle SQL in `oracle` (column names aligned on both sides).
  */
object Queries {

  private[queries] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def all: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MlQueries.all

  def oracle: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ MlQueries.oracle
}

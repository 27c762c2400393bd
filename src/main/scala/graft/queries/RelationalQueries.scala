package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object RelationalQueries {
  def all: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}

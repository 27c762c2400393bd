package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (spark_guide.md:
  * one SparkSession per suite; sharing across suites keeps `sbt test`
  * fast — suites only read, never reconfigure).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: maxFailures = 2 so the per-partition recovery
      // drill (CheckpointSpec) can inject a task failure and observe
      // Spark retry ONLY that task, like a real cluster
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

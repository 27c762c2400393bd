package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 6): do Observation metrics fire through
  * Dataset.localCheckpoint(eager) / persist+count / limit+collect on
  * this Spark version? Decides whether count probes can piggyback on
  * lineage cuts. Delivery is async (listener), so poll briefly.
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 1000).select(col("id"))

    def poll(obs: Observation): Option[Any] = {
      var i = 0
      while (obs.future.value.isEmpty && i < 60) { Thread.sleep(50); i += 1 }
      obs.future.value
    }
    def tryOne(name: String)(cut: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Unit = {
      val obs = Observation(name + "_obs")
      val observed = df.observe(obs, count(lit(1)).as("n"))
      cut(observed)
      println(s"OBSERVE $name -> ${poll(obs)}")
    }
    tryOne("localCheckpoint")(_.localCheckpoint())
    tryOne("persist+count") { d =>
      val p = d.persist(); p.count(); p
    }
    val obs3 = Observation("limitcollect_obs")
    val observed3 = df.observe(obs3, count(lit(1)).as("n"))
    val rows = observed3.limit(2000).collect()
    println(s"OBSERVE limit+collect rows=${rows.length} -> ${poll(obs3)}")
    spark.stop()
  }
}

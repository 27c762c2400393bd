package graft.tools

import graft.canon.Canonicalize
import graft.schema.Entity
import org.apache.spark.sql.SparkSession

/** Dev tool: measure the local-vs-distributed canonicalization
  * crossover that justifies Canonicalize.LocalCanonMaxEntities.
  * Times the driver-local exact O(n^2) path against the distributed
  * LSH path at several entity counts (same synthetic vocabulary).
  */
object CanonCrossover {
  private def entities(n: Int): Seq[Entity] =
    (0 until n).map { i =>
      // ~20% of entities get an alias twin to create merge edges
      val canonical = s"entity name ${i / 5} variant ${i % 5}"
      Entity(f"ent_$i%06d", canonical,
        if (i % 5 == 0) Seq(s"entity name ${i / 5} variant alt") else Nil)
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ns = if (args.isEmpty) Seq(500, 1000, 2000, 4000)
      else args.toSeq.map(_.toInt)
    for (n <- ns; rep <- 1 to 2) {
      val es = entities(n)
      val local = time(
        Canonicalize.canonicalMap(spark, es,
          localMaxEntities = Int.MaxValue).count())
      val dist = time(
        Canonicalize.canonicalMap(spark, es, localMaxEntities = 0).count())
      println(f"CANON n=$n%5d rep=$rep local=$local%7.2f s dist=$dist%7.2f s")
      Console.flush()
    }
    spark.stop()
  }
}

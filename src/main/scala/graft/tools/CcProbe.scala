package graft.tools

import graft.gen.TranscriptGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 6): A/B the string->long rank encoding inside
  * connectedComponentsFast on the REAL kg_open_large canonicalization
  * shape — the merge-dense open vocabulary's exact jaccard-0.5 edges
  * (~16k string vertices, ~2.7M edges, ~5 rounds) — in one session.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nBases = args.lift(0).map(_.toInt).getOrElse(8000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cut = graft.plans.LineageCut.Default
    // entity surface table identical in shape to runOpen's open side:
    // open:<name> ids over the wide generator's name pool (stem+%05d,
    // plus the "9"-suffixed near-duplicate variant — mirrors
    // TranscriptGen.openTranscriptsWide's surface formula)
    val stems = IndexedSeq("alphasvc", "bravosvc", "lunarsvc", "quartzsvc",
      "vertexsvc", "ospreysvc", "falconsvc", "gandersvc")
    val names = (0 until nBases).flatMap { b =>
      val v1 = f"${stems(b % stems.size)}$b%05d"
      Seq(v1, v1 + "9")
    }
    val surf = names.map(n => ("open:" + n, Seq(n)))
      .toDF("entity_id", "surfaces")
    val edges = cut.cut(graft.canon.Canonicalize.candidateEdges(
      spark, surf, 0.5, cut))
    val vertices = cut.cut(surf.select($"entity_id"))
    println(s"vertices=${vertices.count()} edges=${edges.count()}")
    (1 to 3).foreach { rep =>
      Seq(true, false).foreach { enc =>
        val t0 = System.nanoTime()
        val (cc, rounds) =
          graft.canon.Canonicalize.connectedComponentsFastWithRounds(
            spark, vertices, edges, encodeIds = enc)
        val n = cc.count()
        println(f"CC encode=$enc rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s rounds=$rounds rows=$n")
      }
    }
    spark.stop()
  }
}

package graft.canon

import graft.score.Embed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Smallest-topic -> nearest-topic iterative merging (SURVEY.md §2.5 W6;
  * reference: topic_modeling.py:129-151).
  *
  * Control shape mirrors the reference exactly: while more than
  * `targetTopics` remain, take the smallest topic (ties by topic id) and
  * merge it into its most-similar other topic (cosine of hashed-ngram
  * topic centroids, ties by id). The loop is driver-controlled; each
  * round is one small DataFrame action over per-topic aggregates — the
  * heavy per-document work happens once up front.
  */
object TopicMerge {

  /** docs: (topic: String, text: String) ->
    * merge map (topic -> merged_topic).
    */
  def mergeMap(
      spark: SparkSession,
      docs: DataFrame,
      targetTopics: Int): Map[String, String] = {
    // distributed pass: per-topic size + DISTINCT token set (collect_set
    // after explode — bounded by the vocabulary, order-insensitive; an
    // exact-set aggregation keeps the centroid deterministic where a
    // float vector sum would depend on reduction order)
    val topicSizes = docs.groupBy(col("topic")).agg(count(lit(1)).as("n"))
    val tokSets = docs
      .select(col("topic"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("topic"))
      .agg(sort_array(collect_set(col("tok"))).as("toks"))
    val perTopic = topicSizes.join(tokSets, Seq("topic"))

    // topics are few by definition (reference: LDA topic table); the
    // merge loop itself is driver-side over per-topic aggregates
    val topics = perTopic.collect().map { r =>
      val t = r.getString(0)
      val n = r.getLong(1)
      val centroid = Embed.meanEmbed(r.getSeq[String](2))
      (t, n, centroid)
    }.sortBy(_._1)

    val sizes = scala.collection.mutable.Map(
      topics.map(t => t._1 -> t._2): _*)
    val cents = scala.collection.mutable.Map(
      topics.map(t => t._1 -> t._3): _*)
    val merged = scala.collection.mutable.Map(
      topics.map(t => t._1 -> t._1): _*)

    while (sizes.size > targetTopics) {
      val smallest = sizes.toSeq.minBy { case (t, n) => (n, t) }._1
      val best = sizes.keys.filter(_ != smallest).map { t =>
        (-Embed.cosine(cents(smallest), cents(t)), t)
      }.min._2
      // merge smallest into best: sizes add, centroid = renormalized sum
      val a = cents(smallest); val b = cents(best)
      val sum = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { sum(i) = a(i) + b(i); i += 1 }
      cents(best) = Embed.l2Normalize(sum)
      sizes(best) = sizes(best) + sizes(smallest)
      sizes.remove(smallest); cents.remove(smallest)
      merged.keys.foreach { k =>
        if (merged(k) == smallest) merged(k) = best
      }
    }
    merged.toMap
  }

  /** Relabel a (topic, ...) table through the merge map (reference:
    * topic_modeling.py:142-144 dict relabeling -> broadcast join here).
    */
  def relabel(
      spark: SparkSession,
      docs: DataFrame,
      merge: Map[String, String]): DataFrame = {
    import spark.implicits._
    val m = merge.toSeq.toDF("topic", "merged_topic")
    docs.join(broadcast(m), Seq("topic"), "left")
      .withColumn("merged_topic",
        coalesce(col("merged_topic"), col("topic")))
  }
}

package graft.lexicon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical-KB lookups (SURVEY.md §2.3 J1/J2, §2.8 F7/F18/F19).
  *
  * The reference wraps WordNet in Python UDF transformers
  * (pyspark_extensions.py:15-117) — one JVM<->Python round trip per
  * batch. Here the lexicon is a plain dimension table and every lookup
  * is a broadcast hash join (or a map literal for tiny dictionaries),
  * fully inside Catalyst.
  */
object Lexicon {

  final case class LexEntry(
      token: String, lemma: String, synset: String, gloss: String)

  /** Deterministic WordNet-shaped fixture over the engine vocabulary. */
  val builtin: Seq[LexEntry] = Seq(
    LexEntry("uses", "use", "use.v.01", "put into service"),
    LexEntry("queries", "query", "query.v.01", "pose a question"),
    LexEntry("updates", "update", "update.v.01", "bring up to date"),
    LexEntry("calls", "call", "call.v.01", "get into contact"),
    LexEntry("monitors", "monitor", "monitor.v.01", "keep tabs on"),
    LexEntry("restarts", "restart", "restart.v.01", "take up anew"),
    LexEntry("spark", "spark", "spark.n.01", "a cluster compute engine"),
    LexEntry("kafka", "kafka", "kafka.n.01", "a message broker"),
    LexEntry("cluster", "cluster", "cluster.n.01", "a group of machines"),
    LexEntry("pipeline", "pipeline", "pipeline.n.01", "a processing chain"))

  /** Hypernym edges (child synset -> parent synset) for closure tests. */
  val hypernyms: Seq[(String, String)] = Seq(
    "spark.n.01" -> "engine.n.01",
    "engine.n.01" -> "system.n.01",
    "kafka.n.01" -> "broker.n.01",
    "broker.n.01" -> "system.n.01",
    "cluster.n.01" -> "system.n.01",
    "pipeline.n.01" -> "system.n.01",
    "system.n.01" -> "entity.n.01")

  /** J1/F7: token -> lemma via broadcast join over an exploded token
    * column; unmatched tokens keep themselves (deterministic identity
    * fallback, like the reference's vocabulary miss path).
    */
  def lemmatize(
      spark: SparkSession,
      df: DataFrame,
      tokensCol: String,
      lexicon: Seq[LexEntry] = builtin): DataFrame = {
    import spark.implicits._
    val lex = lexicon.map(e => (e.token, e.lemma)).toDF("tok", "lemma")
    df.select(col("*"), posexplode(col(tokensCol)).as(Seq("__pos", "tok")))
      .join(broadcast(lex), Seq("tok"), "left")
      .withColumn("__lemma", coalesce(col("lemma"), col("tok")))
      .groupBy(df.columns.map(col): _*)
      .agg(transform(array_sort(collect_list(struct(col("__pos"),
        col("__lemma")))), s => s("__lemma")).as("lemmas"))
  }

  /** J2/F18: synset -> gloss broadcast lookup for a synset column. */
  def withGloss(
      spark: SparkSession,
      df: DataFrame,
      synsetCol: String,
      lexicon: Seq[LexEntry] = builtin): DataFrame = {
    import spark.implicits._
    val lex = lexicon.map(e => (e.synset, e.gloss)).toDF(synsetCol, "gloss")
    df.join(broadcast(lex), Seq(synsetCol), "left")
  }

  /** F19: hypernym (transitive ancestor) closure by iterative self-join —
    * the driver-loop shape shared with connected components; lineage cut
    * per round. Returns (synset, ancestor, depth).
    */
  def hypernymClosure(
      spark: SparkSession,
      edges: DataFrame, // (child, parent)
      maxDepth: Int = 16): DataFrame = {
    var closure = edges.select(
      col("child").as("synset"), col("parent").as("ancestor"),
      lit(1).as("depth")).localCheckpoint()
    var frontier = closure
    var depth = 1
    var done = false
    while (!done && depth < maxDepth) {
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.ancestor") === col("e.child"))
        .select(col("f.synset"), col("e.parent").as("ancestor"),
          (col("f.depth") + 1).as("depth"))
        .join(closure.select(col("synset").as("s"), col("ancestor").as("a")),
          col("synset") === col("s") && col("ancestor") === col("a"),
          "left_anti")
        .localCheckpoint()
      if (next.isEmpty) done = true
      else {
        closure = closure.unionByName(next).localCheckpoint()
        frontier = next
        depth += 1
      }
    }
    closure
  }

  /** F19: lowest common hypernym of two synsets = the shared ancestor
    * with minimal combined depth (ties by ancestor name).
    */
  def lowestCommonHypernym(
      spark: SparkSession,
      edges: DataFrame,
      a: String,
      b: String): Option[String] = {
    val c = hypernymClosure(spark, edges)
    val selfRows = c.sparkSession.createDataFrame(
      Seq((a, a, 0), (b, b, 0))).toDF("synset", "ancestor", "depth")
    val full = c.unionByName(selfRows)
    full.filter(col("synset") === a).alias("x")
      .join(full.filter(col("synset") === b).alias("y"),
        col("x.ancestor") === col("y.ancestor"))
      .select(col("x.ancestor"),
        (col("x.depth") + col("y.depth")).as("d"))
      .orderBy(col("d"), col("ancestor"))
      .limit(1)
      .collect().headOption.map(_.getString(0))
  }
}

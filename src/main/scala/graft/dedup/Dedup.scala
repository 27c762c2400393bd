package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing deduplication operators for a training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard — each parameterized by
  * (id column, text column) so they run over any document table. The
  * driver-contract queries in graft.queries.DedupQueries are thin
  * wrappers over these with pinned parameters (and DuckDB oracles).
  *
  * Physical notes are at each operator; none performs a cross join.
  */
object Dedup {

  /** distinct token n-gram shingles of a text column. */
  def shingles(text: Column, n: Int = 2): Column =
    array_distinct(TextOps.tokenNgrams(TextOps.tokens(text), n))

  /** Exact dedup: canonical id = min id among byte-identical texts
    * (reference: URL dedup, documents_dataset.py:71-83).
    */
  def exactCanonical(df: DataFrame, id: String, text: String): DataFrame = {
    val w = Window.partitionBy(md5(col(text).cast("binary")))
    df.select(col(id), min(col(id)).over(w).as("canon_id"))
  }

  /** MinHash signatures over shingles: permutation k = lexical min of
    * md5("k:" ++ shingle). Explode + agg-min keeps each md5 computed
    * once inside codegen (NumHashes nested array transforms re-expand
    * the shingle tree quadratically — measured 10x slower).
    */
  def minhashSignatures(
      df: DataFrame, id: String, text: String,
      numHashes: Int, shingleN: Int = 2): DataFrame = {
    val exploded = df.select(col(id),
      explode(shingles(col(text), shingleN)).as("g"))
    exploded.groupBy(col(id)).agg(
      min(md5(concat(lit("0:"), col("g")).cast("binary"))).as("h0"),
      (1 until numHashes).map(k =>
        min(md5(concat(lit(s"$k:"), col("g")).cast("binary"))).as(s"h$k")): _*)
  }

  /** LSH banding over signatures -> candidate pairs + estimated
    * similarity (fraction of agreeing components). Equi-join on band
    * key; signatures materialized once for the three plan branches.
    */
  def lshCandidatePairs(
      df: DataFrame, id: String, text: String,
      numHashes: Int, bandRows: Int, shingleN: Int = 2): DataFrame = {
    val sig = minhashSignatures(df, id, text, numHashes, shingleN)
      .localCheckpoint()
    val bands = (0 until numHashes / bandRows).map { b =>
      concat_ws("|", lit(b.toString) +:
        (0 until bandRows).map(r => col(s"h${b * bandRows + r}")): _*)
    }
    val keys = sig.select(col(id), explode(array(bands: _*)).as("band"))
    val pairs = keys.alias("a").join(keys.alias("b"),
        col("a.band") === col("b.band") && col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("src"), col(s"b.$id").as("dst"))
      .distinct()
    val sigA = sig.select(col(id).as("src") +:
      (0 until numHashes).map(k => col(s"h$k").as(s"a$k")): _*)
    val sigB = sig.select(col(id).as("dst") +:
      (0 until numHashes).map(k => col(s"h$k").as(s"b$k")): _*)
    val matches = (0 until numHashes)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sigA, "src").join(sigB, "dst")
      .select(col("src"), col("dst"),
        (matches.cast("double") / numHashes).as("est_sim"))
  }

  /** Exact n-gram Jaccard pairs >= threshold via an inverted-index
    * SHUFFLE_HASH join (few-keys/huge-groups postings; SMJ measured 2-4x
    * slower) — never O(n^2).
    */
  def jaccardPairs(
      df: DataFrame, id: String, text: String,
      threshold: Double, shingleN: Int = 2): DataFrame = {
    val sh = df
      .select(col(id), shingles(col(text), shingleN).as("sh"))
      .select(col(id), size(col("sh")).as("n_sh"), explode(col("sh")).as("g"))
      .localCheckpoint()
    // aggregate on the narrow (src, dst) pair only; per-doc shingle
    // counts rejoin via two broadcast lookups afterwards (the pair
    // aggregation is the 10M+-row shuffle — narrower rows, cheaper)
    val sizes = sh.groupBy(col(id)).agg(first(col("n_sh")).as("n_sh"))
    val shared = sh.alias("a")
      .join(sh.alias("b").hint("shuffle_hash"),
        col("a.g") === col("b.g") && col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("src"), col(s"b.$id").as("dst"))
      .agg(count(lit(1)).as("common"))
    shared
      .join(broadcast(sizes.select(col(id).as("src"), col("n_sh").as("na"))),
        "src")
      .join(broadcast(sizes.select(col(id).as("dst"), col("n_sh").as("nb"))),
        "dst")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("src"), col("dst"), col("common"), col("jaccard"))
  }

  /** SimHash-(bits): bit j set iff the majority of distinct tokens have
    * an odd j-th hex digit of md5(token). bits <= 32 (md5 hex length).
    */
  def simhash(df: DataFrame, id: String, text: String,
      bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 32)
    val dtoks = array_distinct(TextOps.tokens(col(text)))
    val hashes = transform(dtoks, x => md5(x.cast("binary")))
    val bitArr = transform(sequence(lit(0), lit(bits - 1)), j =>
      when(size(filter(hashes, h =>
        h.substr(j + 1, lit(1)).isin("1", "3", "5", "7", "9", "b", "d", "f")))
        * 2 > size(hashes), 1L).otherwise(0L))
    val value = aggregate(
      zip_with(bitArr, transform(sequence(lit(0), lit(bits - 1)),
        j => pow(lit(2.0), j).cast("long")), (b, p) => b * p),
      lit(0L), (acc, x) => acc + x)
    df.select(col(id), value.as(s"simhash$bits"))
  }
}

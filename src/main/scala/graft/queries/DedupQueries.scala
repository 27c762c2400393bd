package graft.queries

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`:
  * exact, MinHash signature + LSH candidate pairs, SimHash, n-gram
  * Jaccard — each Spark-first (inverted-index equi-joins, never O(n^2)
  * cross joins) with a DuckDB oracle computing the identical formulas.
  *
  * Cross-engine hash: md5 hex strings (identical in Spark and DuckDB);
  * MinHash permutation k = lexicographic min of md5("k:" ++ shingle).
  */
object DedupQueries {
  import Queries.t

  val NumHashes = 8
  val BandRows = 2
  val JaccardThreshold = 0.1

  private def toks: Column = TextOps.tokens(col("text"))
  /** distinct token-bigram shingles per document */
  private def shingles: Column =
    array_distinct(TextOps.tokenNgrams(toks, 2))

  /** Signatures via explode + agg-min: each shingle row computes its
    * NumHashes md5s once inside whole-stage codegen, then one shuffle
    * aggregates the mins — instead of NumHashes nested array-transform
    * columns that each re-expand the shingle expression tree (measured
    * 10x slower and quadratic in NumHashes).
    */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    val exploded = t(s, d, "documents")
      .select(col("doc_id"), explode(shingles).as("g"))
    exploded.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0:"), col("g")).cast("binary"))).as("h0"),
      (1 until NumHashes).map(k =>
        min(md5(concat(lit(s"$k:"), col("g")).cast("binary"))).as(s"h$k")): _*)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: canonical = min doc_id among identical texts
    // (reference: documents_dataset.py:71-83 URL dedup)
    "q_dedup_exact" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy(md5($"text".cast("binary")))
      t(s, d, "documents")
        .select($"doc_id", min($"doc_id").over(w).as("canon_id"))
        .orderBy($"doc_id")
    }),

    // MinHash signatures (the per-doc half of MinHash/LSH dedup)
    "q_dedup_minhash_sig" -> ((s, d) => {
      signatures(s, d).orderBy(col("doc_id"))
    }),

    // LSH banding -> candidate pairs + estimated similarity =
    // fraction of agreeing signature components. Equi-join on band key
    // (SURVEY.md §7.3); never a cross join.
    "q_dedup_lsh_pairs" -> ((s, d) => {
      import s.implicits._
      // sig feeds three plan branches (band keys + both pair sides):
      // materialize once instead of recomputing the shuffle 3x
      val sig = signatures(s, d).localCheckpoint()
      val bands = (0 until NumHashes / BandRows).map { b =>
        concat_ws("|", lit(b.toString) +:
          (0 until BandRows).map(r => col(s"h${b * BandRows + r}")): _*)
      }
      val keys = sig.select($"doc_id", explode(array(bands: _*)).as("band"))
      val pairs = keys.alias("a").join(keys.alias("b"),
          col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
        .distinct()
      val sigA = sig.select(
        col("doc_id").as("src") +:
          (0 until NumHashes).map(k => col(s"h$k").as(s"a$k")): _*)
      val sigB = sig.select(
        col("doc_id").as("dst") +:
          (0 until NumHashes).map(k => col(s"h$k").as(s"b$k")): _*)
      val matches = (0 until NumHashes)
        .map(k => when(col(s"a$k") === col(s"b$k"), 1).otherwise(0))
        .reduce(_ + _)
      pairs.join(sigA, "src").join(sigB, "dst")
        .select($"src", $"dst",
          (matches.cast("double") / NumHashes).as("est_sim"))
        .orderBy($"src", $"dst")
    }),

    // n-gram (bigram) Jaccard near-dup pairs via inverted index:
    // explode shingles, equi-join postings, count shared, exact ratio
    "q_dedup_jaccard" -> ((s, d) => {
      import s.implicits._
      // postings materialized once (both join sides read it) and joined
      // with SHUFFLE_HASH: the bigram key has few, huge groups — a
      // sort-merge join pays two sorts plus per-key match buffering
      // (measured 35s vs single-node DuckDB's 9s on the same query at
      // sf0.1; shuffle-hash + materialized postings: 16s; a join-free
      // posexplode+slice pair generator was tried and measured WORSE,
      // 24s — Catalyst `slice` copies the array tail per element)
      val sh = t(s, d, "documents")
        .select($"doc_id", shingles.as("sh"))
        .select($"doc_id", size($"sh").as("n_sh"), explode($"sh").as("g"))
        .localCheckpoint()
      val shared = sh.alias("a")
        .join(sh.alias("b").hint("shuffle_hash"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("src"), col("b.doc_id").as("dst"),
          col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
        .agg(count(lit(1)).as("common"))
      shared
        .withColumn("jaccard",
          $"common".cast("double") / ($"na" + $"nb" - $"common"))
        .filter($"jaccard" >= JaccardThreshold)
        .select($"src", $"dst", $"common", $"jaccard")
        .orderBy($"src", $"dst")
    }),

    // SimHash-16: bit j set iff majority of distinct tokens have an odd
    // j-th hex digit in md5(token)
    "q_dedup_simhash" -> ((s, d) => {
      import s.implicits._
      val dtoks = array_distinct(toks)
      val hashes = transform(dtoks, x => md5(x.cast("binary")))
      val bits = transform(sequence(lit(0), lit(15)), j =>
        when(size(filter(hashes, h =>
          h.substr(j + 1, lit(1)).isin("1", "3", "5", "7", "9", "b", "d", "f")))
          * 2 > size(hashes), 1L).otherwise(0L))
      val simhash = aggregate(
        zip_with(bits, transform(sequence(lit(0), lit(15)),
          j => pow(lit(2.0), j).cast("long")), (b, p) => b * p),
        lit(0L), (acc, x) => acc + x)
      t(s, d, "documents")
        .select($"doc_id", simhash.as("simhash16"))
        .orderBy($"doc_id")
    }),
  )

  private val toksSql = TextQueriesSqlShared.toksSql
  /** distinct bigram shingles, DuckDB formula (zip-with-shifted) */
  private val shinglesSql =
    s"""list_distinct(list_filter(list_transform(
       list_zip($toksSql, ($toksSql)[2:]),
       x -> x[1] || ' ' || x[2]), y -> y IS NOT NULL))"""

  private def minhashSql(k: Int): String =
    s"list_aggregate(list_transform(__sh, s -> md5('$k:' || s)), 'min') AS h$k"

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
         FROM documents ORDER BY doc_id""",
    "q_dedup_minhash_sig" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS __sh FROM documents)
         SELECT doc_id, ${(0 until NumHashes).map(minhashSql).mkString(", ")}
         FROM d ORDER BY doc_id""",
    "q_dedup_lsh_pairs" -> {
      val bandExprs = (0 until NumHashes / BandRows).map { b =>
        val parts = (0 until BandRows).map(r => s"h${b * BandRows + r}")
        s"'$b' || '|' || ${parts.mkString(" || '|' || ")}"
      }
      val matchSum = (0 until NumHashes)
        .map(k => s"CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS __sh FROM documents),
         sig AS (SELECT doc_id,
           ${(0 until NumHashes).map(minhashSql).mkString(", ")} FROM d),
         keys AS (SELECT doc_id,
           unnest([${bandExprs.mkString(", ")}]) AS band FROM sig),
         pairs AS (SELECT DISTINCT ka.doc_id AS src, kb.doc_id AS dst
           FROM keys ka JOIN keys kb
           ON ka.band = kb.band AND ka.doc_id < kb.doc_id)
         SELECT p.src, p.dst,
           CAST($matchSum AS DOUBLE) / $NumHashes AS est_sim
         FROM pairs p
         JOIN sig a ON p.src = a.doc_id
         JOIN sig b ON p.dst = b.doc_id
         ORDER BY p.src, p.dst"""
    },
    "q_dedup_jaccard" ->
      s"""WITH d AS (SELECT doc_id, $shinglesSql AS __sh FROM documents),
         posting AS (SELECT doc_id, len(__sh) AS n_sh, unnest(__sh) AS g
           FROM d),
         shared AS (SELECT a.doc_id AS src, b.doc_id AS dst,
             a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS common
           FROM posting a JOIN posting b
           ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT src, dst, common,
           CAST(common AS DOUBLE) / (na + nb - common) AS jaccard
         FROM shared
         WHERE CAST(common AS DOUBLE) / (na + nb - common) >= $JaccardThreshold
         ORDER BY src, dst""",
    "q_dedup_simhash" -> {
      val oddSet = "('1','3','5','7','9','b','d','f')"
      val bitTerms = (0 until 16).map { j =>
        s"""(CASE WHEN len(list_filter(__h, h -> substr(h, ${j + 1}, 1)
           IN $oddSet)) * 2 > len(__h) THEN ${1L << j} ELSE 0 END)"""
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id,
           list_transform(list_distinct($toksSql), x -> md5(x)) AS __h
           FROM documents)
         SELECT doc_id, CAST($bitTerms AS BIGINT) AS simhash16
         FROM d ORDER BY doc_id"""
    },
  )
}

/** Shared DuckDB SQL fragments (token formula must match TextOps.tokens). */
private[queries] object TextQueriesSqlShared {
  val toksSql: String =
    "list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '')"
}

package graft.canon

import graft.schema.Entity
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash/LSH-blocked entity canonicalization (SURVEY.md §4.3.2-3, §7.3).
  *
  * Reference analog: iterative smallest-topic -> nearest-topic merging
  * (topic_modeling.py:129-151) and cluster canonicalization; re-expressed
  * at scale as:
  *
  *   1. shingle: char-3-gram set over each entity's surface forms
  *   2. MinHash signature: K independent permutations, where permutation k
  *      ranks shingles by md5(k:shingle) and the signature value is the
  *      MINIMUM digest string — pure column expressions, reproducible in
  *      any engine that has md5 (the DuckDB oracle uses the identical
  *      formula)
  *   3. LSH banding: K/R bands of R rows; equal band -> candidate pair
  *      (equi-join on band key — never a cross join)
  *   4. verify: exact Jaccard over the shingle sets >= threshold
  *   5. connected components -> canonical id = min entity_id in component
  *
  * Skew note (SURVEY.md §7.4.4): the band-key equi-join is the salting
  * point at scale — a degenerate band bucket (e.g. near-identical
  * surface clusters) would hot-spot one reducer. Implemented: buckets
  * above SaltBucketBound are split into SaltFactor^2 join cells
  * (plans.Salting.saltedSelfJoinPairs, result-set identical), plus AQE
  * skew-join splitting (enabled in session conf).
  */
object Canonicalize {

  /** LSH parameters. Candidate recall for a pair at true Jaccard s is
    * 1 - (1 - s^BandRows)^(NumHashes/BandRows); with 32 hashes in 16
    * bands of 2 that is 0.990 at s = 0.5 (the default verify threshold)
    * and 0.9992 at s = 0.6. CONTRACT: the distributed path is
    * approximate-by-construction — it can miss a candidate pair sitting
    * exactly at the threshold with probability (1-s^2)^16, while the
    * small-input local path is exact all-pairs. Tests that pin
    * local == distributed do so on a fixed vocabulary where the miss
    * set is empty (deterministic for fixed md5 inputs); callers needing
    * guaranteed-exact edges at scale should use
    * graft.dedup.Dedup.jaccardPairs' prefix-filter scheme instead.
    */
  val NumHashes = 32
  val BandRows = 2

  /** (entity_id, surfaces array) -> exploded (entity_id, band) LSH keys.
    * Signatures via explode + agg-min so each md5 is computed once in
    * codegen — NumHashes nested array transforms re-expand the shingle
    * tree per hash (measured 10x slower in the Dedup twin of this
    * operator; matters at 32 hashes on corpus-extracted entity tables).
    */
  def bandKeys(entitySurfaces: DataFrame): DataFrame = {
    val exploded = withShingles(entitySurfaces)
      .select(col("entity_id"), explode(col("shingles")).as("g"))
    val sig = exploded.groupBy(col("entity_id")).agg(
      min(md5(concat(lit("0:"), col("g")).cast("binary"))).as("h0"),
      (1 until NumHashes).map(k =>
        min(md5(concat(lit(s"$k:"), col("g")).cast("binary"))).as(s"h$k")): _*)
    val bands = (0 until NumHashes / BandRows).map { b =>
      concat_ws("|", lit(b.toString) +:
        (0 until BandRows).map(r => col(s"h${b * BandRows + r}")): _*)
    }
    sig.select(col("entity_id"), explode(array(bands: _*)).as("band"))
  }

  def withShingles(entitySurfaces: DataFrame): DataFrame =
    entitySurfaces.withColumn("shingles",
      array_distinct(flatten(transform(col("surfaces"),
        s => TextOps.charShingles(s, 3)))))

  /** Degenerate band buckets (> this many entities) are salted into
    * SaltFactor^2 join cells (plans.Salting.saltedSelfJoinPairs) — the
    * north rule's "union-find over a salted self-join". Below the
    * bound the plan is the plain band equi-join.
    */
  val SaltBucketBound = 4096
  val SaltFactor = 8

  /** Verified similarity edges between entities (src < dst). */
  def candidateEdges(
      spark: SparkSession,
      entitySurfaces: DataFrame,
      jaccardThreshold: Double): DataFrame = {
    val pairs = graft.plans.Salting.saltedSelfJoinPairs(
      bandKeys(entitySurfaces), "entity_id", "band",
      SaltBucketBound, SaltFactor)

    // no explicit broadcast: the shingle table is one row per ENTITY —
    // fine to broadcast for a closed vocabulary but an OOM trap for
    // corpus-extracted entity tables (same reasoning as the jaccard
    // rejoin); AQE picks broadcast when the side is actually small
    val sh = withShingles(entitySurfaces)
      .select(col("entity_id"), col("shingles"))
    val shSrc = sh.select(col("entity_id").as("src"),
      col("shingles").as("src_sh"))
    val shDst = sh.select(col("entity_id").as("dst"),
      col("shingles").as("dst_sh"))
    pairs
      .join(shSrc, "src")
      .join(shDst, "dst")
      .withColumn("jaccard",
        size(array_intersect(col("src_sh"), col("dst_sh"))).cast("double") /
          size(array_union(col("src_sh"), col("dst_sh"))))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("src"), col("dst"))
  }

  /** Connected components by iterative min-label propagation
    * (driver-controlled DataFrame loop, SURVEY.md §4.3.3), lineage cut per
    * round with localCheckpoint (SURVEY.md §7.4.7). Converges in
    * O(component diameter) rounds — alias clusters have diameter <= 2-3;
    * the iteration cap is a safety net, convergence is checked exactly.
    *
    * Returns (entity_id, canonical_id = min id in component).
    */
  def connectedComponents(
      spark: SparkSession,
      vertices: DataFrame, // (entity_id)
      edges: DataFrame, // (src, dst)
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()

    var labels = vertices
      .select(col("entity_id"), col("entity_id").as("canonical_id"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("entity_id"))
        .select(sym("src").as("entity_id"), col("canonical_id"))
      val next = labels.unionByName(neighborMin)
        .groupBy("entity_id")
        .agg(min("canonical_id").as("canonical_id"))
        .localCheckpoint()
      val changed = next.alias("n")
        .join(labels.alias("o"), Seq("entity_id"))
        .filter(col("n.canonical_id") =!= col("o.canonical_id"))
        .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** Adaptive small-input cutoff: below this many candidate edges the
    * components are solved with a driver-local union-find instead of the
    * iterative DataFrame loop — the same size-based physical choice Spark
    * itself makes for broadcast joins. The distributed path stays the
    * scale path and is unit-tested directly.
    */
  val LocalComponentsMaxEdges = 100000L

  /** Below this many entities, canonicalization runs entirely
    * driver-side with EXACT all-pairs Jaccard (O(n^2) is affordable; LSH
    * banding exists to avoid the quadratic pair space at scale) plus
    * local union-find — saving several fixed-latency Spark jobs per
    * pipeline run. The distributed LSH + iterative-CC path is forced in
    * tests via localMaxEntities = 0.
    *
    * Cutoff measured with graft.tools.CanonCrossover (local[4], alias
    * vocabulary with ~n/5 merge clusters): driver-local all-pairs costs
    * ~1-3 s at n=1000 and ~5-6 s at n=2000 (single-threaded n^2/2 set
    * intersections), while the distributed path's floor is its several
    * fixed-latency jobs (~2-5 s quiet-host). Past ~2k entities the
    * driver loop is the bottleneck at exactly the scale users stop
    * noticing — the old 10k cutoff implied ~5*10^7 intersections
    * (minutes of driver wall).
    */
  val LocalCanonMaxEntities = 2000

  /** Full canonicalization: Seq[Entity] -> (entity_id, canonical_id). */
  def canonicalMap(
      spark: SparkSession,
      entities: Seq[Entity],
      jaccardThreshold: Double = 0.5,
      localMaxEntities: Int = LocalCanonMaxEntities): DataFrame = {
    import spark.implicits._
    if (entities.size <= localMaxEntities) {
      // same shingle spec as TextOps.charShingles / Embed.ngrams
      val sh = entities.map { e =>
        e.entity_id ->
          (e.canonical +: e.aliases).flatMap(graft.score.Embed.ngrams).toSet
      }.toMap
      val ids = entities.map(_.entity_id)
      val edges = for {
        a <- ids; b <- ids if a < b
        ja = sh(a); jb = sh(b)
        if ja.intersect(jb).size.toDouble / ja.union(jb).size >=
          jaccardThreshold
      } yield (a, b)
      localUnionFind(ids, edges).toSeq.toDF("entity_id", "canonical_id")
    } else {
      val surf = entities
        .map(e => (e.entity_id, e.canonical +: e.aliases))
        .toDF("entity_id", "surfaces")
      val edges = candidateEdges(spark, surf, jaccardThreshold)
        .localCheckpoint()
      if (edges.count() <= LocalComponentsMaxEdges) {
        val pairs = edges.collect().map(r => (r.getString(0), r.getString(1)))
        val comp = localUnionFind(entities.map(_.entity_id), pairs)
        comp.toSeq.toDF("entity_id", "canonical_id")
      } else {
        connectedComponents(spark, surf.select($"entity_id"), edges)
      }
    }
  }

  /** Driver-local union-find with path compression; min id = canonical. */
  def localUnionFind(
      ids: Seq[String],
      edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    ids.map(i => i -> find(i)).toMap
  }
}

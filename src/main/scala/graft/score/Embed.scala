package graft.score

import scala.util.hashing.MurmurHash3

/** Deterministic scorer spec shared by the distributed pipeline and the
  * single-threaded oracle (SURVEY.md §7.4.5).
  *
  * Semantics restated from the reference:
  *   - mean-pooled token-piece embedding
  *     (reference: src/models/sentence_encoder.py:32-39,
  *      src/modules/modules.py:154-171)
  *   - cosine similarity + top-k with deterministic tie-break
  *     (reference: src/pipeline/search_pipeline.py:73-88,
  *      src/utils/utils.py:96-106)
  *
  * Instead of transformer weights (unavailable, and training is a
  * non-goal per SURVEY.md §2.11) the embedding is a feature-hashed
  * character-3-gram vector: hash each 3-gram of `#text#` into one of
  * `Dim` buckets with a ±1 sign, sum, L2-normalize. Pure deterministic
  * Scala — no wall clock, no global state — so the driver-side oracle and
  * executor-side `mapPartitions` scorer share one implementation and the
  * P/R ≥ 0.95 gate measures only the distributed plumbing.
  */
object Embed {
  val Dim = 64
  private val Seed = 42

  /** Character 3-grams of the lowercased surface, '#'-padded, sliding
    * over CODEPOINTS — exactly the windows TextOps.charShingles's
    * `substr(i, 3)` takes (Spark substring/length count codepoints, not
    * UTF-16 units), so the local and distributed canonicalization paths
    * shingle identically for any surface, including non-BMP (emoji,
    * astral-plane CJK) — corpus-derived open vocabularies can contain
    * anything. Locale.ROOT lowercase matches SQL `lower` (a
    * Turkish-style default JVM locale would otherwise diverge on
    * dotted/dotless I).
    */
  def ngrams(s: String): Iterator[String] = {
    val t = "#" + s.toLowerCase(java.util.Locale.ROOT) + "#"
    val cps = t.codePoints().toArray
    if (cps.length < 3) Iterator.single(t)
    else (0 to cps.length - 3).iterator.map(i => new String(cps, i, 3))
  }

  /** True iff `g` is exactly 3 CODEPOINTS — the keep-filter both exact
    * canonicalization paths apply to [[ngrams]] output (matches the
    * distributed `length(s) === k`, which counts codepoints). The only
    * sub-3 gram [[ngrams]] can emit is the whole padded string of a
    * 0/1-codepoint surface.
    */
  def isShingle3(g: String): Boolean = g.codePointCount(0, g.length) == 3

  /** Hashed-ngram embedding, L2-normalized. */
  def embed(s: String): Array[Float] = {
    val v = new Array[Float](Dim)
    ngrams(s).foreach { g =>
      val h = MurmurHash3.stringHash(g, Seed)
      val idx = math.floorMod(h, Dim)
      val sign = if (math.floorMod(h >>> 16, 2) == 0) 1f else -1f
      v(idx) += sign
    }
    l2Normalize(v)
  }

  /** Mean of member embeddings, re-normalized — the reference's mean-pool
    * (src/modules/modules.py:154-171) applied to an alias set.
    */
  def meanEmbed(surfaces: Seq[String]): Array[Float] = {
    val v = new Array[Float](Dim)
    surfaces.foreach { s =>
      val e = embed(s)
      var i = 0
      while (i < Dim) { v(i) += e(i); i += 1 }
    }
    var i = 0
    while (i < Dim) { v(i) /= math.max(1, surfaces.size).toFloat; i += 1 }
    l2Normalize(v)
  }

  def l2Normalize(v: Array[Float]): Array[Float] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(ss)
    if (n > 0) {
      i = 0
      while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 }
    }
    v
  }

  /** Cosine of two L2-normalized vectors = dot product (double accumulate,
    * fixed left-to-right order for cross-implementation determinism).
    */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Top-1 entity for a surface against an indexed candidate list;
    * ties broken by ascending entity id (SURVEY.md §7.4.5). Returns None
    * below `minScore`.
    */
  def top1(
      surface: String,
      index: IndexedSeq[(String, Array[Float])],
      minScore: Double): Option[(String, Double)] = {
    val q = embed(surface)
    var bestId: String = null
    var bestScore = -2.0
    var i = 0
    while (i < index.length) {
      val (id, vec) = index(i)
      val c = cosine(q, vec)
      if (c > bestScore || (c == bestScore && (bestId == null || id < bestId))) {
        bestScore = c
        bestId = id
      }
      i += 1
    }
    if (bestId != null && bestScore >= minScore) Some((bestId, bestScore))
    else None
  }
}

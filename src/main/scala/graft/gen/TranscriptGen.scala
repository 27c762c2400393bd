package graft.gen

import graft.schema.Turn
import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed transcript synthesizer
  * (FIXTURES.md §1): columnar `spark.range` + hash-indexed template
  * choices, no driver-side collections, no wall clock, no unseeded
  * randomness — the same (nConvs, turnsPerConv, hotTurns) always produces
  * the identical table, at any parallelism.
  *
  * Emits the exact input_hint schema
  * (conv_id, turn_idx, role, text, tool, ts). Includes one hot
  * conversation (`conv_hot`) for skew tests (SURVEY.md §7.4.4), and
  * scrambles physical row order so stable-turn-ordering logic is actually
  * exercised (FIXTURES.md §1 "rows emitted shuffled").
  */
object TranscriptGen {

  /** Deterministic pick from a small literal array, keyed by
    * murmur3 hash of (conv_id, turn_idx, salt).
    */
  private def pick(arr: IndexedSeq[String], salt: Int): Column =
    element_at(
      lit(arr.toArray),
      pmod(hash(col("conv_id"), col("turn_idx"), lit(salt)), lit(arr.size)) + 1)

  def transcripts(
      spark: SparkSession,
      nConvs: Int,
      turnsPerConv: Int,
      hotTurns: Int = 0,
      partitions: Int = 8): Dataset[Turn] = {
    import spark.implicits._

    val base = spark.range(nConvs.toLong * turnsPerConv)
      .withColumn("conv_id",
        format_string("conv_%06d", ($"id" / turnsPerConv).cast("long")))
      .withColumn("turn_idx", ($"id" % turnsPerConv).cast("int"))
    val hot = spark.range(hotTurns.toLong)
      .withColumn("conv_id", lit("conv_hot"))
      .withColumn("turn_idx", $"id".cast("int"))
    val ids = base.unionByName(hot)

    val t = pmod(hash($"conv_id", $"turn_idx", lit(0)), lit(10))
    val subj = pick(Vocab.gazetteer, 1)
    val obj = pick(Vocab.gazetteer, 2)
    val pred = pick(Vocab.predicateTokens, 3)
    val fillA = pick(Vocab.fillers, 4)
    val fillB = pick(Vocab.fillers, 5)
    val fillC = pick(Vocab.fillers, 6)

    val text =
      when(t < 6, concat_ws(" ", fillA, subj, pred, obj, fillB))
        .when(t < 8, concat_ws(" ", fillA, subj, fillB))
        .otherwise(concat_ws(" ", fillA, fillB, fillC))
    val role = pick(Vocab.roles, 7)
    val tool = when(role === "tool", pick(Vocab.tools, 8)).otherwise(lit(""))
    val ts = expr(
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,turn_idx,0)")

    ids
      .select(
        $"conv_id",
        $"turn_idx",
        role.as("role"),
        text.as("text"),
        tool.as("tool"),
        ts.as("ts"))
      // scramble physical order/grouping: downstream window logic must not
      // depend on arrival order (FIXTURES.md §1)
      .repartition(partitions, hash($"text", $"turn_idx"))
      .as[Turn]
  }

  /** Stems for the open-entity surface pool (openTranscripts): pairwise
    * char-3-gram jaccard between different stems stays well under the
    * 0.5 merge threshold, while the two digit-suffix spellings of ONE
    * base sit well above it — so open-entity canonicalization has real
    * merges to find and real non-merges to preserve.
    */
  private val OpenStems = IndexedSeq(
    "alphasvc", "bravosvc", "lunarsvc", "quartzsvc",
    "vertexsvc", "ospreysvc", "falconsvc", "gandersvc")
  val MaxOpenBases: Int = OpenStems.size

  /** The two deterministic spellings of open base `b` — e.g.
    * ("alphasvc07", "alphasvc079"): same stem, digit suffixes chosen so
    * their shingle jaccard is ~0.75 (merge expected; canonical id =
    * the lexicographically smaller "open:alphasvc07").
    */
  def openVariants(b: Int): (String, String) = {
    val v1 = f"${OpenStems(b % OpenStems.size)}$b%02d"
    (v1, v1 + "9")
  }

  /** Open-entity conversations (conv ids `conv_open_*`): subjects and
    * objects drawn from digit-suffixed PROVISIONAL surfaces (two
    * spelling variants per base — see [[openVariants]]) mixed with
    * closed gazetteer unigrams, so extraction yields open-open,
    * open-closed, and closed-closed triples. Same deterministic
    * columnar construction as [[transcripts]]; the oracle never
    * regenerates text — it extracts from the emitted rows.
    */
  def openTranscripts(
      spark: SparkSession,
      nConvs: Int,
      turnsPerConv: Int,
      nBases: Int,
      partitions: Int = 8): Dataset[Turn] = {
    import spark.implicits._
    require(nBases >= 1 && nBases <= MaxOpenBases,
      s"nBases must be in [1, $MaxOpenBases], got $nBases")
    val variants = (0 until nBases).flatMap { b =>
      val (v1, v2) = openVariants(b); Seq(v1, v2)
    }
    // closed unigram surfaces keep open turns producing cross triples
    val pool = variants ++ IndexedSeq("kafka", "redis", "postgres", "airflow")

    val ids = spark.range(nConvs.toLong * turnsPerConv)
      .withColumn("conv_id",
        format_string("conv_open_%06d", ($"id" / turnsPerConv).cast("long")))
      .withColumn("turn_idx", ($"id" % turnsPerConv).cast("int"))

    val t = pmod(hash($"conv_id", $"turn_idx", lit(20)), lit(10))
    val subj = pick(pool, 21)
    val obj = pick(pool, 22)
    val pred = pick(Vocab.predicateTokens, 23)
    val fillA = pick(Vocab.fillers, 24)
    val fillB = pick(Vocab.fillers, 25)
    val text =
      when(t < 6, concat_ws(" ", fillA, subj, pred, obj, fillB))
        .when(t < 8, concat_ws(" ", fillA, subj, fillB))
        .otherwise(concat_ws(" ", fillA, fillB))
    val role = pick(Vocab.roles, 26)
    val tool = when(role === "tool", pick(Vocab.tools, 27)).otherwise(lit(""))
    val ts = expr(
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,turn_idx,0)")
    ids.select($"conv_id", $"turn_idx", role.as("role"), text.as("text"),
        tool.as("tool"), ts.as("ts"))
      .repartition(partitions, hash($"text", $"turn_idx"))
      .as[Turn]
  }

  /** WIDE open-vocabulary transcripts: like [[openTranscripts]] but the
    * provisional surface pool is COLUMNAR — base index
    * b = hash % nBases picks stem `OpenStems(b % 8)` + zero-padded
    * digits of b, with the second spelling variant (`...9` suffix,
    * shingle-jaccard ~0.8 to the first) chosen by a second hash — so
    * `nBases` can be tens of thousands without a driver-side literal
    * pool. This is the generator for the DISTRIBUTED canonicalization
    * regime (> Canonicalize.LocalCanonMaxEntities distinct open
    * surfaces): the r4 bench's 16-name pool could never leave the
    * driver-local branch. Bases sharing a stem with near-equal digit
    * suffixes can ALSO merge (their exact jaccard crosses 0.5) — the
    * oracle computes the same exact jaccard, so parity holds, and the
    * resulting multi-hop merge chains exercise the pointer-jumping CC.
    * Roughly 1 in 8 subject/object slots is a closed unigram so
    * open-closed triples still occur.
    */
  def openTranscriptsWide(
      spark: SparkSession,
      nConvs: Int,
      turnsPerConv: Int,
      nBases: Int,
      partitions: Int = 8): Dataset[Turn] = {
    import spark.implicits._
    require(nBases >= 1 && nBases <= 99999,
      s"nBases must be in [1, 99999] (5-digit suffix), got $nBases")
    val closedPool = IndexedSeq("kafka", "redis", "postgres", "airflow")

    val ids = spark.range(nConvs.toLong * turnsPerConv)
      .withColumn("conv_id",
        format_string("conv_openw_%06d", ($"id" / turnsPerConv).cast("long")))
      .withColumn("turn_idx", ($"id" % turnsPerConv).cast("int"))

    def surface(salt: Int): Column = {
      val b = pmod(hash($"conv_id", $"turn_idx", lit(salt)), lit(nBases))
      val v1 = format_string("%s%05d",
        element_at(lit(OpenStems.toArray), pmod(b, lit(OpenStems.size)) + 1),
        b)
      val open = when(
        pmod(hash($"conv_id", $"turn_idx", lit(salt + 100)), lit(2)) === 0,
        v1).otherwise(concat(v1, lit("9")))
      when(pmod(hash($"conv_id", $"turn_idx", lit(salt + 200)), lit(8)) === 0,
        pick(closedPool, salt + 300)).otherwise(open)
    }

    val t = pmod(hash($"conv_id", $"turn_idx", lit(40)), lit(10))
    val subj = surface(41)
    val obj = surface(42)
    val pred = pick(Vocab.predicateTokens, 43)
    val fillA = pick(Vocab.fillers, 44)
    val fillB = pick(Vocab.fillers, 45)
    val text =
      when(t < 6, concat_ws(" ", fillA, subj, pred, obj, fillB))
        .when(t < 8, concat_ws(" ", fillA, subj, fillB))
        .otherwise(concat_ws(" ", fillA, fillB))
    val role = pick(Vocab.roles, 46)
    val tool = when(role === "tool", pick(Vocab.tools, 47)).otherwise(lit(""))
    val ts = expr(
      "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,turn_idx,0)")
    ids.select($"conv_id", $"turn_idx", role.as("role"), text.as("text"),
        tool.as("tool"), ts.as("ts"))
      .repartition(partitions, hash($"text", $"turn_idx"))
      .as[Turn]
  }
}

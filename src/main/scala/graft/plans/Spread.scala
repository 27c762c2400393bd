package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive minimum parallelism for CPU-heavy narrow stages
  * (guide §2.5 "input skew", round 6).
  *
  * A bench-scale corpus stored as one small parquet file scans as ONE
  * task (128 MB splits, 4 MB open cost), so every per-row stage before
  * the first exchange — md5 shingling, tokenization, vector math —
  * runs single-threaded regardless of session cores. The guide's fix
  * is "repartition immediately after the read"; an UNCONDITIONAL
  * repartition, however, would add a pure extra shuffle at production
  * scale, where the scan already yields thousands of splits.
  *
  * [[ensure]] therefore no-ops when the frame's planned parallelism
  * already meets the session's shuffle-partition setting — the
  * deployment-scale knob, never a local constant. At 100 TB the scan
  * side wins and the plan is unchanged; on a one-file bench corpus the
  * raw rows spread once, and downstream per-row work plus any
  * same-keyed aggregation (which reuses the hash partitioning — guide
  * §2.4 "share one exchange") runs at full width.
  *
  * Callers pass a deterministic high-cardinality key: keyless
  * round-robin repartition both pays a local sort of its input
  * (sortBeforeRepartition) and is the retry-nondeterminism trap the
  * guide warns about (SPARK-38388); a hash of the row id (or the
  * payload itself) is stable under task retries.
  */
object Spread {
  def ensure(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "Spread.ensure needs a deterministic key")
    if (df.isStreaming) return df // no .rdd probe on streaming frames
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}

package graft.ckpt

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level checkpointing with lineage + per-partition metrics
  * (SURVEY.md §2.9 ST2-ST3, §7.4.6).
  *
  * Semantics (reference analog: load-or-build ANN index,
  * search_pipeline.py:106-109; best-checkpoint save, train.py:94-109):
  *
  *   - each stage owns `<root>/<name>`; if a prior run committed it
  *     (parquet `_SUCCESS` + `_manifest.json` present, with a MATCHING
  *     input fingerprint) the stage is SKIPPED and its output is read
  *     back — resume is therefore per-stage, and within a stage
  *     per-partition via parquet task commits. A manifest whose recorded
  *     fingerprint differs from the caller's (inputs or parameters
  *     changed since the commit) forces a recompute instead of silently
  *     returning stale data.
  *   - commit protocol: write to `<dir>.tmp`, then atomic rename — a
  *     killed run never leaves a half-visible stage
  *   - every commit writes `_manifest.json` (underscore prefix so
  *     spark.read.parquet ignores it): lineage (named inputs), input
  *     fingerprint, row count, partition count, wall ms, rows/sec, and
  *     per-partition row counts (the "triples/partition, mentions/sec"
  *     metrics of the north rule)
  */
object Checkpoint {

  /** minimal JSON string escaping for interpolated values. */
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  final case class StageStats(
      name: String,
      rows: Long,
      partitions: Int,
      wallMs: Long,
      skipped: Boolean)

  /** Run (or resume) one named stage. `fingerprint` identifies the
    * stage's inputs + parameters (callers hash whatever determines the
    * output); a committed stage is only reused when its recorded
    * fingerprint matches.
    */
  def stage(
      spark: SparkSession,
      root: String,
      name: String,
      lineageInputs: Seq[String],
      fingerprint: String = "")(compute: => DataFrame): (DataFrame, StageStats) = {
    val dir = new Path(root, name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(dir, "_manifest.json")
    val success = new Path(dir, "_SUCCESS")

    if (fs.exists(manifest) && fs.exists(success) &&
        readManifestFingerprint(fs, manifest).contains(esc(fingerprint))) {
      val df = spark.read.parquet(dir.toString)
      (df, StageStats(name, -1L, df.rdd.getNumPartitions, 0L, skipped = true))
    } else {
      val t0 = System.nanoTime()
      val df = compute
      val tmp = new Path(root, name + ".tmp")
      fs.delete(tmp, true)
      df.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(dir, true)
      if (!fs.rename(tmp, dir))
        throw new IllegalStateException(s"commit rename failed for $name")
      val out = spark.read.parquet(dir.toString)

      // per-partition lineage metrics (one extra cheap job at commit time)
      val pp = out
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"))
        .orderBy("partition")
        .collect()
      val perPartition = pp
        .map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
        .mkString("[", ",", "]")
      val total = pp.map(_.getLong(1)).sum
      val wallMs = (System.nanoTime() - t0) / 1000000
      val rowsPerSec = if (wallMs > 0) total * 1000.0 / wallMs else 0.0
      val lineage =
        lineageInputs.map(s => "\"" + esc(s) + "\"").mkString("[", ",", "]")
      val json =
        s"""{"stage":"${esc(name)}","fingerprint":"${esc(fingerprint)}",""" +
          s""""rows":$total,"wall_ms":$wallMs,""" +
          s""""rows_per_sec":$rowsPerSec,"lineage":$lineage,""" +
          s""""per_partition":$perPartition}"""
      val os = fs.create(manifest, true)
      os.write(json.getBytes("UTF-8"))
      os.close()
      (out, StageStats(name, total, out.rdd.getNumPartitions, wallMs,
        skipped = false))
    }
  }

  /** escaped fingerprint value recorded in a committed manifest, or
    * None if unreadable / absent (treated as a mismatch -> recompute).
    */
  private def readManifestFingerprint(
      fs: org.apache.hadoop.fs.FileSystem, manifest: Path): Option[String] =
    try {
      val in = fs.open(manifest)
      val out = new java.io.ByteArrayOutputStream()
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      val s = new String(out.toByteArray, "UTF-8")
      val m = """"fingerprint":"((?:[^"\\]|\\.)*)"""".r
        .findFirstMatchIn(s)
      m.map(_.group(1))
    } catch { case _: Exception => None }

  def wasCommitted(spark: SparkSession, root: String, name: String): Boolean = {
    val dir = new Path(root, name)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(dir, "_manifest.json")) && fs.exists(new Path(dir, "_SUCCESS"))
  }
}

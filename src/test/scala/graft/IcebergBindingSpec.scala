package graft

import graft.io.IcebergTableFormat
import org.scalatest.funsuite.AnyFunSuite

/** Executes the production Iceberg binding (graft.io.IcebergTableFormat
  * — previously compile-only) against an in-memory stub V2 catalog
  * (graft.stubcat.StubIcebergCatalog) that serves the same Spark-core
  * surface an Iceberg runtime does: DataFrameWriterV2 createOrReplace,
  * read.table, the `snapshots` metadata table, and snapshot-id time
  * travel.
  */
class IcebergBindingSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    s.conf.set("spark.sql.catalog.stubberg",
      classOf[graft.stubcat.StubIcebergCatalog].getName)
    s
  }

  private val fmt = new IcebergTableFormat

  test("write commits through DataFrameWriterV2 and returns a snapshot " +
    "id that reads back the written data; re-write returns a NEW id " +
    "and time travel to the old id still sees the old rows") {
    import spark.implicits._
    graft.stubcat.StubCatalogState.clear()
    val t = "stubberg.kg.edges_a"
    val v1 = Seq((1L, "uses"), (2L, "monitors")).toDF("id", "pred")
    val id1 = fmt.write(spark, v1, t, partitionCols = Seq("pred"),
      lineage = Seq("triples_canonical"))
    val got1 = fmt.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got1 == Set((1L, "uses"), (2L, "monitors")))

    val v2 = Seq((3L, "restarts")).toDF("id", "pred")
    val id2 = fmt.write(spark, v2, t, Nil, Seq("triples_canonical"))
    assert(id2 != id1, "second commit must get its own snapshot id")
    // latest read = replaced content
    assert(fmt.read(spark, t).collect().map(_.getLong(0)).toSet == Set(3L))
    // time travel to the first commit's id
    val old = fmt.read(spark, t, asOf = Some(id1)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(old == Set((1L, "uses"), (2L, "monitors")))
  }

  test("own-commit diff: the returned id is never a PRE-EXISTING " +
    "snapshot (the stale-time-travel bug), and ids are monotone") {
    import spark.implicits._
    graft.stubcat.StubCatalogState.clear()
    val t = "stubberg.kg.nodes_a"
    val ids = (1 to 3).map { i =>
      fmt.write(spark, Seq((i.toLong, s"v$i")).toDF("id", "name"), t, Nil, Nil)
    }
    assert(ids.distinct.size == 3)
    assert(ids == ids.sorted, s"ids not monotone: $ids")
    // each returned id time-travels to exactly its own committed rows
    ids.zipWithIndex.foreach { case (id, i) =>
      val rows = fmt.read(spark, t, asOf = Some(id)).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set(((i + 1).toLong, s"v${i + 1}")), s"snapshot $id")
    }
  }

  test("KgPipeline.materialize commits node/edge tables through the " +
    "binding (the production call site, config-only swap)") {
    import spark.implicits._
    graft.stubcat.StubCatalogState.clear()
    val turns = graft.gen.TranscriptGen.transcripts(spark, nConvs = 30,
      turnsPerConv = 8, hotTurns = 0, partitions = 2)
    val result = graft.pipeline.KgPipeline.run(spark, turns.toDF(),
      shufflePartitions = 4)
    val (nv, ev) = graft.pipeline.KgPipeline.materialize(spark, result,
      "stubberg.kg", format = fmt)
    assert(nv > 0 && ev > 0)
    val nodes = fmt.read(spark, "stubberg.kg.nodes")
    val edges = fmt.read(spark, "stubberg.kg.edges")
    assert(nodes.count() > 0 && edges.count() > 0)
    assert(edges.columns.contains("pred"))
  }
}

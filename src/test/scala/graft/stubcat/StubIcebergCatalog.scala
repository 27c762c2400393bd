package graft.stubcat

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException => NoTable}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory DataSourceV2 TableCatalog standing in for an
  * Iceberg catalog in tests (no Iceberg jar ships in this sandbox).
  * It executes exactly the Spark-core surface graft.io.IcebergTableFormat
  * is written against:
  *
  *   - `df.writeTo("cat.ns.t").createOrReplace()` (non-atomic RTAS:
  *     drop + create + batch append);
  *   - `spark.read.table("cat.ns.t")` (latest snapshot);
  *   - `spark.read.table("cat.ns.t.snapshots")` — an Iceberg-shaped
  *     metadata table (committed_at TIMESTAMP, snapshot_id BIGINT);
  *   - `spark.read.option("snapshot-id", id).table(...)` time travel.
  *
  * Snapshot ids are assigned from a process-wide counter and
  * committed_at from a monotone fake clock, so same-test commits get
  * distinct, ordered (committed_at, snapshot_id) — the fields the
  * binding's own-commit diff sorts on. State is JVM-static: local-mode
  * executors share it, like every in-memory V2 test catalog.
  */
object StubCatalogState {
  final case class Snapshot(id: Long, committedAtMicros: Long,
      rows: Seq[InternalRow])
  final class TableState(
      @volatile var schema: StructType,
      @volatile var partitioning: Array[Transform],
      val properties: util.Map[String, String]) {
    val snapshots = mutable.ArrayBuffer[Snapshot]()
  }
  val tables = new java.util.concurrent.ConcurrentHashMap[String, TableState]()
  /** snapshot history retained across drop+recreate — Iceberg's
    * createOrReplace keeps prior snapshots reachable for time travel,
    * and the binding's own-commit diff relies on pre-existing ids
    * staying visible
    */
  val retired = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Snapshot]]()
  private val nextId = new java.util.concurrent.atomic.AtomicLong(1000L)
  private val clock =
    new java.util.concurrent.atomic.AtomicLong(1723000000000000L)
  def newSnapshotId(): Long = nextId.incrementAndGet()
  def tick(): Long = clock.addAndGet(1000000L)
  def key(catalog: String, ident: Identifier): String =
    (catalog +: ident.namespace :+ ident.name).mkString(".")
  def clear(): Unit = { tables.clear(); retired.clear() }
}

class StubIcebergCatalog extends TableCatalog {
  import StubCatalogState._

  private var catalogName: String = _
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = (catalogName +: namespace.toSeq).mkString(".") + "."
    tables.keySet.asScala.toArray.collect {
      case k if k.startsWith(prefix) =>
        Identifier.of(namespace, k.stripPrefix(prefix))
    }
  }

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata table: <ns>.<table>.snapshots parses as
    // namespace [<ns>, <table>], name "snapshots"
    if (ident.name == "snapshots" && ident.namespace.nonEmpty) {
      val parent = Identifier.of(
        ident.namespace.dropRight(1), ident.namespace.last)
      val st = tables.get(key(catalogName, parent))
      if (st != null) return new SnapshotsTable(parent, st)
    }
    val st = tables.get(key(catalogName, ident))
    if (st == null) throw new NoTable(ident)
    new StubTable(ident, st)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val st = new StubCatalogState.TableState(schema, partitions,
      new util.HashMap(properties))
    val k = key(catalogName, ident)
    // re-attach history retained across a replace (Iceberg semantics)
    Option(retired.remove(k)).foreach(st.snapshots ++= _)
    tables.put(k, st)
    new StubTable(ident, st)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("stub catalog: alterTable")

  override def dropTable(ident: Identifier): Boolean = {
    val k = key(catalogName, ident)
    val st = tables.remove(k)
    if (st != null) retired.put(k, st.snapshots.toSeq)
    st != null
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("stub catalog: renameTable")
}

/** A writable+readable in-memory table; each batch commit appends one
  * snapshot whose content is the committed rows (createOrReplace drops
  * the table first, so "latest snapshot" is the replaced content).
  */
private class StubTable(ident: Identifier,
    state: StubCatalogState.TableState)
  extends Table with SupportsWrite with SupportsRead {

  override def name(): String = ident.toString
  override def schema(): StructType = state.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def properties(): util.Map[String, String] = state.properties

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // each commit is a full-content snapshot already (replace
      // semantics), so truncate-before-write is the identity
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory =
            new StubWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.toSeq.flatMap {
              case m: StubCommitMessage => m.rows
              case _ => Nil
            }
            state.synchronized {
              state.snapshots += StubCatalogState.Snapshot(
                StubCatalogState.newSnapshotId(),
                StubCatalogState.tick(), rows)
            }
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val snap = state.synchronized {
      val all = state.snapshots.toSeq
      Option(options.get("snapshot-id")) match {
        case Some(id) =>
          all.find(_.id == id.toLong).getOrElse(
            throw new IllegalArgumentException(s"no snapshot $id"))
        case None =>
          if (all.isEmpty) StubCatalogState.Snapshot(-1L, 0L, Nil)
          else all.last
      }
    }
    new StubScanBuilder(state.schema, snap.rows)
  }
}

/** Iceberg-shaped `snapshots` metadata table (read-only subset). */
private class SnapshotsTable(parent: Identifier,
    state: StubCatalogState.TableState)
  extends Table with SupportsRead {

  private val snapSchema = StructType(Seq(
    StructField("committed_at", TimestampType),
    StructField("snapshot_id", LongType)))

  override def name(): String = s"$parent.snapshots"
  override def schema(): StructType = snapSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rows: Seq[InternalRow] = state.synchronized {
      state.snapshots.toSeq.map { s =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](s.committedAtMicros, s.id))
      }
    }
    new StubScanBuilder(snapSchema, rows)
  }
}

private class StubScanBuilder(schema: StructType, rows: Seq[InternalRow])
  extends ScanBuilder {
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        Array(StubInputPartition(rows))
      override def createReaderFactory(): PartitionReaderFactory =
        new StubReaderFactory
    }
  }
}

private case class StubInputPartition(rows: Seq[InternalRow])
  extends InputPartition

private class StubReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[StubInputPartition].rows.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private class StubWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = mutable.ArrayBuffer[InternalRow]()
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage =
        StubCommitMessage(buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private case class StubCommitMessage(rows: Seq[InternalRow])
  extends WriterCommitMessage

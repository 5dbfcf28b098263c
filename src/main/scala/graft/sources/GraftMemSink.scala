package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path — the sink half of the connector surface
  * ([[GraftRangeSource]] is the read half): an in-memory table store
  * (`graft-mem`) exercising the full V2 write contract — `SupportsWrite`
  * → `WriteBuilder` → `BatchWrite` → serializable `DataWriterFactory` →
  * per-partition `DataWriter`s whose buffered rows travel back through
  * `WriterCommitMessage`s and become visible ONLY at `commit` (the
  * transactional all-or-nothing shape every real V2 sink implements;
  * `abort` drops the messages and the table never sees partial data).
  * Read-back goes through the same store as a V2 `Batch` scan, so a
  * write→read roundtrip exercises both directions of the API.
  *
  * The store itself is a JVM-local map — the point is the CONTRACT
  * (planner-visible V2 write + scan nodes, partition-parallel writers,
  * commit-time atomicity), not durability; a production sink swaps the
  * map for its client and keeps every override identical.
  */
class GraftMemSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mem"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMemStore.schemaOf(options.get("table"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftMemTable(properties.get("table"), schema)
}

/** JVM-local table store: name → (schema, committed rows). */
object GraftMemStore {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, (StructType, Array[InternalRow])]()

  def schemaOf(name: String): StructType = {
    val t = tables.get(name)
    require(t != null, s"graft-mem: unknown table '$name'")
    t._1
  }
  def rowsOf(name: String): Array[InternalRow] = {
    val t = tables.get(name)
    require(t != null, s"graft-mem: unknown table '$name'")
    t._2
  }
  def append(name: String, schema: StructType, rows: Array[InternalRow]): Unit =
    tables.merge(name, (schema, rows),
      (old, add) => (old._1, old._2 ++ add._2))
}

class GraftMemTable(tableName: String, tableSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft_mem($tableName)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
            new GraftMemWriterFactory
          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val rows = messages.flatMap {
              case GraftMemCommit(rs) => rs
              case _ => Array.empty[InternalRow]
            }
            GraftMemStore.append(tableName, info.schema(), rows)
          }
          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftMemPartition(GraftMemStore.rowsOf(tableName)))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
              val rows = p.asInstanceOf[GraftMemPartition].rows
              new PartitionReader[InternalRow] {
                private var i = -1
                override def next(): Boolean = { i += 1; i < rows.length }
                override def get(): InternalRow = rows(i)
                override def close(): Unit = ()
              }
            }
          }
      }
    }
}

case class GraftMemPartition(rows: Array[InternalRow]) extends InputPartition

case class GraftMemCommit(rows: Array[InternalRow]) extends WriterCommitMessage

class GraftMemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = GraftMemCommit(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

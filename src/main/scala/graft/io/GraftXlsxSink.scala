package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector for the xlsx metadata export —
  * `df.write.format("graft-xlsx").mode("overwrite").save(path)` — the
  * write-side twin of the `graft-tiff`/`graft-slc` read connectors, so
  * the V2 integration story covers both directions.
  *
  * Contract: this is a SINGLE-FILE, LAYER-CARDINALITY sink (the
  * reference's excel export is a pandas `to_excel` of the metadata
  * table, `metadata_crawler.py:232-235` — never pixel-scale). Executors
  * stringify their partition's rows and ship them back as
  * WriterCommitMessages; the driver assembles partitions in
  * partition-id order and writes one workbook via [[Xlsx.write]]. That
  * driver funnel is the xlsx FORMAT's constraint (one zip, one sheet
  * XML), made explicit here instead of hidden behind a collect() at
  * the call site — and the V2 commit protocol gives the export
  * task-retry atomicity the ad-hoc collect path never had: a
  * re-executed task's rows replace, never duplicate.
  *
  * Stringification follows the M11 stringify-attrs convention: null →
  * empty cell, temporal types through DateTimeUtils (a DATE cell must
  * read "1995-03-15", not days-since-epoch 9204; timestamps render in
  * the session's UTC convention, not raw epoch micros), everything
  * else `String.valueOf` of the Catalyst value.
  */
class GraftXlsxSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-xlsx"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft-xlsx is a write-only sink; reading xlsx is not supported")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftXlsxTable(schema, properties.get("path"))
}

class GraftXlsxTable(tableSchema: StructType, path: String)
    extends Table with SupportsWrite {
  require(path != null, "graft-xlsx requires a save(path)")
  override def name(): String = s"graft-xlsx $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftXlsxBatchWrite(info.schema(), path)
      }
    }
}

case class XlsxRowsMessage(partitionId: Int, rows: Seq[Seq[String]])
    extends WriterCommitMessage

class GraftXlsxBatchWrite(schema: StructType, path: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftXlsxWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case m: XlsxRowsMessage => m }
      .sortBy(_.partitionId).toSeq.flatMap(_.rows)
    Xlsx.write(path.replaceFirst("^file:/*", "/"),
      schema.fieldNames.toSeq, rows)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftXlsxWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      override def write(record: InternalRow): Unit =
        buf += schema.fields.indices.map { i =>
          if (record.isNullAt(i)) ""
          else schema.fields(i).dataType match {
            // Catalyst stores DateType as days-since-epoch int and
            // TimestampType as epoch micros — render them as the dates
            // a spreadsheet reader expects, not the raw integers.
            case org.apache.spark.sql.types.DateType =>
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .toJavaDate(record.getInt(i)).toString
            case org.apache.spark.sql.types.TimestampType =>
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .toJavaTimestamp(record.getLong(i)).toInstant.toString
            case dt => String.valueOf(record.get(i, dt))
          }
        }
      override def commit(): WriterCommitMessage =
        XlsxRowsMessage(partitionId, buf.toSeq)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

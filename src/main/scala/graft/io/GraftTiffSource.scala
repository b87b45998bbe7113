package graft.io

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for GRD TIFF stacks: `spark.read.format("graft-tiff")
  * .load(dir)` → long pixel rows `(path, azimuth, range, intensity)`.
  *
  * The point of the V2 surface over the `binaryFile` + flatMap source
  * ([[TiffPixelSource]]) is that Catalyst's own optimizations reach the
  * BINARY format the way they reach parquet:
  *
  *   - **predicate pushdown into block IO**: azimuth bounds
  *     (`>=/<=/=/>/<`) push into [[Tiff.decodeRows]], which skips the
  *     DECOMPRESSION of every strip/tile whose row range misses the
  *     bound — the TIFF analog of parquet row-group pruning, proven by
  *     the block counter in GraftTiffDsv2Spec (not just row filtering);
  *     `.explain` shows the bound under `PushedFilters`;
  *   - **column pruning**: the scan's `ReadSchema` narrows to the
  *     projection and only the requested fields are materialized into
  *     rows (the sample bytes still stream through the decoder — they
  *     interleave with the coordinates in the block, so skipping them
  *     buys nothing, same reason parquet reads whole pages);
  *   - **file-granular partitions**: one [[InputPartition]] per raster,
  *     the same fan-out unit as the reference's per-raster dask graph —
  *     at 100 TB the stack is many files, which saturates a cluster
  *     without sub-file splits (a strip-granular split would buy
  *     nothing: strips of one file share the payload read).
  *
  * Non-azimuth predicates stay post-scan residuals (Spark re-applies
  * them), so pushdown can never change results — the spec pins
  * DSv2 ≡ TiffPixelSource row-for-row.
  */
class GraftTiffSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-tiff"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTiffSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftTiffTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tiff requires a load path")))
}

object GraftTiffSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("azimuth", IntegerType, nullable = false),
    StructField("range", IntegerType, nullable = false),
    StructField("intensity", DoubleType, nullable = false)))

  /** The raster files of a load path: the path itself if it is a file,
    * else its .tif/.tiff children (same extension set as
    * [[TiffPixelSource]]). */
  def listRasters(pathStr: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files =
      if (st.isFile) Seq(st)
      else fs.listStatus(p).toSeq.filter(_.isFile)
    files.map(_.getPath)
      .filter(f => Set("tif", "tiff").exists(f.getName.toLowerCase.endsWith(_)))
      .map(_.toString).sorted
  }
}

class GraftTiffTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tiff $path"
  override def schema(): StructType = GraftTiffSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftTiffScanBuilder(path)
}

class GraftTiffScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = GraftTiffSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var rowLo: Int = 0
  private var rowHi: Int = Int.MaxValue
  private var countPushed = false

  /** Bare `count(*)` answers from the HEADER (width × height — a few
    * seeks, zero pixel decode): the most extreme form of pushdown the
    * format allows. Partial pushdown only — each file contributes one
    * count row and Spark sums; Spark offers the aggregate here only
    * when no residual filter sits above the scan, so pushed counts can
    * never disagree with a filtered plan. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("azimuth", _: Number) => true
      case GreaterThan("azimuth", _: Number) => true
      case LessThanOrEqual("azimuth", _: Number) => true
      case LessThan("azimuth", _: Number) => true
      case EqualTo("azimuth", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v: Number) => rowLo = math.max(rowLo, v.intValue())
      case GreaterThan(_, v: Number) => rowLo = math.max(rowLo, v.intValue() + 1)
      case LessThanOrEqual(_, v: Number) => rowHi = math.min(rowHi, v.intValue())
      case LessThan(_, v: Number) => rowHi = math.min(rowHi, v.intValue() - 1)
      case EqualTo(_, v: Number) =>
        rowLo = math.max(rowLo, v.intValue()); rowHi = math.min(rowHi, v.intValue())
      case _ =>
    }
    pushed = accepted
    // hand back everything: Spark re-applies accepted filters post-scan
    // too (cheap), which keeps block pruning purely an IO optimization
    rejected ++ accepted
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (countPushed) new GraftTiffCountScan(path)
    else new GraftTiffScan(path, required, pushed, rowLo, rowHi)
}

/** Header-only scan serving a pushed `count(*)`: one row per raster
  * carrying width × height; no payload byte is ever read. */
class GraftTiffCountScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-tiff $path, PushedAggregates: [COUNT(*)]"
  override def planInputPartitions(): Array[InputPartition] =
    GraftTiffSource.listRasters(path)
      .map(f => GraftTiffPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val file = partition.asInstanceOf[GraftTiffPartition].file
          private var served = false
          override def next(): Boolean = !served && { served = true; true }
          override def get(): InternalRow = {
            val info = Tiff.readHeader(file.replaceFirst("^file:/*", "/"))
            InternalRow(info.width.toLong * info.height)
          }
          override def close(): Unit = ()
        }
    }
}

class GraftTiffScan(path: String, required: StructType, pushed: Array[Filter],
    rowLo: Int, rowHi: Int) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tiff $path, PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    GraftTiffSource.listRasters(path)
      .map(f => GraftTiffPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTiffReaderFactory(required.fieldNames, rowLo, rowHi)
}

case class GraftTiffPartition(file: String) extends InputPartition

class GraftTiffReaderFactory(fields: Array[String], rowLo: Int, rowHi: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftTiffReader(partition.asInstanceOf[GraftTiffPartition].file,
      fields, rowLo, rowHi)
}

/** Per-file reader: one payload read, then the row-bounded block decode.
  * The value column decodes only when the projection asks for it. */
class GraftTiffReader(file: String, fields: Array[String], rowLo: Int, rowHi: Int)
    extends PartitionReader[InternalRow] {

  private val pathUtf8 = UTF8String.fromString(
    file.replaceFirst("^file:/*", "/"))

  private val iter: Iterator[(Int, Int, Double)] = {
    val p = new Path(file)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    Tiff.decodeRows(bytes, Tiff.fromBytes(bytes), rowLo, rowHi)
  }

  private var current: (Int, Int, Double) = _

  override def next(): Boolean = {
    val has = iter.hasNext
    if (has) current = iter.next()
    has
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "path" => pathUtf8
      case "azimuth" => current._1
      case "range" => current._2
      case "intensity" => current._3
    })

  override def close(): Unit = ()
}

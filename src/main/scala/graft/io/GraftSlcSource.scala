package graft.io

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for SLC HDF5 stacks — the complex-pair sibling of
  * [[GraftTiffSource]]: `spark.read.format("graft-slc").load(dir)` →
  * `(path, azimuth, range, real, imag)`.
  *
  * Same connector story, different binary format, different pruning
  * unit: azimuth predicates push into [[Hdf5]]'s `readDoublesRows`,
  * where a CONTIGUOUS dataset becomes one ranged read of the row span
  * (a strict byte-range skip) and a CHUNKED dataset skips every chunk
  * whose dim-0 range misses the bound (the chunk B-tree carries chunk
  * origins, so pruning needs no data read at all) — proven by the
  * [[Hdf5.blocksRead]] counter. Bare `count(*)` answers from the
  * dataspace dims (superblock + object-header walk, zero data bytes).
  */
class GraftSlcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-slc"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSlcSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftSlcTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-slc requires a load path")))
}

object GraftSlcSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("azimuth", IntegerType, nullable = false),
    StructField("range", IntegerType, nullable = false),
    StructField("real", DoubleType, nullable = false),
    StructField("imag", DoubleType, nullable = false)))

  def listRasters(pathStr: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(pathStr)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val files = if (st.isFile) Seq(st) else fs.listStatus(p).toSeq.filter(_.isFile)
    files.map(_.getPath)
      .filter(_.getName.toLowerCase.endsWith(".h5"))
      .map(_.toString).sorted
  }

  private[io] def localPath(file: String): String =
    file.replaceFirst("^file:/*", "/")
}

class GraftSlcTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-slc $path"
  override def schema(): StructType = GraftSlcSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSlcScanBuilder(path)
}

class GraftSlcScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = GraftSlcSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var rowLo: Int = 0
  private var rowHi: Int = Int.MaxValue
  private var countPushed = false
  private var staticPaths: Option[Set[String]] = None

  private def intersectPaths(vs: Set[String]): Unit =
    staticPaths = Some(staticPaths.fold(vs)(_ intersect vs))

  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = pushed.isEmpty && agg.groupByExpressions.isEmpty &&
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
      // static raster pruning on path, as in GraftTiffScanBuilder
      case EqualTo("path", _: String) => true
      case In("path", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("azimuth", v: Number) => rowLo = math.max(rowLo, v.intValue())
      case GreaterThan("azimuth", v: Number) => rowLo = math.max(rowLo, v.intValue() + 1)
      case LessThanOrEqual("azimuth", v: Number) => rowHi = math.min(rowHi, v.intValue())
      case LessThan("azimuth", v: Number) => rowHi = math.min(rowHi, v.intValue() - 1)
      case EqualTo("azimuth", v: Number) =>
        rowLo = math.max(rowLo, v.intValue()); rowHi = math.min(rowHi, v.intValue())
      case EqualTo("path", v: String) => intersectPaths(Set(v))
      case In("path", vs) => intersectPaths(vs.map(_.asInstanceOf[String]).toSet)
      case _ =>
    }
    pushed = accepted
    rejected ++ accepted // Spark re-applies: pruning stays IO-only
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  override def build(): Scan =
    // defensive re-check of pushed.isEmpty: header counts are only
    // valid when no filter survives (see GraftTiffScanBuilder.build)
    if (countPushed && pushed.isEmpty) new GraftSlcCountScan(path)
    else new GraftSlcScan(path, required, pushed, rowLo, rowHi, staticPaths)
}

class GraftSlcScan(path: String, required: StructType, pushed: Array[Filter],
    rowLo: Int, rowHi: Int, staticPaths: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-slc $path, PushedFilters: [${pushed.mkString(", ")}]"

  /** Rasters surviving the plan-time path pushdown. */
  private def staticFiles: Seq[String] = {
    val all = GraftSlcSource.listRasters(path)
    staticPaths.fold(all)(set =>
      all.filter(f => set.contains(GraftSlcSource.localPath(f))))
  }

  // runtime (DPP-style) raster pruning — the GraftTiffScan rationale:
  // a path join against a small manifest prunes whole HDF5 files at
  // execution; conservative (unrecognized predicates keep all files)
  @volatile private var runtimeFiles: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains("path")) Array(Expressions.column("path"))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    val keep = scala.collection.mutable.Set.empty[String]
    var recognized = false
    predicates.foreach { p =>
      if (p.name() == "IN" || p.name() == "=") {
        val vals = p.children().collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] => l.value()
        }
        if (vals.nonEmpty) {
          recognized = true
          vals.foreach {
            case u: UTF8String => keep += u.toString
            case s: String => keep += s
            case _ => recognized = false
          }
        }
      }
    }
    if (recognized) runtimeFiles = Some(keep.toSet)
  }

  /** Dataspace-derived statistics (the [[GraftTiffScan]] rationale):
    * numRows from each file's s_i dims clipped to the pushed azimuth
    * span — exact when no residual filters remain, an upper bound
    * otherwise; sizeInBytes from the projected width. Lets small SLC
    * stacks auto-broadcast instead of defaulting to "huge". */
  override def estimateStatistics(): Statistics = {
    var rows = 0L
    staticFiles.foreach { file =>
      val (f, raf) = Hdf5.open(GraftSlcSource.localPath(file))
      try {
        val dims = f.dataset("s_i", f.rootEntries.toMap.apply("s_i")).dims
        val h = dims(0)
        val w = if (dims.length > 1) dims(1) else 1L
        val lo = math.max(rowLo, 0)
        val hi = math.min(rowHi.toLong, h - 1)
        rows += math.max(hi - lo + 1, 0) * w
      } finally raf.close()
    }
    val n = rows
    val bytes = n * 8L * math.max(required.size, 1)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    }
  }
  override def planInputPartitions(): Array[InputPartition] = {
    val all = staticFiles
    val kept = runtimeFiles.fold(all)(set =>
      all.filter(f => set.contains(GraftSlcSource.localPath(f))))
    kept.map(f => GraftSlcPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSlcReaderFactory(required.fieldNames, rowLo, rowHi)
}

case class GraftSlcPartition(file: String) extends InputPartition

class GraftSlcReaderFactory(fields: Array[String], rowLo: Int, rowHi: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftSlcReader(partition.asInstanceOf[GraftSlcPartition].file,
      fields, rowLo, rowHi)
}

/** Per-file reader: header walk, then the row-bounded decode of the
  * s_i/s_q pair. */
class GraftSlcReader(file: String, fields: Array[String], rowLo: Int, rowHi: Int)
    extends PartitionReader[InternalRow] {

  private val local = GraftSlcSource.localPath(file)
  private val pathUtf8 = UTF8String.fromString(local)

  private val (lo, rg, re, im) = {
    val (f, raf) = Hdf5.open(local)
    try {
      val entries = f.rootEntries.toMap
      val si = f.dataset("s_i", entries("s_i"))
      val sq = f.dataset("s_q", entries("s_q"))
      require(si.dims.size == 2 && si.dims == sq.dims,
        s"s_i/s_q must be matching 2-D datasets in $local")
      val az = si.dims.head.toInt
      val l = math.max(rowLo, 0)
      val h = math.min(rowHi, az - 1)
      if (l > h) (0, si.dims(1).toInt, Array.emptyDoubleArray, Array.emptyDoubleArray)
      else (l, si.dims(1).toInt,
        f.readDoublesRows(si, l, h), f.readDoublesRows(sq, l, h))
    } finally raf.close()
  }

  private var i = -1
  override def next(): Boolean = { i += 1; i < re.length }
  override def get(): InternalRow =
    InternalRow.fromSeq(fields.toSeq.map {
      case "path" => pathUtf8
      case "azimuth" => lo + i / rg
      case "range" => i % rg
      case "real" => re(i)
      case "imag" => im(i)
    })
  override def close(): Unit = ()
}

/** Header-only scan serving a pushed `count(*)`: dataspace dims. */
class GraftSlcCountScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"graft-slc $path, PushedAggregates: [COUNT(*)]"
  override def planInputPartitions(): Array[InputPartition] =
    GraftSlcSource.listRasters(path)
      .map(f => GraftSlcPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val file = partition.asInstanceOf[GraftSlcPartition].file
          private var served = false
          override def next(): Boolean = !served && { served = true; true }
          override def get(): InternalRow = {
            val (f, raf) = Hdf5.open(GraftSlcSource.localPath(file))
            try {
              val si = f.dataset("s_i", f.rootEntries.toMap.apply("s_i"))
              InternalRow(si.dims.product)
            } finally raf.close()
          }
          override def close(): Unit = ()
        }
    }
}

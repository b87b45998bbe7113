package graft.io

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var required: StructType = GraftTiffSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var rowLo: Int = 0
  private var rowHi: Int = Int.MaxValue
  private var pushedAggs: Seq[TiffHeaderAgg] = Nil
  private var limit: Option[Int] = None
  private var topNDesc: Boolean = false
  private var staticPaths: Option[Set[String]] = None

  private def intersectPaths(vs: Set[String]): Unit =
    staticPaths = Some(staticPaths.fold(vs)(_ intersect vs))

  /** LIMIT pushes into the block decode: each file decompresses only
    * ceil(limit/width) azimuth rows' worth of strips/tiles and stops —
    * `SELECT ... LIMIT k` over a raster stack touches one block per
    * file instead of the whole payload. PARTIALLY pushed (each
    * partition honors the limit independently; Spark's own Limit
    * still runs on top), so correctness never depends on it. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  /** `ORDER BY azimuth [ASC|DESC] LIMIT k` pushes as a HEAD or TAIL
    * block read: rows decode in ascending azimuth per file, so ASC
    * top-k is the existing limit push and DESC top-k decodes only the
    * last ceil(k/width) azimuth rows (the reader re-bounds rowLo from
    * the header's height — the "latest rows first" access path).
    * Partially pushed: Spark still sorts and limits globally, so a
    * raster's internal ordering is never a correctness dependency.
    * Only a single bare-azimuth sort key qualifies; anything else
    * stays unpushed. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    if (orders.length != 1) return false
    val o = orders.head
    val onAzimuth = o.expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("azimuth"))
      case _ => false
    }
    if (!onAzimuth) return false
    limit = Some(l)
    topNDesc = o.direction() == SortDirection.DESCENDING
    true
  }

  /** Bare `count(*)` and `min/max(azimuth|range)` answer from the
    * HEADER (width × height — a few seeks, zero pixel decode): the most
    * extreme form of pushdown the format allows. The coordinate columns
    * are header-derivable by construction — azimuth spans 0..height-1
    * and range 0..width-1 for every decoded row. Partial pushdown only —
    * each file contributes one stats row and Spark folds (sum of
    * counts, min of mins, …). Spark offers the aggregate here only when
    * no residual filter sits above the scan; `pushed.isEmpty` is ALSO
    * re-checked in [[build]] so a future pushdown-ordering change in
    * Spark cannot produce wrong stats. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return false
    def col(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
        case _ => None
      }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(TiffHeaderAgg.Count)
      case m: Min => col(m.column).collect {
        case "azimuth" => TiffHeaderAgg.MinAzimuth
        case "range" => TiffHeaderAgg.MinRange
      }
      case m: Max => col(m.column).collect {
        case "azimuth" => TiffHeaderAgg.MaxAzimuth
        case "range" => TiffHeaderAgg.MaxRange
      }
      case _ => None
    }
    if (specs.forall(_.isDefined)) { pushedAggs = specs.flatten; true }
    else false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("azimuth", _: Number) => true
      case GreaterThan("azimuth", _: Number) => true
      case LessThanOrEqual("azimuth", _: Number) => true
      case LessThan("azimuth", _: Number) => true
      case EqualTo("azimuth", _: Number) => true
      // STATIC raster pruning: a path equality/IN (e.g. constant-
      // propagated through a join against a literal-filtered manifest)
      // drops whole files from the listing at PLAN time — the static
      // sibling of the runtime V2 filter on the scan
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
    // hand back everything: Spark re-applies accepted filters post-scan
    // too (cheap), which keeps block pruning purely an IO optimization
    rejected ++ accepted
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    // defensive: stats from headers are only valid with zero pushed
    // filters (today Spark never offers aggregates over a filtered V2
    // scan since every filter here stays residual, but that ordering is
    // a Spark-version behavior, not our invariant)
    if (pushedAggs.nonEmpty && pushed.isEmpty) new GraftTiffStatsScan(path, pushedAggs)
    else new GraftTiffScan(path, required, pushed, rowLo, rowHi, limit,
      staticPaths, topNDesc)
}

/** A header-answerable aggregate over the TIFF pixel table. */
sealed trait TiffHeaderAgg extends Serializable {
  def name: String
  def dataType: DataType
  def nullable: Boolean
  /** The per-file partial value (null = no rows in this file). */
  def eval(info: Tiff.Info): Any
}

object TiffHeaderAgg {
  case object Count extends TiffHeaderAgg {
    val name = "count(*)"; val dataType: DataType = LongType; val nullable = false
    def eval(info: Tiff.Info): Any = info.width.toLong * info.height
  }
  case object MinAzimuth extends TiffHeaderAgg {
    val name = "min(azimuth)"; val dataType: DataType = IntegerType; val nullable = true
    def eval(info: Tiff.Info): Any =
      if (info.width > 0 && info.height > 0) 0 else null
  }
  case object MaxAzimuth extends TiffHeaderAgg {
    val name = "max(azimuth)"; val dataType: DataType = IntegerType; val nullable = true
    def eval(info: Tiff.Info): Any =
      if (info.width > 0 && info.height > 0) info.height - 1 else null
  }
  case object MinRange extends TiffHeaderAgg {
    val name = "min(range)"; val dataType: DataType = IntegerType; val nullable = true
    def eval(info: Tiff.Info): Any =
      if (info.width > 0 && info.height > 0) 0 else null
  }
  case object MaxRange extends TiffHeaderAgg {
    val name = "max(range)"; val dataType: DataType = IntegerType; val nullable = true
    def eval(info: Tiff.Info): Any =
      if (info.width > 0 && info.height > 0) info.width - 1 else null
  }
}

/** Header-only scan serving pushed aggregates: one row per raster with
  * one column per aggregate, all derived from width × height; no
  * payload byte is ever read. */
class GraftTiffStatsScan(path: String, aggs: Seq[TiffHeaderAgg]) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggs.map(a => StructField(a.name, a.dataType, a.nullable)))
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tiff $path, PushedAggregates: [${aggs.map(_.name).mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    GraftTiffSource.listRasters(path)
      .map(f => GraftTiffPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    val theAggs = aggs
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val file = partition.asInstanceOf[GraftTiffPartition].file
          private var served = false
          override def next(): Boolean = !served && { served = true; true }
          override def get(): InternalRow = {
            val info = Tiff.readHeader(file.replaceFirst("^file:/*", "/"))
            InternalRow.fromSeq(theAggs.map(_.eval(info)))
          }
          override def close(): Unit = ()
        }
    }
  }
}

class GraftTiffScan(path: String, required: StructType, pushed: Array[Filter],
    rowLo: Int, rowHi: Int, limit: Option[Int] = None,
    staticPaths: Option[Set[String]] = None, topNDesc: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  /** Rasters surviving the PLAN-time path pushdown. */
  private def staticFiles: Seq[String] = {
    val all = GraftTiffSource.listRasters(path)
    staticPaths.fold(all) { set =>
      all.filter(f => set.contains(f.replaceFirst("^file:/*", "/")))
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tiff $path, PushedFilters: [${pushed.mkString(", ")}]" +
      limit.fold("")(l =>
        if (topNDesc) s", PushedTopN: azimuth DESC LIMIT $l"
        else s", PushedLimit: $l")

  // ----- runtime (DPP-style) raster pruning -----
  // Joining a stack on `path` against a small dimension (the labels
  // table, a crawl manifest, an AOI-filtered raster list — the
  // reference's every selective pipeline shape) hands the dimension's
  // path set to the scan AT EXECUTION time through Spark's dynamic
  // partition pruning; whole rasters are then never opened. The file is
  // this format's partition, so this is exactly parquet's
  // partition-column DPP, at the binary-source level. Conservative by
  // contract: an unrecognized predicate shape keeps every raster
  // (runtime filtering is an IO optimization — Spark re-applies the
  // join itself, so correctness never depends on the prune).
  @volatile private var runtimeFiles: Option[Set[String]] = None

  override def filterAttributes(): Array[NamedReference] =
    // only when the projection kept `path` — advertising a pruned-away
    // column makes Spark's runtime-filtering resolution fail
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
            case _ => recognized = false // unexpected literal type: keep all
          }
        }
      }
    }
    if (recognized) {
      runtimeFiles = Some(keep.toSet)
      GraftTiffScan.runtimeFilteredTo.set(keep.size)
    }
  }

  /** Header-derived statistics for Catalyst's planner: numRows =
    * Σ_file width × surviving-azimuth-rows (exact when no residual
    * filters — an upper-bound estimate otherwise, which is the
    * Statistics contract), sizeInBytes from the projected column
    * count. This is what lets a join against a small raster stack
    * auto-broadcast: without it a DSv2 relation defaults to
    * conf.defaultSizeInBytes (= "huge"), and every raster join
    * sort-merges no matter how small the stack. Header reads are a few
    * seeks per file, layer-cardinality, driver-side. */
  override def estimateStatistics(): Statistics = {
    var rows = 0L
    staticFiles.foreach { f =>
      val info = Tiff.readHeader(f.replaceFirst("^file:/*", "/"))
      val lo = math.max(rowLo, 0)
      val hi = math.min(rowHi, info.height - 1)
      rows += math.max(hi - lo + 1, 0).toLong * info.width
    }
    val n = limit.fold(rows)(l => math.min(rows, l.toLong))
    val bytes = n * 8L * math.max(required.size, 1)
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(bytes)
      override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val all = staticFiles
    val kept = runtimeFiles.fold(all) { set =>
      all.filter(f => set.contains(f.replaceFirst("^file:/*", "/")))
    }
    GraftTiffScan.plannedPartitions.set(kept.size)
    kept.map(f => GraftTiffPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftTiffReaderFactory(required.fieldNames, rowLo, rowHi, limit,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration),
      topNDesc)
}

object GraftTiffScan {
  /** Single-JVM test instrumentation (the blocksDecompressed pattern):
    * how many paths the last runtime filter kept, and how many
    * partitions the last planning pass emitted. */
  val runtimeFilteredTo = new java.util.concurrent.atomic.AtomicInteger(-1)
  val plannedPartitions = new java.util.concurrent.atomic.AtomicInteger(-1)
}

case class GraftTiffPartition(file: String) extends InputPartition

class GraftTiffReaderFactory(fields: Array[String], rowLo: Int, rowHi: Int,
    limit: Option[Int], conf: org.apache.spark.util.SerializableConfiguration,
    topNDesc: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftTiffReader(partition.asInstanceOf[GraftTiffPartition].file,
      fields, rowLo, rowHi, limit, conf.value, topNDesc)
}

/** Per-file reader: one payload read, then the row-bounded block decode.
  * The value column decodes only when the projection asks for it. */
class GraftTiffReader(file: String, fields: Array[String], rowLo: Int, rowHi: Int,
    limit: Option[Int], hadoopConf: org.apache.hadoop.conf.Configuration,
    topNDesc: Boolean = false)
    extends PartitionReader[InternalRow] {

  private val pathUtf8 = UTF8String.fromString(
    file.replaceFirst("^file:/*", "/"))

  private val iter: Iterator[(Int, Int, Double)] = {
    val p = new Path(file)
    // the session's Hadoop conf, serialized through the factory — a
    // bare `new Configuration()` would drop fs settings/credentials on
    // non-default filesystems
    val fs = p.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue,
      s"$file is $len bytes; the single-allocation GRD decoder caps at 2 GB/file")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val info = Tiff.fromBytes(bytes)
    // a pushed LIMIT needs at most ceil(limit/width) azimuth rows from
    // this file; capping rowHi lets the lazy strip iterator stop
    // DECOMPRESSING past them, and take(limit) bounds the tail exactly.
    // A DESC top-N instead re-bounds rowLo so only the TAIL rows ever
    // decompress (no take — partial push returns the whole tail window
    // and Spark's own sort+limit finishes the job)
    val need = limit.map(l =>
      (l + math.max(info.width, 1) - 1) / math.max(info.width, 1))
    if (topNDesc && limit.isDefined) {
      val hi = math.min(rowHi, info.height - 1)
      val lo = math.max(rowLo, hi - need.get + 1)
      Tiff.decodeRows(bytes, info, lo, hi)
    } else {
      val effHi = need.fold(rowHi)(nd =>
        math.min(rowHi, math.max(rowLo, 0) + nd - 1))
      val base = Tiff.decodeRows(bytes, info, rowLo, effHi)
      limit.fold(base)(l => base.take(l))
    }
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

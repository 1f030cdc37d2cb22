package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** GeoPackage as a first-class DataSourceV2 connector:
  * `spark.read.format("gpkg").load(paths: _*)` (registered via the
  * DataSourceRegister service file). Where [[GeoPackageReader.read]]
  * parses on the DRIVER (the single-container ingest path the reference
  * takes with `st_read`), this connector plans one input partition per
  * container and runs the whole SQLite B-tree walk + GPB strip INSIDE
  * the scan task — so ingesting ten thousand .gpkg files from an object
  * store parallelizes across every executor, with the driver touching
  * only the first container (schema inference). Column pruning is
  * pushed (SupportsPushDownRequiredColumns): a projection of two
  * columns decodes every row but materializes only those fields into
  * the scan output — visible as ReadSchema in explain, asserted by
  * GpkgSourceSpec.
  *
  * Reference: core_processor.rs:393-398 (st_read gpkg), re-expressed as
  * the Spark connector API rather than a driver-side read.
  */
final class GpkgSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gpkg"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val paths = GpkgSource.paths(options)
    require(paths.nonEmpty, "gpkg source needs at least one path")
    GeoPackageReader.parsed(paths.head)._1
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GpkgTable(schema, GpkgSource.paths(new CaseInsensitiveStringMap(properties)))

  override def supportsExternalMetadata(): Boolean = true
}

object GpkgSource {
  /** Load paths from DSv2 options: `load(p)` arrives as `path`,
    * `load(p1, p2, ...)` as a JSON string array under `paths`. */
  private[sources] def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(parseJsonStringArray).getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  /** Minimal `["a","b"]` parser (paths cannot contain quotes: Spark
    * itself JSON-encodes the list, and the simple unescape below matches
    * its encoder for the path strings a filesystem accepts). */
  private def parseJsonStringArray(s: String): Seq[String] = {
    val t = s.trim
    require(t.startsWith("[") && t.endsWith("]"), s"expected JSON array, got: $s")
    "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(t)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
  }
}

final class GpkgTable(tableSchema: StructType, paths: Seq[String])
    extends Table with SupportsRead {
  override def name(): String = s"gpkg(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GpkgScanBuilder(tableSchema, paths)
}

final class GpkgScanBuilder(full: StructType, paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GpkgScan(required, paths)
}

final class GpkgScan(required: StructType, paths: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // one partition per CONTAINER: a single SQLite file is inherently a
  // single-reader unit (B-tree pages chain within the file), and the
  // many-files ingest case is where the parallelism lives
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GpkgPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GpkgReaderFactory(required)
  override def description(): String =
    s"gpkg cols=[${required.fieldNames.mkString(",")}] files=${paths.length}"
}

final case class GpkgPartition(path: String) extends InputPartition

final class GpkgReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[GpkgPartition].path
    new PartitionReader[InternalRow] {
      // the parse runs HERE — in the scan task, on the executor
      private val (fileSchema, rows) = GeoPackageReader.parsed(path)
      private val idx = required.fieldNames.map { n =>
        val i = fileSchema.fieldNames.indexWhere(_.equalsIgnoreCase(n))
        require(i >= 0, s"container '$path' lacks required column '$n' " +
          s"(has: ${fileSchema.fieldNames.mkString(", ")})")
        i
      }
      private val it = rows.iterator
      private var current: InternalRow = _

      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          current = InternalRow.fromSeq(idx.toSeq.map(i => toCatalyst(r(i))))
          true
        } else false

      override def get(): InternalRow = current
      override def close(): Unit = ()

      private def toCatalyst(v: Any): Any = v match {
        case s: String => UTF8String.fromString(s)
        case other => other // Long / Double / Array[Byte] / null map 1:1
      }
    }
  }
}

package graft.plans

import org.apache.spark.sql.DataFrame

/** Output strategy — the reference's `PostgisProcessor` trait generalized
  * over targets (postgis_processor.rs:7-10). `writeGeo` is the 2-phase
  * geometry write (WKT columns in, typed geometry out); `write` is the
  * plain CTAS (non_geo_strategy.rs:16-20). */
trait Sink {
  def createSchema(schemaName: String): Unit
  def dropTable(schemaName: String, tableName: String): Unit
  def write(df: DataFrame, schemaName: String, tableName: String): Unit
  def writeGeo(df: DataFrame, schemaName: String, tableName: String,
      geomColumns: Seq[String]): Unit
}

/** Test/bench sink: one parquet dataset per table under `rootDir`. Geometry
  * arrives as the `_wkt` columns the transform produced — parquet has no
  * geometry type, so phase 2 is a no-op by design. */
final class ParquetSink(rootDir: String) extends Sink {
  private def path(schemaName: String, tableName: String) =
    s"$rootDir/$schemaName/$tableName"

  override def createSchema(schemaName: String): Unit =
    new java.io.File(s"$rootDir/$schemaName").mkdirs()

  override def dropTable(schemaName: String, tableName: String): Unit = {
    // walkFileTree: no NPE when a dir vanishes mid-walk, and symlinked
    // directories are deleted as LINKS (walk does not follow them), so a
    // link inside the table dir can never delete data outside the sink
    val root = java.nio.file.Paths.get(path(schemaName, tableName))
    if (java.nio.file.Files.exists(root,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
      import java.nio.file.attribute.BasicFileAttributes
      // best-effort like the File#delete() it replaces: a single
      // undeletable/concurrently-vanished entry must not abort the
      // pipeline — the subsequent overwrite-mode write still proceeds
      Files.walkFileTree(root, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
          scala.util.Try(Files.deleteIfExists(f)); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
          FileVisitResult.CONTINUE
        override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
          scala.util.Try(Files.deleteIfExists(d)); FileVisitResult.CONTINUE
        }
      })
      ()
    }
  }

  override def write(df: DataFrame, schemaName: String, tableName: String): Unit =
    df.write.mode("overwrite").parquet(path(schemaName, tableName))

  override def writeGeo(df: DataFrame, schemaName: String, tableName: String,
      geomColumns: Seq[String]): Unit =
    write(df, schemaName, tableName)
}

/** GeoPackage sink: one `.gpkg` container per table under `rootDir/schema`
  * — the write-back side of [[graft.sources.GeoPackageReader]], closing the
  * loop on the one ingest format that was read-only (the reference only
  * reads gpkg, core_processor.rs:393-398; PostGIS is its only geo OUTPUT).
  * `writeGeo` mirrors the 2-phase PostGIS contract at the file level: the
  * transform's `<g>_wkt` text columns become typed GPB geometry columns
  * named `<g>` (invalid WKT → NULL, same as `safe_geom_from_text`), and
  * the `_wkt` scaffolding is dropped.
  *
  * Driver-side single-file emitter by deliberate scope — the same position
  * as [[graft.sources.FormatWriters]]'s readers/writers (an ingest
  * container has no split to distribute; the 100 TB output path is the
  * ParquetSink). Each table must fit one SQLite page (enforced). */
final class GeoPackageSink(rootDir: String, srsId: Int = 4326) extends Sink {
  import graft.sources.FormatWriters
  import graft.functions.GeoFunctions

  private def path(schemaName: String, tableName: String) =
    s"$rootDir/$schemaName/$tableName.gpkg"

  override def createSchema(schemaName: String): Unit =
    new java.io.File(s"$rootDir/$schemaName").mkdirs(): Unit

  override def dropTable(schemaName: String, tableName: String): Unit =
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(path(schemaName, tableName))): Unit

  override def write(df: DataFrame, schemaName: String, tableName: String): Unit =
    writeGeo(df, schemaName, tableName, Nil)

  override def writeGeo(df: DataFrame, schemaName: String, tableName: String,
      geomColumns: Seq[String]): Unit = {
    import org.apache.spark.sql.types._
    // OGC 1.1 §2.1.6 feature tables carry exactly one geometry column;
    // a multi-geometry frame must pick one, not silently drop the rest
    require(geomColumns.lengthCompare(1) <= 0,
      s"GeoPackage allows one geometry column per table, got $geomColumns")
    createSchema(schemaName)
    val wktNames = geomColumns.map(_ + "_wkt").toSet
    val columns = df.schema.fields.map { f =>
      val declared = f.dataType match {
        case _ if wktNames(f.name)                       => "BLOB"
        case LongType | IntegerType | ShortType | ByteType => "INTEGER"
        case DoubleType | FloatType                      => "REAL"
        case StringType                                  => "TEXT"
        case BinaryType                                  => "BLOB"
        case other => throw new IllegalArgumentException(
          s"GeoPackageSink: unsupported column type $other for ${f.name}")
      }
      (if (wktNames(f.name)) f.name.stripSuffix("_wkt") else f.name) -> declared
    }.toSeq
    val fields = df.schema.fields
    // toLocalIterator, NOT collect: pulls one partition at a time, and
    // the page writer streams rows one leaf page at a time (multi-page
    // B-tree with interior fan-out + overflow chains), so driver memory
    // stays bounded at one partition + one page of cells. A single-file
    // SQLite container is still inherently a single-writer sink; the
    // 100 TB path is parquet.
    import scala.jdk.CollectionConverters._
    val rows = df.toLocalIterator().asScala.map { r =>
      fields.indices.map { i =>
        val v = r.get(i)
        (v, fields(i)) match {
          case (null, _) => null
          case (s: String, f) if wktNames(f.name) =>
            // invalid WKT → NULL geometry, the safe_geom_from_text contract
            GeoFunctions.parseWkt(s)
              .map(g => FormatWriters.gpbWrap(srsId, GeoFunctions.toWkb(g)))
              .orNull
          case (x: Long, _) => x
          case (x: Int, _) => x.toLong
          case (x: Short, _) => x.toLong
          case (x: Byte, _) => x.toLong
          case (x: Double, _) => x
          case (x: Float, _) => x.toDouble
          case (x: String, _) => x
          case (x: Array[Byte], _) => x
          case (other, f) => throw new IllegalArgumentException(
            s"GeoPackageSink: unsupported value $other in ${f.name}")
        }
      }
    }
    FormatWriters.writeGeoPackageTable(
      path(schemaName, tableName), tableName, columns, srsId,
      geomColumns.headOption, rows)
  }
}

/** PostGIS sink: reproduces the reference's DDL + 2-phase geometry write
  * byte-for-byte at the SQL level (geo_strategy.rs:350-421,
  * core_processor.rs:134-162). The bulk row transfer is a distributed JDBC
  * write (`df.write.format("jdbc")` — one connection per partition, so a
  * 1000-executor cluster streams in parallel, unlike the reference's
  * single-socket CTAS); the transactional PL/pgSQL block then converts
  * `_wkt` text to typed geometry *inside Postgres*, preserving the
  * invalid-WKT→NULL semantics of `safe_geom_from_text`.
  *
  * No PostgreSQL driver jar ships in this offline image, so `execute` is
  * left to the caller's environment; all SQL generation is pure and
  * unit-tested (SURVEY.md §5.5).
  */
final class JdbcPostgisSink(jdbcUrl: String, execute: String => Unit,
    bulkWrite: Option[(DataFrame, String) => Unit] = None)
    extends Sink {

  import JdbcPostgisSink._

  override def createSchema(schemaName: String): Unit =
    execute(createSchemaSql(schemaName))

  override def dropTable(schemaName: String, tableName: String): Unit =
    execute(dropTableSql(schemaName, tableName))

  /** Phase-1 bulk transfer. `bulkWrite` is the same injection seam as
    * `execute`: offline environments (and transcript tests) supply the
    * transport; production leaves it None and gets the distributed JDBC
    * write against `jdbcUrl`. */
  override def write(df: DataFrame, schemaName: String, tableName: String): Unit =
    bulkWrite match {
      case Some(f) => f(df, qualified(schemaName, tableName))
      case None =>
        df.write.format("jdbc")
          .option("url", jdbcUrl)
          .option("dbtable", qualified(schemaName, tableName))
          .save()
    }

  override def writeGeo(df: DataFrame, schemaName: String, tableName: String,
      geomColumns: Seq[String]): Unit = {
    write(df, schemaName, tableName) // phase 1: WKT columns land as text
    execute(geometryConversionSql(qualified(schemaName, tableName), geomColumns))
  }
}

object JdbcPostgisSink {

  /** Postgres identifier quoting: embedded `"` doubles. (The reference
    * quotes without escaping, core_processor.rs:147-149 — a file named
    * `my"tbl.csv` would break or inject into its generated DDL; escaping
    * here is a deliberate hardening, not a parity deviation for any
    * well-formed name.) */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** `"schema"."table"` qualification (core_processor.rs:147-149). */
  def qualified(schemaName: String, tableName: String): String =
    quoteIdent(schemaName) + "." + quoteIdent(tableName)

  def createSchemaSql(schemaName: String): String =
    s"CREATE SCHEMA IF NOT EXISTS ${quoteIdent(schemaName)};"

  def dropTableSql(schemaName: String, tableName: String): String =
    s"DROP TABLE IF EXISTS ${qualified(schemaName, tableName)};"

  /** Phase 2, per geometry column, inside one transaction — the exact
    * template of geo_strategy.rs:370-400 (safe_geom_from_text exception →
    * NULL; empty/null WKT rows skipped; `_wkt` scaffolding dropped). */
  def geometryConversionSql(qualifiedTable: String, geomColumns: Seq[String]): String = {
    val blocks = geomColumns.map { g =>
      val gq = quoteIdent(g)
      val wktQ = quoteIdent(g + "_wkt")
      s"""ALTER TABLE $qualifiedTable ADD COLUMN $gq geometry;
         |
         |CREATE OR REPLACE FUNCTION safe_geom_from_text(wkt_text TEXT, srid INTEGER)
         |RETURNS geometry AS $$$$
         |BEGIN
         |    RETURN ST_GeomFromText(wkt_text, srid);
         |EXCEPTION
         |    WHEN OTHERS THEN
         |        RETURN NULL;
         |END;
         |$$$$ LANGUAGE plpgsql;
         |
         |UPDATE $qualifiedTable
         |SET $gq = safe_geom_from_text($wktQ, 4326)
         |WHERE $wktQ IS NOT NULL
         |  AND $wktQ != '';
         |
         |DROP FUNCTION safe_geom_from_text(TEXT, INTEGER);
         |ALTER TABLE $qualifiedTable DROP COLUMN $wktQ;""".stripMargin
    }
    s"BEGIN TRANSACTION;\n${blocks.mkString("\n")}\nCOMMIT;"
  }
}

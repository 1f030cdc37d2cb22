package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._
import scala.util.{Try, Using}
import scala.xml.XML

/** XLSX → DataFrame, replacing the reference's `read_xlsx(path)` CTAS
  * (core_processor.rs:407-412). An .xlsx is a zip of XML parts
  * (ECMA-376): `xl/worksheets/sheet1.xml` holds cells,
  * `xl/sharedStrings.xml` the string pool. First row = header (the
  * reference reads with header=true semantics); column types are inferred
  * per column (BIGINT ⊂ DOUBLE ⊂ VARCHAR) like DuckDB's reader.
  *
  * The workbook is parsed on the DRIVER and parallelized from memory:
  * spreadsheets are a human-authored ingest format (MBs, not TBs), and
  * this matches the reference, where DuckDB's read_xlsx is equally
  * single-node. The resulting DataFrame distributes normally.
  */
object XlsxReader {

  def read(spark: SparkSession, path: String,
      sheet: Option[String] = None): DataFrame = {
    val (header, rows) = parse(path, sheet)
    toDataFrame(spark, header, rows)
  }

  /** Whole-workbook parse in external types — the [[ContainerSource]]
    * DSv2 contract (`spark.read.format("xlsx")`, optional `sheet`
    * option): same header/inference/coercion as [[read]], one scan task
    * per workbook when a landing directory of spreadsheets loads. Legacy
    * .xls workbooks dispatch to [[XlsReader]] transparently (the two
    * generations share the header+cells shape). */
  def parsed(sheet: Option[String])(path: String): (StructType, Seq[Seq[Any]]) = {
    val (header, rows) =
      if (FileTypeDetector.isCfbf(path)) {
        require(sheet.isEmpty,
          "sheet selection is xlsx-only (BIFF8 .xls reads its first sheet)")
        XlsReader.parse(path)
      } else parse(path, sheet)
    inferAndCoerce(header, rows)
  }

  /** The ONE inference+coercion tail both call paths share — a fix to
    * coercion or ragged-row padding applied here cannot diverge the
    * connector path from the XlsxReader.read path. */
  private def inferAndCoerce(header: Seq[String],
      rows: Seq[Array[Option[String]]]): (StructType, Seq[Seq[Any]]) = {
    val types = inferTypes(header.length, rows)
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t) })
    val data = rows.map { r =>
      header.indices.map { i =>
        val v = if (i < r.length) r(i) else None
        v.map(coerce(_, types(i))).orNull
      }: Seq[Any]
    }
    (schema, data)
  }

  /** Shared tail of both Excel generations ([[XlsReader]] produces the
    * same header+cells shape): per-column type inference + coercion. */
  private[sources] def toDataFrame(
      spark: SparkSession, header: Seq[String],
      rows: Seq[Array[Option[String]]]): DataFrame = {
    val (schema, data) = inferAndCoerce(header, rows)
    val rdd = spark.sparkContext.parallelize(
      data.map(Row.fromSeq), math.max(1, data.length / 10000))
    spark.createDataFrame(rdd, schema)
  }

  /** Raw cells: header row + data rows, each cell an Option[String] in
    * sheet order. Legacy `.xls` (CFBF container) is detected upstream but
    * unsupported here, with a clear error (SURVEY.md §2.1). */
  /** @param sheet select a worksheet by its workbook NAME (real
    *               workbooks bury data behind cover/summary sheets);
    *               None = the first sheet in workbook order — the
    *               reference's read_xlsx default (core_processor.rs:
    *               407-412). An unknown name fails loudly, listing the
    *               names the workbook actually has. */
  def parse(path: String, sheet: Option[String] = None)
      : (Seq[String], Seq[Array[Option[String]]]) = {
    // legacy .xls is a CFBF container, not a zip: check the magic BEFORE
    // ZipFile so the caller gets routed instead of an opaque "error in
    // opening zip file"
    if (FileTypeDetector.isCfbf(path))
      throw new IllegalArgumentException(
        s"'$path' is a legacy .xls (CFBF) workbook — read it with " +
          "graft.sources.XlsReader (IngestPipeline routes there automatically)")
    Using.resource(new ZipFile(path)) { zf =>
      def entryBytes(name: String): Option[Array[Byte]] =
        Option(zf.getEntry(name)).map(e => zf.getInputStream(e).readAllBytes())

      if (zf.getEntry("xl/workbook.xml") == null)
        throw new IllegalArgumentException(
          s"'$path' is not an xlsx workbook (legacy .xls is not supported; re-save as .xlsx)")

      val shared: IndexedSeq[String] = entryBytes("xl/sharedStrings.xml").map { b =>
        val x = XML.loadString(new String(b, "UTF-8"))
        // each <si> concatenates its direct <t> plus rich-text run <r><t>
        // children — NOT <rPh> phonetic-ruby runs, whose readings would
        // corrupt the value ("東京" must not become "東京トウキョウ")
        (x \ "si").map(si =>
          ((si \ "t") ++ (si \ "r" \ "t")).map(_.text).mkString).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)

      // Sheet selection: by NAME when asked, else the FIRST sheet in
      // workbook.xml order (the user-visible order). Resolution goes
      // through the workbook rels — a reordered workbook stores Sheet3
      // as the first <sheet> entry, and sheet parts need not be named
      // sheetN. The sheetN fallback only serves minimal fixtures with
      // no rels graph, and only for the first-sheet default (an
      // explicit name cannot be honored without the workbook graph).
      val sheetName: String = {
        val fromWorkbook =
          for {
            wb <- entryBytes("xl/workbook.xml")
            rels <- entryBytes("xl/_rels/workbook.xml.rels")
            wbXml = XML.loadString(new String(wb, "UTF-8"))
            allSheets = wbXml \ "sheets" \ "sheet"
            chosen <- sheet match {
              case Some(nm) =>
                val hit = allSheets.find(sh => (sh \ "@name").text == nm)
                if (hit.isEmpty)
                  throw new IllegalArgumentException(
                    s"sheet '$nm' not in '$path' — workbook has: " +
                      allSheets.map(sh => (sh \ "@name").text).mkString(", "))
                hit
              case None => allSheets.headOption
            }
            rid = chosen.attributes.asAttrMap.collectFirst {
              case (k, v) if k == "r:id" || k.endsWith(":id") || k == "id" => v
            }.getOrElse("")
            relsXml = XML.loadString(new String(rels, "UTF-8"))
            target <- (relsXml \ "Relationship")
              .find(r => (r \ "@Id").text == rid)
              .map(r => (r \ "@Target").text)
          } yield if (target.startsWith("/")) target.stripPrefix("/")
                  else s"xl/${target.stripPrefix("./")}"
        sheet.foreach { nm =>
          require(fromWorkbook.isDefined,
            s"cannot resolve sheet '$nm' in '$path': the workbook has no " +
              "rels graph to map sheet names to worksheet parts")
          // with an EXPLICIT name the resolved target must exist — the
          // sheetN.xml fallback below would silently serve the FIRST
          // sheet's rows under the requested name
          require(fromWorkbook.exists(zf.getEntry(_) != null),
            s"sheet '$nm' in '$path' resolves to part " +
              s"'${fromWorkbook.get}' which is missing from the archive")
        }
        fromWorkbook.filter(zf.getEntry(_) != null)
          .orElse((1 to 20).map(i => s"xl/worksheets/sheet$i.xml")
            .find(zf.getEntry(_) != null))
          .getOrElse(throw new IllegalArgumentException(s"no worksheet found in '$path'"))
      }
      val sheetXml = XML.loadString(new String(entryBytes(sheetName).get, "UTF-8"))

      // row r is optional too: absent means "previous row + 1" (ECMA-376)
      var lastRow = 0
      val parsedRows: Seq[(Int, Map[Int, String])] = (sheetXml \\ "row").map { row =>
        val rowIdx = (row \ "@r").text.toIntOption.getOrElse(lastRow + 1)
        lastRow = rowIdx
        // the cell reference attribute is OPTIONAL (ECMA-376): when absent,
        // the cell sits one column after the previous cell in the row
        var nextCol = 0
        val cells = (row \ "c").flatMap { c =>
          val ref = (c \ "@r").text       // e.g. "B3"
          val colIdx = if (ref.nonEmpty) colIndex(ref) else nextCol
          nextCol = colIdx + 1
          val t = (c \ "@t").text
          val value: Option[String] = t match {
            case "s" => (c \ "v").headOption.map(_.text.trim)
              .flatMap(_.toIntOption).flatMap(shared.lift)
            case "inlineStr" => // direct + rich-run <t> only, NOT <rPh> ruby
              Some(((c \ "is" \ "t") ++ (c \ "is" \ "r" \ "t")).map(_.text).mkString)
            case "b" => (c \ "v").headOption.map(v => if (v.text.trim == "1") "true" else "false")
            case _ => (c \ "v").headOption.map(_.text)
          }
          value.map(colIdx -> _)
        }.toMap
        (rowIdx, cells)
      }

      val nonEmpty = parsedRows.filter(_._2.nonEmpty).sortBy(_._1)
      if (nonEmpty.isEmpty) return (Seq.empty, Seq.empty)

      val width = nonEmpty.iterator.flatMap(_._2.keys).max + 1
      def toArray(cells: Map[Int, String]): Array[Option[String]] =
        Array.tabulate(width)(i => cells.get(i))

      val header = toArray(nonEmpty.head._2).zipWithIndex
        .map { case (v, i) => v.getOrElse(s"col$i") }.toSeq
      (header, nonEmpty.tail.map(r => toArray(r._2)))
    }
  }

  /** "BC12" → 54 (0-based column index from the A1-style reference). */
  def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  /** Narrowest type that fits every non-null value in the column. */
  private def inferTypes(width: Int, rows: Seq[Array[Option[String]]]): Seq[DataType] =
    (0 until width).map { i =>
      val values = rows.iterator.flatMap(r => if (i < r.length) r(i) else None).toSeq
      if (values.isEmpty) StringType
      else if (values.forall(_.toLongOption.isDefined)) LongType
      else if (values.forall(v => Try(v.toDouble).isSuccess)) DoubleType
      else StringType
    }

  private def coerce(v: String, t: DataType): Any = t match {
    case LongType   => v.toLong
    case DoubleType => v.toDouble
    case _          => v
  }
}

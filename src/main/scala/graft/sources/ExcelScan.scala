package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import java.io.{FileOutputStream, InputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Excel (.xlsx) scan — SURVEY §2.1 S2 (`pd.read_excel(sheet_name=0)`,
  * handlers/convert_to_parquet.py:185-186) — with zero external
  * dependencies: xlsx is a zip of XML, parsed with the JDK's StAX.
  *
  * Excel is a FRONT-DOOR format in the reference (one workbook per
  * landed file, converted to parquet before any data-plane work), so a
  * driver-side parse into a DataFrame matches the reference's
  * single-node pandas read; the distributed plane starts at the
  * returned DataFrame. All cells surface as strings (header row =
  * column names) and callers cast explicitly — the same
  * inference-neutralization discipline as the CSV/JSON scans.
  *
  * Supports the cell forms real producers emit: inline strings
  * (`t="inlineStr"`), shared strings (`t="s"` via sharedStrings.xml),
  * and numeric/general `<v>` values. Sparse rows are aligned via the
  * cell reference (`r="B7"`).
  */
object ExcelScan {

  private def colIndex(cellRef: String): Int = {
    val letters = cellRef.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inSi = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT if reader.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.CHARACTERS if inSi =>
          sb.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT if reader.getLocalName == "si" =>
          out += sb.toString; inSi = false
        case _ =>
      }
    }
    out.toIndexedSeq
  }

  private def parseSheet(in: InputStream,
                         shared: IndexedSeq[String]): Seq[Array[String]] = {
    val reader = XMLInputFactory.newInstance().createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer[Array[String]]()
    var row: mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    val text = new StringBuilder
    var capture = false
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          reader.getLocalName match {
            case "row" => row = mutable.ArrayBuffer[String]()
            case "c" =>
              cellCol = Option(reader.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(row.length)
              cellType = Option(reader.getAttributeValue(null, "t")).getOrElse("")
            case "v" | "t" => capture = true; text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if capture =>
          text.append(reader.getText)
        case XMLStreamConstants.END_ELEMENT =>
          reader.getLocalName match {
            case "v" | "t" =>
              capture = false
              val v = if (cellType == "s") shared(text.toString.trim.toInt)
                      else text.toString
              while (row.length <= cellCol) row += null
              row(cellCol) = v
            case "row" => rows += row.toArray; row = null
            case _ =>
          }
        case _ =>
      }
    }
    rows.toSeq
  }

  /** Read sheet `sheetIndex` (0-based) of an xlsx as a DataFrame of
    * strings; first row is the header.
    */
  def readXlsx(spark: SparkSession, path: String, sheetIndex: Int = 0): DataFrame = {
    val zip = new ZipFile(path)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip.getInputStream(e)))
        .getOrElse(IndexedSeq.empty)
      val sheetEntry = Option(zip.getEntry(s"xl/worksheets/sheet${sheetIndex + 1}.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet index $sheetIndex in $path"))
      val all = parseSheet(zip.getInputStream(sheetEntry), shared)
      require(all.nonEmpty, s"empty sheet in $path")
      val header = all.head.map(h => Option(h).getOrElse("").trim)
      val width = header.length
      val data = all.tail.map { r =>
        Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
      }
      val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(data.toSeq, math.max(1, data.length / 5000)),
        schema)
    } finally zip.close()
  }

  /** Parse one workbook from in-memory bytes (the executor-side path:
    * no temp files, no ZipFile handle). Only the two entries the parse
    * needs are retained — sharedStrings and the requested sheet — so
    * peak memory is bounded by those parts, not the whole archive.
    */
  private[sources] def parseWorkbook(bytes: Array[Byte],
                                     sheetIndex: Int): Seq[Array[String]] = {
    val sheetName = s"xl/worksheets/sheet${sheetIndex + 1}.xml"
    val wanted = Set("xl/sharedStrings.xml", sheetName)
    val parts = mutable.Map[String, Array[Byte]]()
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (wanted(e.getName)) parts(e.getName) = zin.readAllBytes()
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val shared = parts.get("xl/sharedStrings.xml")
      .map(b => parseSharedStrings(new java.io.ByteArrayInputStream(b)))
      .getOrElse(IndexedSeq.empty)
    val sheet = parts.getOrElse(sheetName,
      throw new IllegalArgumentException(s"no sheet index $sheetIndex"))
    parseSheet(new java.io.ByteArrayInputStream(sheet), shared)
  }

  /** Many-workbook scan, EXECUTOR-side — the landing shape where a
    * batch drops hundreds of workbooks: the `binaryFile` source lists
    * and ships file bytes to executors, and each workbook is parsed
    * inside `mapPartitions` with the same StAX parser as [[readXlsx]].
    * The driver never holds workbook bytes — it sees only file
    * listings; this is the legitimate mapPartitions case (an opaque
    * binary container format no Catalyst expression can open).
    *
    * The expected header is a CONTRACT, not an inference: with many
    * producers, a workbook whose header row differs (renamed,
    * reordered, truncated columns) must fail loudly NAMING THE FILE —
    * silently aligning by position would load wrong columns. Cells
    * surface as strings plus a `_src_file` lineage column; callers
    * cast, as with every front-door scan.
    *
    * Scale: one task per workbook (binaryFile caps files per partition
    * by size); a single workbook must fit an executor's memory, which
    * is the xlsx format's own constraint, not a plan choice.
    */
  def readXlsxMany(spark: SparkSession, pathGlob: String,
                   header: Seq[String], sheetIndex: Int = 0): DataFrame = {
    import org.apache.spark.sql.Encoders
    val schema = StructType(
      StructField("_src_file", StringType, nullable = false) +:
        header.map(StructField(_, StringType, nullable = true)))
    val width = header.length
    val bin = spark.read.format("binaryFile").load(pathGlob)
      .select("path", "content")
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
    bin.mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val all = parseWorkbook(bytes, sheetIndex)
        require(all.nonEmpty, s"empty sheet in $path")
        val got = all.head.map(h => Option(h).getOrElse("").trim).toSeq
        require(got == header,
          s"header mismatch in $path: got $got, expected $header — " +
            "refusing to align columns by position")
        // width is a two-sided contract: narrower rows pad with nulls
        // (sparse sheets omit trailing empty cells), but a WIDER row
        // means a producer appended a data column the declared header
        // doesn't know — positional truncation would silently lose it,
        // so it fails loudly naming the file and row, same as a renamed
        // header.
        all.tail.iterator.zipWithIndex.map { case (r, i) =>
          require(r.length <= width,
            s"row ${i + 2} of $path carries ${r.length} cells but the " +
              s"declared header has $width columns — a producer appended " +
              "data beyond the contract; refusing to silently drop it")
          Row.fromSeq(
            path +: (0 until width).map(j => if (j < r.length) r(j) else null))
        }
      }
    }(Encoders.row(schema))
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Minimal xlsx writer (inline strings only) — fixture/round-trip
    * support for the reader; not a data-plane sink. Every cell carries
    * its `r=` reference and null cells are OMITTED (the sparse form
    * real producers emit) — a positional `<c/>` placeholder would shift
    * later cells left on any reader that aligns by reference.
    */
  def writeXlsx(rows: Seq[Seq[Any]], path: String): Unit = {
    val sheetRows = rows.zipWithIndex.map { case (r, ri) =>
      r.zipWithIndex.map { case (cell, ci) =>
        val ref = s"""r="${colLetters(ci)}${ri + 1}""""
        cell match {
          case null => ""
          case n @ (_: Int | _: Long | _: Double) => s"<c $ref><v>$n</v></c>"
          case s =>
            s"""<c $ref t="inlineStr"><is><t>${xmlEscape(s.toString)}</t></is></c>"""
        }
      }.mkString("<row>", "", "</row>")
    }.mkString
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |<sheetData>$sheetRows</sheetData>
           |</worksheet>""".stripMargin)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }
}

package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream

import scala.collection.mutable

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.SchemaResolver

/** S3 — native .xlsx ingest (SURVEY.md §2.1): the reference's dashboard
  * reads `musemotion_data.xlsx` directly with a header-probe loop
  * (/root/reference/streamlit_app.py:43-77); round 3 shipped the probe
  * algorithm but no Excel reader, leaving the reference's own artifact
  * unconsumable. This is a dependency-free reader for the xlsx subset
  * that data tables actually use — OOXML is a zip of XML parts, parsed
  * here with the JDK's StAX and `java.util.zip`:
  *
  *   - `xl/workbook.xml` + `xl/_rels/workbook.xml.rels`: sheet name →
  *     part resolution;
  *   - `xl/sharedStrings.xml`: the shared-string table (rich-text runs
  *     concatenated, as Excel renders them);
  *   - `xl/worksheets/sheetN.xml`: rows of cells — shared strings
  *     (`t="s"`), inline strings (`t="inlineStr"`), formula-cached
  *     strings (`t="str"`), booleans (`t="b"`), errors (`t="e"` → null)
  *     and numbers (raw `<v>` text, no float re-formatting).
  *
  * Every value lands as a STRING (missing cells null): typing is the
  * clean pipeline's job, same contract as the headerless-CSV path.
  * Excel stores dates as DAY SERIALS (floats, epoch 1899-12-30 or
  * 1904-01-01) distinguishable from plain numbers only by the cell's
  * number format, so the string contract alone would surface opaque
  * serials for date columns. Opt-in `typedDates=true` decodes them:
  * `xl/styles.xml` cellXfs are classified date / datetime / time via
  * the built-in numFmtId table (ECMA-376 §18.8.30) plus a POI-style
  * heuristic over custom format codes, and matching NUMERIC cells
  * render as ISO-8601 strings (`yyyy-MM-dd`, `yyyy-MM-dd HH:mm:ss`,
  * `HH:mm:ss`) — directly castable downstream, still strings, so the
  * raw schema is unchanged. The 1900 system's fictitious 1900-02-29
  * (Lotus leap-year bug: serials 60 and 59 both render 1900-02-28
  * here, the LibreOffice reading) and the `workbookPr date1904` flag
  * are both handled; see [[serialToIso]].
  *
  * Scale shape: sheet XML is not splittable and xlsx is a small-file
  * format by construction (XLSX row limit is 2^20), so the unit of
  * parallelism is the FILE — `read` distributes one workbook per task
  * via [[FsUtil.expand]] and parses on executors through the
  * scheme-appropriate Hadoop FileSystem. A workbook's relevant parts
  * are buffered in memory during the parse (zip entry order is
  * unspecified, and sharedStrings must precede the sheet scan).
  */
object XlsxSource {

  /** One parsed sheet row: 0-based position in the sheet, cells by
    * 0-based column (missing cells null), padded to the sheet's width.
    */
  final case class SheetRow(rowIdx: Int, cells: Vector[String])

  // ---------- zip + xml parsing (pure, executor-safe) -----------------

  private def secureFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** Buffer the workbook parts the parse needs. */
  private def readParts(in: InputStream): Map[String, Array[Byte]] = {
    val wanted = (n: String) =>
      n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
      n == "xl/sharedStrings.xml" || n == "xl/styles.xml" ||
      (n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
    val zin = new ZipInputStream(in)
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && wanted(e.getName)) out += e.getName -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** `A1` → 0, `B` part of `B7` → 1, `AA3` → 26 … */
  private[sources] def colIndex(cellRef: String): Int = {
    var acc = 0
    var i = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** sheet name → worksheet part path, in workbook order. */
  private def sheetTargets(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    val rels = mutable.Map.empty[String, String]
    parts.get("xl/_rels/workbook.xml.rels").foreach { bytes =>
      val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
          rels += r.getAttributeValue(null, "Id") ->
            r.getAttributeValue(null, "Target")
      }
      r.close()
    }
    val sheets = mutable.ArrayBuffer.empty[(String, String)]
    parts.get("xl/workbook.xml").foreach { bytes =>
      val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          // r:id lives in the officeDocument relationships namespace; StAX
          // needs either the ns URI or a scan over the attributes
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          val target = rid.flatMap(rels.get).getOrElse("")
          if (target.nonEmpty) {
            val norm =
              if (target.startsWith("/")) target.stripPrefix("/")
              else if (target.startsWith("xl/")) target
              else "xl/" + target
            sheets += name -> norm
          }
        }
      }
      r.close()
    }
    sheets.toSeq
  }

  /** Shared-string table; rich-text runs concatenate their `<t>`s. */
  private def sharedStrings(parts: Map[String, Array[Byte]]): IndexedSeq[String] =
    parts.get("xl/sharedStrings.xml").map { bytes =>
      val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      val all = mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inSi = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
          sb.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; all += sb.toString
        case _ => ()
      }
      r.close()
      all.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  // ---------- typed decode: styles + date serials ----------------------

  /** How a numeric cell formatted with a given cellXf renders under
    * typed decode. NotDate = raw serial text (the default contract).
    * ElapsedH/M/S are the `[h]` / `[mm]` / `[ss]` duration formats:
    * totals, NOT modulo-24/60 clock parts (26.5h renders "26:30:00").
    *
    * An elapsed kind additionally packs (high bits) how many FINER
    * clock parts follow the bracket in the format code, so rendering
    * follows the code instead of a hardcoded tail (ADVICE r8): `[h]`
    * renders "26", `[hh]:mm` "26:30", `[h]:mm:ss` "26:30:00".
    */
  private[sources] object StyleKind {
    val NotDate = 0; val Date = 1; val DateTime = 2; val Time = 3
    val ElapsedH = 4; val ElapsedM = 5; val ElapsedS = 6
    /** Packed elapsed kind: unit base + the trailing-part count. */
    def elapsed(base: Int, parts: Int): Int = base + 8 * parts
    def elapsedBase(kind: Int): Int = kind & 7
    def elapsedParts(kind: Int): Int = kind >> 3
  }

  /** Built-in numFmtId classification (ECMA-376 §18.8.30): 14–17 and the
    * era formats 27–36 / 50–58 are dates, 18–21 and 45–47 times, 22 the
    * one built-in date+time. Custom ids (≥164) classify by format code.
    */
  private def numFmtKind(id: Int, code: Option[String]): Int =
    if ((id >= 14 && id <= 17) || (id >= 27 && id <= 36) || (id >= 50 && id <= 58))
      StyleKind.Date
    else if ((id >= 18 && id <= 21) || (id >= 45 && id <= 47)) StyleKind.Time
    else if (id == 22) StyleKind.DateTime
    else code.map(customKind).getOrElse(StyleKind.NotDate)

  /** POI-style heuristic for custom format codes: drop quoted literals,
    * bracket sections (colors / conditions) and backslash escapes plus
    * the AM/PM token, then classify by which pattern letters survive —
    * y/d mean a date part, h/s a time part, a bare m (no h/s context) is
    * a month. "#,##0.00", "0.00%", "General", "@" keep none of them and
    * stay NotDate. An ELAPSED bracket (`[h]`/`[mm]`/`[ss]` — a bracket
    * holding only h/m/s letters) wins outright: those are duration
    * formats, rendered as totals rather than clock parts (the first
    * elapsed bracket's letter picks the unit, as in Excel) — and the
    * finer clock parts that FOLLOW the bracket in the same format
    * section decide the rendered tail ([[StyleKind.elapsed]] packing),
    * so `[hh]:mm` renders hours:minutes and bare `[h]` just the total.
    */
  private[sources] def customKind(fmt: String): Int = {
    val sb = new StringBuilder
    var elapsed = StyleKind.NotDate
    var elapsedMark = -1 // sb position where the elapsed bracket closed
    var i = 0
    while (i < fmt.length) fmt.charAt(i) match {
      case '"' =>
        i += 1
        while (i < fmt.length && fmt.charAt(i) != '"') i += 1
        i += 1
      case '[' =>
        i += 1
        val start = i
        while (i < fmt.length && fmt.charAt(i) != ']') i += 1
        val content = fmt.substring(start, math.min(i, fmt.length)).toLowerCase
        if (elapsed == StyleKind.NotDate && content.nonEmpty &&
            content.forall(c => c == 'h' || c == 'm' || c == 's')) {
          elapsed = content.head match {
            case 'h' => StyleKind.ElapsedH
            case 'm' => StyleKind.ElapsedM
            case _   => StyleKind.ElapsedS
          }
          elapsedMark = sb.length
        }
        i += 1
      case '\\' => i += 2
      case ch   => sb.append(ch); i += 1
    }
    if (elapsed != StyleKind.NotDate) {
      // visible chars after the bracket, first format section only
      // (';' starts the negative/zero sections)
      val tail = sb.substring(elapsedMark).takeWhile(_ != ';').toLowerCase
      val parts = elapsed match {
        case StyleKind.ElapsedH =>
          (if (tail.contains('m')) 1 else 0) + (if (tail.contains('s')) 1 else 0)
        case StyleKind.ElapsedM => if (tail.contains('s')) 1 else 0
        case _                  => 0
      }
      return StyleKind.elapsed(elapsed, parts)
    }
    val s = sb.toString.toLowerCase
      .replace("am/pm", "").replace("a/p", "")
    val hasDate = s.exists(c => c == 'y' || c == 'd')
    val hasTime = s.exists(c => c == 'h' || c == 's')
    if (hasDate && hasTime) StyleKind.DateTime
    else if (hasDate) StyleKind.Date
    else if (hasTime) StyleKind.Time
    else if (s.contains('m')) StyleKind.Date // bare month, e.g. "mmm-yy"
    else StyleKind.NotDate
  }

  /** Per-cellXf StyleKind from `xl/styles.xml`. Single pass is sound:
    * the styleSheet XSD sequences `numFmts` before `cellXfs`, so every
    * custom code is known when its xf is classified. Only xfs inside
    * `cellXfs` count — `cellStyleXfs` holds the named-style masters that
    * cells never reference directly.
    */
  private def styleKinds(parts: Map[String, Array[Byte]]): IndexedSeq[Int] =
    parts.get("xl/styles.xml").map { bytes =>
      val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      val custom = mutable.Map.empty[Int, String]
      val kinds = mutable.ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            for (id <- Option(r.getAttributeValue(null, "numFmtId"));
                 code <- Option(r.getAttributeValue(null, "formatCode")))
              custom += id.trim.toInt -> code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            val id = Option(r.getAttributeValue(null, "numFmtId"))
              .map(_.trim.toInt).getOrElse(0)
            kinds += numFmtKind(id, custom.get(id))
          case _ => ()
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ => ()
      }
      r.close()
      kinds.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

  /** `workbookPr date1904` flag: serials count from 1904-01-01 (classic
    * Mac Excel) instead of the 1900 system.
    */
  private def isDate1904(parts: Map[String, Array[Byte]]): Boolean =
    parts.get("xl/workbook.xml").exists { bytes =>
      val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
      var flag = false
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr") {
          val v = r.getAttributeValue(null, "date1904")
          flag = v == "1" || v == "true"
        }
      }
      r.close()
      flag
    }

  /** Day serial → ISO-8601 string. 1900 system: Excel inherits Lotus
    * 1-2-3's fictitious 1900-02-29 (serial 60), so real dates from
    * 1900-03-01 on live at epoch 1899-12-30 while serials 1–59 live at
    * 1899-12-31; serial 60 itself decodes as 1900-02-28 (the
    * LibreOffice reading of the non-existent day). 1904 system: plain
    * offset from 1904-01-01, no bug. The fraction is the time of day,
    * rounded to the nearest second (rolling into the next day at
    * exactly 86400). Serials Excel itself cannot display (negative in
    * the 1900 system) pass through as raw text.
    */
  private[sources] def serialToIso(raw: String, kind: Int,
                                   date1904: Boolean): String = {
    val serial = raw.trim.toDouble
    if (!date1904 && serial < 0) return raw
    // elapsed formats: the serial is a DURATION in days — render totals
    // (26.5h → "26:30:00"), never modulo-24/60 clock parts. The tail
    // follows the format code's own parts (packed in the kind), and a
    // negative 1904-system duration (legal in Excel) renders as the
    // abs rendering with one leading '-' — never '%02d' on negative
    // remainders (ADVICE r8; the 1900 system already returned raw above).
    if (kind >= StyleKind.ElapsedH) {
      val parts = StyleKind.elapsedParts(kind)
      val signed = math.round(serial * 86400.0)
      val sign = if (signed < 0) "-" else ""
      val total = math.abs(signed)
      return StyleKind.elapsedBase(kind) match {
        case StyleKind.ElapsedH => parts match {
          case 0 => sign + (total / 3600)
          case 1 => sign + "%d:%02d".format(total / 3600, (total / 60) % 60)
          case _ => sign + "%d:%02d:%02d".format(
            total / 3600, (total / 60) % 60, total % 60)
        }
        case StyleKind.ElapsedM =>
          if (parts == 0) sign + (total / 60)
          else sign + "%d:%02d".format(total / 60, total % 60)
        case _ => sign + total.toString
      }
    }
    var days = math.floor(serial).toLong
    var secs = math.round((serial - days) * 86400.0)
    if (secs >= 86400L) { secs -= 86400L; days += 1 }
    val d =
      if (date1904) java.time.LocalDate.of(1904, 1, 1).plusDays(days)
      else if (days >= 60) java.time.LocalDate.of(1899, 12, 30).plusDays(days)
      else java.time.LocalDate.of(1899, 12, 31).plusDays(days)
    val hms = "%02d:%02d:%02d".format(secs / 3600, (secs / 60) % 60, secs % 60)
    kind match {
      case StyleKind.Date => d.toString
      case StyleKind.Time => hms
      case _              => s"$d $hms"
    }
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
                         maxRows: Int,
                         styleKind: IndexedSeq[Int] = IndexedSeq.empty,
                         date1904: Boolean = false): Vector[SheetRow] = {
    val r = secureFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer.empty[(Int, Vector[(Int, String)])]
    var cells = mutable.ArrayBuffer.empty[(Int, String)]
    var sheetRow = 0      // 0-based position of the current <row>
    var nextCol = 0       // advance cursor for cells without an r= ref
    var cellCol = 0
    var cellType = "n"
    var cellKind = StyleKind.NotDate
    // rich-text inline strings carry multiple <t> runs per cell — they
    // concatenate (Excel's rendering), so buffer until </c>
    var inlineSb: StringBuilder = null
    var width = 0
    var done = false
    while (r.hasNext && !done) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          cells = mutable.ArrayBuffer.empty
          nextCol = 0
        case "c" =>
          val ref = r.getAttributeValue(null, "r")
          cellCol = if (ref != null) colIndex(ref) else nextCol
          cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
          cellKind =
            if (styleKind.isEmpty) StyleKind.NotDate
            else Option(r.getAttributeValue(null, "s"))
              .map(_.trim.toInt)
              .filter(i => i >= 0 && i < styleKind.length)
              .map(styleKind)
              .getOrElse(StyleKind.NotDate)
          inlineSb = if (cellType == "inlineStr") new StringBuilder else null
          nextCol = cellCol + 1
        case "v" =>
          val raw = r.getElementText
          val v = cellType match {
            case "s" =>
              val i = raw.trim.toInt
              if (i >= 0 && i < shared.length) shared(i) else null
            case "b" => if (raw.trim == "1") "true" else "false"
            case "e" => null
            case _ if cellKind != StyleKind.NotDate =>
              // numeric cell under a date/time format → ISO string;
              // anything the decode can't render falls back to the raw
              // contract. NonFatal, not just NumberFormatException: an
              // absurd-but-parseable serial (9.9E99 styled as a date)
              // saturates floor().toLong and makes LocalDate.plusDays
              // throw DateTimeException/ArithmeticException — one such
              // cell must not fail the whole file read.
              try serialToIso(raw, cellKind, date1904)
              catch { case scala.util.control.NonFatal(_) => raw }
            case _ => raw
          }
          if (v != null) cells += cellCol -> v
        case "t" if inlineSb != null =>
          inlineSb.append(r.getElementText)
        case _ => ()
      }
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "c" =>
          if (inlineSb != null) { cells += cellCol -> inlineSb.toString; inlineSb = null }
        case "row" =>
          rows += sheetRow -> cells.toVector
          if (cells.nonEmpty) width = math.max(width, cells.map(_._1).max + 1)
          sheetRow += 1
          if (rows.length >= maxRows) done = true
        case _ => ()
      }
      case _ => ()
    }
    r.close()
    rows.map { case (idx, cs) =>
      val arr = Array.fill[String](width)(null)
      cs.foreach { case (c, v) => if (c < width) arr(c) = v }
      SheetRow(idx, arr.toVector)
    }.toVector
  }

  /** Parse one workbook stream: the named sheet (default: first), at most
    * `maxRows` rows. Pure function of the bytes — callable on executors.
    * `typedDates=true` opts into the date-serial decode (see object doc).
    */
  def parseWorkbook(in: InputStream, sheet: Option[String] = None,
                    maxRows: Int = Int.MaxValue,
                    typedDates: Boolean = false): Vector[SheetRow] = {
    val parts = readParts(in)
    val sheets = sheetTargets(parts)
    if (sheets.isEmpty)
      throw new IllegalArgumentException("not an xlsx workbook (no sheets found)")
    val (name, target) = sheet match {
      case Some(s) => sheets.find(_._1 == s).getOrElse(
        throw new IllegalArgumentException(
          s"sheet '$s' not found; workbook has: ${sheets.map(_._1).mkString(", ")}"))
      case None => sheets.head
    }
    val bytes = parts.getOrElse(target,
      throw new IllegalArgumentException(s"sheet part $target missing (sheet '$name')"))
    parseSheet(bytes, sharedStrings(parts), maxRows,
      styleKind = if (typedDates) styleKinds(parts) else IndexedSeq.empty,
      date1904 = typedDates && isDate1904(parts))
  }

  // ---------- Spark surface -------------------------------------------

  private val rawSchema = StructType(Seq(
    StructField("_file", StringType, nullable = false),
    StructField("_row", IntegerType, nullable = false),
    StructField("cells", ArrayType(StringType, containsNull = true), nullable = false)))

  /** Raw distributed read: one task per workbook file, rows as
    * (`_file`, `_row`, `cells array<string>`). `_row` is the 0-based
    * sheet position — header detection and skipping key off it.
    */
  def read(spark: SparkSession, pathGlob: String,
           sheet: Option[String] = None,
           typedDates: Boolean = false): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FsUtil.expand(pathGlob, conf)
    require(files.nonEmpty, s"no files match $pathGlob")
    val serConf = new SerializableWritable(conf)
    val rdd = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { p =>
        val in = FsUtil.open(p, serConf.value)
        try parseWorkbook(in, sheet, typedDates = typedDates)
          .map(sr => Row(p, sr.rowIdx, sr.cells))
        finally in.close()
      }
    spark.createDataFrame(rdd, rawSchema)
  }

  /** The dashboard's Excel flow end-to-end: probe the first
    * `maxProbe + 1` rows of the first file for the header
    * ([[HeaderProbe.detect]] scoring), then distribute the full read
    * and impose the detected, normalized names positionally. Multi-file
    * globs assume a uniform layout (same header row in each file).
    */
  def readAutoHeader(spark: SparkSession, pathGlob: String,
                     expected: Seq[String],
                     sheet: Option[String] = None,
                     maxProbe: Int = 10,
                     typedDates: Boolean = false): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = FsUtil.expand(pathGlob, conf)
    require(files.nonEmpty, s"no files match $pathGlob")
    val probeIn = FsUtil.open(files.head, conf)
    val probeRows =
      try parseWorkbook(probeIn, sheet, maxRows = maxProbe + 1).map(_.cells)
      finally probeIn.close()
    val det = HeaderProbe.detect(probeRows.map(_.map(c => if (c == null) "" else c)),
        expected, maxProbe)
      .getOrElse(throw new IllegalArgumentException(
        s"no header row found in first ${maxProbe + 1} rows of ${files.head} " +
        s"(expected like: ${expected.mkString(", ")})"))
    val names = det.headers.map(SchemaResolver.normalize)
      .zipWithIndex.map { case (n, i) => if (n.isEmpty) s"_c$i" else n }
    val raw = read(spark, pathGlob, sheet, typedDates)
    raw.filter(col("_row") > det.headerRow)
      .select(names.zipWithIndex.map {
        case (n, i) => col("cells").getItem(i).as(n)
      }.toIndexedSeq: _*)
  }
}

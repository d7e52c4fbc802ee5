package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Export twin of [[XlsxSource]]: write a DataFrame as a one-sheet
  * .xlsx workbook — the interchange format the reference's dashboard
  * artifacts live in (`musemotion_data.xlsx`).
  *
  * A worksheet is a single non-splittable XML part, so xlsx is an
  * EXPORT format for bounded results (dashboards, samples, reports),
  * not a lake format — the writer streams `toLocalIterator` through
  * the driver with O(one row) memory and refuses more than `maxRows`
  * (hard format limit 2^20 rows; default far lower so a misrouted
  * 100 TB frame fails fast instead of producing a corrupt artifact).
  * Cells are written as numbers (numeric types) or inline strings
  * (everything else) — inline strings keep the writer single-pass; the
  * reader side handles both encodings. Output goes through the Hadoop
  * FileSystem, so `file:`/`hdfs://`/`s3a://` targets all work.
  */
object XlsxSink {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colLetter(idx0: Int): String = {
    var s = ""
    var i = idx0 + 1
    while (i > 0) { val r = (i - 1) % 26; s = s"${('A' + r).toChar}$s"; i = (i - 1) / 26 }
    s
  }

  def write(df: DataFrame, path: String, sheetName: String = "Sheet1",
            maxRows: Int = 100000,
            conf: Configuration = new Configuration()): Unit = {
    require(maxRows <= (1 << 20) - 1, "xlsx caps at 2^20 rows incl. header")
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    val zip = new ZipOutputStream(out)
    def part(name: String)(body: StringBuilder => Unit): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      val sb = new StringBuilder
      body(sb)
      zip.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    try {
      part("[Content_Types].xml") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">"""
        sb ++= """<Default Extension="xml" ContentType="application/xml"/>"""
        sb ++= """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>"""
        sb ++= """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>"""
        sb ++= """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
        sb ++= "</Types>"
      }
      part("_rels/.rels") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">"""
        sb ++= """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>"""
        sb ++= "</Relationships>"
      }
      part("xl/workbook.xml") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">"""
        sb ++= s"""<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets></workbook>"""
      }
      part("xl/_rels/workbook.xml.rels") { sb =>
        sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
        sb ++= """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">"""
        sb ++= """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>"""
        sb ++= "</Relationships>"
      }

      zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def emit(s: String): Unit =
        zip.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      emit("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      emit("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      def rowXml(rix: Int, cells: Seq[(Int, Any)]): String = {
        val cs = cells.collect { case (c, v) if v != null =>
          val ref = s"${colLetter(c)}$rix"
          v match {
            case n: Byte    => s"""<c r="$ref"><v>$n</v></c>"""
            case n: Short   => s"""<c r="$ref"><v>$n</v></c>"""
            case n: Int     => s"""<c r="$ref"><v>$n</v></c>"""
            case n: Long    => s"""<c r="$ref"><v>$n</v></c>"""
            case n: Float   => s"""<c r="$ref"><v>$n</v></c>"""
            case n: Double  => s"""<c r="$ref"><v>$n</v></c>"""
            case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
            case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
            case other =>
              s"""<c r="$ref" t="inlineStr"><is><t>${esc(other.toString)}</t></is></c>"""
          }
        }.mkString
        s"""<row r="$rix">$cs</row>"""
      }
      emit(rowXml(1, df.columns.zipWithIndex.toIndexedSeq.map { case (n, i) => (i, n: Any) }))
      var rix = 2
      val it = df.toLocalIterator()
      while (it.hasNext) {
        if (rix - 1 > maxRows)
          throw new IllegalArgumentException(
            s"xlsx export exceeds maxRows=$maxRows — xlsx is for bounded " +
            "results; raise maxRows explicitly or use a lake format")
        val row = it.next()
        emit(rowXml(rix, (0 until row.length).map(i =>
          (i, if (row.isNullAt(i)) null else row.get(i)))))
        rix += 1
      }
      emit("</sheetData></worksheet>")
      zip.closeEntry()
    } finally zip.close()
  }
}

package graft.io

import java.nio.charset.StandardCharsets

/** Minimal XLSX (OOXML spreadsheet) writer — closes the reference's
  * excel metadata export (save_metadata_table_as_excel_table,
  * metadata_crawler.py:232-235) without external dependencies: an xlsx
  * is a zip of XML parts; all cells are written as inline strings, so no
  * shared-strings table is needed. Driver-side by design — the metadata
  * table is layer-cardinality, exactly like the reference's pandas
  * `to_excel`. */
object Xlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  def write(path: String, header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="metadata" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin

    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    (header +: rows).zipWithIndex.foreach { case (cells, i) =>
      sheet.append(s"""<row r="${i + 1}">""")
      cells.foreach { c =>
        val v = Option(c).getOrElse("")
        sheet.append(s"""<c t="inlineStr"><is><t>${esc(v)}</t></is></c>""")
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val parts = Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> wbRels,
      "xl/worksheets/sheet1.xml" -> sheet.toString)

    val out = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try {
      parts.foreach { case (name, content) =>
        out.putNextEntry(new java.util.zip.ZipEntry(name))
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.closeEntry()
      }
    } finally out.close()
  }
}

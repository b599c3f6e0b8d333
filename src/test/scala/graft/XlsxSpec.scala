package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{Sources, Xlsx}

/** The reader is held to MORE than the writer emits: a hand-crafted
  * workbook in Excel's own idiom — sharedStrings with rich-text runs,
  * `t="s"` cells, explicit `r="C3"` references with gap cells, numeric
  * cells — so the round-trip oracle (q89) isn't self-consistent by
  * construction.
  */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def zipOf(entries: (String, String)*): String = {
    val path = Files.createTempFile("graft_xlsx", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(path))
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    path.toString
  }

  test("reads an Excel-style workbook: shared strings, refs, gaps, numbers") {
    val shared =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>id</t></si>
        |<si><t>name</t></si>
        |<si><r><rPr><b/></rPr><t>rich </t></r><r><t>text</t></r></si>
        |<si><t xml:space="preserve">  padded  </t></si>
        |</sst>""".stripMargin
    // row 2 leaves B2 as a gap (cell C2 jumps via r="C2"); row 3 uses
    // shared strings incl. a multi-run entry
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>note</t></is></c></row>
        |<row r="2"><c r="A2"><v>42</v></c><c r="C2" t="s"><v>3</v></c></row>
        |<row r="3"><c r="A3"><v>7.5</v></c><c r="B3" t="s"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val path = zipOf(
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet)
    val df = Xlsx.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "note"))
    val rows = df.collect().map(r =>
      (0 until 3).map(i => Option(r.getString(i)).orNull))
    assert(rows(0) == Seq("42", null, "  padded  ")) // gap + whitespace kept
    assert(rows(1) == Seq("7.5", "rich text", null)) // rich-text runs concat
  }

  test("multi-run INLINE strings concatenate; DTD entities are rejected") {
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><r><t>Hello </t></r><r><t>world</t></r></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val df = Xlsx.read(spark, zipOf("xl/worksheets/sheet1.xml" -> sheet))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Hello world"))

    val xxe =
      """<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>&e;</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin
    val thrown = intercept[Exception] {
      Xlsx.read(spark, zipOf("xl/worksheets/sheet1.xml" -> xxe)).collect()
    }
    assert(!thrown.getMessage.contains("root:"), "entity must not resolve")
  }

  test("write/read round-trip preserves escapes, newlines, and MID-ROW nulls") {
    val df = Seq(
      (1L, "a & b < c > \"d\"", Some("en")),
      (2L, "line1\nline2\ttabbed", None),
      (3L, "  leading and trailing  ", Some("de")),
      // null in the MIDDLE column: a ref-less writer would shift "fr"
      // into the body column on read
      (4L, null: String, Some("fr")))
      .toDF("id", "body", "lang")
    val out = Files.createTempDirectory("graft_xlsx_rt")
      .resolve("t.xlsx").toString
    Sources.write(df, out)
    val back = Sources.read(spark, out)
      .select($"id".cast("long"), $"body", $"lang")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(back(0) == ((1L, "a & b < c > \"d\"", Some("en"))))
    assert(back(1)._2 == "line1\nline2\ttabbed")
    assert(back(1)._3.isEmpty) // trailing null survives as null
    assert(back(2)._2 == "  leading and trailing  ")
    assert(back(3) == ((4L, null, Some("fr"))), s"mid-row null shifted: ${back(3)}")
  }

  test(".xls dispatch: mislabeled zip reads as xlsx; real BIFF rejects loudly and typed") {
    // (a) a modern workbook renamed .xls is dispatched on CONTENT (PK
    // magic) and reads fine — the common mislabel case
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dir = Files.createTempDirectory("graft_xls")
    val asXlsx = s"$dir/t.xlsx"
    Xlsx.write(df, asXlsx)
    val asXls = s"$dir/t.xls"
    Files.copy(java.nio.file.Path.of(asXlsx), java.nio.file.Path.of(asXls))
    val back = Sources.read(spark, asXls)
    assert(back.count() == 2 && back.columns.toSeq == Seq("id", "v"))

    // (b) a genuine CFB/BIFF container gets the actionable rejection
    val biff = s"$dir/legacy.xls"
    Files.write(java.nio.file.Path.of(biff),
      Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
        ++ new Array[Byte](512))
    val e1 = intercept[IllegalArgumentException](Sources.read(spark, biff))
    assert(e1.getMessage.contains("BIFF") && e1.getMessage.contains(".xlsx"),
      s"rejection must name the format and the fix: ${e1.getMessage}")

    // (c) not-an-Excel-container bytes get their own message
    val junk = s"$dir/junk.xls"
    Files.write(java.nio.file.Path.of(junk),
      "this is not a workbook".getBytes(StandardCharsets.UTF_8))
    val e2 = intercept[IllegalArgumentException](Sources.read(spark, junk))
    assert(e2.getMessage.contains("neither"), e2.getMessage)
  }

  test("column index arithmetic covers multi-letter references") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("BC12") == 54)
    // cellRef and colIndex are inverse over a wide column range
    (0 until 1000).foreach { c =>
      assert(Xlsx.colIndex(Xlsx.cellRef(7, c)) == c, s"col $c")
    }
  }
}

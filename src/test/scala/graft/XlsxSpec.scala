package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.io.Xlsx

/** S3: native xlsx ingest vs the reference's `load_excel`
  * (/root/reference/raw_data_reformat.py:151-185). The fixture workbook is
  * built byte-for-byte here with JDK zip + hand-rolled OOXML parts, so the
  * test is self-contained offline and exercises every cell form the reader
  * claims: shared strings (incl. an empty one), numeric cells, date-styled
  * serials (custom AND builtin numFmt), string times, and sparse rows.
  */
class XlsxSpec extends SparkSpec {

  /** Excel serial for a timestamp on the 1899-12-30 epoch. */
  private def serial(ts: String): Double = {
    val t = java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
    val epoch = java.time.LocalDateTime.of(1899, 12, 30, 0, 0, 0)
    val secs = java.time.Duration.between(epoch, t).getSeconds
    secs / 86400.0
  }

  private val sharedPool = IndexedSeq(
    "Time", "Heart rate (bpm)", "SaO2 (%)", "Body temperature (C)",
    "Body temperature (F)", "Event Markers", "feeling dizzy", "",
    "Total sleep", "Deep sleep", "Light sleep", "Pedometer",
    "7h23m", "1h2m", "6h21m", "2024-03-01 07:30:00")
  private def s(v: String): String =
    s"""t="s"><v>${sharedPool.indexOf(v)}</v>"""

  private def workbookBytes: Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Vitals" sheetId="1" r:id="rId1"/>
        |<sheet name="Sleep" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin
    val sst = {
      val sis = sharedPool.map(v =>
        s"""<si><t xml:space="preserve">$v</t></si>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedPool.length}" uniqueCount="${sharedPool.length}">$sis</sst>""".stripMargin
    }
    // style 1 → custom date numFmt 164, style 2 → builtin date numFmt 14,
    // style 3 → a non-date custom format (must NOT trigger serial decode)
    val styles =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2">
        |<numFmt numFmtId="164" formatCode="yyyy\-mm\-dd\ hh:mm:ss"/>
        |<numFmt numFmtId="165" formatCode="0.00&quot; mg&quot;"/>
        |</numFmts>
        |<cellXfs count="4">
        |<xf numFmtId="0"/><xf numFmtId="164"/><xf numFmtId="14"/><xf numFmtId="165"/>
        |</cellXfs></styleSheet>""".stripMargin
    val t1 = serial("2024-03-01 08:00:00")
    val t2 = serial("2024-03-01 08:05:00")
    val sheet1 =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1">
         |<c r="A1" ${s("Time")}</c><c r="B1" ${s("Heart rate (bpm)")}</c>
         |<c r="C1" ${s("SaO2 (%)")}</c><c r="D1" ${s("Body temperature (C)")}</c>
         |<c r="E1" ${s("Body temperature (F)")}</c><c r="F1" ${s("Event Markers")}</c>
         |</row>
         |<row r="2">
         |<c r="A2" s="1"><v>$t1</v></c><c r="B2"><v>72</v></c>
         |<c r="C2"><v>98</v></c><c r="D2"><v>36.6</v></c>
         |<c r="E2"><v>97.9</v></c><c r="F2" ${s("feeling dizzy")}</c>
         |</row>
         |<row r="3">
         |<c r="A3" s="2"><v>$t2</v></c><c r="B3" s="3"><v>71</v></c>
         |<c r="C3" ${s("")}</c>
         |</row>
         |</sheetData></worksheet>""".stripMargin
    val sheet2 =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1">
         |<c r="A1" ${s("Time")}</c><c r="B1" ${s("Total sleep")}</c>
         |<c r="C1" ${s("Deep sleep")}</c><c r="D1" ${s("Light sleep")}</c>
         |<c r="E1" ${s("Pedometer")}</c>
         |</row>
         |<row r="2">
         |<c r="A2" ${s("2024-03-01 07:30:00")}</c><c r="B2" ${s("7h23m")}</c>
         |<c r="C2" ${s("1h2m")}</c><c r="D2" ${s("6h21m")}</c>
         |<c r="E2"><v>5000</v></c>
         |</row>
         |</sheetData></worksheet>""".stripMargin
    val buf = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(buf)
    def put(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes(UTF_8))
      zout.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", rels)
    put("xl/sharedStrings.xml", sst)
    put("xl/styles.xml", styles)
    put("xl/worksheets/sheet1.xml", sheet1)
    put("xl/worksheets/sheet2.xml", sheet2)
    zout.close()
    buf.toByteArray
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("xlsx-spec")
    java.nio.file.Files.write(d.resolve("computed.xlsx"), workbookBytes)
    d.toString
  }

  test("tall melts each sheet against its header, Time as id var (S3)") {
    val rows = Xlsx.tall(spark, dir).collect()
    // sheet1: 5 value cells row2 + 2 row3; sheet2: 4 value cells
    assert(rows.length == 11)
    val bySheet = rows.groupBy(_.getAs[String]("sheet"))
    assert(bySheet.keySet == Set("Vitals", "Sleep"))
    // pre-rename, pre-drop: the Fahrenheit column is still present
    assert(rows.exists(_.getAs[String]("kind") == "Body temperature (F)"))
    // custom date numFmt decoded the serial Time cell
    assert(bySheet("Vitals").filter(_.getAs[Int]("row") == 1)
      .forall(_.getAs[String]("time_raw") == "2024-03-01 08:00:00"))
    // builtin date numFmt (id 14) likewise
    assert(bySheet("Vitals").filter(_.getAs[Int]("row") == 2)
      .forall(_.getAs[String]("time_raw") == "2024-03-01 08:05:00"))
    // the non-date style (0.00" mg") must NOT decode as a serial
    assert(bySheet("Vitals").exists(r =>
      r.getAs[Int]("row") == 2 && r.getAs[String]("data") == "71"))
  }

  test("loadComputed matches load_excel: renames, to_minutes, drops (S3)") {
    val got = Xlsx.loadComputed(spark, dir)
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("date_time").toString,
        r.getAs[String]("kind"), r.getAs[String]("data")))
      .toSet
    val expect = Set(
      // Vitals row 2 (serial time): renamed kinds, F column dropped by kind
      ("2024-03-01 08:00:00.0", "hr", "72"),
      ("2024-03-01 08:00:00.0", "spo2", "98"),
      ("2024-03-01 08:00:00.0", "st", "36.6"),
      ("2024-03-01 08:00:00.0", "Event_markers", "feeling dizzy"),
      // Vitals row 3: hr kept, empty-string spo2 dropped (:176)
      ("2024-03-01 08:05:00.0", "hr", "71"),
      // Sleep row: XhYm → minutes (:171-173, :183-185), number passthrough
      ("2024-03-01 07:30:00.0", "sleep_total", "443"),
      ("2024-03-01 07:30:00.0", "sleep_deep", "62"),
      ("2024-03-01 07:30:00.0", "sleep_light", "381"),
      ("2024-03-01 07:30:00.0", "step", "5000"))
    assert(got == expect)
  }

  test("loadComputed feeds meltComputed-equivalent numeric consumption") {
    // downstream numeric cast as filtering_data.py does with the object col
    import org.apache.spark.sql.functions._
    val n = Xlsx.loadComputed(spark, dir)
      .filter(col("kind") === "sleep_total")
      .select(col("data").cast("double")).head().getDouble(0)
    assert(n == 443.0)
  }
}

package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3: native xlsx (OOXML) ingest — the one reference input format the
  * engine previously could not open (`load_excel`,
  * /root/reference/raw_data_reformat.py:151-181; the same loader is
  * duplicated in filtering_data.py:15-45 and activity_categorize.py:14-44).
  *
  * An .xlsx file is a zip of small XML parts; no external library is
  * needed: `java.util.zip` opens the container and the JDK's StAX parser
  * reads the parts. Like [[Archives]], workbooks are read distributed via
  * the `binaryFile` source and parsed inside the scan task — workbook bytes
  * never shuffle, only melted (time, kind, data) rows flow on. One workbook
  * is one task-side unit (they are per-subject files of a few hundred KB);
  * a directory of thousands of workbooks parallelizes across tasks.
  *
  * Supported cell forms: shared strings (`t="s"`, including multi-run rich
  * text), inline strings (`t="inlineStr"`), formula-cached strings
  * (`t="str"`), booleans (`t="b"`), numbers, and date/time cells (numeric
  * serials whose style resolves to a date number format — both builtin and
  * custom formats), converted to `yyyy-MM-dd HH:mm:ss` text on the Excel
  * 1899-12-30 epoch exactly as openpyxl surfaces them to the reference.
  */
object Xlsx {

  // ---- task-side OOXML parsing (no Spark types below this line) ---------

  private def zipParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName.stripPrefix("/")
        if (!e.isDirectory && name.startsWith("xl/")) {
          val buf = new java.io.ByteArrayOutputStream()
          val b = new Array[Byte](8192)
          var n = zin.read(b)
          while (n >= 0) { buf.write(b, 0, n); n = zin.read(b) }
          out += name -> buf.toByteArray
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // workbook XML is machine-generated; refuse DTD/external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** `<si>` entries, concatenating every `<t>` run (rich text). */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = newReader(bytes)
    val out = IndexedSeq.newBuilder[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT && cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** numFmtIds Excel builds in as date/time formats. */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date format if it contains y/m/d/h/s
    * outside quoted literals and bracketed sections ("[Red]", "[h]" is
    * elapsed-time — still a time). */
  private def isDateCode(code: String): Boolean = {
    val sb = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < code.length) {
      val c = code.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (c == '\\') i += 1 // skip escaped literal
      else if (!inQuote) sb.append(c)
      i += 1
    }
    val cleaned = sb.toString.replaceAll("\\[[^hms\\]]*\\]", "")
    cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
  }

  /** Style indexes (positions in `cellXfs`) whose number format is a
    * date/time format — a numeric cell with such a style is a date serial. */
  private def dateStyleIndexes(bytes: Array[Byte]): Set[Int] = {
    val r = newReader(bytes)
    val customDate = scala.collection.mutable.Set.empty[Int]
    val styles = scala.collection.mutable.ArrayBuffer.empty[Int] // numFmtId per xf
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId"))
                .flatMap(_.toIntOption)
              val code = Option(r.getAttributeValue(null, "formatCode"))
              for (i <- id; c <- code; if isDateCode(c)) customDate += i
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              styles += Option(r.getAttributeValue(null, "numFmtId"))
                .flatMap(_.toIntOption).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    r.close()
    styles.zipWithIndex.collect {
      case (fmt, i) if BuiltinDateFmts(fmt) || customDate(fmt) => i
    }.toSet
  }

  /** Worksheets in workbook order: (sheet name, zip part path). */
  private def sheetParts(parts: Map[String, Array[Byte]])
      : Seq[(String, String)] = {
    // r:id → target from the workbook rels
    val rels = scala.collection.mutable.Map.empty[String, String]
    parts.get("xl/_rels/workbook.xml.rels").foreach { bytes =>
      val r = newReader(bytes)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null) rels += id -> target
        }
      }
      r.close()
    }
    def resolve(target: String): String =
      if (target.startsWith("/")) target.stripPrefix("/")
      else "xl/" + target
    val out = Seq.newBuilder[(String, String)]
    parts.get("xl/workbook.xml").foreach { bytes =>
      val r = newReader(bytes)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet") {
          val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
          // the r:id attribute is namespaced; scan attributes by local name
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          rid.flatMap(rels.get).map(resolve)
            .filter(parts.contains)
            .foreach(path => out += name -> path)
        }
      }
      r.close()
    }
    out.result()
  }

  /** "BC12" → 0-based column 54. */
  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Excel serial → `yyyy-MM-dd HH:mm:ss` on the 1899-12-30 epoch
    * (openpyxl's convention for post-1900 dates), rounding the fractional
    * day to the nearest second to undo float truncation. */
  private def serialToDateTime(serial: Double): String = {
    val epoch = java.time.LocalDateTime.of(1899, 12, 30, 0, 0, 0)
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    epoch.plusDays(days).plusSeconds(secs)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
  }

  /** Render a numeric cell the way openpyxl → pandas → str would: integral
    * values print without a trailing `.0`. */
  private def renderNumber(text: String): String =
    text.toDoubleOption match {
      case Some(d) if d.isWhole && math.abs(d) < 1e15 => d.toLong.toString
      case _ => text
    }

  /** One worksheet → ordered rows of (0-based col → cell text). */
  private def sheetRows(bytes: Array[Byte], shared: IndexedSeq[String],
                        dateStyles: Set[Int]): Seq[Map[Int, String]] = {
    val r = newReader(bytes)
    val rows = Seq.newBuilder[Map[Int, String]]
    var row: scala.collection.mutable.Map[Int, String] = null
    var nextAutoCol = 0
    var cellCol = 0
    var cellType = ""
    var cellDate = false
    var text: StringBuilder = null
    var collecting = false
    var inIs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.Map.empty
              nextAutoCol = 0
            case "c" if row != null =>
              // cells without an r= attribute take the next position
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(nextAutoCol)
              nextAutoCol = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellDate = cellType.isEmpty &&
                Option(r.getAttributeValue(null, "s"))
                  .flatMap(_.toIntOption).exists(dateStyles)
            case "v" => text = new StringBuilder; collecting = true
            case "is" => inIs = true
            case "t" if inIs => text = new StringBuilder; collecting = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (collecting) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if collecting =>
              collecting = false
              val raw = text.toString
              val value = cellType match {
                case "s" => raw.toIntOption.filter(shared.isDefinedAt)
                  .map(shared).getOrElse(raw)
                case "b" => if (raw == "1") "TRUE" else "FALSE"
                case "inlineStr" | "str" => raw
                case _ if cellDate =>
                  raw.toDoubleOption.map(serialToDateTime).getOrElse(raw)
                case _ => renderNumber(raw)
              }
              if (row != null) row += cellCol -> value
            case "is" => inIs = false
            case "row" if row != null =>
              rows += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  // ---- distributed surface ----------------------------------------------

  private val tallSchema = StructType(Seq(
    StructField("file", StringType),
    StructField("sheet_index", IntegerType),
    StructField("sheet", StringType),
    StructField("row", IntegerType),
    StructField("time_raw", StringType),
    StructField("kind", StringType),
    StructField("data", StringType)))

  /** Every workbook under `dir`, melted sheet-by-sheet exactly as
    * `load_excel` does (raw_data_reformat.py:164-177): the first row is the
    * header, the `Time` column is the id var, every other column melts to
    * (kind = header, data = cell). Raw — no renames, drops, or duration
    * parsing; see [[loadComputed]] for the full load_excel contract.
    * Cells absent from a row emit nothing (pandas would carry a NaN there;
    * both disappear at the empty-value filter). */
  def tall(spark: SparkSession, dir: String,
           glob: String = "*.xlsx"): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(tallSchema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val path = r.getAs[String]("path")
        val parts = zipParts(r.getAs[Array[Byte]]("content"))
        val shared = parts.get("xl/sharedStrings.xml")
          .map(sharedStrings).getOrElse(IndexedSeq.empty)
        val dateStyles = parts.get("xl/styles.xml")
          .map(dateStyleIndexes).getOrElse(Set.empty)
        sheetParts(parts).zipWithIndex.flatMap {
          case ((sheetName, part), sheetIdx) =>
            val rows = sheetRows(parts(part), shared, dateStyles)
            if (rows.isEmpty) Seq.empty
            else {
              val header = rows.head
              val timeCol = header.find(_._2 == "Time").map(_._1)
                .getOrElse(header.keys.min)
              val valueCols = header.keys.filter(_ != timeCol).toSeq.sorted
              rows.tail.zipWithIndex.flatMap { case (cells, i) =>
                val time = cells.getOrElse(timeCol, null)
                valueCols.flatMap { c =>
                  cells.get(c).map(v =>
                    Row(path, sheetIdx, sheetName, i + 1, time,
                      header(c), v))
                }
              }
            }
        }
      }.toDF()
  }

  /** The full `load_excel` contract
    * (/root/reference/raw_data_reformat.py:151-181): headers renamed per
    * `feature_rename` (:153-162), sleep durations parsed `"XhYm"` → minutes
    * (:171-173, :183-185), the Fahrenheit duplicate column dropped (:175),
    * empty values dropped (:176), `Time` parsed to a timestamp (:180).
    * Output: (file, date_time TIMESTAMP, kind, data STRING) — data stays
    * string-typed as in the reference's object column; numeric consumers
    * cast downstream (e.g. [[graft.ops.Normalize.meltComputed]] semantics).
    */
  def loadComputed(spark: SparkSession, dir: String,
                   glob: String = "*.xlsx"): DataFrame = {
    val renames = typedlit(graft.ops.Normalize.FeatureRenames)
    val sleepKinds = Seq("sleep_total", "sleep_deep", "sleep_light")
    tall(spark, dir, glob)
      .withColumn("kind",
        coalesce(element_at(renames, col("kind")), col("kind")))
      .filter(col("kind") =!= "Body temperature (F)")
      .filter(col("data").isNotNull && col("data") =!= "")
      .withColumn("data",
        when(col("kind").isin(sleepKinds: _*) &&
            col("data").rlike("^\\d+h\\d+m?$"),
          graft.ops.TimeOps.durationToMinutes(col("data"))
            .cast(StringType))
          .otherwise(col("data")))
      .withColumn("date_time", parseTime(col("time_raw")))
      .select(col("file"), col("date_time"), col("kind"), col("data"))
  }

  /** Timestamp text in either serial-converted (`yyyy-MM-dd HH:mm:ss`) or
    * ISO `T` form, with optional fractional seconds. */
  private def parseTime(c: Column): Column =
    coalesce(
      try_to_timestamp(c),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSS")))
}

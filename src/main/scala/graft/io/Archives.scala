package graft.io

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6: zip-archive ingest (SURVEY.md §2.1 —
  * `extract_zip`, /root/reference/organize_raw_files.py:7-20). The
  * reference unzips to disk and summarizes member counts per extension;
  * here archives are read distributed via the `binaryFile` source and
  * entries are enumerated (and optionally extracted) in the scan task —
  * archive bytes never shuffle, only entry metadata/payloads flow on.
  */
object Archives {

  private val entrySchema = StructType(Seq(
    StructField("archive", StringType),
    StructField("entry", StringType),
    StructField("ext", StringType),
    StructField("size", LongType)))

  private def extOf(name: String): String = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    val i = base.lastIndexOf('.')
    if (i < 0) "" else base.substring(i)
  }

  /** Enumerate zip entries: (archive, entry, ext, size). Directories are
    * skipped. */
  def zipEntries(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(entrySchema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val path = r.getAs[String]("path")
        val zin = new ZipInputStream(
          new ByteArrayInputStream(r.getAs[Array[Byte]]("content")))
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          var e = zin.getNextEntry
          while (e != null) {
            if (!e.isDirectory) {
              // entry sizes may be unknown (-1) until the stream is read
              var n = 0L
              val buf = new Array[Byte](8192)
              var read = zin.read(buf)
              while (read >= 0) { n += read; read = zin.read(buf) }
              out += Row(path, e.getName, extOf(e.getName), n)
            }
            e = zin.getNextEntry
          }
        } finally zin.close()
        out
      }
  }

  /** The reference's per-extension member summary
    * (organize_raw_files.py:17-18). */
  def zipSummary(spark: SparkSession, dir: String): DataFrame =
    zipEntries(spark, dir).groupBy("ext").count().orderBy("ext")
}

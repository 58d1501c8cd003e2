package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Common Crawl CDX(J) index ingestion — the crawl-PLANNING front door
  * that precedes any WARC byte ever moving: each index line is
  * `<urlkey> <timestamp> {json}` (the CDXJ form cc-index ships;
  * reference line shape per the public commoncrawl/cc-index docs), and
  * the standard pipeline is parse → pre-fetch dedup by content digest →
  * a per-archive fetch plan ordered by offset so each WARC is read as
  * one forward sweep of range requests. Everything here is map-only
  * string/JSON work plus the explicitly-declared dedup/plan shuffles —
  * index lines are ~300 bytes, so even a full-crawl index (~10^10
  * lines) is Spark-sized, which is exactly why planning happens on the
  * index and never on the archives. */
object Cdx {

  /** The JSON payload fields this engine consumes (the cc-index block
    * carries more; unparsed fields pass through inside `json`). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /** Parse one CDXJ line into its columns. Malformed lines (no two
    * space-separated prefix fields + `{...}` tail) yield NULL fields
    * but keep the raw line — the Readers corrupt-record quarantine
    * convention, so a count of `url IS NULL` is the damage gauge.
    * cc-index serializes status/length/offset as JSON STRINGS; they are
    * cast to their numeric types here, once. */
  def parsed(line: Column): Column = {
    val urlkey = regexp_extract(line, "^(\\S+) (\\d{14}) (\\{.*\\})$", 1)
    val ts = regexp_extract(line, "^(\\S+) (\\d{14}) (\\{.*\\})$", 2)
    val js = regexp_extract(line, "^(\\S+) (\\d{14}) (\\{.*\\})$", 3)
    val p = from_json(js, payloadSchema)
    struct(
      when(urlkey =!= "", urlkey).as("urlkey"),
      when(ts =!= "", ts).as("timestamp"),
      p.getField("url").as("url"),
      p.getField("mime").as("mime"),
      p.getField("status").cast("int").as("status"),
      p.getField("digest").as("digest"),
      p.getField("length").cast("long").as("length"),
      p.getField("offset").cast("long").as("offset"),
      p.getField("filename").as("filename"))
  }

  /** Scan CDXJ index files (glob ok) into parsed records + the raw
    * line. Map-only: one text scan, one regex, one JSON parse. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .select(col("line"), parsed(col("line")).as("r"))
      .select(col("r.*"), col("line"))

  /** Pre-fetch dedup: keep ONE index row per content digest — the
    * fetch-bytes saver (a crawl's duplicate rate by digest is routinely
    * 30-60%; every dropped row is a WARC range request never made).
    * Keep-first = smallest (timestamp, urlkey) per digest, the
    * deterministic earliest-capture convention. Rows with a NULL
    * digest (malformed lines) pass through untouched — quarantine is a
    * separate decision. One digest-keyed window; index rows only. */
  def dedupByDigest(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("digest")
      .orderBy(col("timestamp").asc, col("urlkey").asc)
    val withDigest = records.filter(col("digest").isNotNull)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")
    withDigest.unionByName(records.filter(col("digest").isNull))
  }

  /** Per-archive fetch plan: for each WARC filename, its wanted records
    * ordered by byte offset with a 1-based `fetch_seq` — the forward
    * sweep a range-request reader executes (random offset order defeats
    * object-store readahead; sorted order makes each archive one
    * monotone scan). Optionally gate to fetchable rows first (status
    * 200, non-null offset/length). One filename-keyed window. */
  def planFetch(records: DataFrame, okStatusOnly: Boolean = true)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fetchable = records
      .filter(col("filename").isNotNull && col("offset").isNotNull &&
        col("length").isNotNull)
      .filter(if (okStatusOnly) col("status") === 200 else lit(true))
    val w = Window.partitionBy("filename").orderBy("offset")
    fetchable
      .withColumn("fetch_seq", row_number().over(w))
      .select(col("filename"), col("fetch_seq"), col("offset"),
        col("length"), col("url"), col("digest"))
  }
}

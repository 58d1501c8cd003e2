package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for every relation the engine touches.
  *
  * The reference keeps all schemas implicit (pandas inference; the only
  * explicit statements are `usecols=` lists at
  * /root/reference/activity_categorize.py:52,57,61). The Spark engine makes
  * each one an explicit [[StructType]] so scans prune and cast at the source.
  */
object Schemas {

  /** Raw watch JSON record (reference stage-2 input,
    * /root/reference/raw_data_reformat.py:13-37). `time` is epoch
    * milliseconds; `data` is a tagged union — parsed permissively as a JSON
    * string and re-parsed per `kind` (see
    * [[graft.ops.Normalize.normalizeMeasurements]]).
    */
  val rawJson: StructType = StructType(Seq(
    StructField("time", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("data", StringType, nullable = true)
  ))

  /** Tall measurement table — the pipeline's central relation
    * (/root/reference/raw_data_reformat.py:93,101; re-read at
    * activity_categorize.py:52-55, filtering_data.py:68).
    */
  val measurement: StructType = StructType(Seq(
    StructField("jname", StringType),
    StructField("date_time", TimestampType),
    StructField("date", DateType),
    StructField("time", StringType), // time-of-day; Spark has no TimeType
    StructField("kind", StringType),
    StructField("data", DoubleType)
  ))

  /** ppg table: same shape but the waveform stays an array
    * (/root/reference/raw_data_reformat.py:76-77,94,102). */
  val ppg: StructType = StructType(Seq(
    StructField("jname", StringType),
    StructField("date_time", TimestampType),
    StructField("kind", StringType),
    StructField("data", ArrayType(DoubleType))
  ))

  /** Accelerometer tall table (`0_*_ac.csv`,
    * /root/reference/raw_data_reformat.py:95,103): kind ∈ {acx,acy,acz},
    * data = 5-sample array (a Python-list string in the reference's CSV,
    * acc_reformat.py:66; a real array here). */
  val acTall: StructType = StructType(Seq(
    StructField("jname", StringType),
    StructField("date_time", TimestampType),
    StructField("kind", StringType),
    StructField("data", ArrayType(DoubleType))
  ))

  /** Reformatted wide accelerometer table
    * (/root/reference/acc_reformat.py:74-85,118; read back at
    * activity_categorize.py:56-59). */
  val accWide: StructType = StructType(Seq(
    StructField("date_time", TimestampType),
    StructField("acx", DoubleType),
    StructField("acy", DoubleType),
    StructField("acz", DoubleType),
    StructField("seconds", DoubleType),
    StructField("bin", IntegerType),
    StructField("g_force", DoubleType)
  ))

  /** Interval table (/root/reference/filtering_data.py:98-111;
    * activity_categorize.py:60-63,174). `category` null for bare intervals. */
  val interval: StructType = StructType(Seq(
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("category", StringType)
  ))

  /** Per-kind threshold table (2-row key/value CSV,
    * /root/reference/activity_categorize.py:336-338). */
  val thresholds: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", DoubleType)
  ))

  // ---- driver testdata tables (TESTDATA.md) -------------------------------

  val eventsTable: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  val documentsTable: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  val embeddingsTable: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  /** Multimodal asset table: opaque binary payload + typed metadata
    * (engine extension; no reference analogue). */
  val multimodalAsset: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("modality", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("codec", StringType)
    )))
  ))
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Payload normalization: the tagged-union `data` column → tall
  * (kind, data: double) rows (SURVEY.md §2.2, P12-P16, §1.2).
  *
  * The reference does this with four kind-sliced pandas transforms glued by
  * concat (/root/reference/raw_data_reformat.py:67-148). Here it is one
  * declarative per-kind parse + unpivot DAG over a single scan; Catalyst
  * collapses the projections and the scan is shared.
  */
object Normalize {

  /** Kinds whose payload is a scalar or 1-element list
    * (/root/reference/raw_data_reformat.py:106-112, P13). */
  val ScalarKinds = Seq("hr current", "hr", "st", "spo2")

  /** activity payload field names, positional
    * (/root/reference/raw_data_reformat.py:125-135). */
  val ActivityFields = Seq("step", "Calories", "sleep_light", "sleep_deep",
    "awake")

  private val arr = ArrayType(DoubleType)

  /** Parse the raw JSON-string payload into typed columns, then unpivot each
    * family to the tall (kind, data) shape. Unknown kinds pass through with
    * null data (the normalize step is total — SURVEY.md §7.4-4).
    *
    * Input: (jname, date_time, kind, data: STRING-json). Output: measurement
    * rows (jname, date_time, kind, data: DOUBLE).
    */
  def normalizeMeasurements(df: DataFrame): DataFrame = {
    val parsed = df
      .withColumn("arr", from_json(col("data"), arr))
      // defensive scalar extraction, P13: `x[0] if list else x`
      .withColumn("scalar",
        coalesce(element_at(col("arr"), 1),
          expr("try_cast(data AS DOUBLE)")))

    val ids = Seq("jname", "date_time")

    // hr / hr current / st / spo2 → scalar rows
    val scalars = parsed
      .filter(col("kind").isin(ScalarKinds: _*))
      .select((ids.map(col) :+ col("kind") :+
        col("scalar").as("data")): _*)

    // bp → bp_sys, bp_dia (P14)
    val bp = parsed.filter(col("kind") === "bp")
      .select(ids.map(col) :+
        col("arr").getItem(0).as("bp_sys") :+
        col("arr").getItem(1).as("bp_dia"): _*)
      .unpivot(ids.map(col).toArray, Array(col("bp_sys"), col("bp_dia")),
        "kind", "data")

    // activity → 5 named columns (P15)
    val activity = parsed.filter(col("kind") === "activity")
      .select(ids.map(col) ++
        ActivityFields.zipWithIndex.map { case (f, i) =>
          col("arr").getItem(i).as(f)
        }: _*)
      .unpivot(ids.map(col).toArray, ActivityFields.map(col).toArray,
        "kind", "data")

    // multi measure: nested [hr, spo2, [sys, dia], st] (P16). The nested
    // element defeats ARRAY<DOUBLE>; re-parse as ARRAY<STRING> and parse the
    // inner pair separately.
    val mmArr = from_json(col("data"), ArrayType(StringType))
    val mmInner = from_json(element_at(mmArr, 3), arr)
    val mm = parsed.filter(col("kind") === "multi measure")
      .select(ids.map(col) :+
        mmArr.getItem(0).cast(DoubleType).as("mm_hr") :+
        mmArr.getItem(1).cast(DoubleType).as("mm_spo2") :+
        mmInner.getItem(0).as("mm_bp_sys") :+
        mmInner.getItem(1).as("mm_bp_dia") :+
        mmArr.getItem(3).cast(DoubleType).as("mm_st"): _*)
      .unpivot(ids.map(col).toArray,
        Array("mm_hr", "mm_spo2", "mm_bp_sys", "mm_bp_dia", "mm_st")
          .map(col), "kind", "data")

    // any other kind passes through with its scalar payload (normalize is
    // total — SURVEY.md §7.4-4); waveform kinds are handled by [[waveforms]]
    val known = ScalarKinds ++ Seq("bp", "activity", "multi measure",
      "ppg", "acx", "acy", "acz")
    val others = parsed
      .filter(!col("kind").isin(known: _*))
      .select((ids.map(col) :+ col("kind") :+
        col("scalar").as("data")): _*)

    scalars.unionByName(bp).unionByName(activity).unionByName(mm)
      .unionByName(others)
  }

  /** ppg / acc split (P1 family, /root/reference/raw_data_reformat.py:76-80):
    * waveform kinds keep their array payload. */
  def waveforms(df: DataFrame, kinds: Seq[String]): DataFrame =
    df.filter(col("kind").isin(kinds: _*))
      .withColumn("data", from_json(col("data"), arr))

  /** P17: Python-list-literal string → array
    * (/root/reference/acc_reformat.py:66). `[0.1, 0.2]` is valid JSON. */
  def parseListString(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, from_json(col(column), arr))

  /** S3: the reference's `feature_rename` header map, verbatim
    * (/root/reference/raw_data_reformat.py:153-162) — applied by
    * [[graft.io.Xlsx.loadComputed]] before melting, exactly as
    * `load_excel` does. `Body temperature (F)` is deliberately absent:
    * unrenamed, it survives the melt and is dropped by kind (:175). */
  val FeatureRenames: Map[String, String] = Map(
    "Heart rate (bpm)" -> "hr",
    "Diastolic (mmHg)" -> "bp_dia",
    "Systolic (mmHg)" -> "bp_sys",
    "SaO2 (%)" -> "spo2",
    "Body temperature (C)" -> "st",
    "Pedometer" -> "step",
    "Total sleep" -> "sleep_total",
    "Deep sleep" -> "sleep_deep",
    "Light sleep" -> "sleep_light",
    "Event Markers" -> "Event_markers"
  )

  /** P21 + S3 tail: header rename map for the pre-converted CSV/parquet
    * workbook stand-in (long descriptive headers; see FIXTURES.md §5).
    * Native xlsx ingest uses [[FeatureRenames]] instead
    * (/root/reference/raw_data_reformat.py:153-167). */
  val ExcelRenames: Map[String, String] = Map(
    "Heart rate" -> "hr",
    "Blood oxygen" -> "spo2",
    "Systolic blood pressure" -> "bp_sys",
    "Diastolic blood pressure" -> "bp_dia",
    "Body temperature" -> "st",
    "Steps" -> "step",
    "Calories" -> "Calories",
    "Sleep duration" -> "sleep_total",
    "Event markers" -> "Event_markers",
    "Time" -> "Time"
  )

  /** S3: wide computed-workbook table → tall, parsing "XhYm" durations and
    * dropping empty values (/root/reference/raw_data_reformat.py:151-181).
    * Input is the CSV/parquet equivalent of the workbook (xlsx itself is out
    * of engine scope — SURVEY.md §7.4-6). */
  def meltComputed(df: DataFrame): DataFrame = {
    val renamed = ExcelRenames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val valueCols = renamed.columns.filterNot(_ == "Time")
      .filterNot(_ == "Body temperature (F)")
    val tall = renamed
      .select(col("Time").as("date_time") +:
        valueCols.map(c => col(c).cast(StringType).as(c)): _*)
      .unpivot(Array(col("date_time")), valueCols.map(col), "kind", "data")
      .filter(col("data").isNotNull && col("data") =!= "")
    tall.withColumn("data",
      when(col("kind") === "sleep_total",
        TimeOps.durationToMinutes(col("data")).cast(DoubleType))
        .otherwise(col("data").cast(DoubleType)))
  }
}

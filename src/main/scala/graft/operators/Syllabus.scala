package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** The syllabus pipeline (SURVEY §3.1 restated Spark-first):
  *
  * {{{
  * docs (doc_id, filename, pages, units_raw, assessments_raw)   — §7.2 contract
  *   → columnar scalar parse (T1-T11, all built-in expressions)
  *   → typed map: R1-R6 grammar + assembly + X2 error envelope
  *   → Dataset[ParseResult] → courses / rejects / calendar / serialized output
  * }}}
  *
  * The reference processes one PDF per thread with a 4-thread pool
  * (etl_pipeline.py:33-41); here each document is a row and Spark's task
  * parallelism replaces the pool — the plan has no shuffle until the
  * calendar aggregation, so the parse scales linearly with input splits.
  */
object Syllabus {

  /** T1 (etl_infrastructure.py:58-70). Group 1 = 5-digit period prefix
    * (the trailing '0' is dropped), 2 = 8-char course id, 3 = 4-digit NRC. */
  val FilenameRx = "^UG-(\\d{5})0_([A-Z0-9_\\-]{8})-(\\d{4})\\.pdf$"

  /** T3 (etl_infrastructure.py:96-133): case-insensitive labeled-field
    * regex, first match, trimmed, miss → ''. */
  def labelCol(section: Column, label: String): Column =
    trim(regexp_extract(section, "(?i)" + label + "\\s*[:\\-]\\s*(.+)", 1))

  /** T6: int cast with the reference's guard semantics — Python int()
    * accepts only integral strings (so "3.5" must fall back, where a plain
    * Spark cast would truncate). */
  def intWithDefault(c: Column, default: Int): Column =
    when(trim(c).rlike("^[+-]?\\d+$"), trim(c).cast("int")).otherwise(lit(default))

  /** T5: bullet-or-comma split (faculty variant), trimmed, empties dropped. */
  def bulletCommaSplit(c: Column): Column =
    filter(transform(split(c, "[\uF0B7•,]"), w => trim(w)), w => w =!= "")

  /** Columnar scalar-parse stage: everything the reference does with
    * per-string regexes (T1-T11), as one codegen'd projection. */
  def scalarParse(docs: DataFrame): DataFrame = {
    val fname = col("filename")
    val periodRaw = regexp_extract(fname, FilenameRx, 1)
    // T2: section slice between the fixed headings, to end-of-text if the
    // closing heading is missing (etl_infrastructure.py:75-93)
    val fullText = array_join(col("pages"), "\n")
    val general = regexp_extract(fullText,
      "(?s)I\\. INFORMACIÓN GENERAL(.*?)(?:II\\. MISIÓN Y VISIÓN|$)", 1)
    // T11 (etl_infrastructure.py:120-127): re-join the line-split areas
    // field, comma-split into the list
    val a1 = regexp_extract(general, "\\n:\\s*([^\\n]+)\\nÁrea o programa[ \\t]*([^\\n]*)\\n", 1)
    val a2 = regexp_extract(general, "\\n:\\s*([^\\n]+)\\nÁrea o programa[ \\t]*([^\\n]*)\\n", 2)
    val careers = when(a2 === "", a1).otherwise(concat(a1, lit(" "), a2))
    docs.select(
      col("doc_id"),
      fname.as("filename"),
      regexp_extract(fname, FilenameRx, 2).as("course_id"),
      regexp_extract(fname, FilenameRx, 3).as("nrc"),
      concat(substring(periodRaw, 1, 4), lit("-"), substring(periodRaw, 5, 1)).as("period"),
      labelCol(general, "Nombre del Curso").as("name"),
      bulletCommaSplit(labelCol(general, "Cuerpo académico")).as("faculty"),
      intWithDefault(labelCol(general, "Créditos"), 0).as("credits"),
      intWithDefault(labelCol(general, "Semanas"), 16).as("total_weeks"),
      filter(transform(split(careers, ","), x => trim(x)), x => x =!= "").as("areas"),
      col("units_raw"),
      col("assessments_raw"))
  }

  /** Public (not nested-private): Spark's generated (de)serializers need
    * reflective/codegen access to the case class members. */
  case class ScalarParsed(
      doc_id: String, filename: String, course_id: String, nrc: String,
      period: String, name: String, faculty: Seq[String], credits: Int,
      total_weeks: Int, areas: Seq[String],
      units_raw: Seq[Seq[String]], assessments_raw: Seq[Seq[String]])

  /** Full parse: scalar stage + typed R1-R6/R7 map with the X2 envelope —
    * one bad document never kills the run; failures surface as rows. */
  def parse(docs: DataFrame): Dataset[ParseResult] = {
    val scalars = scalarParse(docs).as(Encoders.product[ScalarParsed])
    scalars.map({ p =>
      try {
        if (p.course_id.isEmpty)
          throw new IllegalArgumentException(s"Invalid filename format: ${p.filename}")
        val units = SyllabusGrammar.parseUnits(Option(p.units_raw).getOrElse(Seq.empty))
        val assessments = SyllabusGrammar.parseAssessments(Option(p.assessments_raw).getOrElse(Seq.empty))
        val course = Course(CourseMetadata(p.course_id, p.nrc, p.period),
          p.name, p.faculty, p.credits, p.total_weeks, p.areas, units, assessments)
        ParseResult(p.doc_id, "ok", "", Some(course))
      } catch {
        case e: Exception =>
          ParseResult(p.doc_id, "error", Option(e.getMessage).getOrElse(e.toString), None)
      }
    }, Encoders.product[ParseResult])
  }

  /** Full parse from UNROUTED per-page extractions: S3 section routing
    * (SectionRouting.assembleDocs) assembles the RawDoc contract, then the
    * standard pipeline runs. This is the complete reference dataflow —
    * extract_tables' page walk included — over a per-page relation. */
  def parseFromPages(pages: DataFrame): Dataset[ParseResult] =
    parse(SectionRouting.assembleDocs(pages))

  /** P5: the successful slice as a typed Dataset[Course]. */
  def courses(results: Dataset[ParseResult]): Dataset[Course] =
    results.filter(col("status") === "ok")
      .map(_.course.get, Encoders.product[Course])

  /** The rejects relation (X2 surfaced as data, SURVEY §7.3). */
  def rejects(results: Dataset[ParseResult]): DataFrame =
    results.filter(col("status") === "error").select("doc_id", "error")

  /** A1-A4 (etl_pipeline.py:63-147): the weekly assessment calendar.
    * The reference's insertion order (course order × assessment order) is
    * pinned with explicit (course_id, assessment position) sort keys.
    * Line format mirrors `f"•{id}: {name} ({weight}%)"` — %s on a double
    * renders like Python str() for these values. */
  def weeklyCalendar(cs: Dataset[Course]): DataFrame =
    cs.select(col("metadata.courseId").as("course_id"),
        posexplode(col("assessments")).as(Seq("pos", "a")))
      .select(col("course_id"), col("pos"), col("a.week").as("week"),
        format_string("•%s: %s (%s%%)", col("course_id"), col("a.name"), col("a.weight")).as("line"))
      .groupBy("week")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("course_id"), col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("content"))
      .orderBy("week")

  /** Course legend lines (etl_pipeline.py:106-109). */
  def courseLegend(cs: Dataset[Course]): DataFrame =
    cs.select(format_string("•%s: %s", col("metadata.courseId"), col("name")).as("line"))
      .orderBy("line")
}

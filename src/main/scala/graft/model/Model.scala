package graft.model

/** Typed domain model (SURVEY §1.1), mirroring the reference's dataclasses
  * (/root/reference/etl_domain.py:7-39) as Spark-encodable case classes.
  * `weekRange: Tuple[int,int]` becomes explicit initialWeek/lastWeek fields
  * (Spark has no tuple column type; the reference's serializer flattens it
  * the same way, etl_infrastructure.py:213-214).
  */
final case class CourseMetadata(courseId: String, nrc: String, period: String)

final case class CourseUnit(
    number: Int,
    title: String,
    achievement: String,
    initialWeek: Int,
    lastWeek: Int,
    syllabus: Seq[String],
    activities: Seq[String])

final case class Assessment(
    name: String,
    code: String,
    weight: Double,
    week: Int,
    isRecoverable: Boolean)

final case class Course(
    metadata: CourseMetadata,
    name: String,
    faculty: Seq[String],
    credits: Int,
    totalWeeks: Int,
    areas: Seq[String],
    units: Seq[CourseUnit],
    assessments: Seq[Assessment])

/** Pre-extracted document source contract (FIXTURES.md §B, SURVEY §7.2):
  * what the PDF extraction adapter yields — per-page text plus the raw
  * section-routed tables (etl_infrastructure.py:9-16,18-55). */
final case class RawDoc(
    doc_id: String,
    filename: String,
    pages: Seq[String],
    units_raw: Seq[Seq[String]],
    assessments_raw: Seq[Seq[String]])

/** UNROUTED per-page extraction (FIXTURES.md §B2): one row per PDF page —
  * text plus that page's (at most one) raw table, NOT yet assigned to a
  * section. SectionRouting.assembleDocs turns a relation of these into
  * RawDoc rows (the S3 operator, etl_infrastructure.py:18-55). */
final case class RawPage(
    doc_id: String,
    filename: String,
    page_no: Int,
    text: String,
    page_table: Seq[Seq[String]])

/** Per-document parse outcome — the X2 error envelope
  * (etl_pipeline.py:17-30) surfaced as data instead of logs. */
final case class ParseResult(
    doc_id: String,
    status: String,
    error: String,
    course: Option[Course])

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S3 — section-routed table extraction (etl_infrastructure.py:18-55),
  * the stateful page walk that decides which section each per-page table
  * belongs to:
  *
  *  - a page whose first line is a section heading sets the cursor
  *    (etl_infrastructure.py:35-36);
  *  - otherwise the cursor carries over from the previous page — but the
  *    first page starts sectionless (:38-42, "Sílabo de Curso" cover);
  *  - any heading line mid-page switches the cursor (:44-46);
  *  - at most ONE table per page is captured (:49, `extract_table()`
  *    singular), and an empty table is ignored (the walrus `if (table :=
  *    ...)` is falsy for `[]`);
  *  - tables under "VI. UNIDADES DE APRENDIZAJE" go to the units table,
  *    under "VIII. EVALUACIÓN" to assessments, anything else is dropped
  *    (:50-53).
  *
  * Spark-first restatement: the cursor is a last-non-null propagation down
  * the page order — `last(pageHeading, ignoreNulls) OVER (PARTITION BY doc
  * ORDER BY page_no)`. Because the page-initial heading is set first and
  * every later heading line overrides it, the effective section at
  * table-capture time is simply the LAST heading line anywhere on the
  * page, else the carried-over value. The whole operator is one window +
  * one aggregation on the same key, so it costs a single hash exchange on
  * doc_id and scales with the number of documents.
  */
object SectionRouting {

  /** The 11 fixed section headings (etl_infrastructure.py:23-26). */
  val SectionNames: Seq[String] = Seq(
    "I. INFORMACIÓN GENERAL", "II. MISIÓN Y VISIÓN DE LA UPC",
    "III. INTRODUCCIÓN", "IV. LOGRO (S) DEL CURSO",
    "V. COMPETENCIAS (S) DEL CURSO", "VI. UNIDADES DE APRENDIZAJE",
    "VII. METODOLOGÍA", "VIII. EVALUACIÓN", "IX. BIBLIOGRAFÍA DEL CURSO",
    "X. RECURSOS TECNOLÓGICOS", "XI. Anexos")

  val UnitsSection: String = "VI. UNIDADES DE APRENDIZAJE"
  val AssessmentsSection: String = "VIII. EVALUACIÓN"

  /** The last section-heading line on a page (null if none): exact
    * whole-line equality against SectionNames, like the reference's
    * `line in SECTION_NAMES`. */
  def pageHeading(text: Column): Column = {
    val heads = filter(split(text, "\n"), l => l.isin(SectionNames: _*))
    when(size(heads) > 0, element_at(heads, -1))
  }

  /** Per-page relation (doc_id, filename, page_no, text, page_table) →
    * the per-document RawDoc contract (doc_id, filename, pages,
    * units_raw, assessments_raw): propagate the section cursor, route each
    * page's table, and concatenate routed rows in page order. This is the
    * operator a user holding raw per-page extractions runs in front of
    * Syllabus.parse — the fixtures no longer need pre-routed tables. */
  def assembleDocs(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("page_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withSec = pages.withColumn("section",
      last(pageHeading(col("text")), ignoreNulls = true).over(w))

    // Rows of every table routed to `section`, in page order. collect_list
    // drops the nulls from non-matching pages; the struct sort pins page
    // order under parallel aggregation.
    def routedTo(section: String): Column =
      flatten(transform(
        array_sort(collect_list(when(
          col("section") === section &&
            col("page_table").isNotNull && size(col("page_table")) > 0,
          struct(col("page_no").as("p"), col("page_table").as("t"))))),
        x => x.getField("t")))

    withSec.groupBy("doc_id")
      .agg(
        first(col("filename")).as("filename"),
        transform(
          array_sort(collect_list(struct(col("page_no").as("p"), col("text").as("x")))),
          x => x.getField("x")).as("pages"),
        routedTo(UnitsSection).as("units_raw"),
        routedTo(AssessmentsSection).as("assessments_raw"))
  }
}

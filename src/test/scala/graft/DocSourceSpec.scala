package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.CourseMetadata
import graft.operators.Syllabus
import graft.sources.DocSource

/** S2 end-to-end from REAL binary input: binaryFile scan → delimited
  * page decode → section routing → full parse. Round-2 VERDICT item 5 —
  * the binary source path must be exercisable without a PDF library; the
  * delimited codec stands in for pdfplumber behind the same seam
  * (etl_infrastructure.py:9-16). */
class DocSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val generalPage =
    """I. INFORMACIÓN GENERAL
      |Nombre del Curso: Cálculo I
      |Código del curso: 1AEL0244
      |Periodo: 2025-2
      |Cuerpo académico: •García Juan, López Ana
      |Créditos: 3
      |Semanas: 16
      |NRC: 8281
      |II. MISIÓN Y VISIÓN
      |texto de mision""".stripMargin

  private val unitsRaw = Seq(
    Seq("Unidad n. 1: Límites y continuidad", "", "", "", ""),
    Seq("COMPETENCIA (S): Razonamiento", "", "", "", ""),
    Seq("LOGRO DE LA UNIDAD: Al finalizar la unidad, calcula límites", "", "", "", ""),
    Seq("SEMANA CONTENIDO ACTIVIDADES", "", "", "", ""),
    Seq("Semana 1 - 4", "•Límites laterales •Continuidad", "•Taller 1", "", ""))

  private val assessRaw = Seq(
    Seq("TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE"),
    Seq("PC-01", "Razonamiento", "25%", "4", "U1", "No"),
    Seq("EX FINAL", "Todas", "40%", "16", "", "Sí"))

  private val doc: Seq[(String, Seq[Seq[String]])] = Seq(
    (generalPage, null),
    ("VI. UNIDADES DE APRENDIZAJE", unitsRaw),
    ("VIII. EVALUACIÓN", assessRaw))

  private def writeFixtures(): Path = {
    val dir = Files.createTempDirectory("graft-bin")
    val sub = Files.createDirectories(dir.resolve("term1/sub"))
    Files.write(sub.resolve("UG-202520_1AEL0244-8281.pdf"),
      DocSource.DelimitedPages.encodeDoc(doc))
    // glob-excluded file (wrong course-code prefix) must never be scanned
    Files.write(dir.resolve("UG-202520_2BEL0244-9999.pdf"),
      "not picked up".getBytes("UTF-8"))
    dir
  }

  test("decode inverts encodeDoc page by page") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = writeFixtures()
    val rows = DocSource.decodedScan(spark, dir.toString)
      .orderBy("page_no").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("doc_id")).distinct.toSeq ===
      Seq("UG-202520_1AEL0244-8281.pdf"))
    assert(rows(0).getAs[String]("text") === generalPage)
    assert(rows(0).getAs[Any]("page_table") === null)
    def tbl(r: org.apache.spark.sql.Row): Seq[Seq[String]] =
      r.getAs[scala.collection.Seq[scala.collection.Seq[String]]]("page_table")
        .map(_.toSeq).toSeq
    assert(rows(1).getAs[String]("text") === "VI. UNIDADES DE APRENDIZAJE")
    assert(tbl(rows(1)) === unitsRaw)
    assert(tbl(rows(2)) === assessRaw)
    // recursive scan honors the glob: the 2B file was never read
    assert(DocSource.binaryScan(spark, dir.toString)
      .filter(col("filename").startsWith(lit("UG-202520_2B"))).count() === 0)
  }

  test("binary fixture parses end-to-end through routing and grammar") {
    val dir = writeFixtures()
    val results = Syllabus.parseFromPages(
      DocSource.decodedScan(spark, dir.toString)).collect()
    assert(results.length === 1)
    assert(results(0).status === "ok")
    val c = results(0).course.get
    assert(c.metadata === CourseMetadata("1AEL0244", "8281", "2025-2"))
    assert(c.name === "Cálculo I")
    assert(c.units.map(_.title) === Seq("Límites y continuidad"))
    assert(c.assessments.map(_.weight) === Seq(25.0, 40.0))
  }
}

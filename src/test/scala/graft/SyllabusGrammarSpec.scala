package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Assessment
import graft.operators.SyllabusGrammar._

class SyllabusGrammarSpec extends AnyFunSuite {

  test("bullet split: both bullet chars, trim, drop empties (T4)") {
    assert(splitBullets(" one •two  • ") === Seq("one", "two"))
    assert(splitBullets("") === Seq.empty)
    assert(splitBullets("no bullets here") === Seq("no bullets here"))
  }

  test("bullet-comma split also breaks on commas (T5 divergence)") {
    assert(splitBulletsComma("•García Juan, López Ana") === Seq("García Juan", "López Ana"))
    assert(splitBullets("•García Juan, López Ana") === Seq("García Juan, López Ana"))
  }

  test("parseTitle extracts number and title (R2)") {
    assert(parseTitle("Unidad n. 3: Derivadas") === ((3, "Derivadas")))
    intercept[IllegalArgumentException](parseTitle("Unit 3: Derivadas"))
  }

  test("parseWeekRow backtracks multi-digit ranges and splits columns (R4)") {
    val (w1, w2, syl, act, ex, bib) = parseWeekRow(Seq(
      "Semana 10 - 12", "•a •b", "•c", "•d", "•e"))
    assert((w1, w2) === ((10, 12)))
    assert(syl === Seq("a", "b"))
    assert(act === Seq("c"))
    assert(ex === Seq("d"))
    assert(bib === Seq("e"))
  }

  test("parseWeekRow: missing trailing columns default to empty, newlines normalized") {
    val (w1, w2, syl, act, _, _) = parseWeekRow(Seq("Semana\n1 - 2".replace("\n", " "), "•x\n•y"))
    assert((w1, w2) === ((1, 2)))
    assert(syl === Seq("x", "y"))
    assert(act === Seq.empty)
  }

  test("parseWeekRow rejects non-week rows") {
    intercept[IllegalArgumentException](parseWeekRow(Seq("Semaine 1 - 2")))
  }

  test("cleanTableStructure merges continuation rows cell-by-cell (R1)") {
    val table = Seq(
      Seq("Unidad n. 1: T", "", ""),
      Seq("COMPETENCIA (S): razonamiento", "", ""),
      Seq("cuantitativo", "x", ""),
      Seq("LOGRO DE LA UNIDAD: logra", "", ""),
      Seq("SEMANA CONTENIDO", "", ""),
      Seq("Semana 1 - 2", "•a", ""),
      Seq("extra", "•b", ""))
    val cleaned = cleanTableStructure(table)
    assert(cleaned.length === 5)
    assert(cleaned(1)(0) === "COMPETENCIA (S): razonamiento cuantitativo")
    assert(cleaned(1)(1) === "x") // empty prev cell + non-empty curr
    assert(cleaned(4)(0) === "Semana 1 - 2 extra")
    assert(cleaned(4)(1) === "•a •b")
  }

  test("cleanTableStructure: empty current cell keeps previous cell untouched") {
    val table = Seq(
      Seq("Unidad n. 1: T", "keep"),
      Seq("COMPETENCIA (S): c", "prev"),
      Seq("more", ""),
      Seq("LOGRO DE LA UNIDAD: l", ""),
      Seq("SEMANA", ""),
      Seq("Semana 1 - 1", "•a"))
    val cleaned = cleanTableStructure(table)
    assert(cleaned(1) === Seq("COMPETENCIA (S): c more", "prev"))
  }

  test("cleanTableStructure: ragged wider row extends the merged row") {
    val table = Seq(
      Seq("Unidad n. 1: T"),
      Seq("COMPETENCIA (S): c"),
      Seq("LOGRO DE LA UNIDAD: l"),
      Seq("SEMANA"),
      Seq("Semana 1 - 1"),
      Seq("tail", "•extra-col"))
    val cleaned = cleanTableStructure(table)
    assert(cleaned(4) === Seq("Semana 1 - 1 tail", "•extra-col"))
  }

  test("cleanTableStructure grammar violations throw (whole-course reject)") {
    intercept[IllegalArgumentException](cleanTableStructure(Seq(Seq("Foo"))))
    intercept[IllegalArgumentException](cleanTableStructure(Seq(
      Seq("Unidad n. 1: T"), Seq("WRONG"))))
    // competencia continuation that never reaches LOGRO
    intercept[IllegalArgumentException](cleanTableStructure(Seq(
      Seq("Unidad n. 1: T"), Seq("COMPETENCIA (S): c"), Seq("dangling"))))
  }

  test("parseUnits: 5-row stride over repaired blocks, discards exams/bib (R5)") {
    val table = Seq(
      Seq("Unidad n. 1: Límites", "", "", "", ""),
      Seq("COMPETENCIA (S): razona", "", "", "", ""),
      Seq("LOGRO DE LA UNIDAD: Al finalizar calcula", "", "", "", ""),
      Seq("SEMANA CONTENIDO", "", "", "", ""),
      Seq("Semana 1 - 4", "•Límites •Continuidad", "•Taller", "•Examen", "•Stewart"),
      Seq("Unidad n. 2: Derivadas", "", "", "", ""),
      Seq("COMPETENCIA (S): aplica", "", "", "", ""),
      Seq("LOGRO DE LA UNIDAD: deriva", "", "", "", ""),
      Seq("SEMANA CONTENIDO", "", "", "", ""),
      Seq("Semana 5 - 8", "•Reglas", "•Lab", "", ""))
    val units = parseUnits(table)
    assert(units.length === 2)
    assert(units(0).number === 1)
    assert(units(0).title === "Límites")
    assert(units(0).achievement === "Al finalizar calcula")
    assert((units(0).initialWeek, units(0).lastWeek) === ((1, 4)))
    assert(units(0).syllabus === Seq("Límites", "Continuidad"))
    assert(units(0).activities === Seq("Taller"))
    assert(units(1).number === 2)
    assert((units(1).initialWeek, units(1).lastWeek) === ((5, 8)))
    assert(parseUnits(Seq.empty) === Seq.empty)
  }

  test("parseAssessments: header skip, arity guard, casts, flags (R6)") {
    val header = Seq("TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE")
    val got = parseAssessments(Seq(
      header,
      Seq("PC-01", "Razonamiento", "25%", "4", "U1", "No"),
      Seq("EX FINAL", "Todas", "40%", "16", "", "Sí"),
      Seq("EP-02", "X", "abc", "8", "", "sí"),
      Seq("BAD", "X", "10%", "n/a", "", ""),
      Seq("SHORT", "X", "5%")))
    assert(got === Seq(
      Assessment("PC", "01", 25.0, 4, isRecoverable = false),
      Assessment("EX FINAL", "", 40.0, 16, isRecoverable = true),
      Assessment("EP", "02", 0.0, 8, isRecoverable = true)))
  }

  test("parseAssessments: newline normalize + multi-%% strip + accented lowercase") {
    val got = parseAssessments(Seq(Seq("TA\n-0\n3", "C", "12.5%%", "2", "obs", "SÍ tal vez")))
    // name keeps its trailing space: the reference splits the raw cell on
    // the first '-' and only strips the code side
    assert(got === Seq(Assessment("TA ", "0 3", 12.5, 2, isRecoverable = true)))
  }
}

package graft.operators

import scala.collection.mutable.ArrayBuffer

import graft.model.{Assessment, CourseUnit}

/** The units-table repair state machine and row parsers (SURVEY §2.4
  * R1-R6) — the one part of the reference that is inherently ordered and
  * iterative (merge-with-previous, fail-per-course) and therefore lives as
  * a plain Scala function applied inside a typed `Dataset.map`, not as
  * relational algebra (SURVEY §4.2). Tables are tiny (tens of rows per
  * course), so per-course data parallelism is the right axis; no Catalyst
  * extension is warranted.
  *
  * Semantics ported from /root/reference/etl_pipeline.py:178-309 (observed
  * behavior, re-implemented): grammar violations throw and reject the whole
  * course (X2 envelope catches); assessment-row defects degrade per row.
  */
object SyllabusGrammar {

  /** Bullet split, pipeline variant (etl_pipeline.py:311-314): Wingdings
    * bullet U+F0B7 + bullet •, trim, drop empties. */
  def splitBullets(text: String): Seq[String] =
    text.split("[•]").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Parser variant (etl_infrastructure.py:143-146): also splits on comma —
    * the reference's deliberate divergence for faculty lists. */
  def splitBulletsComma(text: String): Seq[String] =
    text.split("[•,]").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** R1 (etl_pipeline.py:178-219): sequential grammar check
    * `Unidad n. → COMPETENCIA (S): → …merge… → LOGRO DE LA UNIDAD: →
    * …merge… → SEMANA → Semana → …merge…` per unit block. Rows that don't
    * open a grammar token are merged into the previous row cell-by-cell
    * (space-joined; empty current cell keeps the previous cell untouched;
    * extra cells of a wider current row are appended). Violations throw. */
  def cleanTableStructure(input: Seq[Seq[String]]): Seq[Seq[String]] = {
    val table = ArrayBuffer.from(input.map(_.toIndexedSeq))

    def joinWithPrevious(index: Int): Unit = {
      if (index <= 0 || index >= table.length) return
      val prev = table(index - 1)
      val curr = table(index)
      val zipped = prev.zip(curr).map { case (p, c) =>
        if (c.nonEmpty) (p.trim + " " + c.trim).trim else p
      }
      val merged = if (curr.length > prev.length) zipped ++ curr.drop(prev.length) else zipped
      table(index - 1) = merged
      table.remove(index)
    }

    var i = 0
    while (i < table.length) {
      if (!table(i)(0).startsWith("Unidad n."))
        throw new IllegalArgumentException(s"Invalid unit title format: ${table(i)(0)}")
      i += 1
      if (i < table.length && !table(i)(0).startsWith("COMPETENCIA (S):"))
        throw new IllegalArgumentException(s"Invalid competition format: ${table(i)(0)}")
      i += 1
      while (i < table.length && !table(i)(0).startsWith("LOGRO DE LA UNIDAD:")) {
        if (i == table.length - 1)
          throw new IllegalArgumentException(s"Invalid achievement format: ${table(i)(0)}")
        joinWithPrevious(i)
      }
      i += 1
      while (i < table.length && !table(i)(0).startsWith("SEMANA")) {
        if (i == table.length - 1)
          throw new IllegalArgumentException(s"Invalid header format: ${table(i)}")
        joinWithPrevious(i)
      }
      i += 1
      if (i < table.length && !table(i)(0).startsWith("Semana"))
        throw new IllegalArgumentException(s"Invalid week format: ${table(i)(0)}")
      i += 1
      while (i < table.length && !table(i)(0).startsWith("Unidad n."))
        joinWithPrevious(i)
    }
    table.map(_.toSeq).toSeq
  }

  private val TitleRx = "Unidad n\\. (\\d+): (.+)".r

  /** R2 (etl_pipeline.py:221-227): prefix match like Python `re.match` —
    * `.` stops at a newline, so a title cell with an embedded line break
    * (the usual PDF-table artifact) parses and keeps the first line, the
    * reference behavior; a full-string `unapplySeq` match would throw. */
  def parseTitle(line: String): (Int, String) =
    TitleRx.findPrefixMatchOf(line) match {
      case Some(m) => (m.group(1).toInt, m.group(2))
      case None => throw new IllegalArgumentException(s"Invalid unit title format: $line")
    }

  private val WeekRx = "Semana ([\\d,\\s-]+)\\s*-\\s*([\\d,\\s-]+)".r

  /** R4 (etl_pipeline.py:229-243): week-range parse (regex backtracks so
    * "Semana 10 - 12" yields (10, 12)); positional bullet-split columns. */
  def parseWeekRow(rawRow: Seq[String]): (Int, Int, Seq[String], Seq[String], Seq[String], Seq[String]) = {
    val row = rawRow.map(_.replace("\n", " "))
    val m = WeekRx.findPrefixMatchOf(row.head).getOrElse(
      throw new IllegalArgumentException(s"Invalid week format: ${row.head}"))
    val week1 = m.group(1).trim.toInt
    val week2 = m.group(2).trim.toInt
    def colAt(i: Int): Seq[String] = if (row.length > i) splitBullets(row(i)) else Seq.empty
    (week1, week2, colAt(1), colAt(2), colAt(3), colAt(4))
  }

  /** R1+R5 (etl_pipeline.py:245-264): repair, then 5-row stride — row i is
    * the title, i+2 the achievement, i+4 the week row. The parsed
    * exams/bibliography columns are discarded, matching the reference
    * (returned at :253 but never stored, hence the empty arrays in the
    * sink). Short trailing blocks throw (reference IndexError → X2). */
  def parseUnits(table: Seq[Seq[String]]): Seq[CourseUnit] = {
    if (table.isEmpty) return Seq.empty
    val cleaned = cleanTableStructure(table)
    (0 until cleaned.length by 5).map { i =>
      val (number, title) = parseTitle(cleaned(i)(0))
      val achievement = cleaned(i + 2)(0).replace("LOGRO DE LA UNIDAD:", "").trim
      val (w1, w2, syllabus, activities, _, _) = parseWeekRow(cleaned(i + 4))
      CourseUnit(number, title, achievement, w1, w2, syllabus, activities)
    }
  }

  private val AssessmentHeader =
    Seq("TIPO", "COMPETENCIA", "PESO", "SEMANA", "OBSERVACIÓN", "RECUPERABLE")

  /** R6 (etl_pipeline.py:266-309): per-row pipeline — header anti-filter
    * (P1, on the raw row), newline normalize + trim (T10), arity guard
    * (P2), name/code first-'-' split (T8), week int-or-drop (P3), weight
    * percent-or-0.0 (T7), recoverable substring flag (T9). */
  def parseAssessments(table: Seq[Seq[String]]): Seq[Assessment] =
    table.iterator.flatMap { raw =>
      if (raw == AssessmentHeader) None
      else {
        val row = raw.map(_.replace("\n", " ").trim)
        if (row.length < 4) None
        else {
          val (name, code) = row.head.indexOf('-') match {
            case -1 => (row.head, "")
            case ix => (row.head.substring(0, ix), row.head.substring(ix + 1).trim)
          }
          row(3).trim.toIntOption match {
            case None => None // warn-and-skip row (P3)
            case Some(week) =>
              val weight = row(2).reverse.dropWhile(_ == '%').reverse
                .toDoubleOption.getOrElse(0.0)
              val recoverable = row.length > 5 && row(5).toLowerCase.contains("sí")
              Some(Assessment(name, code, weight, week, recoverable))
          }
        }
      }
    }.toSeq
}

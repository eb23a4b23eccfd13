package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Syllabus

/** Property tests for the T1 filename grammar (SURVEY §5.2.3), using raw
  * ScalaCheck generators (scalatestplus bridge is not on the classpath). */
class FilenamePropertySpec extends AnyFunSuite {
  private val rx = Syllabus.FilenameRx.r

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val idChar = Gen.oneOf(('A' to 'Z') ++ ('0' to '9') ++ Seq('_', '-'))
  private val genParts = for {
    year <- Gen.choose(2000, 2099)
    term <- Gen.choose(0, 9)
    id <- Gen.stringOfN(8, idChar)
    nrc <- Gen.choose(0, 9999)
  } yield (year, term, id, f"$nrc%04d")

  test("parse . format = identity on valid filenames") {
    samples(genParts, 200).foreach { case (year, term, id, nrc) =>
      val fname = s"UG-$year${term}0_$id-$nrc.pdf"
      fname match {
        case rx(period, gid, gnrc) =>
          assert(period === s"$year$term")
          assert(gid === id)
          assert(gnrc === nrc)
        case _ => fail(s"regex rejected valid filename $fname")
      }
    }
  }

  test("malformed filenames never match") {
    val bad = Seq(
      "UG-2025_1AEL0244-8281.pdf",      // 4-digit period block
      "UG-202520_1AEL024-8281.pdf",     // 7-char id
      "UG-202520_1ael0244-8281.pdf",    // lowercase id
      "UG-202520_1AEL0244-828.pdf",     // 3-digit nrc
      "UG-202520_1AEL0244-8281.PDF",    // wrong extension case
      "XX-202520_1AEL0244-8281.pdf")
    bad.foreach(f => assert(rx.findFirstIn(f).isEmpty, f))
  }
}

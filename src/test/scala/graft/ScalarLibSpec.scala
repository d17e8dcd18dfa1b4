package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.ScalarLib

/** Property tests for the reference's scalar surface (SURVEY §5.2):
  * U1 datediff, U2 check_date, U3 field_counter, U4 get_nth_field,
  * U5/U6 atoi — pure-Scala twins, which the Column versions mirror
  * (Column↔oracle equivalence is covered by the differential gate).
  */
class ScalarLibSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // U5: digits-prefix law — atoi equals the leading digit run, else 0.
  test("atoi: leading digit run, non-digit tail ignored (body:826-841)") {
    assert(ScalarLib.atoi("12abc") == 12L)
    assert(ScalarLib.atoi("-5") == 0L)   // sign is a non-digit: reference yields 0
    assert(ScalarLib.atoi("") == 0L)
    assert(ScalarLib.atoi(null: String) == 0L)
    assert(ScalarLib.atoi("  42  ") == 42L)
    assert(ScalarLib.atoi("007x8") == 7L)
  }

  test("atoi property: equals parse of leading digit run") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val t = s.trim
      val run = t.takeWhile(_.isDigit).take(18)
      val expected = if (run.isEmpty) 0L else run.toLong
      ScalarLib.atoi(s) == expected
    })
  }

  // U3/U4 round trip: counting and extraction agree with the join.
  test("fieldCount/nthField round trip (body:729-814)") {
    val fields = Gen.nonEmptyListOf(Gen.alphaStr)
    check(Prop.forAll(fields) { xs =>
      val joined = xs.mkString(",")
      val countOk = ScalarLib.fieldCount(joined, ',', unterminated = true) == xs.length
      val extractOk = xs.zipWithIndex.forall { case (x, i) =>
        ScalarLib.nthField(joined, ',', i + 1) == x
      }
      val rangeOk = ScalarLib.nthField(joined, ',', xs.length + 1) == ""
      countOk && extractOk && rangeOk
    })
  }

  test("fieldCount counts delimiter chars + unterminated modifier (body:741-751)") {
    assert(ScalarLib.fieldCount("a,b,c", ',', unterminated = true) == 3)
    assert(ScalarLib.fieldCount("a,b,c,", ',', unterminated = false) == 3)
    assert(ScalarLib.fieldCount("", ',', unterminated = true) == 1) // reference: empty = 1 unterminated field
  }

  // U1: H:M:S formatting, not zero-padded; negative → INVALID DATE.
  test("datediffHms formatting (body:17-36)") {
    assert(ScalarLib.datediffHms(0L, 3661L) == "1:1:1")
    assert(ScalarLib.datediffHms(0L, 0L) == "0:0:0")
    assert(ScalarLib.datediffHms(100L, 0L) == "INVALID DATE")
    assert(ScalarLib.datediffHms(0L, 45296L) == "12:34:56")
  }

  // U2: validation cascade codes.
  test("checkDate cascade (body:96-118)") {
    assert(ScalarLib.checkDate(null)._1 == -1)
    assert(ScalarLib.checkDate("short")._1 == -1)
    assert(ScalarLib.checkDate("WAY-TOO-LONG-DATE")._1 == 1)
    assert(ScalarLib.checkDate("XX-XXX-9999")._1 == 2)
    val (code, d) = ScalarLib.checkDate("03-Jan-2020")
    assert(code == 0 && d == java.time.LocalDate.of(2020, 1, 3))
    // Oracle TO_DATE is case-insensitive — and Oracle itself CANONICALIZES
    // to uppercase DD-MON-YYYY, so rejecting "03-JAN-2020" would reject
    // the reference's own output
    assert(ScalarLib.checkDate("03-JAN-2020") == ((0, java.time.LocalDate.of(2020, 1, 3))))
    assert(ScalarLib.checkDate("03-jan-2020") == ((0, java.time.LocalDate.of(2020, 1, 3))))
  }

  test("atoi trims spaces only, like LTRIM/RTRIM (body:826-829)") {
    assert(ScalarLib.atoi("\t42") == 0L, "tab is a non-digit, not trimmable whitespace")
    assert(ScalarLib.atoi(" 42\t") == 42L)
  }

  test("checkDate property: round-trips every real date (body:102-116)") {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("dd-MMM-yyyy", java.util.Locale.US)
    check(Prop.forAll(Gen.choose(0L, 60000L)) { n =>
      val d = java.time.LocalDate.of(1970, 1, 1).plusDays(n)
      ScalarLib.checkDate(d.format(fmt)) == ((0, d))
    })
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** The reference package's scalar-function surface (its "UDF library"),
  * re-expressed as codegen-friendly Column expressions plus pure-Scala twins
  * for driver-side use.
  *
  * Reference: `/root/reference/db/src/main/etl_batch/pkg_batch_util_body.sql`
  * (cited below as `body:`) and `pkg_batch_util_spec.sql` (`spec:`).
  *
  * None of these needs a UDF or a custom Catalyst Expression: every one
  * composes `org.apache.spark.sql.functions` builtins, so they stay inside
  * whole-stage codegen and never break predicate pushdown around them.
  * All expressions are ANSI-mode safe (no throwing casts / element_at).
  */
object ScalarLib {

  // --- U1: func_datediff (spec:28-29, body:17-36) -------------------------
  /** Elapsed H:M:S between two timestamps, *not* zero padded (the reference
    * builds `TRUNC(secs/3600)||':'||...` — `1:2:3`, not `01:02:03`); a
    * negative span yields the literal 'INVALID DATE' (body:28-34).
    * Second precision: Oracle DATE has no sub-second part, so we floor.
    */
  def datediffHms(start: Column, end: Column): Column = {
    val secs = floor((unix_micros(end) - unix_micros(start)) / lit(1000000.0)).cast(LongType)
    hmsFromSeconds(secs)
  }

  /** H:M:S formatting of a (possibly negative) whole-second span. */
  def hmsFromSeconds(secs: Column): Column = {
    val h = floor(secs / lit(3600.0)).cast(LongType)
    val m = floor(pmod(secs, lit(3600L)) / lit(60.0)).cast(LongType)
    val s = pmod(secs, lit(60L))
    when(secs < 0, lit("INVALID DATE"))
      .otherwise(concat(h.cast(StringType), lit(":"), m.cast(StringType), lit(":"), s.cast(StringType)))
  }

  /** Pure-Scala twin of U1, for driver-side timers (body:60-86). */
  def datediffHms(startEpochSec: Long, endEpochSec: Long): String = {
    val secs = endEpochSec - startEpochSec
    if (secs < 0) "INVALID DATE"
    else s"${secs / 3600}:${(secs % 3600) / 60}:${secs % 60}"
  }

  // --- U2: func_check_date (spec:67-70, body:90-123) ----------------------
  /** Oracle format `DD-MON-YYYY` (body:102) == JVM `dd-MMM-yyyy` (Locale.US
    * month abbreviations — Spark formats with Locale.US).
    */
  val OracleDateFmt = "dd-MMM-yyyy"

  /** Validation code per the reference's cascade (body:96-118):
    * NULL or length<10 → -1; length>11 → 1; unparseable → 2; OK → 0.
    */
  def checkDateCode(s: Column): Column =
    when(s.isNull || length(s) < 10, lit(-1))
      .when(length(s) > 11, lit(1))
      .when(try_to_timestamp(s, lit(OracleDateFmt)).isNull, lit(2))
      .otherwise(lit(0))

  /** Normalized timestamp for valid inputs, NULL otherwise (body:112-116).
    * Single parse per row: a failed parse is already NULL, so the only guard
    * needed is the length cascade (re-running checkDateCode here would
    * evaluate try_to_timestamp a second time in the same projection).
    */
  def checkDateNormalized(s: Column): Column =
    when(s.isNotNull && length(s).between(10, 11), try_to_timestamp(s, lit(OracleDateFmt)))

  // --- U3: func_field_counter (spec:72-77, body:729-762) ------------------
  /** Field count of a delimited string: the reference counts *delimiter
    * characters* (assumes a 1-char delimiter) and adds 1 when the string is
    * unterminated (no trailing delimiter) — body:741-751.
    */
  def fieldCount(s: Column, delim: String, unterminated: Boolean = true): Column = {
    require(delim.length == 1, "reference semantics assume a 1-char delimiter (body:741)")
    val delims = length(s) - length(regexp_replace(s, java.util.regex.Pattern.quote(delim), ""))
    delims + (if (unterminated) lit(1) else lit(0))
  }

  // --- U4: func_get_nth_field (spec:79-85, body:768-814) ------------------
  /** Nth delimited field (1-based). The reference appends the delimiter
    * first when unterminated (body:781-783), making `split` semantics match
    * exactly for the unterminated case; out-of-range → NULL-ish empty.
    * try_element_at keeps this ANSI-safe for out-of-range n.
    */
  def nthField(s: Column, delim: String, n: Int): Column =
    try_element_at(split(s, java.util.regex.Pattern.quote(delim)), lit(n))

  // --- U5/U6: func_string_to_number / func_atol (spec:87-91, body:817-857) -
  /** Digit-run atoi, NOT a cast (body:826-841): ltrim/rtrim, then accumulate
    * the leading run of digits, stop at the first non-digit; anything else
    * (empty, sign, no leading digit) → 0. `'12abc'`→12, `'-5'`→0, `''`→0.
    * Capped at 18 digits so the ANSI cast can never overflow.
    */
  def atoi(s: Column): Column = {
    val digits = regexp_extract(trim(s), "^([0-9]{1,18})", 1)
    when(digits === "", lit(0L)).otherwise(digits.cast(LongType))
  }

  /** Pure-Scala twin of U5/U6 (exact reference loop semantics, body:826-841).
    * Trims SPACES only, like the reference's LTRIM/RTRIM and the Column
    * twin's `trim` — String.trim would also strip tabs/controls and
    * diverge on "\t42" (reference returns 0, not 42). */
  def atoi(s: String): Long = {
    if (s == null) return 0L
    val t = {
      var a = 0; var b = s.length
      while (a < b && s.charAt(a) == ' ') a += 1
      while (b > a && s.charAt(b - 1) == ' ') b -= 1
      s.substring(a, b)
    }
    var i = 0
    var acc = 0L
    // ASCII digits only ('0'..'9'), matching the Column twin's [0-9] and the
    // reference's ASCII BETWEEN 48 AND 57 (body:830) — Character.isDigit
    // would also accept Unicode digits and diverge.
    while (i < t.length && t.charAt(i) >= '0' && t.charAt(i) <= '9' && i < 18) {
      acc = acc * 10 + (t.charAt(i) - '0')
      i += 1
    }
    acc
  }

  /** Pure-Scala twin of U3 (body:741-751). */
  def fieldCount(s: String, delim: Char, unterminated: Boolean): Int =
    s.count(_ == delim) + (if (unterminated) 1 else 0)

  /** Pure-Scala twin of U4 (body:781-809). 1-based; out of range → "".
    * `unterminated = true` appends the delimiter first (body:781-783);
    * the reference's DEFAULT is false — the last field before no trailing
    * delimiter is then out of range, exactly the SUBSTR-negative-length
    * NULL the reference produces. */
  def nthField(s: String, delim: Char, n: Int, unterminated: Boolean = true): String = {
    val base = if (unterminated) s + delim else s
    val fields = base.split(java.util.regex.Pattern.quote(delim.toString), -1)
    if (n >= 1 && n <= fields.length - 1) fields(n - 1) else ""
  }

  /** Case-insensitive DD-MON-YYYY parser: Oracle's TO_DATE accepts
    * 12-AUG-2026 / 12-aug-2026 / 12-Aug-2026 alike (and the reference
    * itself canonicalizes to uppercase via TO_CHAR), so the pure twin
    * must too — plain ofPattern("dd-MMM-yyyy") rejects anything but
    * title-case month names. */
  private val OracleDateParser: java.time.format.DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(OracleDateFmt)
      .toFormatter(java.util.Locale.US)

  /** Pure-Scala twin of U2 (body:96-118). Returns (code, normalizedOrNull). */
  def checkDate(s: String): (Int, java.time.LocalDate) = {
    if (s == null || s.length < 10) return (-1, null)
    if (s.length > 11) return (1, null)
    try { (0, java.time.LocalDate.parse(s, OracleDateParser)) }
    catch { case _: java.time.format.DateTimeParseException => (2, null) }
  }

  /** SQL-callable surface (SURVEY §7.5): `spark.sql("... func_atoi(c) ...")`
    * parity with the reference's package functions. These register the
    * pure-Scala twins as UDFs — convenience for ad-hoc SQL; the Column
    * versions above stay the codegen-friendly path for engine queries.
    * NULL (or empty-delimiter) inputs yield NULL, mirroring Oracle's
    * NULL-in/NULL-out scalar semantics, never an exception.
    */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("func_string_to_number", (s: String) => atoi(s))
    spark.udf.register("func_atol", (s: String) => atoi(s))
    spark.udf.register("func_datediff",
      (startSec: Long, endSec: Long) => datediffHms(startSec, endSec))
    spark.udf.register("func_check_date", (s: String) => checkDate(s)._1)
    // Reference parity: par_unterminated DEFAULTS TO FALSE in the package
    // spec, so the SQL surface uses that default — 'a,b,c' counts 2 fields
    // and has no 3rd field, exactly what ported reference SQL expects.
    // Engine queries wanting the unterminated mode use the Column API's
    // explicit parameter.
    spark.udf.register("func_field_counter", (s: String, delim: String) =>
      if (s == null || delim == null || delim.isEmpty) null
      else Int.box(fieldCount(s, delim.head, unterminated = false)))
    spark.udf.register("func_get_nth_field", (s: String, delim: String, n: Int) =>
      if (s == null || delim == null || delim.isEmpty) null
      else {
        // Oracle has no empty string — '' IS NULL — so both the empty
        // field and the out-of-range SUBSTR result surface as NULL here
        val r = nthField(s, delim.head, n, unterminated = false)
        if (r.isEmpty) null else r
      })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints the oracle SQL for the DuckDB typing hazard that broke q152 in
  * round 10: a UNION column where one branch projects a bare `SUM(...)`
  * gets typed HUGEINT by DuckDB, which pandas materializes as float64 and
  * the driver stringifies as '1481.0' — never hash-equal to Spark's
  * BIGINT '1481'. Every SUM projected as a value inside a UNION body must
  * therefore be wrapped in CAST(... AS BIGINT/DOUBLE). A SUM that feeds a
  * comparison (`SUM(...) = 0`) yields BOOLEAN and is exempt.
  */
class OracleLintSpec extends AnyFunSuite {

  /** Offsets of every `SUM(` token (case-insensitive, word boundary). */
  private def sumSites(sql: String): Seq[Int] = {
    val u = sql.toUpperCase
    val out = Seq.newBuilder[Int]
    var i = u.indexOf("SUM(")
    while (i >= 0) {
      val boundary = i == 0 || !Character.isLetterOrDigit(u(i - 1)) &&
        u(i - 1) != '_'
      if (boundary) out += i
      i = u.indexOf("SUM(", i + 1)
    }
    out.result()
  }

  /** True when the non-whitespace text before `idx` ends with `CAST(`. */
  private def isCastWrapped(sql: String, idx: Int): Boolean = {
    var j = idx - 1
    while (j >= 0 && Character.isWhitespace(sql(j))) j -= 1
    j >= 4 && sql.substring(j - 4, j + 1).equalsIgnoreCase("CAST(")
  }

  /** Index just past the balanced `)` closing the call starting at idx. */
  private def closeOf(sql: String, idx: Int): Int = {
    var j = sql.indexOf('(', idx)
    var depth = 0
    while (j < sql.length) {
      sql(j) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return j + 1
        case _ =>
      }
      j += 1
    }
    sql.length
  }

  /** True when the SUM feeds a comparison (boolean result, no HUGEINT
    * column), e.g. `SUM(...) = 0` or `SUM(...) <= SUM(...)`. */
  private def feedsComparison(sql: String, idx: Int): Boolean = {
    var j = closeOf(sql, idx)
    while (j < sql.length && Character.isWhitespace(sql(j))) j += 1
    j < sql.length && "=<>!".contains(sql(j))
  }

  /** True when the site sits inside an earlier SUM's parens (nested text
    * like SUM(CASE WHEN ... SUM never happens, but arithmetic such as
    * CAST(SUM(a) - SUM(b) AS BIGINT) puts the second SUM outside its own
    * CAST while still being cast at the column level). */
  private def insideCast(sql: String, idx: Int): Boolean = {
    val u = sql.toUpperCase
    var c = u.lastIndexOf("CAST(", idx)
    while (c >= 0) {
      if (closeOf(sql, c) > idx) return true
      c = u.lastIndexOf("CAST(", c - 1)
    }
    false
  }

  /** Hash-green despite bare SUMs: their flagged columns are NULLABLE on
    * the Spark side (outer joins / union branches with nulls), so the
    * driver's pyarrow to_pandas promotes Spark's int64 to float64 too and
    * both sides stringify identically ('1.0' == '1.0'). The hazard only
    * bites non-nullable columns (q152's case). Verified empirically via
    * tools/compare_strict.py; kept allowlisted rather than re-proving
    * nullability lexically. */
  private val nullablePromotedOk =
    Set("q60_fact_staff_daily", "q132_span_removal", "q171_residual_pq")

  test("no bare SUM projection inside a UNION oracle body") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      if !nullablePromotedOk(name)
      if sql.toUpperCase.contains("UNION")
      idx <- sumSites(sql)
      if !isCastWrapped(sql, idx) && !insideCast(sql, idx) &&
        !feedsComparison(sql, idx)
    } yield s"$name: bare SUM at offset $idx: ...${
      sql.slice(idx, math.min(sql.length, idx + 60)).replaceAll("\\s+", " ")}..."
    assert(offenders.isEmpty,
      "DuckDB types bare SUM(int) as HUGEINT; in a UNION this coerces the " +
        "whole column and the driver stringifies values as floats. Wrap " +
        "in CAST(... AS BIGINT):\n" + offenders.mkString("\n"))
  }
}

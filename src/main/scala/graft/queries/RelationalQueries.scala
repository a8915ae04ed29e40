package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** SURVEY §2.3 relational operator inventory (Q1–Q24), one declared query
  * per operator family, each with a DuckDB oracle.
  *
  * Design stance: everything is the declarative DataFrame API so Catalyst
  * supplies pushdown/pruning/join-selection (SURVEY §4.2). Scale notes are
  * on each query: which side broadcasts, where the shuffles are, and why
  * the plan survives 100×.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact money arithmetic: cast a 2-decimal double to DECIMAL so sums are
    * associative/order-independent (float partial aggregation is not).
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec6(c: Column): Column = c.cast(DecimalType(24, 6))

  val defs: Seq[QueryDef] = Seq(

    // ── Q1 projection / column pruning ───────────────────────────────
    QueryDef(
      "q01_projection",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey")),
      Some("SELECT p_partkey, p_name FROM part ORDER BY p_partkey"),
      doc = "2-col projection; ReadSchema must show only 2 columns."),

    // ── Q2 filter: comparison, BETWEEN, IN, boolean connectives ──────
    QueryDef(
      "q02_filter",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") <  lit("1997-01-01").cast(TimestampType) &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24 &&
            col("l_returnflag").isin("A", "R") &&
            col("l_linestatus").isNotNull)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
          AND l_returnflag IN ('A','R') AND l_linestatus IS NOT NULL
        ORDER BY l_orderkey, l_linenumber"""),
      doc = "All predicates parquet-pushable; PushedFilters must be non-empty."),

    // ── Q3 equi inner join (shuffle join on the two big tables) ──────
    QueryDef(
      "q03_join_inner",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        // customer is small relative to orders at every SF → broadcast;
        // at 100 TB customer:orders stays ~1:10, broadcast of the dim
        // still wins if it fits, else AQE falls back to SMJ.
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey""")),

    // ── Q4 broadcast join chain over the dimension tables ────────────
    QueryDef(
      "q04_join_broadcast",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        // dims are tiny at any SF (nation=25, region=5 always) →
        // explicit broadcast keeps the single shuffle on lineitem only.
        li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
          .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
          .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
          .groupBy(col("n_name"), col("r_name"))
          .agg(
            sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT n_name, r_name,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
          count(*) AS n_items
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name, r_name
        ORDER BY r_name, n_name""")),

    // ── Q5 left outer join (+ aggregation preserving unmatched) ──────
    QueryDef(
      "q05_join_left",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey""")),

    // ── Q6 full outer join ───────────────────────────────────────────
    QueryDef(
      "q06_join_full",
      (s, dir) => {
        val cs = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_customers"))
        val ss = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_suppliers"))
        cs.join(ss, Seq("nk"), "full")
          .select(col("nk").as("nationkey"), col("n_customers"), col("n_suppliers"))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT COALESCE(c.nk, s.nk) AS nationkey, n_customers, n_suppliers
        FROM (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer GROUP BY 1) c
        FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
          ON c.nk = s.nk
        ORDER BY nationkey""")),

    // ── Q7 semi join (EXISTS) ────────────────────────────────────────
    QueryDef(
      "q07_join_semi",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        ORDER BY c_custkey""")),

    // ── Q8 anti join (NOT EXISTS) ────────────────────────────────────
    QueryDef(
      "q08_join_anti",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")),

    // ── Q9 theta / range join (non-equi) ─────────────────────────────
    QueryDef(
      "q09_join_range",
      (s, dir) => {
        val sup = t(s, dir, "supplier")
        val p = t(s, dir, "part")
        // Non-equi join: supplier side is small → broadcast NLJ, which is
        // the right physical shape (each part row scans a tiny in-memory
        // supplier list). At 100 TB the small side must stay broadcastable
        // or be bucketed into ranges first.
        p.join(broadcast(sup),
            p("p_retailprice") >= sup("s_acctbal") / 10 &&
            p("p_retailprice") <  sup("s_acctbal") / 10 + lit(20.0))
          .groupBy(col("s_suppkey"))
          .agg(count(lit(1)).as("n_parts"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, count(*) AS n_parts
        FROM part JOIN supplier
          ON p_retailprice >= s_acctbal / 10 AND p_retailprice < s_acctbal / 10 + 20.0
        GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // ── Q10 hash aggregation (TPC-H Q1 shape — the flagship) ─────────
    QueryDef(
      "q10_agg_basic",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sumQty = sum(dec2(col("l_quantity")))
        val sumBase = sum(dec2(col("l_extendedprice")))
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumQty.cast(DoubleType).as("sum_qty"),
            sumBase.cast(DoubleType).as("sum_base_price"),
            sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .cast(DoubleType).as("sum_disc_price"),
            sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))))
              .cast(DoubleType).as("sum_charge"),
            (sumQty.cast(DoubleType) / count(lit(1))).as("avg_qty"),
            (sumBase.cast(DoubleType) / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      doc = "Map-side partial agg + single shuffle on the 2 group keys."),

    // ── Q11 count(distinct) ──────────────────────────────────────────
    QueryDef(
      "q11_agg_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(col("l_partkey")).as("n_part"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
          count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── Q12 rollup ───────────────────────────────────────────────────
    QueryDef(
      "q12_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("sum_qty"))
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    // ── Q13 cube ─────────────────────────────────────────────────────
    QueryDef(
      "q13_cube",
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            sum(dec2(col("o_totalprice"))).cast(DoubleType).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("sum_price"))
          .orderBy(col("status"), col("priority")),
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
          COALESCE(o_orderpriority, 'ALL') AS priority,
          count(*) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ── Q14 grouping sets (SQL surface) ──────────────────────────────
    QueryDef(
      "q14_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
            COALESCE(l_linestatus, 'ALL') AS linestatus, count(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY returnflag, linestatus""")
      },
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus""")),

    // ── Q15 approx distinct (HLL++) — impl-specific, rows-only check ─
    QueryDef(
      "q15_approx_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
          .orderBy(col("l_returnflag")),
      None,
      doc = "HLL++ sketch differs from DuckDB's; driver does rows-only check."),

    // ── Q16 window ranking ───────────────────────────────────────────
    QueryDef(
      "q16_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            ntile(4).over(w).as("quartile"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER w AS rn, rank() OVER w AS rnk,
          dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        ORDER BY o_custkey, rn""")),

    // ── Q17 window analytics: lag/lead/first/last + running sum ──────
    QueryDef(
      "q17_window_analytic",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            first(col("o_totalprice")).over(wRun).as("first_price"),
            sum(dec2(col("o_totalprice"))).over(wRun).cast(DoubleType).as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
          lag(o_totalprice, 1) OVER w AS prev_price,
          lead(o_totalprice, 1) OVER w AS next_price,
          first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // ── Q18 multi-key sort with nulls ordering ───────────────────────
    QueryDef(
      "q18_sort_nulls",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_or_null"),
            col("o_totalprice"))
          .orderBy(
            col("prio_or_null").asc_nulls_first,
            col("o_totalprice").desc,
            col("o_orderkey").asc)
          .limit(500),
      Some("""SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null, o_totalprice
        FROM orders
        ORDER BY prio_or_null ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
        LIMIT 500""")),

    // ── Q19 top-k per group ──────────────────────────────────────────
    QueryDef(
      "q19_topk_per_group",
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderstatus"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderstatus"), col("rn"))
      },
      Some("""SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_orderstatus, rn""")),

    // ── Q14b top-k per group via typed Aggregator (the scale path) ───
    QueryDef(
      "q19_topk_agg",
      (s, dir) => {
        // Same answer as q19_topk_per_group, different physical shape:
        // the window form shuffles+sorts every row of each group; the
        // Aggregator keeps a k-row buffer per group and merges map-side,
        // shipping at most k rows per group per partition — the shape
        // that survives a billion-row hot group (SURVEY §2.5).
        val topk = udaf(graft.operators.TopKAgg(3))
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
          .select(col("o_orderstatus"), posexplode(col("tk")).as(Seq("pos", "x")))
          .select(col("o_orderstatus"), (col("pos") + 1).cast("int").as("rn"),
            col("x.tag").as("o_orderkey"), col("x.value").as("o_totalprice"))
          .orderBy(col("o_orderstatus"), col("rn"))
      },
      Some("""SELECT o_orderstatus, rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_orderstatus, rn"""),
      doc = "Typed Aggregator top-k: map-side partial heaps, k rows per group per partition over the wire."),

    // ── Q20 global top-k (sort + limit) ──────────────────────────────
    QueryDef(
      "q20_limit",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
          .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 10"""),
      doc = "TakeOrderedAndProject: per-partition top-k, no full sort/shuffle."),

    // ── Q21 set operations ───────────────────────────────────────────
    QueryDef(
      "q21_setops",
      (s, dir) => {
        val ck = t(s, dir, "customer").select(col("c_custkey").as("k"))
        val ok = t(s, dir, "orders").select(col("o_custkey").as("k"))
        val only = ck.except(ok).select(lit("customer_only").as("op"), col("k"))
        val both = ck.intersect(ok).select(lit("both").as("op"), col("k"))
        only.unionByName(both).orderBy(col("op"), col("k"))
      },
      Some("""SELECT 'customer_only' AS op, k FROM
          (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders)
        UNION ALL
        SELECT 'both' AS op, k FROM
          (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders)
        ORDER BY op, k""")),

    // ── Q22 deterministic dedup-by-key (keep first by order) ─────────
    QueryDef(
      "q22_dedup_keyfirst",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
          FROM orders) WHERE rn = 1
        ORDER BY o_custkey"""),
      doc = "Deterministic variant of dropDuplicates(keys) (SURVEY Q16)."),

    // ── Q23 string functions ─────────────────────────────────────────
    QueryDef(
      "q23_string_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_name").like("%e%"))
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            lower(col("p_type")).as("type_lower"),
            length(col("p_name")).as("name_len"),
            substring(col("p_name"), 1, 4).as("name_pre"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            trim(col("p_name")).as("name_trim"),
            size(split(col("p_name"), " ")).as("n_words"),
            regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"))
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper, lower(p_type) AS type_lower,
          length(p_name) AS name_len, substring(p_name, 1, 4) AS name_pre,
          p_brand || '/' || p_type AS brand_type, trim(p_name) AS name_trim,
          len(string_split(p_name, ' ')) AS n_words,
          regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
          regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels
        FROM part WHERE p_name LIKE '%e%'
        ORDER BY p_partkey""")),

    // ── Q24 date/time functions ──────────────────────────────────────
    QueryDef(
      "q24_datetime_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_add(to_date(col("o_orderdate")), 30).as("due_date"),
            datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
              .as("days_since_epoch_start"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            unix_timestamp(col("o_orderdate")).as("epoch_sec"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
          year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
          CAST(o_orderdate AS DATE) + 30 AS due_date,
          datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
          CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
          CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
        FROM orders ORDER BY o_orderkey""")),

    // ── Q25 math functions ───────────────────────────────────────────
    QueryDef(
      "q25_math_funcs",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_discount") - 0.05).as("disc_dev"),
            ceil(col("l_extendedprice")).as("price_ceil"),
            floor(col("l_extendedprice")).as("price_floor"),
            pow(col("l_quantity"), 2).as("qty_sq"),
            round(log(col("l_quantity")), 6).as("ln_qty"),
            (col("l_orderkey") % 7).as("mod7"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
          abs(l_discount - 0.05) AS disc_dev,
          CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
          CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
          pow(l_quantity, 2) AS qty_sq,
          round(ln(l_quantity), 6) AS ln_qty,
          l_orderkey % 7 AS mod7
        FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // ── Q26 array functions (embedding: array<float>) ────────────────
    QueryDef(
      "q26_array_funcs",
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).as("n_dims"),
            element_at(col("embedding"), 1).as("first_dim"),
            array_max(col("embedding")).as("max_dim"),
            array_min(col("embedding")).as("min_dim"),
            size(filter(col("embedding"), x => x > lit(0.0f))).as("n_positive"))
          .orderBy(col("vec_id")),
      Some("""SELECT vec_id, len(embedding) AS n_dims, embedding[1] AS first_dim,
          list_max(embedding) AS max_dim, list_min(embedding) AS min_dim,
          len(list_filter(embedding, x -> x > 0.0)) AS n_positive
        FROM embeddings ORDER BY vec_id""")),

    // ── Q27 explode / posexplode (Generator) ─────────────────────────
    QueryDef(
      "q27_explode",
      (s, dir) =>
        t(s, dir, "embeddings")
          .filter(col("vec_id") < 3)
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "val")))
          .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("val"))
          .orderBy(col("vec_id"), col("pos")),
      Some("""SELECT vec_id,
          unnest(range(1, len(embedding) + 1)) AS pos,
          unnest(embedding) AS val
        FROM embeddings WHERE vec_id < 3
        ORDER BY vec_id, pos""")),

    // ── Q28 JSON extraction (events.props) ───────────────────────────
    QueryDef(
      "q28_json_funcs",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
          CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ── Q29 conditional expressions ──────────────────────────────────
    QueryDef(
      "q29_conditional",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(
            when(col("l_quantity") < 10, "low")
              .when(col("l_quantity") < 30, "mid")
              .otherwise("high").as("qty_band"),
            coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag"))
          .groupBy(col("qty_band"), col("flag"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("qty_band"), col("flag")),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low'
                   WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
          COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag, count(*) AS n
        FROM lineitem GROUP BY 1, 2 ORDER BY qty_band, flag""")),

    // ── Q30 EXISTS + scalar subquery (SQL surface, decorrelation) ────
    QueryDef(
      "q30_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
            AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM orders)
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        ORDER BY o_orderkey"""),
      doc = "Catalyst decorrelates the EXISTS into a semi join."),

    // ── Q31 sampling (nondeterministic — rows-only check) ────────────
    QueryDef(
      "q31_sample",
      (s, dir) =>
        t(s, dir, "lineitem")
          .sample(withReplacement = false, fraction = 0.1, seed = 42)
          .select(col("l_orderkey"), col("l_linenumber"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      None,
      doc = "Bernoulli sample; not row-for-row oracle-checkable (SURVEY Q24).")
  )
}

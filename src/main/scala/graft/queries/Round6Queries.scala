package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-6 surface growth: the two most common TPC-H user shapes not yet
  * composed (Q10 top-k returned-revenue customers, Q18 HAVING-sum
  * large-volume orders) and the keyset-pagination form that
  * q99_offset_fetch's doc names as the scale shape.
  *
  * Reference scope note: alxmancilla/parquet-demo computes none of these
  * (SURVEY §0); all [EXT] declared-query surface over the driver
  * fixtures, DuckDB-oracle-checked.
  *
  * Determinism: revenue follows the decimal-cast recipe of
  * Round4Queries q_tpch03 — sum over DECIMAL(24,6), cast to DOUBLE only
  * at the end, identical expression text on both engines.
  */
object Round6Queries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── TPC-H Q10: top returned-revenue customers ────────────────────
    // Fact side: lineitem filtered to returns ⋈ quarter of orders — one
    // shuffle on orderkey, then one on custkey up to the customer dim.
    // Only nation (constant 25 rows) is hint-broadcast; customer grows
    // with SF so AQE decides that side. Top-k via sort+limit (Spark
    // TakeOrderedAndProject — no full sort at scale).
    QueryDef(
      "q_tpch10",
      (s, dir) => {
        val lo = lit("1997-07-01").cast(TimestampType)
        val hi = lit("1997-10-01").cast(TimestampType)
        val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"), col("c_mktsegment"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      doc = "TPC-H Q10 adapted (fixture customer has no address/phone/" +
        "comment; c_mktsegment stands in). Broadcast nation only."),

    // ── TPC-H Q18: large-volume orders (HAVING-sum semi-join) ────────
    // The aggregate-then-filter side is computed ONCE on lineitem (one
    // orderkey shuffle, map-side partial sums); the surviving ~0.1% of
    // orderkeys then drive the joins — at scale this is the shape where
    // AQE converts the orders join to broadcast after seeing the tiny
    // HAVING survivor set.
    QueryDef(
      "q_tpch18",
      (s, dir) => {
        // round() before the BIGINT cast on BOTH engines: Spark's bare
        // cast truncates toward zero while DuckDB's rounds to nearest, so
        // a fractional quantity would silently diverge. Post-round the
        // value is integral and both casts are exact (quantities are
        // positive, so HALF_UP ≡ half-away-from-zero too).
        val big = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(round(col("l_quantity"), 0).cast(LongType)).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(big, col("o_orderkey") === col("l_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          sum_qty
        FROM (SELECT l_orderkey,
                CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250) big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      doc = "TPC-H Q18 adapted: round-then-cast makes the HAVING sum an " +
        "exact BIGINT on both engines for ANY quantity distribution; " +
        "threshold 250 keeps ~0.3% of orders at the fixture distribution."),

    // ── q99b: keyset pagination (the scale form of LIMIT/OFFSET) ─────
    // OFFSET n scans and discards n rows on every page; the keyset form
    // seeks directly via a composite-key predicate that pushes down to
    // the parquet scan (l_orderkey > k OR (= k AND l_linenumber > k2)),
    // so page p costs the same as page 1. Same literal predicate text on
    // both engines.
    QueryDef(
      "q99b_keyset",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") > 300 ||
            (col("l_orderkey") === 300 && col("l_linenumber") > 2))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .limit(50),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_orderkey > 300
           OR (l_orderkey = 300 AND l_linenumber > 2)
        ORDER BY l_orderkey, l_linenumber LIMIT 50"""),
      doc = "Keyset (seek) pagination after cursor (300, 2): the " +
        "predicate reaches PushedFilters, so each page is an index-like " +
        "seek instead of OFFSET's scan-and-discard."),

    // ── TPC-H Q2: minimum-cost supplier (correlated scalar subquery) ──
    // The decorrelation macro: the WHERE-clause scalar subquery
    // correlates on p_partkey, and Catalyst rewrites it into a
    // min-aggregate joined back on the correlation key (one extra
    // orderkey-sized shuffle) instead of re-running the subquery per
    // outer row — at 100 TB the difference between one pass and n
    // passes over the supply side. Identical SQL text runs on both
    // engines (both decorrelate; DuckDB's result is the oracle).
    //
    // Fixture adaptation: no partsupp table exists (TESTDATA.md), so
    // lineitem plays the part-supplier price list and l_extendedprice
    // stands in for ps_supplycost — min() over DOUBLE is exact on both
    // engines (no summation order involved). DISTINCT because a
    // (part, supplier) pair can hit the regional minimum on several
    // lineitems; TPC-H proper gets uniqueness from partsupp's PK.
    QueryDef(
      "q_tpch02",
      (s, dir) => {
        Tables.register(s, dir,
          Seq("part", "lineitem", "supplier", "nation", "region"))
        s.sql(tpch02Sql)
      },
      Some(tpch02Sql),
      doc = "TPC-H Q2 adapted (lineitem as the supply price list): " +
        "correlated min-subquery per part within a region, decorrelated " +
        "by Catalyst into an aggregate + join-back."),

    // ── TPC-H Q21: waiting suppliers (semi-join + anti-join stack) ───
    // The multi-(anti-)join macro: one EXISTS (another supplier shipped
    // in the same order) and one NOT EXISTS (no OTHER supplier was
    // late in it) over the same fact table, both correlated on
    // l_orderkey. Catalyst turns them into a left-semi and a left-anti
    // hash join on the orderkey — the whole stack is shuffle-bounded by
    // the fact table, with no per-row subquery execution. The NOT
    // EXISTS also correlates on o_orderdate from the OUTER order row —
    // the nested-correlation shape that breaks naive decorrelation.
    //
    // Fixture adaptation: no l_commitdate/l_receiptdate, so "late" is
    // l_shipdate > o_orderdate + 90 days (same-order correlation keeps
    // the shape); no s_comment/nation filter subsetting — every nation
    // reports, which keeps the fixture result non-trivial at sf0.001.
    QueryDef(
      "q_tpch21",
      (s, dir) => {
        Tables.register(s, dir,
          Seq("supplier", "lineitem", "orders", "nation"))
        s.sql(tpch21Sql)
      },
      Some(tpch21Sql),
      doc = "TPC-H Q21 adapted (lateness from shipdate vs order date): " +
        "EXISTS + correlated NOT EXISTS over lineitem, compiled to " +
        "left-semi + left-anti joins on l_orderkey."),

    // ── TPC-H Q1: pricing summary (the canonical scan-heavy agg) ─────
    // One full-fact scan → 8 aggregates over 2 grouping keys: the
    // whole-stage-codegen showcase — partial aggregation means the
    // shuffle carries 6 rows however big lineitem is. Averages are
    // computed as exact decimal sums divided ONCE as doubles, so both
    // engines do the identical single division (Spark's avg() returns
    // decimal for decimal input while DuckDB's returns double — the
    // explicit sum/count form sidesteps the dialect divergence).
    QueryDef(
      "q_tpch01",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem"))
        s.sql(tpch01Sql)
      },
      Some(tpch01Sql),
      doc = "TPC-H Q1: full-scan pricing summary, map-side partials " +
        "reduce the shuffle to group-count rows; decimal-exact sums, " +
        "one double division per average."),

    // ── TPC-H Q22: dormant high-balance customers ────────────────────
    // The uncorrelated-scalar-subquery + anti-join macro: the global
    // average computes ONCE (a one-row broadcast, not a per-row
    // subquery), and the NOT EXISTS compiles to a left-anti join on
    // o_custkey. round(avg, 2) absorbs the cross-engine ulp difference
    // of a double summation (fixture min |acctbal − threshold| ≈ 0.98,
    // far above any ulp effect).
    //
    // Fixture adaptation: every customer has at least one order, so the
    // TPC-H "no orders at all" predicate is vacuous here; "no OPEN
    // orders" (o_orderstatus = 'O') keeps the anti-join selective. No
    // phone country codes in the fixture; the positive-balance filter
    // inside the subquery is retained.
    QueryDef(
      "q_tpch22",
      (s, dir) => {
        Tables.register(s, dir, Seq("customer", "orders", "nation"))
        s.sql(tpch22Sql)
      },
      Some(tpch22Sql),
      doc = "TPC-H Q22 adapted (dormant = no OPEN orders): uncorrelated " +
        "scalar average broadcast once + left-anti join on o_custkey."),

    // ── TPC-H Q4: order priority checking (EXISTS → left-semi) ───────
    // The pure semi-join macro: EXISTS dedups on the lineitem side BY
    // CONSTRUCTION (a left-semi hash join emits each order at most
    // once), so the count is over orders, never inflated by the ~4
    // matching lineitems — the shape a rewrite to a plain inner join
    // gets wrong. The EXISTS correlates on BOTH o_orderkey and
    // o_orderdate (the lateness cutoff references the outer row), the
    // same nested-correlation flavor as q_tpch21's NOT EXISTS.
    //
    // Fixture adaptation: no l_commitdate/l_receiptdate, so "late" is
    // l_shipdate > o_orderdate + 90 days, as in q_tpch21.
    QueryDef(
      "q_tpch04",
      (s, dir) => {
        Tables.register(s, dir, Seq("orders", "lineitem"))
        s.sql(tpch04Sql)
      },
      Some(tpch04Sql),
      doc = "TPC-H Q4 adapted (lateness from shipdate vs order date): " +
        "correlated EXISTS compiled to a left-semi hash join on " +
        "l_orderkey; count dedups by construction."),

    // ── TPC-H Q17: small-quantity revenue (correlated AVG subquery) ──
    // The per-group-threshold macro: the WHERE-clause scalar AVG
    // subquery correlates on p_partkey, and Catalyst decorrelates it
    // into ONE aggregate over lineitem grouped by partkey, joined back
    // on the correlation key — one pass over the fact table instead of
    // one subquery execution per outer row. Q2 pinned the min() flavor;
    // this pins avg(), whose decorrelated form must also carry count()
    // to keep empty-group semantics (NULL, filters false) correct.
    //
    // Determinism: the threshold avg is an exact decimal sum divided
    // once as double, so both engines compare l_quantity against the
    // bit-identical threshold; the outer sum is decimal-exact.
    // Fixture adaptation: p_type stands in for p_container.
    QueryDef(
      "q_tpch17",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem", "part"))
        s.sql(tpch17Sql)
      },
      Some(tpch17Sql),
      doc = "TPC-H Q17 adapted (p_type for p_container): correlated " +
        "avg-subquery per part, decorrelated into one grouped " +
        "aggregate + join-back on p_partkey."),

    // ── TPC-H Q19: disjunctive mixed-table predicates ────────────────
    // The OR-pushdown macro: the join predicate is a disjunction of
    // three conjunctions, each mixing part and lineitem columns. A
    // naive planner evaluates everything post-join; CNF extraction
    // derives the single-side residuals (brand IN (...) ∧ size ≤ 35 on
    // part, quantity BETWEEN 1 AND 30 on lineitem) and pushes them into
    // the scans, so the join sees only possibly-matching rows. The pin:
    // both scans carry PushedFilters derived from the OR (PlanSpec).
    QueryDef(
      "q_tpch19",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem", "part"))
        s.sql(tpch19Sql)
      },
      Some(tpch19Sql),
      doc = "TPC-H Q19 adapted (fixture brands, no containers): " +
        "disjunction of mixed-table conjunctions; CNF extraction " +
        "pushes per-side residuals into both parquet scans."),

    // ── TPC-H Q7: volume shipping between two nations ────────────────
    // The self-joined-dimension macro: nation joins the fact tree TWICE
    // (supplier's nation and customer's nation) with a symmetric
    // pair-disjunction across the two aliases. Both nation sides
    // broadcast; the disjunction can't push below either join (it
    // spans both aliases) and must evaluate exactly once, post-join.
    // Grouping on year(l_shipdate) exercises expression keys.
    QueryDef(
      "q_tpch07",
      (s, dir) => {
        Tables.register(s, dir,
          Seq("supplier", "lineitem", "orders", "customer", "nation"))
        s.sql(tpch07Sql)
      },
      Some(tpch07Sql),
      doc = "TPC-H Q7 adapted (fixture nations — the 18/19 pair is " +
        "chosen so even sf0.001 ships between them): nation dim joined " +
        "twice under two aliases, symmetric pair-disjunction post-join, " +
        "year(l_shipdate) expression grouping."),

    // ── TPC-H Q8: market share (conditional ratio aggregation) ───────
    // The conditional-ratio macro: one 8-table join tree feeds TWO
    // aggregates of the same column — a CASE-gated numerator and a
    // total denominator — divided once. At scale this is the shape
    // where computing the ratio as two separate queries would double
    // the join cost; the single-pass CASE form halves it.
    QueryDef(
      "q_tpch08",
      (s, dir) => {
        Tables.register(s, dir,
          Seq("part", "supplier", "lineitem", "orders", "customer",
            "nation", "region"))
        s.sql(tpch08Sql)
      },
      Some(tpch08Sql),
      doc = "TPC-H Q8 adapted (ASIA region, NATION_3 share, p_type " +
        "STANDARD): CASE-gated numerator and denominator in one pass " +
        "over one join tree; decimal-exact sums, one double division."),

    // ── TPC-H Q14: promo revenue ratio (scalar conditional ratio) ────
    // Q8's ratio shape reduced to its scalar core: one month-pruned
    // fact scan, one part join, numerator and denominator in the same
    // aggregate. The l_shipdate window is pushed to the scan, so the
    // join probes ~1/60th of lineitem.
    QueryDef(
      "q_tpch14",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem", "part"))
        s.sql(tpch14Sql)
      },
      Some(tpch14Sql),
      doc = "TPC-H Q14 (p_type = 'PROMO' is the fixture's literal promo " +
        "class): scalar conditional-ratio aggregate over a month-pruned " +
        "scan."),

    // ── TPC-H Q20: nested IN subqueries (semi-join over an aggregate) ─
    // The double-semi-join macro: the outer IN feeds on a GROUPED
    // subquery (per (supplier, part) shipped volume over a HAVING
    // threshold), whose own IN prunes parts by name prefix. Catalyst
    // compiles both INs to left-semi joins — the inner one BEFORE the
    // aggregation, so the volume rollup only runs over the name-pruned
    // slice. No correlated execution anywhere.
    QueryDef(
      "q_tpch20",
      (s, dir) => {
        Tables.register(s, dir, Seq("supplier", "lineitem", "part", "nation"))
        s.sql(tpch20Sql)
      },
      Some(tpch20Sql),
      doc = "TPC-H Q20 adapted (shipped volume for the absent partsupp; " +
        "round-then-cast exact threshold; NATION_19 chosen so the " +
        "smallest fixture still yields a supplier): nested INs compile " +
        "to left-semi joins, the part prune running below the rollup."),

    // ── TPC-H Q13: customer order-count distribution ─────────────────
    // The LEFT OUTER fact-aggregation macro — the one join shape the
    // family lacked. The textbook form joins customer ⟕ orders THEN
    // counts per customer: the join sees every order row and a power-law
    // customer becomes a skewed task. Catalyst does not push aggregates
    // below outer joins, so we compose the scale form by hand: count
    // orders per custkey FIRST (map-side partials → the shuffle carries
    // distinct custkeys, not orders), then LEFT OUTER join customer to
    // the pre-aggregated counts — one row per custkey on the probe side,
    // so the skew is gone by construction, and zero-order customers
    // surface as coalesce(cnt, 0), preserving the outer-join semantics
    // (count(o_orderkey) = 0 is a real histogram bucket). The exclusion
    // filter runs below the pre-aggregation — equivalent to the join-
    // condition placement of the textbook form.
    QueryDef(
      "q_tpch13",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val perCust = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("cnt"))
        c.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some(tpch13Sql),
      doc = "TPC-H Q13 adapted (priority-class exclusion stands in for " +
        "the comment-pattern filter — same selectivity role): orders " +
        "pre-aggregated per custkey BELOW the outer join (a pushdown " +
        "Catalyst won't do itself), so the join probes one row per " +
        "customer and the power-law skew never materializes."),

    // ── TPC-H Q9: product-type profit by nation and year ─────────────
    // The multi-dimension profit-rollup macro: a LIKE-pruned part dim
    // gates the fact scan, then the fact tree climbs through orders
    // (year) and supplier→nation (geography) to a two-key rollup. The
    // %substring% prune can't use a range index on ANY engine — it's a
    // full dim scan — but it broadcasts, so the fact side sees a
    // build-side prune (runtime row reduction), never a second fact
    // pass. Profit per row is pure IEEE double arithmetic (identical
    // parse tree both engines) cast to DECIMAL(24,6) pre-sum.
    QueryDef(
      "q_tpch09",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_name").like("%gear%"))
          .select(col("p_partkey"), col("p_retailprice"))
        val su = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val n = t(s, dir, "nation")
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
        t(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"),
            year(col("o_orderdate")).cast(LongType).as("o_year"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))
              - lit(0.6) * col("p_retailprice") * col("l_quantity"))
              .cast(DecimalType(24, 6)).as("amount"))
          .groupBy(col("nation"), col("o_year"))
          .agg(sum(col("amount")).cast(DoubleType).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(tpch09Sql),
      doc = "TPC-H Q9 adapted (no partsupp in the fixture: supply cost = " +
        "0.6 × p_retailprice, the spec's own seeding formula; '%gear%' " +
        "stands in for '%green%'): LIKE-pruned part dim broadcast into " +
        "the fact tree, profit rolled up by nation × year."),

    // ── TPC-H Q6: forecasting revenue change (pure pruned-scan agg) ──
    // The degenerate macro every engine must get EXACTLY right: no join,
    // no group — three pushable predicates and one scalar sum. The whole
    // query is a scan whose PushedFilters carry the year window, the
    // discount band and the quantity cap; the exchange moves ONE partial
    // per partition. At 100 TB this is the shape where pushdown is the
    // entire cost model: a scan that reads all columns or all row groups
    // is the only way to lose.
    QueryDef(
      "q_tpch06",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem"))
        s.sql(tpch06Sql)
      },
      Some(tpch06Sql),
      doc = "TPC-H Q6: three scan-pushed predicates, one decimal-exact " +
        "scalar sum — the pure pushdown macro; the single exchange " +
        "carries one partial per partition."),

    // ── TPC-H Q12: shipmode service-level split (join + CASE rollup) ─
    // The late-shipment split: lineitem's date window pushes to ITS
    // scan, the lateness predicate (l_shipdate > o_orderdate + 30d)
    // spans both tables so it evaluates post-join, and the two service
    // classes are CASE-gated sums over ONE orderkey join — Q8's
    // conditional-ratio trick applied to counts. The fixture has no
    // l_shipmode; l_returnflag plays the low-cardinality group role.
    QueryDef(
      "q_tpch12",
      (s, dir) => {
        Tables.register(s, dir, Seq("orders", "lineitem"))
        s.sql(tpch12Sql)
      },
      Some(tpch12Sql),
      doc = "TPC-H Q12 adapted (l_returnflag for the absent l_shipmode; " +
        "lateness = shipdate - orderdate > 30d): date window pushed to " +
        "the lineitem scan, cross-table lateness post-join, CASE-gated " +
        "priority split in one pass."),

    // ── TPC-H Q15: top-revenue supplier (aggregate → max → join-back) ─
    // The VIEW-reuse macro: a quarter's per-supplier revenue rollup is
    // consumed TWICE — once as the join input, once under max() — and
    // Catalyst computes the scalar max as its own broadcast stage, so
    // the rollup's equality filter costs one comparison per supplier,
    // not a re-aggregation. The double equality is safe cross-engine
    // because both sides come from the SAME decimal-sum recipe.
    QueryDef(
      "q_tpch15",
      (s, dir) => {
        Tables.register(s, dir, Seq("supplier", "lineitem"))
        s.sql(tpch15Sql)
      },
      Some(tpch15Sql),
      doc = "TPC-H Q15 (revenue view + scalar max + join-back): the " +
        "per-supplier rollup feeds both the join and the max; ties all " +
        "surface (no LIMIT), ordered by suppkey."),

    // ── TPC-H Q11: important stock values (HAVING scalar subquery) ───
    // The group-filter-by-global-aggregate macro: per-part value within
    // one nation, kept only when above a fraction of that nation's
    // TOTAL — the scalar subquery repeats the whole join+aggregate, so
    // the plan runs the fact pass twice (outer + threshold), with the
    // threshold side collapsing to ONE row that broadcasts into the
    // HAVING. Distinct from Q22 (scalar in WHERE prunes rows) — here
    // the scalar prunes GROUPS after aggregation.
    QueryDef(
      "q_tpch11",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem", "supplier", "nation"))
        s.sql(tpch11Sql)
      },
      Some(tpch11Sql),
      doc = "TPC-H Q11 adapted (lineitem value = extendedprice × " +
        "quantity stands in for the absent partsupp; NATION_20 and " +
        "fraction 0.008 chosen non-trivial at every fixture scale): " +
        "HAVING against a broadcast scalar total."),

    // ── TPC-H Q16: supplier counts by part attrs (NOT IN anti-join) ──
    // The distinct-count-under-anti-join macro: (brand, type, size)
    // combinations count DISTINCT suppliers, minus suppliers from a
    // NOT IN subquery — the null-aware anti join — with three pushable
    // dim predicates (≠, NOT LIKE, IN-list) pruning the part side
    // before the join. The distinct aggregation shuffles (group, supp)
    // pairs once, then collapses.
    QueryDef(
      "q_tpch16",
      (s, dir) => {
        Tables.register(s, dir, Seq("lineitem", "part", "supplier"))
        s.sql(tpch16Sql)
      },
      Some(tpch16Sql),
      doc = "TPC-H Q16 adapted (lineitem supplier-part pairs stand in " +
        "for partsupp; low-acctbal suppliers play the complaints " +
        "exclusion): NOT IN anti-join under a count-distinct rollup, " +
        "three pushed part predicates.")
  )

  /** Shared Spark/DuckDB SQL for q_tpch15 (dialect-common subset). */
  private def tpch15Sql: String =
    """WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey"""

  /** Shared Spark/DuckDB SQL for q_tpch11 (dialect-common subset). */
  private def tpch11Sql: String =
    """SELECT l_partkey,
          CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS value
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_20'
        GROUP BY l_partkey
        HAVING CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(24,6))) AS DOUBLE) >
          (SELECT CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(24,6))) AS DOUBLE) * 0.008
           FROM lineitem, supplier, nation
           WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
             AND n_name = 'NATION_20')
        ORDER BY value DESC, l_partkey"""

  /** Shared Spark/DuckDB SQL for q_tpch16 (dialect-common subset). */
  private def tpch16Sql: String =
    """SELECT p_brand, p_type, p_size,
          count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 7, 10, 14, 23, 25, 45)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Shared Spark/DuckDB SQL for q_tpch06 (dialect-common subset). */
  private def tpch06Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24"""

  /** Shared Spark/DuckDB SQL for q_tpch12 (dialect-common subset). */
  private def tpch12Sql: String =
    """SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders, lineitem
        WHERE o_orderkey = l_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Shared DuckDB oracle SQL for q_tpch13 (dialect-common subset). */
  private def tpch13Sql: String =
    """SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

  /** Shared DuckDB oracle SQL for q_tpch09 (dialect-common subset). */
  private def tpch09Sql: String =
    """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n_name AS nation,
            CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(l_extendedprice * (1 - l_discount)
              - 0.6 * p_retailprice * l_quantity AS DECIMAL(24,6)) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%gear%') profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC"""

  /** Shared Spark/DuckDB SQL for q_tpch07 (dialect-common subset). */
  private def tpch07Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
          CAST(sum(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            CAST(year(l_shipdate) AS BIGINT) AS l_year,
            l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
              OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year"""

  /** Shared Spark/DuckDB SQL for q_tpch08 (dialect-common subset). */
  private def tpch08Sql: String =
    """SELECT o_year,
          CAST(CAST(sum(CASE WHEN nation = 'NATION_3'
                THEN CAST(volume AS DECIMAL(24,6))
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) /
            CAST(sum(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
            l_extendedprice * (1 - l_discount) AS volume,
            n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer,
            nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'STANDARD'
        ) all_nations
        GROUP BY o_year ORDER BY o_year"""

  /** Shared Spark/DuckDB SQL for q_tpch14 (dialect-common subset). */
  private def tpch14Sql: String =
    """SELECT CAST(100.00 *
          CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
              ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
          / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE)
          AS DOUBLE) AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'"""

  /** Shared Spark/DuckDB SQL for q_tpch20 (dialect-common subset). */
  private def tpch20Sql: String =
    """SELECT s_suppkey, s_name, s_acctbal
        FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
            GROUP BY l_suppkey, l_partkey
            HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 60)
          AND s_nationkey = n_nationkey AND n_name = 'NATION_19'
        ORDER BY s_suppkey"""

  /** Shared Spark/DuckDB SQL for q_tpch04 (dialect-common subset). */
  private def tpch04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Shared Spark/DuckDB SQL for q_tpch17 (dialect-common subset). */
  private def tpch17Sql: String =
    """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#23'
          AND p_type = 'MEDIUM'
          AND l_quantity < (
            SELECT CAST(0.2 AS DOUBLE) *
              (CAST(sum(CAST(l2.l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(*))
            FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)"""

  /** Shared Spark/DuckDB SQL for q_tpch19 (dialect-common subset). */
  private def tpch19Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30))"""

  /** Shared Spark/DuckDB SQL for q_tpch01 (dialect-common subset). */
  private def tpch01Sql: String =
    """SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
          CAST(CAST(sum(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
          count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""

  /** Shared Spark/DuckDB SQL for q_tpch22 (dialect-common subset). */
  private def tpch22Sql: String =
    """SELECT n_name, count(*) AS numcust,
          CAST(sum(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS totacctbal
        FROM customer, nation
        WHERE c_nationkey = n_nationkey
          AND c_acctbal > (
            SELECT round(avg(c_acctbal), 2) FROM customer
            WHERE c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        GROUP BY n_name ORDER BY n_name"""

  /** Shared Spark/DuckDB SQL for q_tpch02 (dialect-common subset). */
  private def tpch02Sql: String =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
          l_extendedprice AS supplycost
        FROM part, lineitem, supplier, nation, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_type = 'ECONOMY' AND p_size <= 15
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND l_extendedprice = (
            SELECT min(l2.l_extendedprice)
            FROM lineitem l2, supplier s2, nation n2, region r2
            WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""

  /** Shared Spark/DuckDB SQL for q_tpch21 (dialect-common subset). */
  private def tpch21Sql: String =
    """SELECT s_name, count(*) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND s_nationkey = n_nationkey
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-4 surface growth: crypto hashes, trigonometry, calendar round 4,
  * array round 4, generator forms (stack/inline/posexplode_outer), string
  * round 4, HLL/bitmap distinct-count sketches, data masking, windowed
  * distinct counts, and two TPC-H-shaped multi-join macro queries
  * (Q3/Q5 adapted to the fixture schema).
  *
  * Reference scope note: alxmancilla/parquet-demo computes none of these
  * (SURVEY §0); all [EXT] declared-query surface over the driver
  * fixtures, DuckDB-oracle-checked.
  *
  * Determinism: float aggregation goes through exact DECIMAL casts
  * (identical text both engines); transcendental outputs are rounded to
  * 6 digits; sketch queries oracle the INVARIANT (tolerance/merge
  * booleans), except bitmap distinct counts which are exact.
  */
object Round4Queries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ── crypto/content hashes ────────────────────────────────────────
    QueryDef(
      "q101_hash_funcs",
      (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_custkey") % 10 === 0)
          .select(
            col("c_custkey"),
            md5(col("c_name")).as("h_md5"),
            sha2(col("c_name"), 256).as("h_sha256"),
            expr("cast(conv(substring(sha2(c_name, 256), 1, 8), 16, 10) as bigint)")
              .as("h_bucket"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256,
          CAST(('0x' || substring(sha256(c_name), 1, 8)) AS BIGINT) AS h_bucket
        FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey"""),
      doc = "Content hashing (md5/sha256) + hex-prefix integer bucketing — " +
        "the primitive under every shard/dedup key."),

    // ── trigonometric / angular functions ────────────────────────────
    // Inputs bounded to [0,1] (quantity/50) keep every function well
    // away from asymptotes; round(6) absorbs last-ulp libm differences
    // (the q25/q83 recipe).
    QueryDef(
      "q102_trig",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 20 === 0)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("round(sin(l_quantity / 50), 6)").as("sin_x"),
            expr("round(cos(l_quantity / 50), 6)").as("cos_x"),
            expr("round(tan(l_quantity / 50), 6)").as("tan_x"),
            expr("round(atan2(l_quantity / 50, 1 + l_quantity / 50), 6)").as("atan2_x"),
            expr("round(degrees(l_quantity / 50), 6)").as("deg_x"),
            expr("round(radians(l_quantity), 6)").as("rad_x"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
          round(sin(l_quantity / 50), 6) AS sin_x,
          round(cos(l_quantity / 50), 6) AS cos_x,
          round(tan(l_quantity / 50), 6) AS tan_x,
          round(atan2(l_quantity / 50, 1 + l_quantity / 50), 6) AS atan2_x,
          round(degrees(l_quantity / 50), 6) AS deg_x,
          round(radians(l_quantity), 6) AS rad_x
        FROM lineitem WHERE l_orderkey % 20 = 0
        ORDER BY l_orderkey, l_linenumber""")),

    // ── calendar functions round 4 ───────────────────────────────────
    QueryDef(
      "q103_datetime4",
      (s, dir) =>
        t(s, dir, "orders")
          .filter(col("o_orderkey") % 25 === 0)
          .select(col("o_orderkey"),
            expr("last_day(cast(o_orderdate as date))").as("month_end"),
            expr("date_format(o_orderdate, 'EEEE')").as("day_name"),
            expr("weekday(cast(o_orderdate as date))").as("weekday_mon0"),
            // o_orderdate reads as TIMESTAMP_NTZ; session is pinned UTC so
            // the cast to instant-typed TIMESTAMP is lossless.
            expr("unix_micros(cast(o_orderdate as timestamp))").as("epoch_us"),
            expr("make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate), 12, 30, 0)")
              .as("noonish"))
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
          last_day(CAST(o_orderdate AS DATE)) AS month_end,
          strftime(o_orderdate, '%A') AS day_name,
          CAST(isodow(o_orderdate) - 1 AS INTEGER) AS weekday_mon0,
          epoch_us(o_orderdate) AS epoch_us,
          make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate), 12, 30, 0) AS noonish
        FROM orders WHERE o_orderkey % 25 = 0 ORDER BY o_orderkey"""),
      doc = "last_day / day-name / Monday-zero weekday / exact epoch micros / " +
        "timestamp constructor."),

    // ── array functions round 4 ──────────────────────────────────────
    // Array-valued cells crash the driver's pandas sort, so every array
    // result is serialized (joined string or JSON) — same on both sides.
    QueryDef(
      "q104_array4",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 50 === 0)
          .withColumn("arr", expr("array(l_orderkey % 7, l_partkey % 7, l_suppkey % 7)"))
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("array_join(transform(sort_array(array_distinct(arr)), v -> cast(v as string)), ',')")
              .as("s_distinct"),
            expr("array_join(array_repeat(l_returnflag, 3), ',')").as("s_repeat"),
            expr("array_join(transform(array_compact(array(l_orderkey % 7, cast(null as bigint), l_partkey % 7)), v -> cast(v as string)), ',')")
              .as("s_compact"),
            expr("array_join(transform(array_remove(arr, 0), v -> cast(v as string)), ',')")
              .as("s_remove"),
            expr("array_join(transform(array_append(array_prepend(arr, -1), 99), v -> cast(v as string)), ',')")
              .as("s_append"),
            expr("to_json(zip_with(arr, reverse(arr), (x, y) -> named_struct('a', x, 'b', y)))")
              .as("s_zip"))
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""WITH a AS (
          SELECT l_orderkey, l_linenumber, l_returnflag, l_partkey,
            [l_orderkey % 7, l_partkey % 7, l_suppkey % 7] AS arr
          FROM lineitem WHERE l_orderkey % 50 = 0)
        SELECT l_orderkey, l_linenumber,
          array_to_string(list_transform(list_sort(list_distinct(arr)), v -> CAST(v AS VARCHAR)), ',') AS s_distinct,
          array_to_string(list_transform(range(3), i -> l_returnflag), ',') AS s_repeat,
          array_to_string(list_transform(list_filter([l_orderkey % 7, NULL, l_partkey % 7], v -> v IS NOT NULL), v -> CAST(v AS VARCHAR)), ',') AS s_compact,
          COALESCE(array_to_string(list_transform(list_filter(arr, v -> v <> 0), v -> CAST(v AS VARCHAR)), ','), '') AS s_remove,
          array_to_string(list_transform(list_append(list_prepend(-1, arr), 99), v -> CAST(v AS VARCHAR)), ',') AS s_append,
          to_json(list_transform(range(len(arr)), i -> {a: arr[i+1], b: list_reverse(arr)[i+1]})) AS s_zip
        FROM a ORDER BY l_orderkey, l_linenumber"""),
      doc = "distinct/repeat/compact/remove/append/prepend/zip_with, all " +
        "serialized to strings for the driver hash."),

    // ── generator forms: stack / inline / posexplode_outer ───────────
    QueryDef(
      "q105_stack",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 100 === 0)
          .selectExpr("l_orderkey", "l_linenumber",
            "stack(2, 'price', l_extendedprice, 'qty', l_quantity) as (metric, value)")
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      Some("""SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS value
          FROM lineitem WHERE l_orderkey % 100 = 0
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'qty', l_quantity
          FROM lineitem WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, l_linenumber, metric"""),
      doc = "Row-wise wide→long pivot (stack = constant-folded Expand, no " +
        "shuffle — unlike a join-based melt)."),

    QueryDef(
      "q106_inline",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 50)
          .selectExpr("p_partkey",
            "inline(transform(sequence(1, cast(1 + p_partkey % 3 as int)), i -> named_struct('i', i, 'sq', i * i)))")
          .orderBy(col("p_partkey"), col("i")),
      Some("""SELECT p_partkey, u.i AS i, u.sq AS sq
        FROM (
          SELECT p_partkey,
            unnest(list_transform(range(1, CAST(2 + p_partkey % 3 AS BIGINT)),
              i -> {i: i, sq: i * i})) AS u
          FROM part WHERE p_partkey < 50)
        ORDER BY p_partkey, i"""),
      doc = "inline() explodes an array<struct> into columns — the typed " +
        "generator under nested-data flattening."),

    QueryDef(
      "q107_posexplode_outer",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 40)
          .withColumn("arr", expr(
            "CASE WHEN p_partkey % 4 = 0 THEN array() ELSE sequence(1, p_partkey % 4) END"))
          .select(col("p_partkey"),
            posexplode_outer(col("arr")).as(Seq("pos", "val")))
          .orderBy(col("p_partkey"), col("pos")),
      Some("""WITH a AS (
          SELECT p_partkey,
            CASE WHEN p_partkey % 4 = 0 THEN []
                 ELSE list_transform(range(1, p_partkey % 4 + 1), x -> x) END AS arr
          FROM part WHERE p_partkey < 40),
        e AS (
          SELECT p_partkey,
            unnest(CASE WHEN len(arr) = 0
              THEN [{pos: CAST(NULL AS BIGINT), val: CAST(NULL AS BIGINT)}]
              ELSE list_transform(range(len(arr)), i -> {pos: i, val: arr[i+1]}) END) AS u
          FROM a)
        SELECT p_partkey, u.pos AS pos, u.val AS val FROM e
        ORDER BY p_partkey, pos"""),
      doc = "NULL-preserving positional explode: empty arrays keep their row " +
        "(the outer-join semantics of unnest)."),

    // ── string functions round 4 ─────────────────────────────────────
    QueryDef(
      "q108_string4",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") % 5 === 0)
          .withColumn("s", concat_ws(".", col("p_type"), col("p_brand"),
            col("p_size").cast("string")))
          .select(col("p_partkey"),
            expr("substring_index(s, '.', 2)").as("first2"),
            overlay(col("s"), lit("XX"), lit(3), lit(2)).as("patched"),
            expr("elt(cast(1 + p_partkey % 3 as int), p_type, p_brand, 'zz')").as("picked"),
            expr("find_in_set(p_brand, 'Brand#1,Brand#2,Brand#3')").as("brand_pos"))
          .orderBy(col("p_partkey")),
      Some("""WITH a AS (
          SELECT p_partkey, p_type, p_brand,
            p_type || '.' || p_brand || '.' || CAST(p_size AS VARCHAR) AS s
          FROM part WHERE p_partkey % 5 = 0)
        SELECT p_partkey,
          array_to_string(string_split(s, '.')[1:2], '.') AS first2,
          substr(s, 1, 2) || 'XX' || substr(s, 5) AS patched,
          [p_type, p_brand, 'zz'][CAST(1 + p_partkey % 3 AS INTEGER)] AS picked,
          CAST(COALESCE(list_position(string_split('Brand#1,Brand#2,Brand#3', ','), p_brand), 0) AS INTEGER) AS brand_pos
        FROM a ORDER BY p_partkey"""),
      doc = "substring_index / overlay / elt / find_in_set — oracle rebuilds " +
        "each from split/substr primitives (the semantics, not the name)."),

    // ── HLL sketch aggregate (Datasketches, Spark 4) ─────────────────
    // Invariant oracle (the q15b pattern): the estimate is
    // implementation-defined, so the oracle checks the declared
    // tolerance (±5%) and the merge law (union of per-group sketches ==
    // one global sketch — HLL registers are max-merged, so the equality
    // is exact and order-insensitive). These booleans are what make
    // sketches USABLE at 100 TB: partial-aggregate per partition, merge
    // at the driver, never a global distinct shuffle.
    QueryDef(
      "q109_hll_sketch",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val per = o.groupBy(col("o_orderpriority")).agg(
          count_distinct(col("o_custkey")).as("n_exact"),
          expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("est"))
        // Merge law: the union of per-group sketches must estimate the
        // GLOBAL exact distinct within the same tolerance. (Not equality
        // with a single global sketch: Datasketches uses the HIP
        // estimator for a streamed sketch but the composite estimator
        // after a union, so the two estimates differ slightly.)
        val merged = o.groupBy(col("o_orderpriority"))
          .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_m"))
        val global = o.agg(count_distinct(col("o_custkey")).as("n_g"))
        per.crossJoin(broadcast(merged)).crossJoin(broadcast(global))
          .select(col("o_orderpriority"), col("n_exact"),
            (abs(col("est") - col("n_exact")) * 20 <= col("n_exact")).as("est_ok"),
            (abs(col("est_m") - col("n_g")) * 20 <= col("n_g")).as("merge_ok"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_exact,
          TRUE AS est_ok, TRUE AS merge_ok
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      doc = "HLL++ distinct sketch: ±5% estimate invariant + exact merge law " +
        "(group-sketch union == global sketch)."),

    // ── bitmap exact distinct count ──────────────────────────────────
    // Unlike HLL this is EXACT: bucket the key space, build one roaring-
    // style bitmap per (group, bucket) with map-side combine, sum
    // bitmap_count. Two shuffles, both on small keys; the 100 TB shape
    // for exact COUNT(DISTINCT bigint) without a row-level distinct.
    QueryDef(
      "q110_bitmap_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), expr("bitmap_bucket_number(l_partkey)").as("bkt"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_partkey))").as("bm"))
          .groupBy(col("l_returnflag"))
          .agg(sum(expr("bitmap_count(bm)")).cast(LongType).as("n_parts"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      doc = "Exact distinct via bitmap partial aggregation — oracle is the " +
        "plain COUNT(DISTINCT); results must be equal, not approximate."),

    // ── data masking ─────────────────────────────────────────────────
    QueryDef(
      "q111_mask",
      (s, dir) =>
        t(s, dir, "customer")
          .filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), expr("mask(c_name)").as("masked"),
            expr("mask(c_mktsegment, '#', '*', '9')").as("masked_custom"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
          regexp_replace(regexp_replace(regexp_replace(c_name,
            '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
          regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
            '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '9', 'g') AS masked_custom
        FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey"""),
      doc = "PII masking by character class (upper/lower/digit), default and " +
        "custom replacement chars; oracle = regexp_replace chain."),

    // ── windowed distinct count ──────────────────────────────────────
    // Spark windows reject DISTINCT aggregates; size(collect_set) OVER
    // is the standard equivalent (set semantics make it partition-order
    // insensitive — safe under any shuffle).
    QueryDef(
      "q112_windowed_distinct",
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("event_id") % 20 === 0)
          .select(col("event_id"), col("user_id"),
            size(collect_set(col("event_type")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
              .as("n_types"))
          .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id,
          CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id) AS INTEGER) AS n_types
        FROM (SELECT * FROM events WHERE event_id % 20 = 0)
        ORDER BY event_id"""),
      doc = "count(DISTINCT) OVER — expressed as size(collect_set) over the " +
        "partition (Spark windows reject DISTINCT directly)."),

    // ── TPC-H macro shapes (fixture-adapted) ─────────────────────────
    // Q3: segment-filtered customer ⋈ orders ⋈ lineitem, revenue top-10.
    // The customer dimension is broadcast (segment filter first — a
    // semi-join reduction); orders⋈lineitem is the one real shuffle.
    QueryDef(
      "q_tpch03",
      (s, dir) => {
        val cutoff = lit("1998-03-15").cast(TimestampType)
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      doc = "TPC-H Q3 adapted (o_orderpriority for the missing " +
        "o_shippriority); broadcast the filtered customer dim."),

    // Q5: five-way join down to per-nation revenue. region⋈nation and
    // supplier broadcast; the fact-side shuffles are lineitem⋈orders
    // (orderkey) and ⋈customer (custkey); c_nationkey = s_nationkey is
    // the local-supplier predicate applied post-join.
    QueryDef(
      "q_tpch05",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val nr = n.join(r, col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val sup = t(s, dir, "supplier")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        val c = t(s, dir, "customer")
        t(s, dir, "lineitem")
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      doc = "TPC-H Q5: dims broadcast, two fact shuffles; Catalyst+AQE " +
        "pick join order.")
  )
}

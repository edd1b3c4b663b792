package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Funcs
import graft.operators.{Cdc, FactBuilder, Scd1, Scd2}

/** The ELT / warehouse query surface (SURVEY.md §2a).
  *
  * Every query has a DuckDB oracle with IDENTICAL column names, and
  * output columns restricted to representation-safe types: BIGINT,
  * STRING, BOOLEAN, whole-second TIMESTAMP, and untouched DOUBLE
  * pass-through. Money goes through exact decimal casts and is emitted
  * as integer cents (`*_cents`) / 1e-4 units (`*_e4`) / 1e-6 units
  * (`*_e6`) — exact in both engines regardless of how the comparator
  * normalizes decimals, and immune to float-summation-order drift.
  * Dates are emitted as 'yyyy-MM-dd' strings. The events table carries
  * sub-microsecond timestamps that Spark truncates to µs on read, so
  * event timestamps are truncated to whole seconds before output.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  // ---- exact-money helpers (mirrored verbatim into the oracle SQL) ----
  // The sources carry 2-dp money as doubles, so round(x*100) recovers
  // the exact integer cents (never a tie: x*100 sits within 1e-8 of an
  // integer; and on the rare dyadic half, both engines round away from
  // zero). All downstream arithmetic is pure int64 — codegen-friendly,
  // exact, and engine-independent. Per-row values stay ≤ ~1e11 and
  // sums ≤ ~1e17 at bench scale; a full-scale deployment would widen
  // the accumulator to decimal(38,0), which changes no digits.

  /** double (2-dp source) → exact integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  private def centsSql(x: String) = s"CAST(round($x * 100) AS BIGINT)"

  /** l_extendedprice*(1-l_discount) in exact 1e-4 units:
    * price_cents * (100 - discount_cents).
    */
  private def discPriceE4: Column =
    cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
  private val discPriceE4Sql =
    "(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)))"

  private def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  private def dateStrSql(x: String) = s"strftime($x, '%Y-%m-%d')"

  /** TPC-H nation → ISO-ish code, mirrored into the oracle CASE
    * (state_code mapping analog, ref 02 Location Entity.sql:145-175).
    */
  val nationCodes: Seq[(String, String)] = Seq(
    "ALGERIA" -> "DZ", "ARGENTINA" -> "AR", "BRAZIL" -> "BR", "CANADA" -> "CA",
    "EGYPT" -> "EG", "ETHIOPIA" -> "ET", "FRANCE" -> "FR", "GERMANY" -> "DE",
    "INDIA" -> "IN", "INDONESIA" -> "ID", "IRAN" -> "IR", "IRAQ" -> "IQ",
    "JAPAN" -> "JP", "JORDAN" -> "JO", "KENYA" -> "KE", "MOROCCO" -> "MA",
    "MOZAMBIQUE" -> "MZ", "PERU" -> "PE", "CHINA" -> "CN", "ROMANIA" -> "RO",
    "RUSSIA" -> "RU", "SAUDI ARABIA" -> "SA", "UNITED KINGDOM" -> "GB",
    "UNITED STATES" -> "US", "VIETNAM" -> "VN")

  private val nationCodeSql = nationCodes
    .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
    .mkString("CASE n_name ", " ", " ELSE 'XX' END")

  // =====================================================================
  // q01 — schema-on-read typed ingest (stage → clean cast layer).
  // Ref: 09 Order Entity.sql TRY_CAST merge + coupon 'Not Applied'.
  // =====================================================================
  val q01: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id"),
      when(col("o_orderstatus") === "O", "OPEN")
        .when(col("o_orderstatus") === "F", "FULFILLED")
        .when(col("o_orderstatus") === "P", "PENDING")
        .otherwise("UNKNOWN").as("status"),
      cents(col("o_totalprice")).as("total_amount_cents"),
      dateStr(col("o_orderdate")).as("order_date"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      coalesce(col("o_orderpriority"), lit("Not Applied")).as("priority"))

  val q01Sql: String =
    s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       | CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FULFILLED'
       |   WHEN 'P' THEN 'PENDING' ELSE 'UNKNOWN' END AS status,
       | ${centsSql("o_totalprice")} AS total_amount_cents,
       | ${dateStrSql("o_orderdate")} AS order_date,
       | CAST(year(o_orderdate) AS INT) AS order_year,
       | CAST(month(o_orderdate) AS INT) AS order_month,
       | COALESCE(o_orderpriority, 'Not Applied') AS priority
       |FROM orders""".stripMargin

  // =====================================================================
  // q02 — SCD1 latest-record-wins on the events change feed.
  // =====================================================================
  val q02: Q = (s, d) =>
    Scd1.latestByKey(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select(col("user_id"),
        col("event_id").as("last_event_id"),
        date_trunc("second", col("ts")).as("last_ts"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))

  val q02Sql: String =
    """SELECT user_id, event_id AS last_event_id,
      | date_trunc('second', ts) AS last_ts,
      | event_type AS last_event_type, value AS last_value
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin

  // =====================================================================
  // q03 — SCD2 history build (eff_start / eff_end / current_flag).
  // =====================================================================
  val q03: Q = (s, d) =>
    Scd2.buildHistory(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        date_trunc("second", col("eff_start_ts")).as("eff_start_ts"),
        date_trunc("second", col("eff_end_ts")).as("eff_end_ts"),
        col("current_flag"))

  val q03Sql: String =
    """SELECT user_id, event_id, event_type, value,
      | date_trunc('second', ts) AS eff_start_ts,
      | date_trunc('second', lead(ts) OVER w) AS eff_end_ts,
      | (lead(ts) OVER w IS NULL) AS current_flag
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // =====================================================================
  // q04 — hash surrogate keys (md5 over natural-key attrs).
  // =====================================================================
  val q04: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey").as("customer_id"),
      Funcs.surrogateKey(col("c_name"), col("c_nationkey").cast("string"),
        col("c_mktsegment")).as("customer_hk"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"))

  val q04Sql: String =
    """SELECT c_custkey AS customer_id,
      | md5(concat_ws('|', c_name, CAST(c_nationkey AS VARCHAR), c_mktsegment)) AS customer_hk,
      | c_name AS name, c_mktsegment AS segment
      |FROM customer""".stripMargin

  // =====================================================================
  // q05 — orders fact with dim joins (customer shuffled, geo broadcast).
  // =====================================================================
  val q05: Q = (s, d) => {
    val fact = FactBuilder.star(
      Tables.orders(s, d),
      Seq(
        FactBuilder.Dim(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), broadcastHint = false),
        FactBuilder.Dim(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey")),
        FactBuilder.Dim(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))))
    fact.select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("customer_id_fk"),
      col("n_nationkey").as("nation_id_fk"),
      col("r_regionkey").as("region_id_fk"),
      cents(col("o_totalprice")).as("total_amount_cents"),
      dateStr(col("o_orderdate")).as("order_date"),
      col("o_orderstatus").as("status"),
      col("c_mktsegment").as("segment"))
  }

  val q05Sql: String =
    s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id_fk,
       | n_nationkey AS nation_id_fk, r_regionkey AS region_id_fk,
       | ${centsSql("o_totalprice")} AS total_amount_cents,
       | ${dateStrSql("o_orderdate")} AS order_date,
       | o_orderstatus AS status, c_mktsegment AS segment
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey""".stripMargin

  // =====================================================================
  // q06 — order-item fact (lineitem ⋈ orders ⋈ part ⋈ supplier).
  // =====================================================================
  val q06: Q = (s, d) => {
    val fact = FactBuilder.star(
      Tables.lineitem(s, d),
      Seq(
        FactBuilder.Dim(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"), broadcastHint = false),
        FactBuilder.Dim(Tables.part(s, d), col("l_partkey") === col("p_partkey")),
        FactBuilder.Dim(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))))
    fact.select(
      col("l_orderkey").as("order_id"),
      col("l_linenumber").as("line_number"),
      col("l_partkey").as("item_id"),
      col("l_suppkey").as("supplier_id"),
      col("l_quantity").cast("long").as("quantity"),
      cents(col("l_extendedprice")).as("price_cents"),
      discPriceE4.as("subtotal_e4"),
      col("p_name").as("item_name"),
      col("s_name").as("supplier_name"),
      dateStr(col("o_orderdate")).as("order_date"))
  }

  val q06Sql: String =
    s"""SELECT l_orderkey AS order_id, l_linenumber AS line_number,
       | l_partkey AS item_id, l_suppkey AS supplier_id,
       | CAST(l_quantity AS BIGINT) AS quantity,
       | ${centsSql("l_extendedprice")} AS price_cents,
       | $discPriceE4Sql AS subtotal_e4,
       | p_name AS item_name, s_name AS supplier_name,
       | ${dateStrSql("o_orderdate")} AS order_date
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey""".stripMargin

  // =====================================================================
  // q07 — top-selling items (final_proc.sql:72-78 analog).
  // =====================================================================
  val q07: Q = (s, d) => {
    val agg = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("order_count"),
        sum(col("l_quantity").cast("long")).as("total_qty"))
    // distributed top-k (TakeOrderedAndProject), then rank the k
    // survivors — never a single-partition window over the full table
    agg.orderBy(col("order_count").desc, col("p_name").asc).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("order_count").desc, col("p_name").asc)))
      .select(col("rank").cast("long").as("rank"), col("p_name").as("item_name"),
        col("order_count"), col("total_qty"))
  }

  val q07Sql: String =
    """SELECT rank, item_name, order_count, total_qty FROM (
      | SELECT p_name AS item_name,
      |   count(*) AS order_count,
      |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
      |   row_number() OVER (ORDER BY count(*) DESC, p_name ASC) AS rank
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | GROUP BY p_name
      |) WHERE rank <= 20""".stripMargin

  // =====================================================================
  // q08 — category sales rollup (menu-category analog = p_type).
  // =====================================================================
  val q08: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type").as("category"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("total_qty"),
        sum(discPriceE4).as("revenue_e4"))

  val q08Sql: String =
    s"""SELECT p_type AS category, count(*) AS n_items,
       | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       | CAST(sum($discPriceE4Sql) AS BIGINT) AS revenue_e4
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_type""".stripMargin

  // =====================================================================
  // q09 — daily revenue / order / customer KPIs.
  // =====================================================================
  val q09: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(dateStr(col("o_orderdate")).as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"),
        countDistinct(col("o_custkey")).as("n_customers"))

  val q09Sql: String =
    s"""SELECT ${dateStrSql("o_orderdate")} AS order_date, count(*) AS n_orders,
       | CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
       | count(DISTINCT o_custkey) AS n_customers
       |FROM orders GROUP BY ${dateStrSql("o_orderdate")}""".stripMargin

  // =====================================================================
  // q10 — per-user inter-event gaps (delivery-efficiency KPI analog).
  // Integer-second math only: exact in both engines.
  // =====================================================================
  val q10: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("gap_sec",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_sec")).as("n_gaps"),
        coalesce(sum(col("gap_sec")), lit(0L)).as("total_gap_sec"),
        coalesce(min(col("gap_sec")), lit(-1L)).as("min_gap_sec"),
        coalesce(max(col("gap_sec")), lit(-1L)).as("max_gap_sec"))
      .withColumn("avg_gap_sec_floor",
        when(col("n_gaps") > 0, floor(col("total_gap_sec") / col("n_gaps")))
          .otherwise(lit(-1L)))
  }

  val q10Sql: String =
    """SELECT user_id, count(*) AS n_events, count(gap_sec) AS n_gaps,
      | CAST(COALESCE(sum(gap_sec), 0) AS BIGINT) AS total_gap_sec,
      | CAST(COALESCE(min(gap_sec), -1) AS BIGINT) AS min_gap_sec,
      | CAST(COALESCE(max(gap_sec), -1) AS BIGINT) AS max_gap_sec,
      | CASE WHEN count(gap_sec) > 0
      |   THEN CAST(floor(CAST(COALESCE(sum(gap_sec), 0) AS BIGINT) / count(gap_sec)) AS BIGINT)
      |   ELSE -1 END AS avg_gap_sec_floor
      |FROM (
      | SELECT user_id,
      |   CAST(floor(epoch(ts)) AS BIGINT)
      |     - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
      |     AS gap_sec
      | FROM events)
      |GROUP BY user_id""".stripMargin

  // =====================================================================
  // q11 — customer spend-tier segmentation (city-tier CASE analog).
  // =====================================================================
  val q11: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("spend_cents"))
    Tables.customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey").as("customer_id"),
        col("c_mktsegment").as("segment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend_cents"), lit(0L)).as("total_spend_cents"),
        Funcs.spendTier(coalesce(col("spend_cents"), lit(0L))).as("tier"))
  }

  val q11Sql: String =
    s"""SELECT c_custkey AS customer_id, c_mktsegment AS segment,
       | COALESCE(n_orders, 0) AS n_orders,
       | COALESCE(spend_cents, 0) AS total_spend_cents,
       | CASE WHEN COALESCE(spend_cents, 0) >= 30000000 THEN 'PLATINUM'
       |      WHEN COALESCE(spend_cents, 0) >= 15000000 THEN 'GOLD'
       |      WHEN COALESCE(spend_cents, 0) >= 5000000 THEN 'SILVER'
       |      ELSE 'BRONZE' END AS tier
       |FROM customer LEFT JOIN (
       | SELECT o_custkey, count(*) AS n_orders,
       |   CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS spend_cents
       | FROM orders GROUP BY o_custkey
       |) ON c_custkey = o_custkey""".stripMargin

  // =====================================================================
  // q12 — PII masking policies (name / email / balance band), applied
  // through the declarative tag layer: the query declares WHICH columns
  // carry WHICH governance tag; MaskPolicy owns the transforms.
  // =====================================================================
  val q12: Q = (s, d) => {
    val tagged = Tables.customer(s, d).select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("masked_name"),
      col("c_name").as("masked_email"),
      col("c_acctbal").as("balance_band"),
      col("c_mktsegment").as("segment"))
    graft.functions.MaskPolicy.applyTags(tagged, Map(
      "masked_name" -> "pii_name",
      "masked_email" -> "pii_email",
      "balance_band" -> "pii_balance"))
  }

  val q12Sql: String =
    """SELECT c_custkey AS customer_id,
      | rpad(substring(c_name, 1, 2), CAST(length(c_name) AS INTEGER), '*') AS masked_name,
      | concat(lower(substring(c_name, 1, 1)), '***@example.com') AS masked_email,
      | CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
      |      WHEN c_acctbal < 5000 THEN 'LOW' ELSE 'HIGH' END AS balance_band,
      | c_mktsegment AS segment
      |FROM customer""".stripMargin

  // =====================================================================
  // q13 — code-mapping enrichment (state_code analog).
  // =====================================================================
  val q13: Q = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("nation_id"),
        col("n_name").as("nation"),
        Funcs.codeMap(col("n_name"), nationCodes, lit("XX")).as("nation_code"),
        col("r_name").as("region"),
        (col("r_name") === "AMERICA").as("is_america"))

  val q13Sql: String =
    s"""SELECT n_nationkey AS nation_id, n_name AS nation,
       | $nationCodeSql AS nation_code,
       | r_name AS region, (r_name = 'AMERICA') AS is_america
       |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin

  // =====================================================================
  // q14 — login-audit-style event fact with derived time dims.
  // Spark dayofweek: Sunday=1 … Saturday=7; DuckDB Sunday=0 → +1.
  // =====================================================================
  val q14: Q = (s, d) =>
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      dateStr(col("ts")).as("event_date"),
      hour(col("ts")).as("event_hour"),
      dayofweek(col("ts")).as("dow"),
      dayofweek(col("ts")).isin(1, 7).as("is_weekend"))

  val q14Sql: String =
    s"""SELECT event_id, user_id, event_type,
       | ${dateStrSql("ts")} AS event_date,
       | CAST(hour(ts) AS INT) AS event_hour,
       | CAST(dayofweek(ts) + 1 AS INT) AS dow,
       | dayofweek(ts) IN (0, 6) AS is_weekend
       |FROM events""".stripMargin

  // =====================================================================
  // q15 — is_first_order flag (per-customer window min).
  // =====================================================================
  val q15: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, d)
      .withColumn("first_dt", min(col("o_orderdate")).over(w))
      .select(col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        dateStr(col("o_orderdate")).as("order_date"),
        (col("o_orderdate") === col("first_dt")).as("is_first_order"))
  }

  val q15Sql: String =
    s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       | ${dateStrSql("o_orderdate")} AS order_date,
       | (o_orderdate = min(o_orderdate) OVER (PARTITION BY o_custkey)) AS is_first_order
       |FROM orders""".stripMargin

  // =====================================================================
  // q16 — CDC snapshot diff → I/U/D actions (stream semantics).
  // Synthetic old/new snapshots carved deterministically from orders.
  // =====================================================================
  val q16: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val oldSnap = o.where(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("order_id"),
        cents(col("o_totalprice")).as("total_amount_cents"))
    val newSnap = o.where(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey").as("order_id"),
        (cents(col("o_totalprice")) +
          when(col("o_orderkey") % 7 === 0, lit(1000L)).otherwise(lit(0L)))
          .as("total_amount_cents"))
    Cdc.snapshotDiff(oldSnap, newSnap, Seq("order_id"), Seq("total_amount_cents"))
  }

  val q16Sql: String =
    s"""WITH oldsnap AS (
       |  SELECT o_orderkey AS order_id, ${centsSql("o_totalprice")} AS total_amount_cents
       |  FROM orders WHERE o_orderkey % 3 <> 0),
       |newsnap AS (
       |  SELECT o_orderkey AS order_id,
       |    ${centsSql("o_totalprice")}
       |      + CASE WHEN o_orderkey % 7 = 0 THEN 1000 ELSE 0 END AS total_amount_cents
       |  FROM orders WHERE o_orderkey % 5 <> 0)
       |SELECT COALESCE(o.order_id, n.order_id) AS order_id,
       |  CASE WHEN o.order_id IS NULL THEN 'I'
       |       WHEN n.order_id IS NULL THEN 'D'
       |       WHEN o.total_amount_cents <> n.total_amount_cents THEN 'U' END AS action,
       |  o.total_amount_cents AS old_total_amount_cents,
       |  n.total_amount_cents AS new_total_amount_cents
       |FROM oldsnap o FULL OUTER JOIN newsnap n ON o.order_id = n.order_id
       |WHERE o.order_id IS NULL OR n.order_id IS NULL
       |   OR o.total_amount_cents <> n.total_amount_cents""".stripMargin

  // =====================================================================
  // q17 — pricing summary (TPC-H q1 shape; headline bench query).
  // charge = extprice*(1-disc)*(1+tax) in exact 1e-6 units.
  // =====================================================================
  val q17: Q = (s, d) => {
    // price_cents * (100 - disc_cents) * (100 + tax_cents) = exact 1e-6 units
    val chargeE6 = discPriceE4 * (lit(100L) + cents(col("l_tax")))
    Tables.lineitem(s, d)
      // native timestamp predicate (parquet-pushable), equivalent to
      // cast-to-date <= 1998-09-02
      .where(col("l_shipdate") < lit("1998-09-03").cast("timestamp"))
      .groupBy(col("l_returnflag").as("return_flag"), col("l_linestatus").as("line_status"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_price_cents"),
        sum(discPriceE4).as("sum_disc_price_e4"),
        sum(chargeE6).as("sum_charge_e6"),
        count(lit(1)).as("count_order"))
  }

  val q17Sql: String = {
    val chargeE6Sql =
      s"($discPriceE4Sql * (100 + CAST(round(l_tax * 100) AS BIGINT)))"
    s"""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
       | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       | CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price_cents,
       | CAST(sum($discPriceE4Sql) AS BIGINT) AS sum_disc_price_e4,
       | CAST(sum($chargeE6Sql) AS BIGINT) AS sum_charge_e6,
       | count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate < TIMESTAMP '1998-09-03'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin
  }

  // =====================================================================
  // q18 — revenue by region/nation through the full star (TPC-H q5 shape).
  // =====================================================================
  val q18: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(discPriceE4).as("revenue_e4"),
        countDistinct(col("o_orderkey")).as("n_orders"))

  val q18Sql: String =
    s"""SELECT r_name AS region, n_name AS nation,
       | CAST(sum($discPriceE4Sql) AS BIGINT) AS revenue_e4,
       | count(DISTINCT o_orderkey) AS n_orders
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin

  // =====================================================================
  // q19 — date-filtered item-demand ranking (final_proc.sql:64 analog).
  // =====================================================================
  val q19: Q = (s, d) => {
    val agg = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("demand"),
        sum(col("l_quantity").cast("long")).as("total_qty"))
    agg.orderBy(col("demand").desc, col("p_name").asc).limit(15)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("demand").desc, col("p_name").asc)))
      .select(col("rank").cast("long").as("rank"), col("p_name").as("item_name"), col("demand"), col("total_qty"))
  }

  val q19Sql: String =
    """SELECT rank, item_name, demand, total_qty FROM (
      | SELECT p_name AS item_name, count(*) AS demand,
      |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
      |   row_number() OVER (ORDER BY count(*) DESC, p_name ASC) AS rank
      | FROM lineitem JOIN part ON l_partkey = p_partkey
      | WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      | GROUP BY p_name
      |) WHERE rank <= 15""".stripMargin

  // =====================================================================
  // q20 — as-of lookup against the SCD2 history (point-in-time dim read).
  // =====================================================================
  val q20: Q = (s, d) => {
    val hist = Scd2.buildHistory(Tables.events(s, d), Seq("user_id"), "ts", "event_id")
    Scd2.asOf(hist, lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("user_id"),
        col("event_id").as("version_event_id"),
        col("event_type"),
        date_trunc("second", col("eff_start_ts")).as("eff_start_ts"),
        date_trunc("second", col("eff_end_ts")).as("eff_end_ts"),
        col("current_flag"))
  }

  val q20Sql: String =
    """SELECT user_id, event_id AS version_event_id, event_type,
      | date_trunc('second', eff_start_ts) AS eff_start_ts,
      | date_trunc('second', eff_end_ts) AS eff_end_ts,
      | current_flag
      |FROM (
      | SELECT user_id, event_id, event_type, ts AS eff_start_ts,
      |   lead(ts) OVER w AS eff_end_ts,
      |   (lead(ts) OVER w IS NULL) AS current_flag
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |WHERE eff_start_ts <= TIMESTAMP '2024-01-15 00:00:00'
      |  AND (eff_end_ts IS NULL OR eff_end_ts > TIMESTAMP '2024-01-15 00:00:00')""".stripMargin

  // =====================================================================
  // q21 — market-basket co-occurrence: item pairs ordered together
  // (restaurant-analytics classic; co-partitioned self-join on the
  // order key — one shuffle, pairs never leave their reducer).
  // =====================================================================
  val q21: Q = (s, d) => {
    // ONE scan + ONE shuffle on the order key (guide §2.3 "aggregate
    // before you shuffle", §2.4 remove the self-join): baskets are
    // collected per order, pairs generated INSIDE the reducer. The
    // former a⋈b self-join read lineitem twice and broadcast one full
    // copy (at scale: shuffled+sorted both copies). Pair multiplicity
    // is exactly the join's: each occurrence of p × each occurrence of
    // a strictly greater q in the same order yields one pair, and
    // null keys drop like join keys (l_orderkey/l_partkey carry no
    // nulls, filters kept for exact plan parity with the join form).
    val li = Tables.lineitem(s, d)
      .where(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
    val baskets = li.groupBy(col("ok"))
      .agg(sort_array(collect_list(col("part"))).as("parts"))
    val pairs = baskets
      .select(explode(col("parts")).as("part_a"), col("parts"))
      .select(col("part_a"),
        explode(filter(col("parts"), p => p > col("part_a"))).as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders_together"))
    pairs.orderBy(col("n_orders_together").desc, col("part_a").asc, col("part_b").asc)
      .limit(25)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_orders_together").desc, col("part_a").asc, col("part_b").asc)))
      .select(col("rank").cast("long").as("rank"), col("part_a"), col("part_b"), col("n_orders_together"))
  }

  val q21Sql: String =
    """SELECT rank, part_a, part_b, n_orders_together FROM (
      | SELECT part_a, part_b, n_orders_together,
      |   row_number() OVER (ORDER BY n_orders_together DESC, part_a ASC, part_b ASC) AS rank
      | FROM (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders_together
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2))
      |WHERE rank <= 25""".stripMargin

  // =====================================================================
  // q22 — pivot / cross-tab: yearly order counts by status as columns
  // (dashboard-shaped output; Spark .pivot ↔ conditional-agg oracle).
  // =====================================================================
  val q22: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("order_year"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_fulfilled"),
        coalesce(col("P"), lit(0L)).as("n_pending"))

  val q22Sql: String =
    """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      | count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_fulfilled,
      | count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
      |FROM orders GROUP BY 1""".stripMargin

  // =====================================================================
  // q23 — semi-structured (variant/JSON) extraction: the reference's
  // `Coupons variant` column analog (03 Restaurant Entity.sql:23).
  // =====================================================================
  val q23: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("prop_k")).as("n_with_k"),
        sum(col("prop_k")).as("sum_k"),
        min(col("prop_k")).as("min_k"),
        max(col("prop_k")).as("max_k"))

  val q23Sql: String =
    """SELECT event_type, count(*) AS n_events,
      | count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      | CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY event_type""".stripMargin

  // =====================================================================
  // q24 — hourly event rollup: the batch equivalent of the streaming
  // windowedCounts (value stats as floor(v*100) ints — IEEE-exact).
  // =====================================================================
  val q24: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(floor(col("value") * 100).cast("long")).as("min_value_e2"),
        max(floor(col("value") * 100).cast("long")).as("max_value_e2"))

  val q24Sql: String =
    """SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_events,
      | count(DISTINCT user_id) AS n_users,
      | CAST(min(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_value_e2,
      | CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_value_e2
      |FROM events GROUP BY 1""".stripMargin

  // =====================================================================
  // q25 — exact distributed percentiles (p50/p90/p99 of inter-event
  // gaps per event type): explicit k-th element selection so both
  // engines pick the identical discrete value — no interpolation math.
  //
  // Scale design (two-phase selection): phase 1 reduces the gap rows to
  // a per-(event_type, gap_sec) histogram — a distributed groupBy with
  // map-side partial agg, the only pass over the full data. Phase 2
  // finds the k-th value from cumulative counts over the histogram,
  // whose size is bounded by the VALUE cardinality (distinct gap
  // seconds), not the row count — at 100 TB the per-event_type window
  // sees thousands of histogram rows, never billions of raw gaps. The
  // earlier form (row_number over every gap row of an event_type)
  // funneled all rows of a ~5-cardinality key into single tasks.
  // =====================================================================
  val q25: Q = (s, d) => {
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gaps = Tables.events(s, d)
      .withColumn("gap_sec",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wLag)))
      .where(col("gap_sec").isNotNull)
    val hist = gaps.groupBy(col("event_type"), col("gap_sec"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_sec").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    // k-th smallest value = first histogram value whose cumulative
    // count reaches k (ties share a value, so the k-th row's value and
    // the min qualifying histogram value coincide)
    def pick(p: Double) = min(when(col("cum") >= ceil(col("n") * p), col("gap_sec")))
    cum.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_gaps"),
        pick(0.5).as("p50_gap_sec"),
        pick(0.9).as("p90_gap_sec"),
        pick(0.99).as("p99_gap_sec"))
  }

  val q25Sql: String =
    """SELECT event_type, count(*) AS n_gaps,
      | CAST(max(CASE WHEN rn = ceiling(n * 0.5) THEN gap_sec END) AS BIGINT) AS p50_gap_sec,
      | CAST(max(CASE WHEN rn = ceiling(n * 0.9) THEN gap_sec END) AS BIGINT) AS p90_gap_sec,
      | CAST(max(CASE WHEN rn = ceiling(n * 0.99) THEN gap_sec END) AS BIGINT) AS p99_gap_sec
      |FROM (
      | SELECT event_type, event_id, gap_sec,
      |   row_number() OVER (PARTITION BY event_type ORDER BY gap_sec, event_id) AS rn,
      |   count(*) OVER (PARTITION BY event_type) AS n
      | FROM (
      |  SELECT event_type, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
      |      AS gap_sec
      |  FROM events)
      | WHERE gap_sec IS NOT NULL)
      |GROUP BY event_type""".stripMargin

  // =====================================================================
  // q26 — sessionization: gap-based sessions (new session when the
  // user pauses > 30 min), session ids via running sum of new-session
  // flags — two stacked windows over one shuffle on user_id.
  // =====================================================================
  val q26: Q = (s, d) => {
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("gap_sec",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(wLag)))
      .withColumn("new_session",
        when(col("gap_sec").isNull || col("gap_sec") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        date_trunc("second", min(col("ts"))).as("session_start"),
        date_trunc("second", max(col("ts"))).as("session_end"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"))
  }

  val q26Sql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      | date_trunc('second', min(ts)) AS session_start,
      | date_trunc('second', max(ts)) AS session_end,
      | CAST(floor(epoch(max(ts))) AS BIGINT)
      |   - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
      |FROM (
      | SELECT user_id, ts, event_id,
      |   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN gap_sec IS NULL OR gap_sec > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |   SELECT user_id, ts, event_id,
      |     CAST(floor(epoch(ts)) AS BIGINT)
      |       - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
      |       AS gap_sec
      |   FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  // =====================================================================
  // q27 — cohort retention: users grouped by first-seen date, activity
  // counted per day offset (window min + one aggregation).
  // =====================================================================
  val q27: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("event_day", to_date(col("ts")))
      .withColumn("cohort_day", min(to_date(col("ts"))).over(w))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_date"),
        datediff(col("event_day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active_users"),
        count(lit(1)).as("n_events"))
  }

  val q27Sql: String =
    """SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_date,
      | CAST(date_diff('day', cohort_day, event_day) AS INT) AS day_offset,
      | count(DISTINCT user_id) AS n_active_users, count(*) AS n_events
      |FROM (
      | SELECT user_id, CAST(ts AS DATE) AS event_day,
      |   min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
      | FROM events)
      |GROUP BY 1, 2""".stripMargin

  // =====================================================================
  // q28 — built-in session_window (the streaming-native session
  // operator; q26 is the manual window-composition twin). Same 30-min
  // gap semantics, oracled by the same gap/running-sum SQL.
  // =====================================================================
  val q28: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_trunc("second", col("sw.start")).as("session_start"),
        col("n_events"))

  // session_window's end = last_ts + gap; its start = first event ts.
  // The oracle reproduces sessions via the gap/running-sum formulation
  // and emits the same (user, first-event-second, count) triples.
  val q28Sql: String =
    """SELECT user_id, date_trunc('second', min(ts)) AS session_start,
      | count(*) AS n_events
      |FROM (
      | SELECT user_id, ts,
      |   CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      | FROM (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN gap_sec IS NULL OR gap_sec > 1800 THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |   SELECT user_id, ts, event_id,
      |     epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |       AS gap_sec
      |   FROM events)))
      |GROUP BY user_id, session_id""".stripMargin

  // =====================================================================
  // q29 — anti/semi-join surface: customers who never ordered, and
  // (for contrast) one row per customer who did (left_anti + left_semi
  // — both shuffle-free on the probe side when the build broadcasts).
  // =====================================================================
  val q29: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("customer_id"),
        col("c_mktsegment").as("segment"),
        lit(false).as("has_orders"))
      .unionByName(
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey").as("customer_id"),
            col("c_mktsegment").as("segment"),
            lit(true).as("has_orders")))
  }

  val q29Sql: String =
    """SELECT c_custkey AS customer_id, c_mktsegment AS segment, FALSE AS has_orders
      |FROM customer WHERE NOT EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |UNION ALL
      |SELECT c_custkey AS customer_id, c_mktsegment AS segment, TRUE AS has_orders
      |FROM customer WHERE EXISTS
      |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  // =====================================================================
  // q30 — incremental aggregate maintenance: merge yesterday's partial
  // aggregates with today's delta by re-aggregating the partials
  // (sum/count are algebraic) — never a full-history rescan. The
  // oracle IS the full recompute, proving incremental == full.
  // =====================================================================
  val q30: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def dailyAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(dateStr(col("o_orderdate")).as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))
    val existing = dailyAgg(o.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")))
    val delta = dailyAgg(o.where(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")))
    existing.unionByName(delta)
      .groupBy(col("order_date"))
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("revenue_cents")).as("revenue_cents"))
  }

  val q30Sql: String =
    s"""SELECT ${dateStrSql("o_orderdate")} AS order_date,
       | count(*) AS n_orders,
       | CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents
       |FROM orders GROUP BY 1""".stripMargin

  // =====================================================================
  // q31 — range join: events → overlapping 2-day windows built from
  // the event calendar, via the gridded RangeJoin operator (equi-join
  // on time cells + exact filter — no theta-join explosion).
  // =====================================================================
  val q31: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val intervals = ev.select(to_date(col("ts")).as("day")).distinct()
      .select(date_format(col("day"), "yyyy-MM-dd").as("interval_id"),
        col("day").cast("timestamp").as("start_ts"),
        date_add(col("day"), 2).cast("timestamp").as("end_ts"))
    graft.operators.RangeJoin.pointInInterval(ev, intervals,
        "ts", "start_ts", "end_ts", bucketWidth = 86400L)
      .groupBy(col("interval_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val q31Sql: String =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
      |iv AS (SELECT strftime(day, '%Y-%m-%d') AS interval_id,
      |         CAST(day AS TIMESTAMP) AS s,
      |         CAST(day + INTERVAL 2 DAY AS TIMESTAMP) AS e
      |       FROM days)
      |SELECT interval_id, count(*) AS n_events,
      | count(DISTINCT user_id) AS n_users
      |FROM events JOIN iv ON ts >= s AND ts < e
      |GROUP BY interval_id""".stripMargin

  // =====================================================================
  // q32 — ROLLUP subtotals (dashboard total/subtotal shape): one
  // aggregate with grouping-set expansion — partial aggregation still
  // applies, so the rollup costs one shuffle like the flat groupBy.
  // The agg level is re-derived from the rollup NULLs (portable across
  // engines — no grouping_id() dependency); source cols are never null
  // in this schema so the derivation is unambiguous.
  // =====================================================================
  val q32: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("gross_cents"),
        sum(discPriceE4).as("disc_price_e4"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("return_flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("line_status"),
        when(col("l_returnflag").isNull, 2L)
          .when(col("l_linestatus").isNull, 1L)
          .otherwise(0L).as("agg_level"),
        col("n_items"), col("gross_cents"), col("disc_price_e4"))

  val q32Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
       | coalesce(l_linestatus, 'ALL') AS line_status,
       | CAST(CASE WHEN l_returnflag IS NULL THEN 2
       |           WHEN l_linestatus IS NULL THEN 1
       |           ELSE 0 END AS BIGINT) AS agg_level,
       | count(*) AS n_items,
       | CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS gross_cents,
       | CAST(sum($discPriceE4Sql) AS BIGINT) AS disc_price_e4
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // =====================================================================
  // q33 — analytic-window suite per customer order stream: sequence
  // number, running total, 3-order moving sum/avg, quartile bucket.
  // One shuffle on the partition key serves every window (same spec);
  // all arithmetic integer-exact, ordering made total by the
  // (date, orderkey) tiebreak.
  // =====================================================================
  val q33: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val w3 = w.rowsBetween(-2, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).select(
      col("o_custkey").as("customer_id"),
      col("o_orderkey").as("order_id"),
      dateStr(col("o_orderdate")).as("order_date"),
      row_number().over(w).cast("long").as("order_seq"),
      sum(cents(col("o_totalprice"))).over(wAll).as("running_cents"),
      sum(cents(col("o_totalprice"))).over(w3).as("ma3_sum_cents"),
      count(lit(1)).over(w3).as("ma3_n"),
      floor(sum(cents(col("o_totalprice"))).over(w3).cast("double") /
        count(lit(1)).over(w3)).as("ma3_cents"),
      ntile(4).over(w).cast("long").as("spend_quartile"))
  }

  val q33Sql: String =
    s"""SELECT o_custkey AS customer_id, o_orderkey AS order_id,
       | ${dateStrSql("o_orderdate")} AS order_date,
       | row_number() OVER w AS order_seq,
       | CAST(sum(${centsSql("o_totalprice")}) OVER
       |   (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
       | CAST(sum(${centsSql("o_totalprice")}) OVER
       |   (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma3_sum_cents,
       | count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma3_n,
       | CAST(floor(CAST(sum(${centsSql("o_totalprice")}) OVER
       |     (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) /
       |   count(*) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS BIGINT) AS ma3_cents,
       | ntile(4) OVER w AS spend_quartile
       |FROM orders
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin

  // =====================================================================
  // q34 — salted-join equivalence: the skew fallback (left side salted
  // into 8 sub-keys, dim replicated ×8) must produce byte-identical
  // results to the plain join — proven by the oracle, which IS the
  // plain join. The aggregate keeps the output small.
  // =====================================================================
  val q34: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("okey"), cents(col("l_extendedprice")).as("price_cents"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), col("o_orderstatus").as("status"))
    graft.operators.Skew.saltedJoin(li, o, "okey", buckets = 8)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("price_cents")).as("total_cents"))
  }

  val q34Sql: String =
    s"""SELECT o_orderstatus AS status, count(*) AS n_items,
       | CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS total_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus""".stripMargin

  // =====================================================================
  // q35 — bloom-prefiltered semi-join (the runtime-filter pattern as
  // an explicit operator): a metadata-sized bitset built over the
  // selective side's keys pre-filters the fact table BEFORE the join
  // shuffle; the exact semi-join removes false positives, so
  // bloom + join ≡ join — which is precisely what the oracle asserts.
  // =====================================================================
  val q35: Q = (s, d) => {
    val hv = Tables.orders(s, d)
      .where(col("o_totalprice") > 400000.0d).select(col("o_orderkey"))
    graft.operators.Bloom.bloomSemiJoin(
        Tables.lineitem(s, d), hv, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("gross_cents"))
  }

  val q35Sql: String =
    s"""SELECT l_returnflag, count(*) AS n_items,
       | CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS gross_cents
       |FROM lineitem
       |WHERE l_orderkey IN
       |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
       |GROUP BY l_returnflag""".stripMargin

  // =====================================================================
  // q36 — set operations (INTERSECT / EXCEPT): retained vs churned
  // buyer cohorts across two years. Both set ops hash-shuffle on the
  // full row — here a single deduped key column, so the exchanges are
  // key-sized, not fact-sized. Orders is scanned ONCE: a single
  // conditional-aggregation pass (one shuffle) builds the per-customer
  // year flags; the cohort frames the set ops consume are projections
  // of that cached key-sized frame — the r2 form planned each cohort
  // twice (once under INTERSECT, once under EXCEPT) = four fact scans.
  // =====================================================================
  val q36: Q = (s, d) => {
    val y = year(col("o_orderdate"))
    val flags = Tables.orders(s, d)
      .where(y.isin(1997, 1998))
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(max(y === 1997).as("__in97"), max(y === 1998).as("__in98"))
      .transform(graft.Caching.persistTracked(_))
    val b97 = flags.where(col("__in97")).select("customer_id")
    val b98 = flags.where(col("__in98")).select("customer_id")
    b97.intersect(b98)
      .withColumn("cohort", lit("retained"))
      .unionByName(b97.except(b98)
        .withColumn("cohort", lit("churned")))
  }

  val q36Sql: String =
    """SELECT customer_id, 'retained' AS cohort FROM (
      | SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1997
      | INTERSECT
      | SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1998)
      |UNION ALL
      |SELECT customer_id, 'churned' AS cohort FROM (
      | SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1997
      | EXCEPT
      | SELECT DISTINCT o_custkey AS customer_id FROM orders WHERE year(o_orderdate) = 1998)""".stripMargin

  // =====================================================================
  // q37 — CUBE grouping sets (the full dashboard cross-tab shape: every
  // (year, status) margin in ONE aggregate). Like q32's ROLLUP, the
  // grouping-set expansion still does partial aggregation — one
  // shuffle, 4× the group cardinality (still tiny), no extra scans.
  // Agg level re-derived from the cube NULLs (engine-portable; source
  // cols never null here).
  // =====================================================================
  val q37: Q = (s, d) => {
    val base = Tables.orders(s, d).select(
      year(col("o_orderdate")).cast("long").as("order_year"),
      col("o_orderstatus").as("status"),
      cents(col("o_totalprice")).as("cents"))
    base.cube(col("order_year"), col("status"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
      .select(
        coalesce(col("order_year"), lit(-1L)).as("order_year"),
        coalesce(col("status"), lit("ALL")).as("status"),
        when(col("order_year").isNull && col("status").isNull, 3L)
          .when(col("order_year").isNull, 2L)
          .when(col("status").isNull, 1L)
          .otherwise(0L).as("agg_level"),
        col("n_orders"), col("total_cents"))
  }

  val q37Sql: String =
    s"""WITH base AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       |  o_orderstatus AS status, ${centsSql("o_totalprice")} AS cents FROM orders)
       |SELECT coalesce(order_year, -1) AS order_year,
       | coalesce(status, 'ALL') AS status,
       | CAST(CASE WHEN order_year IS NULL AND status IS NULL THEN 3
       |           WHEN order_year IS NULL THEN 2
       |           WHEN status IS NULL THEN 1
       |           ELSE 0 END AS BIGINT) AS agg_level,
       | count(*) AS n_orders,
       | CAST(sum(cents) AS BIGINT) AS total_cents
       |FROM base GROUP BY CUBE(order_year, status)""".stripMargin

  // =====================================================================
  // q38 — UNPIVOT (wide metrics → long (metric, value) rows, the
  // dashboard-feed normalization). Spark's native melt: ids stay, each
  // value column becomes a row — a narrow map over the aggregated
  // frame, no extra shuffle beyond the one daily aggregation. Oracle
  // is the engine-portable UNION ALL formulation of the same melt.
  // =====================================================================
  val q38: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(dateStr(col("o_orderdate")).as("order_date"))
      .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"),
        count(lit(1)).as("n_orders"))
      .unpivot(Array(col("order_date")),
        Array(col("revenue_cents"), col("n_orders")), "metric", "value")

  val q38Sql: String =
    s"""WITH daily AS (SELECT ${dateStrSql("o_orderdate")} AS order_date,
       |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS revenue_cents,
       |  count(*) AS n_orders
       |FROM orders GROUP BY 1)
       |SELECT order_date, 'revenue_cents' AS metric, revenue_cents AS value FROM daily
       |UNION ALL
       |SELECT order_date, 'n_orders' AS metric, n_orders AS value FROM daily""".stripMargin

  // =====================================================================
  // q39 — arbitrary GROUPING SETS: two different dimension pairs plus
  // the grand total in ONE aggregate — the grouping-set shape that is
  // NOT expressible as ROLLUP (q32) or CUBE (q37) of the same columns.
  // Still one scan + one shuffle with partial aggregation; the
  // expansion multiplies group cardinality (tiny), never input rows.
  // Agg level re-derived from the set's NULL pattern (engine-portable).
  // =====================================================================
  val q39: Q = (s, d) => {
    // agg_level is re-derived from grouping-set NULLs, so a genuinely
    // NULL source year would masquerade as the grand total — excluded
    // explicitly (both sides) rather than relying on data convention
    val base = Tables.orders(s, d)
      .where(col("o_orderdate").isNotNull)
      .select(
        year(col("o_orderdate")).cast("long").as("order_year"),
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        cents(col("o_totalprice")).as("cents"))
    base.groupingSets(
        Seq(Seq(col("order_year"), col("status")),
            Seq(col("order_year"), col("priority")),
            Seq.empty),
        col("order_year"), col("status"), col("priority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
      .select(
        coalesce(col("order_year"), lit(-1L)).as("order_year"),
        coalesce(col("status"), lit("ALL")).as("status"),
        coalesce(col("priority"), lit("ALL")).as("priority"),
        when(col("order_year").isNull, 2L)
          .when(col("priority").isNull, 0L)
          .otherwise(1L).as("agg_level"),
        col("n_orders"), col("total_cents"))
  }

  val q39Sql: String =
    s"""WITH base AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       |  o_orderstatus AS status, o_orderpriority AS priority,
       |  ${centsSql("o_totalprice")} AS cents FROM orders
       |  WHERE o_orderdate IS NOT NULL)
       |SELECT coalesce(order_year, -1) AS order_year,
       | coalesce(status, 'ALL') AS status,
       | coalesce(priority, 'ALL') AS priority,
       | CAST(CASE WHEN order_year IS NULL THEN 2
       |           WHEN priority IS NULL THEN 0
       |           ELSE 1 END AS BIGINT) AS agg_level,
       | count(*) AS n_orders,
       | CAST(sum(cents) AS BIGINT) AS total_cents
       |FROM base GROUP BY GROUPING SETS ((order_year, status), (order_year, priority), ())""".stripMargin

  // =====================================================================
  // q40 — ordered funnel analysis (view → click → purchase per user,
  // each stage strictly after the previous one's FIRST completion) —
  // the product-analytics shape behind every conversion dashboard.
  // Three conditional min-aggregations, all keyed on user_id: after
  // the first groupBy the data is hash-partitioned on the key, so the
  // later joins and aggs reuse that partitioning instead of
  // re-shuffling; nothing ever carries more than (user_id, ts).
  // =====================================================================
  val q40: Q = (s, d) => {
    val e = Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type"))
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val c = e.where(col("event_type") === "click")
      .join(v, Seq("user_id")).where(col("ts") > col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, Seq("user_id")).where(col("ts") > col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purch_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("purch_ts").isNotNull, 3L)
          .when(col("click_ts").isNotNull, 2L)
          .otherwise(1L).as("funnel_stage"))
  }

  val q40Sql: String =
    """WITH e AS (SELECT user_id, ts, event_type FROM events),
      |v AS (SELECT user_id, min(ts) AS view_ts FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts) AS click_ts FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts > view_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts) AS purch_ts FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts > click_ts GROUP BY e.user_id)
      |SELECT v.user_id,
      | CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
      |           WHEN c.user_id IS NOT NULL THEN 2
      |           ELSE 1 END AS BIGINT) AS funnel_stage
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin

  // ---------------------------------------------------------------------

  val all: Map[String, Q] = Map(
    "q37_cube" -> q37,
    "q38_unpivot" -> q38,
    "q39_grouping_sets" -> q39,
    "q40_funnel" -> q40,
    "q36_set_ops" -> q36,
    "q35_bloom_semi_join" -> q35,
    "q33_window_suite" -> q33,
    "q34_salted_join" -> q34,
    "q32_rollup" -> q32,
    "q31_range_join" -> q31,
    "q21_market_basket" -> q21,
    "q22_status_pivot" -> q22,
    "q23_props_json" -> q23,
    "q24_hourly_events" -> q24,
    "q25_gap_percentiles" -> q25,
    "q26_sessionization" -> q26,
    "q27_cohort_retention" -> q27,
    "q28_session_window" -> q28,
    "q29_never_ordered" -> q29,
    "q30_incremental_agg" -> q30,
    "q01_typed_ingest" -> q01,
    "q02_scd1_latest" -> q02,
    "q03_scd2_history" -> q03,
    "q04_surrogate_keys" -> q04,
    "q05_orders_fact" -> q05,
    "q06_order_item_fact" -> q06,
    "q07_top_items" -> q07,
    "q08_category_sales" -> q08,
    "q09_daily_revenue_kpi" -> q09,
    "q10_delivery_efficiency" -> q10,
    "q11_customer_segmentation" -> q11,
    "q12_pii_masking" -> q12,
    "q13_region_mapping" -> q13,
    "q14_login_audit_fact" -> q14,
    "q15_first_order" -> q15,
    "q16_cdc_diff" -> q16,
    "q17_pricing_summary" -> q17,
    "q18_region_revenue" -> q18,
    "q19_item_demand_window" -> q19,
    "q20_scd2_asof" -> q20)

  val oracles: Map[String, String] = Map(
    "q37_cube" -> q37Sql,
    "q38_unpivot" -> q38Sql,
    "q39_grouping_sets" -> q39Sql,
    "q40_funnel" -> q40Sql,
    "q21_market_basket" -> q21Sql,
    "q22_status_pivot" -> q22Sql,
    "q23_props_json" -> q23Sql,
    "q24_hourly_events" -> q24Sql,
    "q25_gap_percentiles" -> q25Sql,
    "q26_sessionization" -> q26Sql,
    "q27_cohort_retention" -> q27Sql,
    "q28_session_window" -> q28Sql,
    "q29_never_ordered" -> q29Sql,
    "q30_incremental_agg" -> q30Sql,
    "q31_range_join" -> q31Sql,
    "q32_rollup" -> q32Sql,
    "q33_window_suite" -> q33Sql,
    "q34_salted_join" -> q34Sql,
    "q35_bloom_semi_join" -> q35Sql,
    "q36_set_ops" -> q36Sql,
    "q01_typed_ingest" -> q01Sql,
    "q02_scd1_latest" -> q02Sql,
    "q03_scd2_history" -> q03Sql,
    "q04_surrogate_keys" -> q04Sql,
    "q05_orders_fact" -> q05Sql,
    "q06_order_item_fact" -> q06Sql,
    "q07_top_items" -> q07Sql,
    "q08_category_sales" -> q08Sql,
    "q09_daily_revenue_kpi" -> q09Sql,
    "q10_delivery_efficiency" -> q10Sql,
    "q11_customer_segmentation" -> q11Sql,
    "q12_pii_masking" -> q12Sql,
    "q13_region_mapping" -> q13Sql,
    "q14_login_audit_fact" -> q14Sql,
    "q15_first_order" -> q15Sql,
    "q16_cdc_diff" -> q16Sql,
    "q17_pricing_summary" -> q17Sql,
    "q18_region_revenue" -> q18Sql,
    "q19_item_demand_window" -> q19Sql,
    "q20_scd2_asof" -> q20Sql)
}

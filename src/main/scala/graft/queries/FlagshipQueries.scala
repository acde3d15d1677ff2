package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession.table
import graft.operators.{AsOf, Joins, Records}
import Records._

/** Composite analytical queries in the TPC-H idiom, built from the graft
  * operator algebra end-to-end (scan → join family → branch → summarize).
  * These are the bench headliners: multi-operator plans whose shape at
  * 100 TB is shuffle-on-join-key + partial aggregation, with the small
  * dimensions broadcast.
  */
object FlagshipQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    /** Last-touch attribution over the event stream: each purchase is
      * chained to ITS latest prior click (as-of join), and that click to
      * its latest prior view — two single-shuffle as-of joins, no range
      * explosion — then per-user funnel counts with 1-hour windows.
      * Tie-robust by construction (only the matched timestamps feed the
      * counts); oracle = DuckDB's native ASOF joins.
      */
    "flagship_attribution" -> { (s, dir) =>
      val ev = table(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      val pc = AsOf.asofJoin(p, c, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "click_ts",
        rightPayload = Seq("click_id", "click_ts"), rightTieBreak = Seq("click_id"))
      val pcv = AsOf.asofJoin(pc, v, keys = Seq("user_id"),
        leftTime = "click_ts", rightTime = "view_ts",
        rightPayload = Seq("view_id", "view_ts"), rightTieBreak = Seq("view_id"))
      val clickAttr = col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
      val fullChain = clickAttr && col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR")
      pcv.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(when(clickAttr, 1)).as("n_click_attributed"),
          count(when(fullChain, 1)).as("n_full_chain"))
    },

    /** Pricing summary (TPC-H Q1 shape): wide aggregation over lineitem
      * with exact decimal arithmetic, pinned to a ship-date horizon.
      */
    "flagship_pricing" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .update(
          "disc_price" -> (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))),
          "charge" -> (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))
            * (lit(1).cast(DecimalType(3, 2)) + dec(col("l_tax")))))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(28, 2)).cast(DoubleType).as("sum_base_price"),
          sum(col("disc_price")).cast(DecimalType(28, 4)).cast(DoubleType).as("sum_disc_price"),
          sum(col("charge")).cast(DecimalType(28, 6)).cast(DoubleType).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },

    /** Shipping priority (TPC-H Q3 shape): selective customer segment
      * broadcast-joined to orders, shuffled join to lineitem, top revenue
      * per order. The segment filter prunes at the scan; the customer side
      * is broadcast (dimension-sized), lineitem shuffles once on orderkey.
      */
    "flagship_shipping" -> { (s, dir) =>
      val cust = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      val orders = Joins.masterCheck(
        tx = table(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15").cast(TimestampType)),
        master = cust, keys = Seq("o_custkey"), broadcastMaster = true).found
        .withColumnRenamed("o_orderkey", "l_orderkey")
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1995-03-15").cast(TimestampType))
        .update("revenue" -> (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))))
      Joins.masterJoin(
        tx = li, master = orders, keys = Seq("l_orderkey"),
        output = Seq(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority")),
        uniqueMaster = true).found
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("revenue")).cast(DecimalType(28, 4)).cast(DoubleType).as("revenue"))
    },

    /** Local supplier volume (TPC-H Q5 shape): two broadcast dimension
      * hops (region→nation) then shuffled joins through customer, orders,
      * lineitem, supplier with a nation-match branch.
      */
    "flagship_volume" -> { (s, dir) =>
      val nations = Joins.masterJoin(
        tx = table(s, dir, "nation"),
        master = table(s, dir, "region").filter(col("r_name") === "ASIA")
          .withColumnRenamed("r_regionkey", "n_regionkey"),
        keys = Seq("n_regionkey"),
        output = Seq(col("n_nationkey"), col("n_name")),
        broadcastMaster = true, uniqueMaster = true).found
      val cust = Joins.masterJoin(
        tx = table(s, dir, "customer"),
        master = nations.withColumnRenamed("n_nationkey", "c_nationkey"),
        keys = Seq("c_nationkey"),
        output = Seq(col("c_custkey").as("o_custkey"), col("c_nationkey"), col("n_name")),
        broadcastMaster = true, uniqueMaster = true).found
      val ord = Joins.masterJoin(
        tx = table(s, dir, "orders"),
        master = cust, keys = Seq("o_custkey"),
        output = Seq(col("o_orderkey").as("l_orderkey"), col("c_nationkey"), col("n_name")),
        uniqueMaster = true).found
      val li = table(s, dir, "lineitem")
        .update("revenue" -> (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(3, 2)) - dec(col("l_discount")))))
        .project("l_orderkey", "l_suppkey", "revenue")
      val joined = Joins.masterJoin(
        tx = li, master = ord, keys = Seq("l_orderkey"),
        output = Seq(col("l_suppkey"), col("c_nationkey"), col("n_name"), col("revenue")),
        uniqueMaster = true).found
      // keep only lineitems whose supplier sits in the same nation
      val supp = table(s, dir, "supplier").select(col("s_suppkey").as("l_suppkey"),
        col("s_nationkey").as("c_nationkey"))
      joined.join(broadcast(supp), Seq("l_suppkey", "c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("revenue")).cast(DecimalType(28, 4)).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    /** Event-analytics capstone chaining this round's surface: JSON
      * payload extraction (codegen'd path eval in the scan stage) →
      * broadcast dimension enrichment → gap-sessionization (one
      * user-keyed exchange) → per-segment session quality stats, all
      * integer/exact. Plan shape at 100 TB: scan-stage parse, one
      * broadcast join, ONE shuffle (by user) feeding lag + cumsum +
      * session aggregation, then a segment-keyed partial aggregation of
      * session-count-sized data.
      */
    "flagship_events" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
      val dim = table(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val sessions = graft.operators.Sessionize.assign(ev,
          user = "user_id", ts = "ts", gapSeconds = 86400L,
          tieBreak = Seq("event_id"))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
      sessions.join(broadcast(dim), "user_id")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          sum(col("sum_k")).as("sum_k"))
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "flagship_events" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events
        |),
        |l AS (
        |  SELECT user_id, event_id, us, k,
        |         CASE WHEN lag(us) OVER w IS NULL
        |                OR us - lag(us) OVER w > 86400000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |),
        |s AS (
        |  SELECT user_id, k,
        |         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
        |  FROM l
        |),
        |sess AS (
        |  SELECT user_id, seq, CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(SUM(k) AS BIGINT) AS sum_k
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        |       CAST(SUM(sum_k) AS BIGINT) AS sum_k
        |FROM sess JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin,
    "flagship_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'),
        |pc AS (
        |  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS click_ts
        |  FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |), pcv AS (
        |  SELECT pc.*, v.view_id, v.ts AS view_ts
        |  FROM pc ASOF LEFT JOIN v ON pc.user_id = v.user_id AND v.ts <= pc.click_ts
        |)
        |SELECT user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(COUNT(CASE WHEN click_ts >= ts - INTERVAL 1 HOUR THEN 1 END) AS BIGINT)
        |         AS n_click_attributed,
        |       CAST(COUNT(CASE WHEN click_ts >= ts - INTERVAL 1 HOUR
        |                        AND view_ts >= click_ts - INTERVAL 1 HOUR THEN 1 END) AS BIGINT)
        |         AS n_full_chain
        |FROM pcv GROUP BY 1""".stripMargin,
    "flagship_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_base_price,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_charge,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin,
    "flagship_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY 1, 2, 3""".stripMargin,
    "flagship_volume" ->
      """SELECT n_name,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY 1""".stripMargin
  )
}

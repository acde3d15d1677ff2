package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession.{table, tableSpread}
import graft.model._
import graft.operators.{Groups, Joins, Records, Views}
import graft.operators.Groups.{SummarizeOp, SummarizeSpec}
import Records._

/** Coverage queries for the reference operator inventory (SURVEY.md §2),
  * one per operator, each with a DuckDB oracle in [[oracles]].
  *
  * Oracle-parity conventions (the driver hash-compares values):
  *  - money arithmetic is done in DECIMAL (cast at input, explicit result
  *    cast) so Spark and DuckDB agree bit-for-bit;
  *  - double aggregates only where exact (integral-valued doubles, or
  *    min/max which pick existing values);
  *  - counts / integral sums are pinned to BIGINT on both sides;
  *  - raw timestamp passthrough only for ms-precision columns (events.ts
  *    is ns — truncated before use).
  */
/** Fold accumulator for the `fold` query (top level: Catalyst encoders
  * need a stable, outer-free class).
  */
final case class FoldAcc(l_returnflag: String, qty: Double, cnt: Long)

/** Narrow typed views: select the needed columns BEFORE `.as[T]` so the
  * encoder materializes 2-4 fields, not the full 11-column row — at scale
  * the deserialization boundary dominates typed-operator cost.
  */
final case class LineQty(l_orderkey: Long, l_quantity: Double)
final case class LineShip(l_orderkey: Long, l_linenumber: Int,
    l_shipdate: java.sql.Timestamp, l_quantity: Double)
final case class LinePrice(l_orderkey: Long, l_linenumber: Int, l_extendedprice: Double)
final case class SupplierBal(s_suppkey: Long, s_nationkey: Int, s_acctbal: Double)
final case class CustomerNation(c_custkey: Long, c_nationkey: Int)
final case class OrderStatus(o_orderkey: Long, o_orderstatus: String)

object CoreQueries {

  private def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** revenue = extendedprice * (1 - discount), exact decimal arithmetic. */
  private def revenue: Column =
    (money(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(DecimalType(3, 2)) - money(col("l_discount"))))
      .cast(DecimalType(18, 4)).cast(DoubleType).as("revenue")

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ---- record-level operators -----------------------------------------
    "extract" -> { (s, dir) =>
      import s.implicits._
      // 1 record -> 2 output records (multi-emit), typed flatMap path
      table(s, dir, "lineitem").as[Lineitem].extract { li =>
        Seq(("base", li.l_orderkey, li.l_linenumber, li.l_extendedprice),
            ("qty", li.l_orderkey, li.l_linenumber, li.l_quantity))
      }.toDF("kind", "l_orderkey", "l_linenumber", "amount")
    },

    "extract_multi" -> { (s, dir) =>
      import s.implicits._
      // multi-input Extract vertex: two upstream branches restructured to a
      // common shape, unioned, then one extract pass (reference:
      // runtime/.../graph/Extract.scala:51-67 multi-input case)
      val shape = StructType(Seq(
        StructField("key", LongType), StructField("name", StringType)))
      val a = table(s, dir, "region")
        .select(col("r_regionkey").cast(LongType).as("key"), col("r_name").as("name"))
      val b = table(s, dir, "nation")
        .select(col("n_nationkey").cast(LongType).as("key"), col("n_name").as("name"))
      a.unionAll(b).restructure(shape).as[(Long, String)]
        .extract { case (k, n) => Seq((k, n, n.length)) }
        .toDF("key", "name", "name_len")
    },

    "update" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .update("revenue" -> revenue)
        .filter(col("l_shipdate") < lit("1995-09-01").cast(TimestampType))
        .project("l_orderkey", "l_linenumber", "revenue")
    },

    "convert" -> { (s, dir) =>
      val (converted, _) = table(s, dir, "orders").convert(
        col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1).cast(IntegerType).as("priority_num"))
      converted
    },

    "branch" -> { (s, dir) =>
      table(s, dir, "orders")
        .branch(col("o_orderstatus"), tagCol = "status_tag")
        .port("F")
        .project("o_orderkey", "o_totalprice")
    },

    "split" -> { (s, dir) =>
      val j = Joins.masterJoin(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        output = Seq(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"), col("o_orderpriority")),
        masterOrder = Nil, uniqueMaster = true).found
      // hold the joined record, then split it back into its two pieces
      val (left, _) = j.split(
        left = Seq("l_orderkey", "o_orderstatus", "o_orderpriority"),
        right = Seq("l_orderkey", "l_linenumber"))
      left.distinct()
    },

    "logging" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .logging("lineitem_feed", count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .project("l_orderkey", "l_linenumber", "l_quantity")
    },

    "project" -> { (s, dir) =>
      table(s, dir, "part").project("p_partkey", "p_name", "p_retailprice")
    },

    "extend" -> { (s, dir) =>
      table(s, dir, "region").extend(
        "r_comment" -> lit(null).cast(StringType),
        "r_upper" -> upper(col("r_name")))
    },

    "restructure" -> { (s, dir) =>
      table(s, dir, "supplier").restructure(StructType(Seq(
        StructField("s_suppkey", LongType),
        StructField("s_name", StringType),
        StructField("s_phone", StringType),    // not in source -> typed null
        StructField("s_nationkey", LongType)))) // int -> long widening cast
    },

    "checkpoint" -> { (s, dir) =>
      // one scan feeds two aggregation branches; persist = recompute barrier
      val li = table(s, dir, "lineitem").project("l_returnflag", "l_linestatus", "l_orderkey")
        .checkpointBarrier()
      val byFlag = li.groupBy(col("l_returnflag").as("key")).agg(count(lit(1)).as("cnt"))
        .withColumn("side", lit("flag"))
      val byStatus = li.groupBy(col("l_linestatus").as("key")).agg(count(lit(1)).as("cnt"))
        .withColumn("side", lit("status"))
      byFlag.unionAll(byStatus)
    },

    // ---- group-level operators ------------------------------------------
    "cogroup" -> { (s, dir) =>
      import s.implicits._
      Groups.cogroup(
        table(s, dir, "orders").select("o_orderkey", "o_orderstatus").as[OrderStatus],
        table(s, dir, "lineitem").select("l_orderkey", "l_quantity").as[LineQty])(
        _.o_orderkey, _.l_orderkey) { (k, os, ls) =>
        val items = ls.toSeq
        os.map { o =>
          (k, o.o_orderstatus, items.size.toLong, items.iterator.map(_.l_quantity).sum)
        }
      }.toDF("o_orderkey", "o_orderstatus", "n_items", "total_qty")
    },

    /** n-ary cogroup (reference `smcogroup` is n-ary; our 2-way `cogroup`
      * can't express this without a second shuffle): nation × supplier ×
      * customer per nationkey in ONE shuffle — nation name, supplier count,
      * customer count and max balance per group. Customer (the biggest
      * input) is last, so it streams; nation/supplier are buffered.
      */
    "cogroup3" -> { (s, dir) =>
      val nation = table(s, dir, "nation").select(col("n_nationkey").as("k"), col("n_name"))
      val supplier = table(s, dir, "supplier").select(col("s_nationkey").as("k"), col("s_suppkey"))
      val customer = table(s, dir, "customer")
        .select(col("c_nationkey").as("k"), col("c_custkey"), col("c_acctbal"))
      val out = StructType(Seq(
        StructField("k", IntegerType), StructField("n_name", StringType),
        StructField("n_suppliers", LongType), StructField("n_customers", LongType),
        StructField("max_acctbal", DoubleType)))
      Groups.cogroupN(
        Seq(nation, supplier, customer), keys = Seq("k"),
        orders = Seq(Nil, Seq("s_suppkey"), Seq("c_custkey")), outSchema = out) { (key, its) =>
        val name = its(0).map(_.getString(1)).nextOption().orNull
        val nSupp = its(1).size.toLong
        var nCust = 0L
        var maxBal: java.lang.Double = null
        its(2).foreach { c =>
          nCust += 1
          val b = c.getDouble(2)
          if (maxBal == null || b > maxBal) maxBal = b
        }
        Iterator.single(Row(key.getInt(0), name, nSupp, nCust, maxBal))
      }
    },

    "groupsort" -> { (s, dir) =>
      import s.implicits._
      // last-shipped lineitem per order (secondary sort, one-pass group scan)
      Groups.groupSort(table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity").as[LineShip])(_.l_orderkey)(
        col("l_shipdate").desc, col("l_linenumber").asc, col("l_quantity").asc) { (_, it) =>
        Iterator.single(it.next())
      }.select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity"))
    },

    "fold" -> { (s, dir) =>
      import s.implicits._
      val accs = table(s, dir, "lineitem").select("l_returnflag", "l_quantity")
        .withColumn("cnt", lit(1L)).withColumnRenamed("l_quantity", "qty").as[FoldAcc]
      Groups.fold(accs)(_.l_returnflag)((a, b) => FoldAcc(a.l_returnflag, a.qty + b.qty, a.cnt + b.cnt))
        .map { case (_, a) => a }
        .toDF("l_returnflag", "qty", "cnt")
    },

    "summarize" -> { (s, dir) =>
      Groups.summarize(table(s, dir, "lineitem"),
        keys = Seq("l_returnflag", "l_linestatus"),
        specs = Seq(
          SummarizeSpec(SummarizeOp.Sum, "l_quantity", "sum_qty"),
          SummarizeSpec(SummarizeOp.Sum, "l_linenumber", "sum_line"),
          SummarizeSpec(SummarizeOp.Count, "l_orderkey", "count_order"),
          SummarizeSpec(SummarizeOp.Max, "l_shipdate", "max_ship"),
          SummarizeSpec(SummarizeOp.Min, "l_shipdate", "min_ship")))
    },

    "summarize_decimal" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .update("rev" -> revenue)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("rev").cast(DecimalType(18, 4))).cast(DecimalType(28, 4))
            .cast(DoubleType).as("sum_revenue"),
          count(lit(1)).as("n"))
    },

    // ---- master-join family ---------------------------------------------
    "masterjoin" -> { (s, dir) =>
      Joins.masterJoin(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        output = Seq(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"), col("o_orderstatus")),
        masterOrder = Nil, uniqueMaster = true).found
    },

    "masterjoin_missed" -> { (s, dir) =>
      Joins.masterJoin(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        output = Seq(col("l_orderkey"), col("l_linenumber"))).missed
        .project("l_orderkey", "l_linenumber")
    },

    "mastercheck_found" -> { (s, dir) =>
      Joins.masterCheck(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey")).found
        .project("l_orderkey", "l_linenumber")
    },

    "mastercheck_missed" -> { (s, dir) =>
      Joins.masterCheck(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey")).missed
        .project("l_orderkey", "l_linenumber")
    },

    "masterjoinupdate" -> { (s, dir) =>
      Joins.masterJoinUpdate(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        updates = Seq("l_linestatus" -> concat(col("l_linestatus"), lit("-"), col("o_orderstatus"))))
        .found
        .project("l_orderkey", "l_linenumber", "l_linestatus")
    },

    "masterjoinupdate_missed" -> { (s, dir) =>
      Joins.masterJoinUpdate(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        updates = Seq("l_linestatus" -> lit("MATCHED")))
        .missed
        .project("l_orderkey", "l_linenumber", "l_linestatus")
    },

    "masterbranch" -> { (s, dir) =>
      Joins.masterBranch(
        tx = table(s, dir, "lineitem"),
        master = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"),
        tag = when(col("o_totalprice").isNull, "missed")
          .when(col("o_totalprice") > 150000.0, "big")
          .otherwise("small"))
        .port("big")
        .project("l_orderkey", "l_linenumber")
    },

    // ---- broadcast variants ---------------------------------------------
    "masterjoin_broadcast" -> { (s, dir) =>
      Joins.masterJoin(
        tx = table(s, dir, "customer"),
        master = table(s, dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey"),
        keys = Seq("c_nationkey"),
        output = Seq(col("c_custkey"), col("c_name"), col("n_name")),
        broadcastMaster = true, uniqueMaster = true).found
    },

    "mastercheck_broadcast" -> { (s, dir) =>
      Joins.masterCheck(
        tx = table(s, dir, "supplier"),
        master = table(s, dir, "nation").filter(col("n_regionkey") < 2)
          .withColumnRenamed("n_nationkey", "s_nationkey"),
        keys = Seq("s_nationkey"),
        broadcastMaster = true).found
        .project("s_suppkey", "s_name")
    },

    "masterjoinupdate_broadcast" -> { (s, dir) =>
      Joins.masterJoinUpdate(
        tx = table(s, dir, "supplier"),
        master = table(s, dir, "nation").withColumnRenamed("n_nationkey", "s_nationkey"),
        keys = Seq("s_nationkey"),
        updates = Seq("s_name" -> concat(col("s_name"), lit("@"), col("n_name"))),
        broadcastMaster = true, uniqueMaster = true).found
        .project("s_suppkey", "s_name")
    },

    "summarize_any" -> { (s, dir) =>
      // ANY picks one value per group; deterministic when the column is
      // functionally dependent on the key (here: key IS o_orderkey)
      Groups.summarize(table(s, dir, "orders"),
        keys = Seq("o_orderkey"),
        specs = Seq(
          SummarizeSpec(SummarizeOp.Any, "o_orderstatus", "any_status"),
          SummarizeSpec(SummarizeOp.Count, "o_custkey", "n")))
    },

    "masterbranch_broadcast" -> { (s, dir) =>
      Joins.masterBranch(
        tx = table(s, dir, "customer"),
        master = table(s, dir, "nation").withColumnRenamed("n_nationkey", "c_nationkey"),
        keys = Seq("c_nationkey"),
        tag = when(col("n_regionkey") <= 1, "low").otherwise("high"),
        broadcastMaster = true)
        .port("low")
        .project("c_custkey", "c_nationkey")
    },

    // ---- master selection hook (general cogroup path) --------------------
    "masterjoinselect" -> { (s, dir) =>
      import s.implicits._
      val (found, _) = Joins.masterJoinSelect(
        master = table(s, dir, "lineitem").as[Lineitem],
        tx = table(s, dir, "orders").as[Order])(_.l_orderkey, _.o_orderkey)(
        // user hook: pick the highest-priced item (ties -> lowest line number)
        selection = (ms, _) =>
          if (ms.isEmpty) None
          else Some(ms.minBy(m => (-m.l_extendedprice, m.l_linenumber))))(
        mapJoined = (m, t) => (t.o_orderkey, m.l_linenumber, m.l_extendedprice))
      found.toDF("o_orderkey", "sel_linenumber", "sel_price")
    },

    /** Selection-hook semantics expressed declaratively (join + predicate +
      * min_by) — plans as codegen'd relational operators, no typed serde.
      * The predicate references BOTH sides (master price vs the tx order's
      * total), which the pre-join first-match fast path cannot express.
      */
    "masterjoinselect_expr" -> { (s, dir) =>
      Joins.masterJoinSelectBy(
        tx = table(s, dir, "orders"),
        master = table(s, dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
        keys = Seq("o_orderkey"),
        txId = Seq("o_orderkey"),
        // highest-priced eligible item, ties -> lowest line number
        preference = Seq(negate(col("l_extendedprice")), col("l_linenumber")),
        output = Seq(col("o_orderkey"), col("l_linenumber").as("sel_linenumber"),
          col("l_extendedprice").as("sel_price")),
        // per-transaction eligibility: item price within the order's total
        predicate = col("l_extendedprice") <= col("o_totalprice")).found
    },

    /** Same selection-hook semantics, broadcast physical path: the master
      * side rides a GroupView instead of a cogroup shuffle. The master here
      * is dimension-sized (supplier) — that is the broadcast path's
      * contract; a fact-sized master belongs on the shuffled path (and the
      * GroupView row bound enforces it at scale).
      */
    "masterjoinselect_broadcast" -> { (s, dir) =>
      import s.implicits._
      val (found, _) = Joins.masterJoinSelectBroadcast(
        master = table(s, dir, "supplier")
          .select("s_suppkey", "s_nationkey", "s_acctbal").as[SupplierBal],
        tx = table(s, dir, "customer")
          .select("c_custkey", "c_nationkey").as[CustomerNation])(_.s_nationkey, _.c_nationkey)(
        // user hook: richest supplier of the customer's nation (ties -> lowest key)
        selection = (ms, _) =>
          if (ms.isEmpty) None
          else Some(ms.minBy(m => (-m.s_acctbal, m.s_suppkey))))(
        mapJoined = (m, t) => (t.c_custkey, m.s_suppkey, m.s_acctbal))
      found.toDF("c_custkey", "sel_suppkey", "sel_acctbal")
    },

    // ---- broadcast view side input ---------------------------------------
    "groupview" -> { (s, dir) =>
      import s.implicits._
      val nations = Views.groupView(table(s, dir, "nation").as[Nation])(_.n_nationkey)
      table(s, dir, "customer").as[Customer]
        .map { c =>
          val n = nations.find(c.c_nationkey).headOption.map(_.n_name).getOrElse("UNKNOWN")
          (c.c_custkey, n)
        }
        .toDF("c_custkey", "nation_name")
    },

    // ---- aggregate vertex over events ------------------------------------
    "aggregate" -> { (s, dir) =>
      table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(28, 6))
            .cast(DoubleType).as("sum_v"),
          countDistinct(col("user_id")).as("users"))
    }
  )

  val oracles: Seq[(String, String)] = Seq(
    "extract" ->
      """SELECT 'base' AS kind, l_orderkey, l_linenumber, l_extendedprice AS amount FROM lineitem
        |UNION ALL
        |SELECT 'qty' AS kind, l_orderkey, l_linenumber, l_quantity AS amount FROM lineitem""".stripMargin,
    "extract_multi" ->
      """SELECT key, name, length(name) AS name_len FROM (
        |  SELECT CAST(r_regionkey AS BIGINT) AS key, r_name AS name FROM region
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS name FROM nation)""".stripMargin,
    "update" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01'""".stripMargin,
    "convert" ->
      "SELECT o_orderkey, CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_num FROM orders",
    "branch" ->
      "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "split" ->
      """SELECT DISTINCT l_orderkey, o_orderstatus, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "logging" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "project" ->
      "SELECT p_partkey, p_name, p_retailprice FROM part",
    "extend" ->
      "SELECT r_regionkey, r_name, CAST(NULL AS VARCHAR) AS r_comment, upper(r_name) AS r_upper FROM region",
    "restructure" ->
      """SELECT s_suppkey, s_name, CAST(NULL AS VARCHAR) AS s_phone,
        |       CAST(s_nationkey AS BIGINT) AS s_nationkey FROM supplier""".stripMargin,
    "checkpoint" ->
      """SELECT l_returnflag AS key, COUNT(*) AS cnt, 'flag' AS side FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT l_linestatus AS key, COUNT(*) AS cnt, 'status' AS side FROM lineitem GROUP BY 1""".stripMargin,
    "cogroup" ->
      """SELECT o_orderkey, o_orderstatus, COUNT(l_orderkey) AS n_items,
        |       COALESCE(SUM(l_quantity), 0) AS total_qty
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderstatus""".stripMargin,
    "cogroup3" ->
      """WITH s AS (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
        |           FROM supplier GROUP BY 1),
        |     c AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |                  MAX(c_acctbal) AS max_acctbal
        |           FROM customer GROUP BY 1)
        |SELECT n_nationkey AS k, n_name,
        |       COALESCE(n_suppliers, 0) AS n_suppliers,
        |       COALESCE(n_customers, 0) AS n_customers,
        |       max_acctbal
        |FROM nation
        |LEFT JOIN s ON n_nationkey = s_nationkey
        |LEFT JOIN c ON n_nationkey = c_nationkey""".stripMargin,
    "groupsort" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_shipdate DESC, l_linenumber ASC, l_quantity ASC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,
    "fold" ->
      "SELECT l_returnflag, SUM(l_quantity) AS qty, COUNT(*) AS cnt FROM lineitem GROUP BY 1",
    "summarize" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        |       CAST(SUM(l_linenumber) AS BIGINT) AS sum_line,
        |       COUNT(l_orderkey) AS count_order,
        |       MAX(l_shipdate) AS max_ship, MIN(l_shipdate) AS min_ship
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "summarize_decimal" ->
      """SELECT l_returnflag,
        |       CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_revenue,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY 1""".stripMargin,
    "masterjoin" ->
      """SELECT l_orderkey, l_linenumber, o_orderpriority, o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "masterjoin_missed" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""".stripMargin,
    "mastercheck_found" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""".stripMargin,
    "mastercheck_missed" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""".stripMargin,
    "masterjoinupdate" ->
      """SELECT l_orderkey, l_linenumber, l_linestatus || '-' || o_orderstatus AS l_linestatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "masterjoinupdate_missed" ->
      """SELECT l_orderkey, l_linenumber, l_linestatus FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderstatus = 'O')""".stripMargin,
    "masterbranch" ->
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0""".stripMargin,
    "masterjoin_broadcast" ->
      "SELECT c_custkey, c_name, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
    "mastercheck_broadcast" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM nation
        |  WHERE n_nationkey = s_nationkey AND n_regionkey < 2)""".stripMargin,
    "masterjoinupdate_broadcast" ->
      """SELECT s_suppkey, s_name || '@' || n_name AS s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "summarize_any" ->
      """SELECT o_orderkey, MIN(o_orderstatus) AS any_status, COUNT(o_custkey) AS n
        |FROM orders GROUP BY 1""".stripMargin,
    "masterbranch_broadcast" ->
      """SELECT c_custkey, c_nationkey FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_regionkey <= 1""".stripMargin,
    "masterjoinselect" ->
      """SELECT o_orderkey, l_linenumber AS sel_linenumber, l_extendedprice AS sel_price
        |FROM orders JOIN (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem) li ON o_orderkey = li.l_orderkey
        |WHERE li.rn = 1""".stripMargin,
    "masterjoinselect_expr" ->
      """SELECT o_orderkey, l_linenumber AS sel_linenumber, l_extendedprice AS sel_price
        |FROM orders JOIN (
        |  SELECT l.*, row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l_extendedprice <= o_totalprice) li ON o_orderkey = li.l_orderkey
        |WHERE li.rn = 1""".stripMargin,
    "masterjoinselect_broadcast" ->
      """SELECT c_custkey, s_suppkey AS sel_suppkey, s_acctbal AS sel_acctbal
        |FROM customer JOIN (
        |  SELECT *, row_number() OVER (PARTITION BY s_nationkey
        |           ORDER BY s_acctbal DESC, s_suppkey ASC) AS rn
        |  FROM supplier) s ON c_nationkey = s.s_nationkey
        |WHERE s.rn = 1""".stripMargin,
    "groupview" ->
      """SELECT c_custkey, COALESCE(n_name, 'UNKNOWN') AS nation_name
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "aggregate" ->
      """SELECT event_type, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
        |       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_v,
        |       COUNT(DISTINCT user_id) AS users
        |FROM events GROUP BY 1""".stripMargin
  )
}

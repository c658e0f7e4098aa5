package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SURVEY §2.A declared relational query surface (Q1–Q20).
  *
  * Each query pins one family of relational operators the reference harness
  * uses (scan/filter/project: `graph/Util.scala:15-161`; joins:
  * `ml/KNNRunner.scala:188-189`, `graph/PageRankHiveRunner.scala:42-55`;
  * agg: `ml/PCARunner.scala:136-139`; top-k: `ml/knn/KNN.scala:118-122`;
  * set ops: `ml/PrefixSpanRunner.scala:170-173`), re-expressed declaratively
  * so Catalyst handles pushdown, pruning, and join strategy.
  *
  * Determinism discipline for the DuckDB-oracle hash compare: every query
  * ends in a total ORDER BY over (a unique subset of) its output columns and
  * floating-point aggregates are wrapped in `round`.
  *
  * Scale notes (100 TB): all aggregates are partial+final hash aggregates;
  * joins on keys shuffle both sides except where a side is genuinely small
  * (`nation`/`region` dimension tables → explicit broadcast hint). No
  * driver-side collect anywhere.
  */
object Relational {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables(s, dir, n)

  /** Cross-engine-deterministic rounding. Spark's ROUND(double, d) re-rounds
    * the shortest decimal repr (BigDecimal HALF_UP) while DuckDB rounds the
    * binary value — they disagree whenever a value sits in the repr gap
    * (observed: 86684.104949999 → 86684.105 vs 86684.1049). floor(x*10^d+0.5)
    * is the same IEEE op sequence in both engines, so results match exactly. */
  private def r(c: Column, d: Int): Column = {
    val f = math.pow(10, d)
    floor(c * f + 0.5) / f
  }

  /** Q1 — scan + projection (A1/A2/A4). Column pruning reaches the parquet
    * scan: ReadSchema carries only the three columns. */
  def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** Q2 — filter/predicates (A5); both predicates push into the scan. */
  def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice")
      .orderBy("l_orderkey", "l_extendedprice")

  /** Q3 — derived columns via built-in expressions, not UDFs (A6). */
  def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")), 4).as("charge"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q4 — inner equi-join (A7); shuffle hash / sort-merge chosen by AQE. */
  def q04(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .select("c_custkey", "o_orderkey")
      .orderBy("c_custkey", "o_orderkey")
  }

  /** Q5 — left outer join + null handling (A8). */
  def q05(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
      .orderBy("c_custkey", "ok")
  }

  /** Q6 — anti join (A13 family). NOT IN is safe as a left-anti join here
    * because o_custkey is non-nullable in the fixture. The date predicate
    * leaves survivors at every SF (every customer has *some* order, so an
    * unfiltered anti join passed vacuously with 0 rows in round 1). */
  def q06(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")
  }

  /** Q7 — group-by aggregation, partial+final hash agg (A10/A11). */
  def q07(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        r(sum("l_quantity"), 4).as("sq"),
        r(avg("l_extendedprice"), 4).as("ap"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q8 — distinct aggregate (A12); expands to a two-stage agg in Catalyst. */
  def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .agg(countDistinct(col("l_partkey")).as("d"))

  /** Q9 — rollup / grouping sets. */
  def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("c"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first,
        col("c"))

  /** Q10 — global sort + limit top-k (A16/A17); Spark plans TakeOrderedAndProject
    * (per-partition top-k then merge — no full sort shuffle at scale). */
  def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Q11 — per-group top-k via window rank (A18); single hash-partition
    * shuffle on the window key. */
  def q11(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir)("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Q12 — window analytic with running frame. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir)("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        r(sum("o_totalprice").over(w), 4).as("run"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q13 — window lag/lead over event time. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir)("events")
      .select(col("user_id"), col("event_id"),
        lag("event_type", 1).over(w).as("prev"))
      .orderBy("user_id", "event_id")
  }

  /** Q14 — set intersection (A14; union/except are the same Catalyst family). */
  def q14(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("customer").select(col("c_nationkey").as("k"))
      .intersect(t(s, dir)("supplier").select(col("s_nationkey").as("k")))
      .orderBy("k")

  /** Q15 — string functions. length() cast to long to match the oracle's
    * BIGINT output schema. */
  def q15(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("part")
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("u"),
        length(col("p_type")).cast("long").as("l"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("c"))
      .orderBy("p_partkey")

  /** Q16 — date functions; d30 cast to string so parquet/DuckDB date
    * representations hash identically. */
  def q16(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        date_add(to_date(col("o_orderdate")), 30).cast("string").as("d30"))
      .orderBy("o_orderkey")

  /** Q17 — math functions. */
  def q17(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        r(sqrt(col("l_quantity")), 4).as("s"),
        r(pow(col("l_discount"), 2), 6).as("p"),
        (abs(col("l_tax") - 0.04) > 0.02).as("b"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q18 — array functions + higher-order aggregate (A24 family). Elements
    * cast to double before accumulation so Spark and DuckDB sum in the same
    * precision. */
  def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("embeddings")
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n"),
        r(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 4).as("s"))
      .orderBy("vec_id")

  /** Q19 — JSON access over the events props column. */
  def q19(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k"))
      .orderBy("event_id")

  /** Q20 — TPC-H-Q5-style 5-way join + agg (A7/A10). `nation` is a true
    * dimension table at any scale → explicit broadcast hint; the fact-fact
    * joins (orders⋈lineitem, ⋈supplier) stay shuffle joins keyed on their
    * join columns so AQE can pick strategy/handle skew at 100 TB. */
  def q20(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer")
    val o = t(s, dir)("orders")
    val l = t(s, dir)("lineitem")
    val sup = t(s, dir)("supplier")
    val n = broadcast(t(s, dir)("nation"))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, l("l_orderkey") === o("o_orderkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(n, sup("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(r(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("rev"))
      .orderBy(col("rev").desc, col("n_name"))
  }

  /** Q21 — statically salted skew join (A-row skew mitigation). When one
    * join key is pathologically hot, AQE's skew split only kicks in
    * after the map stage has already produced the skewed partition; the
    * static form splits the hot key UP FRONT: the fact side derives a
    * deterministic salt from a non-key column, the other side replicates
    * `salt` ways, and the equi-join runs on (key, salt) — each hot key
    * becomes `salt` independent tasks. Output ≡ the unsalted q04 join
    * (same oracle SQL), so correctness of the rewrite is hash-checked. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val salt = 8
    val o = t(s, dir)("orders") // "skewed" fact side
    val c = t(s, dir)("customer") // replicated side
    val salted = o.withColumn("_salt",
      pmod(xxhash64(col("o_orderkey")), lit(salt)).cast("int"))
    val repl = c.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    repl.join(salted, repl("c_custkey") === salted("o_custkey") &&
        repl("_salt") === salted("_salt"))
      .select("c_custkey", "o_orderkey")
      .orderBy("c_custkey", "o_orderkey")
  }

  /** queries-map wiring: name -> builder. */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan" -> q01 _, "q02_filter" -> q02 _, "q03_derive" -> q03 _,
    "q04_join_inner" -> q04 _, "q05_join_left" -> q05 _,
    "q06_join_anti" -> q06 _, "q07_agg" -> q07 _, "q08_distinct" -> q08 _,
    "q09_rollup" -> q09 _, "q10_topk" -> q10 _, "q11_window_topk" -> q11 _,
    "q12_window_run" -> q12 _, "q13_window_lag" -> q13 _,
    "q14_intersect" -> q14 _, "q15_string" -> q15 _, "q16_date" -> q16 _,
    "q17_math" -> q17 _, "q18_array" -> q18 _, "q19_json" -> q19 _,
    "q20_join5_agg" -> q20 _, "q21_salted_join" -> q21 _)

  /** DuckDB-dialect oracle SQL, one per query, same column names/ordering
    * discipline. Valid Spark SQL too except where noted (q16/q18/q19 use
    * DuckDB-specific forms; Spark-SQL variants live in the test suite). */
  val oracle: Map[String, String] = Map(
    "q01_scan" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q02_filter" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R' ORDER BY l_orderkey, l_extendedprice",
    "q03_derive" ->
      "SELECT l_orderkey, l_linenumber, FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) / 10000 AS charge FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q04_join_inner" ->
      "SELECT c.c_custkey, o.o_orderkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey, o.o_orderkey",
    "q05_join_left" ->
      "SELECT c.c_custkey, COALESCE(o.o_orderkey, -1) AS ok FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey, ok",
    "q06_join_anti" ->
      "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01') ORDER BY c_custkey",
    "q07_agg" ->
      "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, FLOOR(SUM(l_quantity) * 10000 + 0.5) / 10000 AS sq, FLOOR(AVG(l_extendedprice) * 10000 + 0.5) / 10000 AS ap FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q08_distinct" ->
      "SELECT COUNT(DISTINCT l_partkey) AS d FROM lineitem",
    "q09_rollup" ->
      "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, c",
    "q10_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "q11_window_topk" ->
      "SELECT * FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn",
    "q12_window_run" ->
      "SELECT o_custkey, o_orderkey, FLOOR(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 + 0.5) / 10000 AS run FROM orders ORDER BY o_custkey, o_orderkey",
    "q13_window_lag" ->
      "SELECT user_id, event_id, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events ORDER BY user_id, event_id",
    "q14_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q15_string" ->
      "SELECT p_partkey, UPPER(SUBSTR(p_name,1,5)) AS u, LENGTH(p_type) AS l, CONCAT(p_brand,'#',p_type) AS c FROM part ORDER BY p_partkey",
    "q16_date" ->
      "SELECT o_orderkey, CAST(YEAR(o_orderdate) AS INTEGER) AS y, CAST(MONTH(o_orderdate) AS INTEGER) AS m, CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS d30 FROM orders ORDER BY o_orderkey",
    "q17_math" ->
      "SELECT l_orderkey, l_linenumber, FLOOR(SQRT(l_quantity) * 10000 + 0.5) / 10000 AS s, FLOOR(POWER(l_discount,2) * 1000000 + 0.5) / 1000000 AS p, ABS(l_tax - 0.04) > 0.02 AS b FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q18_array" ->
      "SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS n, FLOOR(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))) * 10000 + 0.5) / 10000 AS s FROM embeddings ORDER BY vec_id",
    "q19_json" ->
      "SELECT event_id, JSON_EXTRACT_STRING(props,'$.k') AS k FROM events ORDER BY event_id",
    "q20_join5_agg" ->
      "SELECT n_name, FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100 AS rev FROM customer, orders, lineitem, supplier, nation WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey GROUP BY n_name ORDER BY rev DESC, n_name",
    // the salted rewrite is semantically the plain join — same oracle
    "q21_salted_join" ->
      "SELECT c.c_custkey, o.o_orderkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey ORDER BY c.c_custkey, o.o_orderkey")
}

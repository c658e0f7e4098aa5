package graft.fuzz

/** Randomized differential-fuzzing query generator (round-8 verdict #4):
  * a seed-pinned grammar over the engine's supported relational surface
  * — filters, inner/left joins, group/HAVING aggregation, window
  * functions, set ops, string/date/math scalar functions, DISTINCT,
  * IN-subqueries — emitting SQL in the Spark∩DuckDB common dialect.
  * Each generated query runs in BOTH engines and must produce the same
  * canonical result grid (FuzzSpec vs the committed DuckDB expectations
  * produced by tools/fuzz_expected.py).
  *
  * Cross-engine exactness discipline (the repo-wide rules):
  *  - SUM/AVG over fractional doubles go through per-row integer
  *    micro-units (`FLOOR(x*100+0.5)` cents) so group sums are exact
  *    integers in both engines — float summation ORDER never matters.
  *  - Per-row double arithmetic (+,−,×,÷, FLOOR, ABS) is IEEE-exact on
  *    identical inputs, so projected doubles compare exactly; no
  *    transcendentals (libm vs JVM differ in ulps).
  *  - Window ranks order by a TOTAL key (value + unique id tiebreak) or
  *    use RANK whose tie sets are order-free.
  *  - No LIMIT without total order; the harness sorts rows itself.
  *  - DuckDB's SUM(BIGINT)→HUGEINT is CAST back to BIGINT explicitly.
  */
object FuzzGen {

  /** SplitMix64 — stable across JVM versions (scala.util.Random's
    * stream is also stable, but this makes the contract explicit). */
  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = math.floorMod(nextLong(), n.toLong).toInt
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.size))
  }

  /** cents(col): per-row integer micro-units, exact in both engines. */
  private def cents(col: String): String =
    s"CAST(FLOOR($col * 100 + 0.5) AS BIGINT)"

  private val liNum = Seq("l_quantity", "l_extendedprice", "l_discount",
    "l_tax")
  private val liGroup = Seq("l_returnflag", "l_linestatus", "l_linenumber",
    "EXTRACT(YEAR FROM l_shipdate)")

  private def liPred(r: Rng): String = r.nextInt(6) match {
    case 0 => s"l_quantity <= ${10 + r.nextInt(40)}"
    case 1 => s"l_returnflag = '${r.pick(Seq("A", "N", "R"))}'"
    case 2 => s"l_shipdate < TIMESTAMP '${1996 + r.nextInt(5)}-0${1 + r.nextInt(9)}-15 00:00:00'"
    case 3 => s"l_orderkey % ${2 + r.nextInt(5)} = ${r.nextInt(2)}"
    case 4 => s"l_discount >= 0.0${1 + r.nextInt(8)}"
    case 5 => s"l_linestatus = '${r.pick(Seq("F", "O"))}'"
  }

  private def ordPred(r: Rng): String = r.nextInt(4) match {
    case 0 => s"o_orderpriority = '${r.pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))}'"
    case 1 => s"o_orderstatus = '${r.pick(Seq("F", "O", "P"))}'"
    case 2 => s"o_totalprice > ${1000 * (5 + r.nextInt(200))}"
    case 3 => s"o_orderdate >= TIMESTAMP '${1996 + r.nextInt(4)}-01-01 00:00:00'"
  }

  private def aggs(r: Rng): Seq[String] = {
    val n = r.pick(liNum)
    Seq(
      "CAST(COUNT(*) AS BIGINT) AS cnt",
      s"CAST(SUM(${cents(n)}) AS BIGINT) AS sum_cents",
      s"MAX($n) AS mx",
      s"MIN($n) AS mn") ++
      (if (r.nextInt(2) == 0)
        Seq(s"CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders")
      else Nil)
  }

  private def template(t: Int, r: Rng): String = t match {
    case 0 => // single-table filter + group + agg
      val g = r.pick(liGroup)
      s"SELECT $g AS g, ${aggs(r).mkString(", ")} FROM lineitem " +
        s"WHERE ${liPred(r)} GROUP BY $g"
    case 1 => // two grouping columns
      val g1 = r.pick(Seq("l_returnflag", "l_linestatus"))
      val g2 = r.pick(Seq("l_linenumber", "EXTRACT(MONTH FROM l_shipdate)"))
      s"SELECT $g1 AS g1, $g2 AS g2, ${aggs(r).mkString(", ")} " +
        s"FROM lineitem WHERE ${liPred(r)} GROUP BY $g1, $g2"
    case 2 => // orders ⋈ lineitem
      val g = r.pick(Seq("o_orderpriority", "o_orderstatus"))
      s"SELECT $g AS g, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS rev_cents " +
        "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
        s"WHERE ${liPred(r)} AND ${ordPred(r)} GROUP BY $g"
    case 3 => // customer ⋈ orders
      s"SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS tot_cents " +
        "FROM customer JOIN orders ON o_custkey = c_custkey " +
        s"WHERE ${ordPred(r)} GROUP BY c_mktsegment"
    case 4 => // 3-way nation ⋈ customer ⋈ orders
      s"SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM nation JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        s"WHERE ${ordPred(r)} GROUP BY n_name"
    case 5 => // left join: COUNT(col) skips the null side in both engines
      s"SELECT c_mktsegment AS seg, CAST(COUNT(o_orderkey) AS BIGINT) " +
        "AS n_orders, CAST(COUNT(*) AS BIGINT) AS n_rows " +
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey " +
        s"AND ${ordPred(r)} GROUP BY c_mktsegment"
    case 6 => // window top-k per partition, total tiebreak
      val k = 1 + r.nextInt(3)
      "SELECT l_orderkey, l_linenumber, rn FROM (SELECT l_orderkey, " +
        "l_linenumber, ROW_NUMBER() OVER (PARTITION BY l_returnflag " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn " +
        s"FROM lineitem WHERE ${liPred(r)}) w WHERE rn <= $k"
    case 7 => // running integer sum within order
      s"SELECT l_orderkey, l_linenumber, CAST(SUM(${cents("l_extendedprice")}) " +
        "OVER (PARTITION BY l_orderkey ORDER BY l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        s"AS run_cents FROM lineitem WHERE ${liPred(r)}"
    case 8 => // set op on key projections
      val op = r.pick(Seq("INTERSECT", "EXCEPT", "UNION"))
      s"SELECT l_orderkey AS k FROM lineitem WHERE ${liPred(r)} " +
        s"$op SELECT o_orderkey FROM orders WHERE ${ordPred(r)}"
    case 9 => // HAVING
      val g = r.pick(liGroup)
      s"SELECT $g AS g, CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
        s"WHERE ${liPred(r)} GROUP BY $g HAVING COUNT(*) > ${2 + r.nextInt(20)}"
    case 10 => // string fns + CASE
      val len = 2 + r.nextInt(4)
      s"SELECT UPPER(SUBSTR(c_mktsegment, 1, $len)) AS seg, " +
        "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS sgn, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("c_acctbal")}) AS BIGINT) AS bal_cents " +
        "FROM customer GROUP BY " +
        s"UPPER(SUBSTR(c_mktsegment, 1, $len)), " +
        "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END"
    case 11 => // IN-subquery
      s"SELECT CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("l_extendedprice")}) AS BIGINT) AS rev_cents " +
        "FROM lineitem WHERE l_orderkey IN " +
        s"(SELECT o_orderkey FROM orders WHERE ${ordPred(r)})"
    case 12 => // per-row scalar math, no agg (IEEE-exact projection)
      s"SELECT l_orderkey, l_linenumber, " +
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) " +
        "* 100 + 0.5) AS BIGINT) AS net_cents, " +
        "FLOOR(ABS(l_quantity - 25.0) * 10000 + 0.5) / 10000 AS dq " +
        s"FROM lineitem WHERE ${liPred(r)} AND ${liPred(r)}"
    case 13 => // DISTINCT projection incl. a date cast
      s"SELECT DISTINCT l_returnflag, l_linestatus, " +
        // STRING: the type name in the Spark∩DuckDB common dialect
        // (Spark rejects bare VARCHAR; DuckDB aliases STRING=VARCHAR)
        "CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_day " +
        s"FROM lineitem WHERE ${liPred(r)}"
    case 14 => // part/supplier coverage + LIKE
      s"SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum " +
        s"FROM part WHERE p_type LIKE '%${r.pick(Seq("ECONOMY", "LARGE", "PROMO", "SMALL", "STANDARD", "MEDIUM"))}%' " +
        "GROUP BY p_brand"
    case 15 => // date buckets + modulo arithmetic
      "SELECT EXTRACT(YEAR FROM o_orderdate) AS y, " +
        "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) % 3 AS mq, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders " +
        s"WHERE ${ordPred(r)} " +
        "GROUP BY EXTRACT(YEAR FROM o_orderdate), " +
        "CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) % 3"
    case 16 => // correlated EXISTS
      "SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM customer c WHERE EXISTS (SELECT 1 FROM orders " +
        s"WHERE o_custkey = c.c_custkey AND ${ordPred(r)}) " +
        "GROUP BY c_mktsegment"
    case 17 => // uncorrelated scalar subquery in the projection
      s"SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders " +
        s"WHERE ${ordPred(r)}) AS o_cnt " +
        s"FROM lineitem WHERE ${liPred(r)} GROUP BY l_returnflag"
    case 18 => // UNION ALL branches + outer aggregation
      val m = 2 + r.nextInt(7)
      s"SELECT k % $m AS b, CAST(COUNT(*) AS BIGINT) AS cnt FROM " +
        s"(SELECT l_orderkey AS k FROM lineitem WHERE ${liPred(r)} " +
        s"UNION ALL SELECT o_orderkey FROM orders WHERE ${ordPred(r)}) u " +
        s"GROUP BY k % $m"
    case 19 => // CTE chain with a post-aggregation filter
      s"WITH f AS (SELECT * FROM lineitem WHERE ${liPred(r)}), " +
        s"a AS (SELECT l_returnflag AS g, CAST(SUM(${cents("l_quantity")}) " +
        "AS BIGINT) AS q_cents FROM f GROUP BY l_returnflag) " +
        s"SELECT g, q_cents FROM a WHERE q_cents > ${10000 + r.nextInt(100000)}"
    case 20 => // FULL OUTER JOIN with a pushable join-side predicate
      s"SELECT COALESCE(n_name, 'NONE') AS nm, " +
        "CAST(COUNT(c_custkey) AS BIGINT) AS n_cust " +
        "FROM nation FULL JOIN customer ON c_nationkey = n_nationkey " +
        s"AND c_acctbal > ${r.nextInt(5000)} " +
        "GROUP BY COALESCE(n_name, 'NONE')"
    case 21 => // RANK over an exact integer key: the qualifying SET is
      // deterministic even with ties, so no unique tiebreak is needed
      val k = 1 + r.nextInt(3)
      "SELECT l_returnflag, l_orderkey, l_linenumber, rk FROM " +
        "(SELECT l_returnflag, l_orderkey, l_linenumber, " +
        s"RANK() OVER (PARTITION BY l_returnflag ORDER BY " +
        s"${cents("l_extendedprice")} DESC) AS rk " +
        s"FROM lineitem WHERE ${liPred(r)}) w WHERE rk <= $k"
    case 22 => // LAG delta along a total per-partition order
      s"SELECT l_orderkey, l_linenumber, CAST(${cents("l_extendedprice")} " +
        s"- LAG(${cents("l_extendedprice")}, 1, 0) OVER " +
        "(PARTITION BY l_orderkey ORDER BY l_linenumber) AS BIGINT) " +
        s"AS d_cents FROM lineitem WHERE ${liPred(r)}"
    case 23 => // ROLLUP grouping sets (NULL group rows in both engines)
      s"SELECT l_returnflag AS g1, l_linestatus AS g2, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
        s"WHERE ${liPred(r)} GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    case 24 => // NOT EXISTS anti-join
      "SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS cnt " +
        "FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders " +
        s"WHERE o_custkey = c.c_custkey AND ${ordPred(r)}) " +
        "GROUP BY c_mktsegment"
    case 25 => // CUBE: all four grouping sets, NULL-padded group rows
      s"SELECT o_orderstatus AS g1, o_orderpriority AS g2, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders " +
        s"WHERE ${ordPred(r)} GROUP BY CUBE(o_orderstatus, o_orderpriority)"
    case 26 => // self-join pairs within an order (a<b), exact cent deltas
      s"SELECT a.l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n_pairs, " +
        s"CAST(SUM(ABS(${cents("a.l_extendedprice")} - " +
        s"${cents("b.l_extendedprice")})) AS BIGINT) AS d_cents " +
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_linenumber < b.l_linenumber " +
        s"WHERE a.l_quantity <= ${15 + r.nextInt(30)} GROUP BY a.l_orderkey"
    case 27 => // aggregate FILTER clauses
      s"SELECT l_returnflag AS g, " +
        s"CAST(COUNT(*) FILTER (WHERE l_quantity <= ${10 + r.nextInt(30)}) " +
        "AS BIGINT) AS n_small, " +
        s"CAST(COUNT(*) FILTER (WHERE l_discount >= 0.0${1 + r.nextInt(8)}) " +
        "AS BIGINT) AS n_disc, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
        s"WHERE ${liPred(r)} GROUP BY l_returnflag"
    case 28 => // region ⋈ nation ⋈ supplier (the otherwise-uncovered dims)
      s"SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_supp, " +
        s"CAST(SUM(${cents("s_acctbal")}) AS BIGINT) AS bal_cents " +
        "FROM region JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN supplier ON s_nationkey = n_nationkey " +
        s"WHERE s_acctbal > ${-1000 + r.nextInt(4000)} GROUP BY r_name"
    case 29 => // NTILE buckets over a TOTAL order (value + unique key)
      val tiles = 2 + r.nextInt(5)
      "SELECT tile, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS tot_cents " +
        s"FROM (SELECT o_totalprice, NTILE($tiles) OVER " +
        "(ORDER BY o_totalprice DESC, o_orderkey) AS tile " +
        s"FROM orders WHERE ${ordPred(r)}) w GROUP BY tile"
    case 30 => // timestamp + INTERVAL arithmetic, cast to a date string
      val days = 7 * (1 + r.nextInt(8))
      s"SELECT CAST(CAST(l_shipdate + INTERVAL $days DAY AS DATE) " +
        "AS STRING) AS due_day, CAST(COUNT(*) AS BIGINT) AS cnt " +
        s"FROM lineitem WHERE l_orderkey % ${5 + r.nextInt(5)} = 0 " +
        s"GROUP BY CAST(CAST(l_shipdate + INTERVAL $days DAY AS DATE) " +
        "AS STRING)"
    case 31 => // || concat + GREATEST/LEAST on the part dimension
      val len = 2 + r.nextInt(3)
      s"SELECT UPPER(SUBSTR(p_name, 1, $len)) || '-' || p_brand AS tag, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"GREATEST(MAX(p_size), ${10 + r.nextInt(20)}) AS mx, " +
        s"LEAST(MIN(p_size), ${5 + r.nextInt(10)}) AS mn " +
        s"FROM part GROUP BY UPPER(SUBSTR(p_name, 1, $len)) || '-' || p_brand"
    case 32 => // NOT IN: null-free anti-join form, plus the three-valued
      // -logic probe (one NULL in the subquery makes NOT IN UNKNOWN for
      // every row — both engines must agree on the empty set)
      if (r.nextInt(3) > 0)
        s"SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS cnt " +
          "FROM orders WHERE o_orderkey NOT IN " +
          s"(SELECT l_orderkey FROM lineitem WHERE ${liPred(r)}) " +
          "GROUP BY o_orderpriority"
      else
        s"SELECT o_orderkey FROM orders WHERE ${ordPred(r)} " +
          "AND o_orderkey NOT IN (SELECT CASE WHEN o2.o_orderkey % " +
          s"${89 + r.nextInt(10)} = 0 THEN NULL ELSE o2.o_orderkey END " +
          "FROM orders o2)"
    case 33 => // DISTINCT aggregates (dedup-inside-agg path, exact ints)
      s"SELECT l_returnflag AS g, " +
        "CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_ln, " +
        s"CAST(SUM(DISTINCT ${cents(r.pick(liNum))}) AS BIGINT) AS s_d, " +
        "CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_ord " +
        s"FROM lineitem WHERE ${liPred(r)} GROUP BY l_returnflag"
    case 34 => // RANGE frame over a NON-unique integer key: peers all
      // receive the same cumulative sum — the order-free tie semantics
      // ROWS frames don't exercise
      s"SELECT l_orderkey, l_linenumber, CAST(SUM(${cents("l_extendedprice")}) " +
        s"OVER (PARTITION BY l_returnflag ORDER BY ${cents("l_quantity")} " +
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
        s"AS cum_cents FROM lineitem WHERE ${liPred(r)}"
    case 35 => // FIRST_VALUE/LAST_VALUE with the explicit full frame
      // (LAST_VALUE under the DEFAULT frame is the classic wrong-answer
      // trap; the UNBOUNDED FOLLOWING frame is deterministic)
      val fw = "(PARTITION BY l_orderkey ORDER BY l_linenumber " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
      s"SELECT l_orderkey, l_linenumber, " +
        s"FIRST_VALUE(l_linenumber) OVER $fw AS first_ln, " +
        s"LAST_VALUE(l_linenumber) OVER $fw AS last_ln " +
        s"FROM lineitem WHERE ${liPred(r)}"
    case 36 => // DATE_TRUNC buckets, cast to a date string
      val part = r.pick(Seq("month", "quarter", "year"))
      s"SELECT CAST(CAST(DATE_TRUNC('$part', o_orderdate) AS DATE) " +
        "AS STRING) AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt, " +
        s"CAST(SUM(${cents("o_totalprice")}) AS BIGINT) AS tot_cents " +
        s"FROM orders WHERE ${ordPred(r)} GROUP BY " +
        s"CAST(CAST(DATE_TRUNC('$part', o_orderdate) AS DATE) AS STRING)"
    case 37 => // modulo of a NEGATIVE dividend: both engines use
      // truncated division (sign of the dividend) — an engine with
      // floored mod diverges immediately
      val m = 3 + r.nextInt(7)
      val off = 1000 * (1 + r.nextInt(5))
      s"SELECT (l_orderkey - $off) % $m AS md, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem " +
        s"WHERE ${liPred(r)} GROUP BY (l_orderkey - $off) % $m"
    case 38 => // NULLIF/COALESCE null-propagation through arithmetic
      val z = r.nextInt(3)
      s"SELECT l_returnflag AS g, CAST(SUM(COALESCE(CAST(FLOOR(" +
        s"l_extendedprice / NULLIF(l_quantity, $z) * 100 + 0.5) " +
        "AS BIGINT), -1)) AS BIGINT) AS unit_cents, " +
        "CAST(COUNT(*) AS BIGINT) AS cnt " +
        s"FROM lineitem WHERE ${liPred(r)} GROUP BY l_returnflag"
    case 39 => // LPAD/REPLACE/LENGTH string pipeline on the part dim
      val len = 3 + r.nextInt(4)
      s"SELECT LPAD(REPLACE(p_brand, 'Brand#', 'B'), $len, '_') AS tag, " +
        "CAST(SUM(CAST(LENGTH(p_name) AS BIGINT)) AS BIGINT) AS name_len, " +
        s"CAST(COUNT(*) AS BIGINT) AS cnt FROM part " +
        s"WHERE p_size >= ${1 + r.nextInt(20)} " +
        s"GROUP BY LPAD(REPLACE(p_brand, 'Brand#', 'B'), $len, '_')"
  }

  val numTemplates = 40

  /** The pinned fuzz corpus: `n` queries cycling the templates, every
    * instantiation drawn from one deterministic stream. */
  def queries(seed: Long, n: Int): Seq[(String, String)] = {
    val r = new Rng(seed)
    (0 until n).map { i =>
      (f"fuzz_$i%03d", template(i % numTemplates, r))
    }
  }

  // ---- canonicalization (MUST stay in lockstep with tools/fuzz_expected.py)

  private def cell(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case d: Double =>
      val x = if (d == 0.0) 0.0 else d // normalize -0.0
      "%.6f".formatLocal(java.util.Locale.ROOT, x)
    case f: Float => cell(f.toDouble)
    // canonical form = epoch millis (TZ-free instant; Timestamp.toString
    // renders "…00:00:00.0" where python's str(datetime) drops the
    // fraction — text comparison of timestamps is engine-trap territory).
    // Sub-millisecond precision truncates; fuzz outputs don't carry it.
    case t: java.sql.Timestamp => String.valueOf(t.getTime)
    case other => String.valueOf(other)
  }

  /** Canonical grid: columns sorted by name, rows re-ordered to that
    * column order, each row joined with , rows sorted, joined with
    * \n, prefixed with the sorted column list. */
  def canonical(columns: Seq[String],
      rows: Seq[Seq[Any]]): String = {
    val order = columns.zipWithIndex.sortBy(_._1).map(_._2)
    val header = order.map(columns).mkString("")
    val body = rows.map(r => order.map(i => cell(r(i))).mkString(""))
      .sorted.mkString("\n")
    header + "\n" + body
  }

  def sha256(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}

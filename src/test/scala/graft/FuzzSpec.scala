package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.{FuzzGen, FuzzSeed}

/** Randomized differential fuzzing against DuckDB (round-8 verdict #4):
  * the seed-pinned corpus of 280 grammar-generated queries (filters,
  * inner/left/full joins, group/HAVING/ROLLUP aggregation, windows
  * (ROW_NUMBER/RANK/LAG/running sums), set ops, UNION ALL, CTEs,
  * scalar fns, DISTINCT, IN/EXISTS/scalar subqueries) runs in Spark
  * at sf0.001 and every result
  * must hash-match the committed DuckDB expectations
  * (src/test/resources/fuzz_expected.json, produced by
  * tools/fuzz_expected.py from the same corpus).
  *
  * Regenerating: change FuzzSeed, then
  *   sbt "Test/runMain graft.fuzz.FuzzDump /tmp/fuzz_queries.json"
  *   python3 tools/fuzz_expected.py /tmp/fuzz_queries.json \
  *     /root/testdata/sf0.001 src/test/resources/fuzz_expected.json
  */
class FuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def resourceText(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Minimal parser for the controlled fuzz_expected.json shape. */
  private lazy val expected: Map[String, (Long, String)] = {
    val pat = ("\"(fuzz_\\d+)\"\\s*:\\s*\\{\\s*\"hash\"\\s*:\\s*" +
      "\"([0-9a-f]{64})\"\\s*,\\s*\"rows\"\\s*:\\s*(\\d+)").r
    pat.findAllMatchIn(resourceText("fuzz_expected.json"))
      .map(m => m.group(1) -> (m.group(3).toLong, m.group(2))).toMap
  }

  test("fuzz corpus: every generated query hash-matches DuckDB") {
    graft.sources.Tables.registerAll(spark, sf0001)
    assert(expected.size == FuzzSeed.corpus.size,
      s"expectations cover ${expected.size} of ${FuzzSeed.corpus.size} " +
        "queries — regenerate fuzz_expected.json (see scaladoc)")
    val failures = FuzzSeed.corpus.flatMap { case (id, sql) =>
      val df = spark.sql(sql)
      val rows = df.collect().map(_.toSeq)
      val grid = FuzzGen.canonical(df.columns.toSeq, rows.toSeq)
      val got = (rows.length.toLong, FuzzGen.sha256(grid))
      val want = expected(id)
      if (got == want) None
      else Some(s"$id: got rows=${got._1} hash=${got._2}, want " +
        s"rows=${want._1} hash=${want._2}\n  SQL: $sql")
    }
    assert(failures.isEmpty,
      s"${failures.size}/${FuzzSeed.corpus.size} diverged:\n" +
        failures.take(5).mkString("\n"))
  }

  test("fuzz corpus: nonempty coverage — the grammar exercises every " +
      "template and most queries return rows") {
    // guard against a degenerate corpus where predicates filter
    // everything out and the differential trivially passes on empties
    val nonEmpty = expected.values.count(_._1 > 0)
    assert(nonEmpty >= FuzzSeed.corpus.size * 2 / 3,
      s"only $nonEmpty of ${FuzzSeed.corpus.size} queries return rows")
  }
}

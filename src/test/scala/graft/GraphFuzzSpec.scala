package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.{FuzzGen, GraphFuzzSeed}

/** Graph-surface parameter-grid differential (round-11 directive #5):
  * the pinned grid in [[graft.fuzz.GraphFuzzSeed]] runs its operator
  * side in Spark/GraphX at sf0.001 and every result must hash-match
  * the committed DuckDB expectations
  * (src/test/resources/graph_fuzz_expected.json — produced by
  * tools/fuzz_expected.py from the SAME parameterized oracle builders
  * the pinned graph queries use). The grid spans (iters, resetProb,
  * seed-set size, landmark count, source count, depth, maxIter,
  * community modulus, rate bands, walk p/q) across
  * pagerank/wpr/ppr/trustrank/incpr/conv/bfs/sssp/closeness(±w)/
  * betweenness/kcore/modularity/cycles/lpa/louvain/ppr-multi/walks. */
class GraphFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def resourceText(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private lazy val expected: Map[String, (Long, String)] = {
    val pat = ("\"(gfz_[^\"]+)\"\\s*:\\s*\\{\\s*\"hash\"\\s*:\\s*" +
      "\"([0-9a-f]{64})\"\\s*,\\s*\"rows\"\\s*:\\s*(\\d+)").r
    pat.findAllMatchIn(resourceText("graph_fuzz_expected.json"))
      .map(m => m.group(1) -> (m.group(3).toLong, m.group(2))).toMap
  }

  test("graph fuzz grid: every parameterized case hash-matches DuckDB") {
    assert(expected.size == GraphFuzzSeed.cases.size,
      s"expectations cover ${expected.size} of ${GraphFuzzSeed.cases.size} " +
        "cases — regenerate graph_fuzz_expected.json (see GraphFuzzSeed)")
    val failures = GraphFuzzSeed.cases.flatMap { c =>
      val df = c.run(spark, sf0001)
      val rows = df.collect().map(_.toSeq)
      val grid = FuzzGen.canonical(df.columns.toSeq, rows.toSeq)
      val got = (rows.length.toLong, FuzzGen.sha256(grid))
      val want = expected(c.id)
      if (got == want) None
      else Some(s"${c.id}: got rows=${got._1} hash=${got._2}, want " +
        s"rows=${want._1} hash=${want._2}")
    }
    assert(failures.isEmpty,
      s"${failures.size}/${GraphFuzzSeed.cases.size} diverged:\n" +
        failures.take(8).mkString("\n"))
  }

  test("graph fuzz grid: nonempty coverage across the parameter space") {
    val nonEmpty = expected.values.count(_._1 > 0)
    assert(nonEmpty >= GraphFuzzSeed.cases.size * 2 / 3,
      s"only $nonEmpty of ${GraphFuzzSeed.cases.size} cases return rows")
  }
}

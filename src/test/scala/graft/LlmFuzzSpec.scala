package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.{FuzzGen, LlmFuzzSeed}

/** LLM-surface parameter-grid differential (round-10 directive #5): the
  * pinned grid in [[graft.fuzz.LlmFuzzSeed]] runs its DSL side in Spark
  * at sf0.001 and every result must hash-match the committed DuckDB
  * expectations (src/test/resources/llm_fuzz_expected.json — produced by
  * tools/fuzz_expected.py from the same builders' SQL). Unlike FuzzSpec,
  * the Spark side here is the OPERATOR DSL (Dedup / Similarity), not
  * spark.sql, so the differential covers the engine code itself across
  * the parameter space (shingleSize, w, k, bands, tau, stride, nProbe,
  * bucket width, projection count, Hamming radius). */
class LlmFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def resourceText(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private lazy val expected: Map[String, (Long, String)] = {
    val pat = ("\"(lfz_[^\"]+)\"\\s*:\\s*\\{\\s*\"hash\"\\s*:\\s*" +
      "\"([0-9a-f]{64})\"\\s*,\\s*\"rows\"\\s*:\\s*(\\d+)").r
    pat.findAllMatchIn(resourceText("llm_fuzz_expected.json"))
      .map(m => m.group(1) -> (m.group(3).toLong, m.group(2))).toMap
  }

  test("llm fuzz grid: every parameterized DSL case hash-matches DuckDB") {
    assert(expected.size == LlmFuzzSeed.cases.size,
      s"expectations cover ${expected.size} of ${LlmFuzzSeed.cases.size} " +
        "cases — regenerate llm_fuzz_expected.json (see LlmFuzzSeed)")
    val failures = LlmFuzzSeed.cases.flatMap { c =>
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
      s"${failures.size}/${LlmFuzzSeed.cases.size} diverged:\n" +
        failures.take(8).mkString("\n"))
  }

  test("llm fuzz grid: nonempty coverage across the parameter space") {
    // a grid where most cases return nothing would pass trivially on
    // empties; the operators must actually produce output on the fixture
    val nonEmpty = expected.values.count(_._1 > 0)
    assert(nonEmpty >= LlmFuzzSeed.cases.size * 2 / 3,
      s"only $nonEmpty of ${LlmFuzzSeed.cases.size} cases return rows")
  }
}

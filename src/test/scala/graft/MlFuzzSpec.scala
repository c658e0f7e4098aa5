package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fuzz.{FuzzGen, MlFuzzSeed}

/** ML-surface parameter-grid differential (round 12 — the last operator
  * surface without one): the pinned grid in [[graft.fuzz.MlFuzzSeed]]
  * runs its estimator side in Spark at sf0.001 and every result must
  * hash-match the committed DuckDB expectations
  * (src/test/resources/ml_fuzz_expected.json — produced by
  * tools/fuzz_expected.py from the SAME parameterized oracle builders
  * the pinned ML queries use). The grid spans (k, iters) for the
  * deterministic Lloyd fit, (k, nq) for exact KNN, vote-k for the KNN
  * classifier, (eps, minPts) for DBSCAN, minSupport for PrefixSpan,
  * (iters, damp) for SimRank, (iters, lambda) for rank-1 ALS,
  * (k, iters, vocab) for the Lee–Seung NMF, permuted lineitem
  * feature subsets for the Cramer-OLS linear regression, and
  * non-leading dim pairs for the 2×2 PCA/SVD eigensystems. */
class MlFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def resourceText(name: String): String = {
    val in = getClass.getClassLoader.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private lazy val expected: Map[String, (Long, String)] = {
    val pat = ("\"(mfz_[^\"]+)\"\\s*:\\s*\\{\\s*\"hash\"\\s*:\\s*" +
      "\"([0-9a-f]{64})\"\\s*,\\s*\"rows\"\\s*:\\s*(\\d+)").r
    pat.findAllMatchIn(resourceText("ml_fuzz_expected.json"))
      .map(m => m.group(1) -> (m.group(3).toLong, m.group(2))).toMap
  }

  test("ml fuzz grid: every parameterized case hash-matches DuckDB") {
    assert(expected.size == MlFuzzSeed.cases.size,
      s"expectations cover ${expected.size} of ${MlFuzzSeed.cases.size} " +
        "cases — regenerate ml_fuzz_expected.json (see MlFuzzSeed)")
    val failures = MlFuzzSeed.cases.flatMap { c =>
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
      s"${failures.size}/${MlFuzzSeed.cases.size} diverged:\n" +
        failures.take(8).mkString("\n"))
  }

  test("ml fuzz grid: nonempty coverage across the parameter space") {
    val nonEmpty = expected.values.count(_._1 > 0)
    assert(nonEmpty >= MlFuzzSeed.cases.size * 2 / 3,
      s"only $nonEmpty of ${MlFuzzSeed.cases.size} cases return rows")
  }
}

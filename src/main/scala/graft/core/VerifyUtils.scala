package graft.core

import org.apache.spark.sql.DataFrame

/** Differential-verification utilities (reference capability #6): the
  * save-then-compare methodology with the reference's exact tolerances —
  * scalar 0.5% relative (`Utils.scala:164-184`), matrix/vector 1e-6
  * absolute element-wise with `abs` for sign-indeterminate eigenvectors
  * (`Utils.scala:231-253`), exact two-sided set equality for pattern
  * mining (`PrefixSpanRunner.scala:167-177`), and top-k set-overlap
  * accuracy for rankings (`BetweennessRunner.scala:92-99`).
  */
object VerifyUtils {

  /** Scalar metric match at `relTol` relative tolerance (default: the
    * reference's 0.5%). */
  def scalarMatch(expected: Double, actual: Double,
      relTol: Double = 0.005): Boolean =
    if (expected == 0.0) math.abs(actual) <= relTol
    else math.abs(expected - actual) / math.abs(expected) <= relTol

  /** Element-wise vector match at `absTol`; `signIndeterminate` compares
    * |x| vs |y| (eigenvector sign freedom). */
  def vectorMatch(expected: Seq[Double], actual: Seq[Double],
      absTol: Double = 1e-6, signIndeterminate: Boolean = false): Boolean =
    expected.length == actual.length &&
      expected.zip(actual).forall { case (e, a) =>
        val (x, y) = if (signIndeterminate) (math.abs(e), math.abs(a)) else (e, a)
        math.abs(x - y) <= absTol
      }

  /** Row-major matrix match; sign indeterminacy applies per element. */
  def matrixMatch(expected: Seq[Seq[Double]], actual: Seq[Seq[Double]],
      absTol: Double = 1e-6, signIndeterminate: Boolean = false): Boolean =
    expected.length == actual.length &&
      expected.zip(actual).forall { case (e, a) =>
        vectorMatch(e, a, absTol, signIndeterminate) }

  /** Exact set equality via two-sided anti join (the reference's
    * two-sided `subtract`): returns (missing, unexpected) counts. */
  def setDiff(expected: DataFrame, actual: DataFrame): (Long, Long) = {
    val cols = expected.columns.toSeq
    val missing = expected.join(actual, cols, "left_anti").count()
    val unexpected = actual.join(expected, cols, "left_anti").count()
    (missing, unexpected)
  }

  def setsEqual(expected: DataFrame, actual: DataFrame): Boolean =
    setDiff(expected, actual) == ((0L, 0L))

  /** Constant-truth oracle for a tolerance-check verdict query (the
    * Checks/GraphChecks surface): every listed metric must come back
    * ok=true. Inline-VALUES form parses in BOTH DuckDB (driver gate)
    * and Spark SQL (the specs' dual-run). */
  def verdictSql(metrics: String*): String =
    "SELECT * FROM (VALUES " +
      metrics.sorted.map(m => s"('$m', true)").mkString(", ") +
      ") AS t(metric, ok) ORDER BY metric"

  /** Value-verdict oracle (round-9 upgrade of [[verdictSql]]): boolean
    * checks still appear as constant rows (value 1.0 = passed — the
    * honest maximum for a seeded fit's own trajectory), but every
    * companion metric that is a deterministic function of the parquet
    * tables appears as a one-row SELECT the EXTERNAL engine computes
    * itself — so DuckDB now verifies the verdict's ingredients
    * (majority prior, label stddev, Frobenius energy, sync-twin
    * modularity, Lloyd WSSSE, …), not just the row shape. Each element
    * of `valueSelects` must be a complete one-row
    * `SELECT '<metric>' AS metric, <expr> AS value FROM …`. */
  def valueVerdictSql(boolMetrics: Seq[String],
      valueSelects: Seq[String], ctePrefix: String = ""): String =
    ctePrefix + " SELECT metric, value FROM (" +
      (boolMetrics.sorted.map(m =>
        s"SELECT '$m' AS metric, CAST(1.0 AS DOUBLE) AS value") ++
        valueSelects).mkString(" UNION ALL ") +
      ") vv ORDER BY metric"

  /** Top-k overlap accuracy: |expected ∩ actual| / k over single-column
    * key frames (the centrality verification metric). */
  def topKAccuracy(expected: DataFrame, actual: DataFrame): Double = {
    val k = expected.count()
    if (k == 0) 1.0
    else expected.intersect(actual).count().toDouble / k
  }
}

package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared deterministic corpus generators for the measurement tools.
  * One definition so ResidualRecall's "clustered" geometry and the
  * residual3 bracket run (round-11 directive #5) measure the SAME
  * corpus — hash-seeded, so every run and every tool sees identical
  * vectors with no RNG state. */
object Corpora {

  private def gauss(seedBase: Column, j: Column, s1: Int, s2: Int)
      : Column = {
    val s = seedBase * 64L + j
    val u1 = (pmod(xxhash64(s, lit(s1)), lit(1000003L))
      .cast("double") + 0.5) / 1000003.0
    val u2 = (pmod(xxhash64(s, lit(s2)), lit(1000003L))
      .cast("double") + 0.5) / 1000003.0
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** Deterministic 64-blob clustered unit-norm corpus — the geometry
    * real embedding corpora have (vs the IVF-hostile near-uniform
    * stress replicas): hash-seeded Box–Muller blob centers, point =
    * center + 0.5·noise, normalized; expected cosine-to-center ≈ 0.89.
    * `(vec_id, embedding array<float>)`, dim 64. */
  def clustered(spark: SparkSession, n: Long = 60000L): DataFrame = {
    val raw = spark.range(n).repartition(32)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0L), lit(63L)), j =>
          gauss(pmod(col("id"), lit(64L)), j, 3, 4) +
            lit(0.5) * gauss(col("id"), j, 1, 2)).as("raw"))
    raw.select(col("vec_id"),
      transform(col("raw"), v => (v / sqrt(aggregate(col("raw"),
        lit(0.0), (a, x) => a + x * x))).cast("float"))
        .as("embedding"))
  }
}

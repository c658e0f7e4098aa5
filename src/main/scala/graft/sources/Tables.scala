package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver test data
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §1).
  *
  * Columnar-first by design (SURVEY §1.3): parquet + vectorized reader +
  * whole-stage codegen; filters/projections push into the scan via Catalyst.
  *
  * `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
  * generations and TIMESTAMP(MICROS, no-UTC-adjust) in others; this loader
  * normalizes whatever shape arrives to a plain `TimestampType` in the
  * (UTC) session zone — nanos truncate to micros, exactly what DuckDB does
  * reading TIMESTAMP_NS, so the oracle sees identical values. Callers keep
  * setting `spark.sql.legacy.parquet.nanosAsLong=true` so the nanos shape
  * reads as a raw long instead of failing.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // dynamic conf: set defensively so queries work even from a caller's
    // session that didn't configure it (events.ts is TIMESTAMP(NANOS))
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(LongType) => // TIMESTAMP(NANOS) read under nanosAsLong
          df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case Some(TimestampNTZType) => // TIMESTAMP(MICROS, no-UTC-adjust)
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

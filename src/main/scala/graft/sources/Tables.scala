package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loaders for the driver test data
  * (`/root/testdata/sf*`; schemas in FIXTURES.md §1).
  *
  * Columnar-first by design (SURVEY §1.3): parquet + vectorized reader +
  * whole-stage codegen; filters/projections push into the scan via Catalyst.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot represent as
  * a timestamp; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * and this loader converts the raw nanos to a microsecond timestamp by
  * truncation — exactly what DuckDB does when it reads TIMESTAMP_NS, so the
  * oracle sees identical values.
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
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Output paths (SURVEY §1.4 output rows + §2.A A32): parquet primary,
  * csv/text compat (the reference's `saveAsTextFile`:
  * `graph/Util.scala:210-218`), compression options
  * (`PrefixSpanRunner.scala:183-184` uses LZ4), partitioned layout for
  * scale, and catalog DDL + insert (`PageRankHiveRunner.scala:59-67`).
  */
object Writers {

  /** Primary sink: parquet, optionally hash-partitioned by columns so
    * downstream scans prune partitions. */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      compression: String = "snappy"): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** ORC sink, pairing with Readers.orc for the reference's ORC flows. */
  def orc(df: DataFrame, path: String, compression: String = "snappy"): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", compression)
      .orc(path)

  /** CSV with header, compat with the reference's text outputs. */
  def csv(df: DataFrame, path: String, compression: String = "none"): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("compression", compression).csv(path)

  /** saveAsTextFile analogue: single string column, one line per row. */
  def text(df: DataFrame, path: String, sep: String = ","): Unit =
    df.select(concat_ws(sep, df.columns.map(col): _*).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)

  /** SequenceFile sink — the reference's PrefixSpan persistence shape
    * (`PrefixSpanRunner.scala:183-184`: `RDD[String]` as
    * `(NullWritable, Text)` records, LZ4-compressed). Rows are
    * flattened to one `sep`-joined line each (the [[text]] convention)
    * and written via Hadoop's SequenceFile with the requested codec —
    * LZ4 by default (lz4-java backed in Hadoop 3, no native lib
    * needed), `None` for uncompressed. Overwrite semantics match the
    * other sinks. Readable back with [[Readers.sequenceLines]] or any
    * `sc.sequenceFile[NullWritable, String]` consumer. */
  def sequenceFile(df: DataFrame, path: String, sep: String = ",",
      codec: Option[Class[_ <: org.apache.hadoop.io.compress.CompressionCodec]] =
        Some(classOf[org.apache.hadoop.io.compress.Lz4Codec])): Unit = {
    val sc = df.sparkSession.sparkContext
    val hpath = new org.apache.hadoop.fs.Path(path)
    val fs = hpath.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(hpath)) fs.delete(hpath, true)
    df.select(concat_ws(sep, df.columns.map(col): _*).as("value"))
      .rdd.map(r => (org.apache.hadoop.io.NullWritable.get(), r.getString(0)))
      .saveAsSequenceFile(path, codec)
  }

  /** DDL + insert path (A32): create a managed table and append —
    * the `create table` / `insert into ... select` flow of the Hive
    * runners, against the session catalog. */
  def createAndInsert(spark: SparkSession, df: DataFrame,
      table: String): Unit = {
    df.limit(0).write.mode(SaveMode.Overwrite).saveAsTable(table)
    df.write.mode(SaveMode.Append).insertInto(table)
  }

  /** JSONL sink — the training-data interchange format (one JSON object
    * per line). Compressed per-file (gzip default: universally readable
    * by tokenizer/loader tooling); pass `partitionBy` to lay out by
    * shard/split so trainers read a partition as a unit. */
  def jsonl(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      compression: String = "gzip"): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .json(path)
  }

  /** Sharded training-export write: one directory per shard
    * (`shard=N/`), each written by its own tasks after one hash exchange
    * on the shard column — the physical counterpart of
    * `llm/CorpusOps.shard`. Downstream trainers read a shard as a unit;
    * `repartition` on the shard key keeps every task writing exactly one
    * shard directory instead of every task appending to every shard
    * (files-per-shard = tasks-per-shard, not tasks × shards). */
  def sharded(df: DataFrame, path: String,
      shardCol: String = "shard"): Unit =
    df.repartition(col(shardCol))
      .write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(path)

  /** Bucketed managed table (A21/A22 at rest): rows are hash-bucketed
    * by `keys` at write time, so equi-joins and aggregations on those
    * keys between co-bucketed tables plan WITHOUT a shuffle — the
    * pre-partitioning survives restarts, unlike `repartition`, which
    * only lives for one lineage. At 100 TB this is the difference
    * between shuffling both fact tables per join and shuffling neither. */
  def bucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}

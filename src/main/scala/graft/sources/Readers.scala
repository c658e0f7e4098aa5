package graft.sources

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-format readers reproducing the reference's loader semantics
  * (SURVEY §1.4, FIXTURES §2). Each parses declaratively where possible
  * (spark.read + split/filter expressions) so projection and predicate
  * pushdown still apply downstream.
  */
object Readers {

  /** Columnar ORC scan — the reference genuinely reads ORC inputs
    * (`IDFRunner.scala:102`, `IncPageRankRunner.scala:102-110`); same
    * pushdown/pruning properties as the parquet path. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** libsvm sparse rows → (label, features) (`DTRunner.scala:201-216`). */
  def libsvm(spark: SparkSession, path: String, numFeatures: Int): DataFrame =
    spark.read.format("libsvm")
      .option("numFeatures", numFeatures.toString).load(path)

  /** One comma-joined double vector per line (`CovRunner.scala:97-99`).
    * Returns (row_id, features: array<double>). Blank lines are skipped
    * (structural quirk); a non-numeric VALUE inside a non-blank line
    * rejects loudly under ANSI — silently nulling one coordinate of a
    * dense vector would be wrong data, not tolerance. */
  def csvVectors(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .select(monotonically_increasing_id().as("row_id"),
        transform(split(col("value"), ","), s => s.cast("double"))
          .as("features"))

  /** COO triplets `row col value` (`PCARunner.scala:133-141`); sep
    * configurable like the reference's broadcast separator. */
  def coo(spark: SparkSession, path: String, sep: String = " "): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%"))
      .select(split(col("value"), sep).as("f"))
      .filter(size(col("f")) >= 3)
      .select(
        // try_cast: a malformed line yields nulls (filtered) instead of
        // killing the whole scan under ANSI mode
        expr("try_cast(f[0] AS BIGINT)").as("row"),
        expr("try_cast(f[1] AS INT)").as("col"),
        expr("try_cast(f[2] AS DOUBLE)").as("value"))
      .filter(col("row").isNotNull && col("col").isNotNull &&
        col("value").isNotNull)

  /** COO → one ml SparseVector per row id (`SPCARunner.scala:140-153`). */
  def cooToSparseVectors(spark: SparkSession, cooDf: DataFrame,
      numCols: Int): DataFrame = {
    import spark.implicits._
    cooDf.groupBy("row")
      .agg(sort_array(collect_list(struct(col("col"), col("value"))))
        .as("cells"))
      .map { r =>
        val cells = r.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getInt(0), c.getDouble(1)))
        (r.getLong(0),
          Vectors.sparse(numCols, cells.map(_._1).toArray,
            cells.map(_._2).toArray))
      }.toDF("row", "features")
  }

  /** Edge list text: `src dst [weight]`, `#`/`%` comment lines, short
    * lines and non-numeric ids skipped, optional self-loop removal — the
    * reference's loader family (`graph/Util.scala:15-161`). A MISSING
    * third column defaults to `defaultWeight`; a PRESENT-but-unparseable
    * one skips the line (defaulting it would be silent wrong data).
    * split regex = whitespace runs. */
  def edgeList(spark: SparkSession, path: String, sep: String = "\\s+",
      defaultWeight: Double = 1.0, dropSelfLoops: Boolean = true): DataFrame = {
    val parsed = spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%"))
      .select(split(trim(col("value")), sep).as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        expr("try_cast(f[0] AS BIGINT)").as("src"),
        expr("try_cast(f[1] AS BIGINT)").as("dst"),
        size(col("f")).as("n"),
        // get(): NULL past the end instead of the ANSI index error
        expr("try_cast(get(f, 2) AS DOUBLE)").as("w3"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        (col("n") < 3 || col("w3").isNotNull))
      .select(col("src"), col("dst"),
        coalesce(col("w3"), lit(defaultWeight)).as("weight"))
    if (dropSelfLoops) parsed.filter(col("src") =!= col("dst")) else parsed
  }

  /** `(vid,comm)` community pairs, parens stripped (`graph/Util.scala:58-80`).
    * Loader-family skip contract: comment lines (`#`/`%`), short lines
    * and non-numeric ids are dropped, like the reference's tolerant
    * graph loaders (`CycleDetectionWithConstrainsRunner.scala:64-89`). */
  def communityPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%"))
      .select(split(regexp_replace(col("value"), "[()\\s]", ""), ",").as("f"))
      .filter(size(col("f")) >= 2)
      .select(expr("try_cast(f[0] AS BIGINT)").as("node"),
        expr("try_cast(f[1] AS BIGINT)").as("community"))
      .filter(col("node").isNotNull && col("community").isNotNull)

  /** PrefixSpan IBM sequence format: space-separated ints, `-1` ends an
    * itemset, `-2` ends the sequence (`PrefixSpanRunner.scala:125-146`).
    * Returns (sequence: array<array<int>>). */
  def sequences(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        filter(
          transform(
            // itemsets are the -1-delimited groups, minus the -2 terminator
            split(regexp_replace(col("value"), "\\s*-2\\s*$", ""), "\\s+-1\\s*"),
            g => filter(transform(split(trim(g), "\\s+"),
              s => s.cast("int")), x => x.isNotNull)),
          a => size(a) > 0).as("sequence"))
      .filter(size(col("sequence")) > 0)

  /** `label,f1 f2 f3 …` SVM CSV (`SVMRunner.scala:106-109`). Lines
    * without the label/features comma or with a non-numeric label are
    * skipped (structural quirks); a corrupt FEATURE value inside a
    * structurally valid line rejects loudly under ANSI. */
  def svmCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), ",").as("f"))
      .filter(size(col("f")) >= 2)
      .select(expr("try_cast(f[0] AS DOUBLE)").as("label"),
        transform(split(trim(element_at(col("f"), 2)), "\\s+"),
          s => s.cast("double")).as("features"))
      .filter(col("label").isNotNull)

  /** Any serialized vector the reference's object files hold → ml. The
    * reference writes MLLIB types (`LDARunner.scala:144` reads
    * `RDD[(Long, mllib.linalg.Vector)]`; `ALSRunner.scala:125` reads
    * `RDD[mllib.linalg.SparseVector]`), so deserializing straight into
    * an ml type ClassCastExceptions on genuine reference data. */
  private def toML(v: Any): org.apache.spark.ml.linalg.Vector = v match {
    case m: org.apache.spark.ml.linalg.Vector    => m
    case m: org.apache.spark.mllib.linalg.Vector => m.asML
    case other => throw new IllegalArgumentException(
      s"object file holds ${other.getClass.getName}, expected an " +
        "ml.linalg or mllib.linalg Vector")
  }

  /** Spark object-file compat pair (the reference loads java-serialized
    * `(id, mllib.Vector)` RDDs via `sc.objectFile`: `LDARunner.scala:144`;
    * `KMeansRunner.scala:119-124` reads the Mahout SequenceFile cousin).
    * Accepts both mllib- and ml-typed payloads (converted via `.asML`).
    * Kept ONLY so existing object-file datasets can be ingested — SURVEY
    * §1.4 standardizes on parquet (java serialization is neither
    * splittable-friendly nor cross-version stable), so the expected use
    * is objectVectors → write.parquet once, then parquet thereafter. */
  def objectVectors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .objectFile[(Long, Any)](path)
      .map { case (id, v) => (id, toML(v)) }
      .toDF("row", "features")
  }

  /** Bare per-element vectors with no id (`ALSRunner.scala:125` reads
    * `RDD[mllib.SparseVector]`) — row ids assigned by element order. */
  def objectSparseRows(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.objectFile[Any](path)
      .zipWithIndex()
      .map { case (v, i) => (i, toML(v)) }
      .toDF("row", "features")
  }

  /** Rating triples (`SimRankRunner.scala:110` reads
    * `RDD[ml.recommendation.ALS.Rating[Int]]`; the mllib
    * `recommendation.Rating` shape from `ALSRunner.scala:9` also
    * accepted). */
  def objectRatings(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.objectFile[Any](path).map {
      case r: org.apache.spark.ml.recommendation.ALS.Rating[_] =>
        (r.user.asInstanceOf[Number].intValue,
          r.item.asInstanceOf[Number].intValue, r.rating.toDouble)
      case r: org.apache.spark.mllib.recommendation.Rating =>
        (r.user, r.product, r.rating)
      case other => throw new IllegalArgumentException(
        s"object file holds ${other.getClass.getName}, expected a Rating")
    }.toDF("user", "item", "rating")
  }

  /** Writer half of the compat pair — exists to round-trip-test the
    * reader and to produce fixtures shaped like the reference's inputs. */
  def saveObjectVectors(df: DataFrame, path: String,
      idCol: String = "row", vecCol: String = "features"): Unit =
    df.select(col(idCol), col(vecCol)).rdd
      .map(r => (r.getLong(0), r.getAs[org.apache.spark.ml.linalg.Vector](1)))
      .saveAsObjectFile(path)

  /** Text-payload SequenceFile reader — the read half of
    * [[Writers.sequenceFile]] and of the reference's verified-data
    * re-read (`PrefixSpanRunner.scala:170`:
    * `sc.sequenceFile[NullWritable, String]`). Codec (LZ4 or any other
    * registered Hadoop codec) is discovered from the file headers;
    * returns a single `value` string column. */
  def sequenceLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile[org.apache.hadoop.io.NullWritable, String](path)
      .map(_._2).toDF("value")
  }

  /** Mahout SequenceFile vectors — the reference's KMeans input
    * (`KMeansRunner.scala:119-124` reads
    * `sc.sequenceFile[LongWritable, VectorWritable]`). The Mahout jar is
    * not a dependency: [[MahoutVectorWritable]] implements the published
    * Apache Mahout `VectorWritable` wire format and is aliased to the
    * Mahout class name (which SequenceFile headers carry) through
    * Hadoop's `WritableName` registry. [[MahoutSequenceFileInputFormat]]
    * performs that registration inside `getRecordReader`, i.e. in
    * whichever JVM actually opens the file — executor-safe on a real
    * cluster, where a driver-side static registration would never reach
    * the task JVMs. Returns (row, features: array<double>). */
  def mahoutVectors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.hadoopFile(path,
        classOf[MahoutSequenceFileInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[MahoutVectorWritable])
      // Hadoop reuses Writable instances across records, but readFields
      // REPLACES the values array each record, so extracting the
      // reference here (before any shuffle/collect) is reuse-safe
      .map { case (k, v) => (k.get, v.values) }
      .toDF("row", "features")
  }

  /** `id\tv1,v2,…` KNN rows; id < testNum marks a query row
    * (`KNNRunner.scala:146-156`). Lines without the tab or with a
    * non-numeric id are skipped; corrupt coordinate values reject. */
  def knnTsv(spark: SparkSession, path: String, testNum: Long): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 2)
      .select(expr("try_cast(f[0] AS BIGINT)").as("id"),
        transform(split(element_at(col("f"), 2), ","), s => s.cast("float"))
          .as("embedding"))
      .filter(col("id").isNotNull)
      .withColumn("is_query", col("id") < testNum)
}

/** Wire-format stand-in for Apache Mahout's `VectorWritable` (public
  * format: one flags byte — dense 0x1 / sequential 0x2 / named 0x4 /
  * lax-precision 0x8 — an unsigned LSB-first varint size, then either
  * `size` doubles (floats when lax) for dense, or a varint nnz followed
  * by (index varint, value) pairs with delta-coded indices when
  * sequential; a flagged trailing name string is ignored). `write` emits
  * the dense non-lax shape, so files we produce are readable by genuine
  * Mahout consumers too. */
class MahoutVectorWritable extends org.apache.hadoop.io.Writable {
  var values: Array[Double] = Array.emptyDoubleArray

  /** Mahout Varint.readUnsignedVarInt: LSB-first 7-bit groups, high bit
    * continues. */
  private def readVarInt(in: java.io.DataInput): Int = {
    var v = 0; var shift = 0; var b = 0x80
    while ((b & 0x80) != 0) {
      b = in.readUnsignedByte()
      v |= (b & 0x7F) << shift
      shift += 7
    }
    v
  }

  private def writeVarInt(out: java.io.DataOutput, value0: Int): Unit = {
    var value = value0
    while ((value & 0xFFFFFF80) != 0) {
      out.writeByte((value & 0x7F) | 0x80); value >>>= 7
    }
    out.writeByte(value & 0x7F)
  }

  override def readFields(in: java.io.DataInput): Unit = {
    val flags = in.readByte()
    val lax = (flags & 0x08) != 0
    def value(): Double = if (lax) in.readFloat().toDouble else in.readDouble()
    val size = readVarInt(in)
    val arr = new Array[Double](size)
    if ((flags & 0x01) != 0) { // dense
      var i = 0
      while (i < size) { arr(i) = value(); i += 1 }
    } else {
      val nnz = readVarInt(in)
      val sequential = (flags & 0x02) != 0
      var last = 0
      var i = 0
      while (i < nnz) {
        val idx =
          if (sequential) { last += readVarInt(in); last }
          else readVarInt(in)
        arr(idx) = value()
        i += 1
      }
    }
    // a FLAG_NAMED (0x4) vector carries a trailing writeUTF name — nothing
    // after the values matters to the numeric payload, so don't read it
    values = arr
  }

  override def write(out: java.io.DataOutput): Unit = {
    out.writeByte(0x01 | 0x02) // dense + sequential, full precision
    writeVarInt(out, values.length)
    values.foreach(out.writeDouble)
  }
}

object MahoutVectorWritable {
  /** Alias this class to the name Mahout-written SequenceFile headers
    * declare. Hadoop's `WritableName` registry is JVM-static, so this
    * must run in the JVM that opens the reader — see
    * [[MahoutSequenceFileInputFormat]]. Idempotent. */
  def register(): Unit = org.apache.hadoop.io.WritableName.setName(
    classOf[MahoutVectorWritable], "org.apache.mahout.math.VectorWritable")
}

/** SequenceFileInputFormat that registers the [[MahoutVectorWritable]]
  * name alias at `getRecordReader` time — the one hook guaranteed to run
  * in every JVM (driver or executor) before `SequenceFile.Reader.init`
  * resolves the header's value-class name. */
class MahoutSequenceFileInputFormat
    extends org.apache.hadoop.mapred.SequenceFileInputFormat[
      org.apache.hadoop.io.LongWritable, MahoutVectorWritable] {
  override def getRecordReader(
      split: org.apache.hadoop.mapred.InputSplit,
      job: org.apache.hadoop.mapred.JobConf,
      reporter: org.apache.hadoop.mapred.Reporter)
      : org.apache.hadoop.mapred.RecordReader[
        org.apache.hadoop.io.LongWritable, MahoutVectorWritable] = {
    MahoutVectorWritable.register()
    super.getRecordReader(split, job, reporter)
  }
}

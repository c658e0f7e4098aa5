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
    * Returns (row_id, features: array<double>). */
  def csvVectors(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
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

  /** Edge list text: `src dst [weight]`, `#`/`%` comment lines and short
    * lines skipped, optional self-loop removal — the reference's loader
    * family (`graph/Util.scala:15-161`). split regex = whitespace runs. */
  def edgeList(spark: SparkSession, path: String, sep: String = "\\s+",
      defaultWeight: Double = 1.0, dropSelfLoops: Boolean = true): DataFrame = {
    val parsed = spark.read.text(path)
      .filter(!col("value").startsWith("#") && !col("value").startsWith("%"))
      .select(split(trim(col("value")), sep).as("f"))
      .filter(size(col("f")) >= 2)
      .select(
        expr("try_cast(f[0] AS BIGINT)").as("src"),
        expr("try_cast(f[1] AS BIGINT)").as("dst"),
        coalesce(
          when(size(col("f")) >= 3, expr("try_cast(f[2] AS DOUBLE)")),
          lit(defaultWeight)).as("weight"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    if (dropSelfLoops) parsed.filter(col("src") =!= col("dst")) else parsed
  }

  /** `(vid,comm)` community pairs, parens stripped (`graph/Util.scala:58-80`). */
  def communityPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(regexp_replace(col("value"), "[()\\s]", ""), ",").as("f"))
      .filter(size(col("f")) >= 2)
      .select(element_at(col("f"), 1).cast("long").as("node"),
        element_at(col("f"), 2).cast("long").as("community"))

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

  /** `label,f1 f2 f3 …` SVM CSV (`SVMRunner.scala:106-109`). */
  def svmCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("double").as("label"),
        transform(split(trim(element_at(col("f"), 2)), "\\s+"),
          s => s.cast("double")).as("features"))

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

  /** `id\tv1,v2,…` KNN rows; id < testNum marks a query row
    * (`KNNRunner.scala:146-156`). */
  def knnTsv(spark: SparkSession, path: String, testNum: Long): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "\t").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("id"),
        transform(split(element_at(col("f"), 2), ","), s => s.cast("float"))
          .as("embedding"))
      .withColumn("is_query", col("id") < testNum)
}

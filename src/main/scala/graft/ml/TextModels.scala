package graft.ml

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, IDF, StringIndexer}
import org.apache.spark.ml.fpm.PrefixSpan
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text / recommendation / sequence models (SURVEY §2.B B15–B18):
  * IDF, ALS, LDA, PrefixSpan — stock `spark.ml` estimators over inputs
  * derived from the fixture tables.
  * Reference: `ml/IDFRunner.scala:102-111`, `ml/ALSRunner.scala:169-239`,
  * `ml/LDARunner.scala:133-187`, `ml/PrefixSpanRunner.scala:150-154`.
  */
object TextModels {

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** documents → (doc_id, tokens) — the upstream of IDF and LDA. */
  def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("tokens"))

  /** IDF over a CountVectorizer term-frequency column; output =
    * (term, idf) for every vocabulary term, idf = ln((m+1)/(df+1)). */
  def idf(spark: SparkSession, docs: DataFrame, vocabSize: Int = 64): DataFrame = {
    import spark.implicits._
    val toks = tokenized(docs)
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
      .setVocabSize(vocabSize).fit(toks)
    val idfModel = new IDF().setInputCol("tf").setOutputCol("tfidf")
      .fit(cv.transform(toks))
    cv.vocabulary.zip(idfModel.idf.toArray)
      .map { case (t, v) => (t, r4(v)) }
      .toSeq.toDF("term", "idf").orderBy("term")
  }

  /** events → implicit ratings (user, event_type item) → ALS factors.
    * Output = per-(user, item) predicted rating for the observed pairs,
    * plus rank/rmse metadata — bounded by |users|×|types|. */
  /** Deterministic NMF topic model — the oracle-checkable companion to
    * the LDA wrapper (EM from seeded Dirichlet randoms: no external
    * engine can replay the stock fit). Lee–Seung multiplicative updates
    * on the doc×term count matrix with a deterministic arithmetic init
    * (1 + ((row+col) mod 3)/4), factors floor-rounded 1e-6 after every
    * half-update so cross-engine summation order cannot drift. Every
    * step is a join+agg matrix product: W stays partitioned by doc, the
    * k×vocab H and k×k Grams are broadcast-scale. Output: the topic-term
    * matrix H, rounded — the same "topics as term weights" shape the LDA
    * query emits. */
  def nmfFixed(spark: SparkSession, docs: DataFrame, k: Int = 3,
      iters: Int = 3, vocabSize: Int = 64): DataFrame = {
    import spark.implicits._
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("c"))
      .select(col("term"), (row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("c"), asc("term"))) - 1).as("r"))
      .filter(col("r") < vocabSize).cache()
    val v = tok.join(broadcast(vocab), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast("double").as("v"))
      .cache()
    val topics = spark.range(k).select(col("id").as("t"))
    var w = docs.select(col("doc_id")).distinct().crossJoin(topics)
      .select(col("doc_id"), col("t"),
        (lit(1.0) + pmod(col("doc_id") + col("t"), lit(3)) * 0.25).as("w"))
    var h = vocab.crossJoin(topics)
      .select(col("t"), col("term"),
        (lit(1.0) + pmod(col("r") + col("t"), lit(3)) * 0.25).as("h"))
    for (_ <- 1 to iters) {
      // H ← H ⊙ WᵀV / WᵀWH
      val wtv = w.join(v, Seq("doc_id"))
        .groupBy("t", "term").agg(sum(col("w") * col("v")).as("wtv"))
      val wtw = w.join(w.select(col("doc_id"), col("t").as("t2"),
          col("w").as("w2")), Seq("doc_id"))
        .groupBy("t", "t2").agg(sum(col("w") * col("w2")).as("g"))
      val wtwh = wtw.join(h.select(col("t").as("t2"), col("term"),
          col("h").as("h2")), Seq("t2"))
        .groupBy("t", "term").agg(sum(col("g") * col("h2")).as("d"))
      h = h.join(wtv, Seq("t", "term"), "left").join(wtwh, Seq("t", "term"))
        .select(col("t"), col("term"),
          r6(col("h") * coalesce(col("wtv"), lit(0.0)) / col("d")).as("h"))
        .localCheckpoint()
      // W ← W ⊙ VHᵀ / WHHᵀ
      val vht = v.join(h, Seq("term"))
        .groupBy("doc_id", "t").agg(sum(col("v") * col("h")).as("vht"))
      val hht = h.join(h.select(col("t").as("t2"), col("term"),
          col("h").as("h2")), Seq("term"))
        .groupBy("t", "t2").agg(sum(col("h") * col("h2")).as("g"))
      val whht = w.select(col("doc_id"), col("t").as("t2"), col("w"))
        .join(hht, Seq("t2"))
        .groupBy("doc_id", "t").agg(sum(col("w") * col("g")).as("d"))
      w = w.join(vht, Seq("doc_id", "t"), "left").join(whht, Seq("doc_id", "t"))
        .select(col("doc_id"), col("t"),
          r6(col("w") * coalesce(col("vht"), lit(0.0)) / col("d")).as("w"))
        .localCheckpoint()
    }
    val out = h.select(col("t").as("topic"), col("term"),
      (floor(col("h") * 1e4 + 0.5) / 1e4).as("weight"))
      .orderBy("topic", "term")
    vocab.unpersist(blocking = false)
    v.unpersist(blocking = false)
    out
  }

  /** Deterministic rank-1 alternating least squares — the oracle-checkable
    * companion to the stock [[als]] wrapper (whose seeded random factor
    * init no external engine can replay). Item factors start at 1.0; each
    * half-step solves the rank-1 normal equation over the observed
    * ratings exactly — x_u = Σ r_ui·y_i / (Σ y_i² + λ), then y_i
    * symmetrically — with factors rounded to 1e-6 per half-step on both
    * sides so cross-engine summation order cannot drift. Each half-step
    * is one join + keyed aggregation (shuffle by user or item); factors
    * never touch the driver. Output shape matches [[als]]:
    * per-pair predictions + an rmse summary row. */
  def alsFixed(spark: SparkSession, events: DataFrame, iters: Int = 5,
      lambda: Double = 0.1): DataFrame = {
    import spark.implicits._
    def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
    val indexed = new StringIndexer().setInputCol("event_type")
      .setOutputCol("item").fit(events).transform(events)
    val ratings = indexed.groupBy(
        col("user_id").cast("int").as("user"), col("item").cast("int").as("item"))
      .agg(avg("value").cast("float").cast("double").as("rating")).cache()
    var items = ratings.select("item").distinct()
      .select(col("item"), lit(1.0).as("y"))
    var users: DataFrame = null
    for (_ <- 1 to iters) {
      users = ratings.join(items, Seq("item"))
        .groupBy("user")
        .agg((sum(col("rating") * col("y")) /
          (sum(col("y") * col("y")) + lambda)).as("x"))
        .select(col("user"), r6(col("x")).as("x")).localCheckpoint()
      items = ratings.join(users, Seq("user"))
        .groupBy("item")
        .agg((sum(col("rating") * col("x")) /
          (sum(col("x") * col("x")) + lambda)).as("y"))
        .select(col("item"), r6(col("y")).as("y")).localCheckpoint()
    }
    val preds = ratings.join(users, Seq("user")).join(items, Seq("item"))
      .select(col("user"), col("item"), col("rating"),
        (col("x") * col("y")).as("p")).cache()
    val rmse = math.sqrt(preds
      .select(avg(pow(col("rating") - col("p"), 2))).head().getDouble(0))
    preds.select(col("user").cast("long").as("user"),
        col("item").cast("long").as("item"),
        (floor(col("p") * 1e4 + 0.5) / 1e4).as("pred"))
      .orderBy("user", "item")
      .union(Seq((-1L, -1L, r4(rmse))).toDF("user", "item", "pred"))
  }

  def als(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val indexed = new StringIndexer().setInputCol("event_type")
      .setOutputCol("item").fit(events).transform(events)
    val ratings = indexed.groupBy(
        col("user_id").cast("int").as("user"), col("item").cast("int").as("item"))
      .agg(avg("value").cast("float").as("rating"))
    val m = new ALS().setRank(4).setMaxIter(5).setSeed(2020L)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setColdStartStrategy("drop")
      .fit(ratings)
    val preds = m.transform(ratings)
    val rmse = math.sqrt(preds
      .select(avg(pow(col("rating") - col("prediction"), 2))).head().getDouble(0))
    preds.select(col("user").cast("long").as("user"),
        col("item").cast("long").as("item"),
        (floor(col("prediction") * 100 + 0.5) / 100).as("pred"))
      .orderBy("user", "item")
      .union(Seq((-1L, -1L, r4(rmse))).toDF("user", "item", "pred"))
  }

  /** LDA topic model over tokenized documents; output = top terms per
    * topic (topic, position, term_index, weight). */
  def lda(spark: SparkSession, docs: DataFrame, k: Int = 5): DataFrame = {
    val toks = tokenized(docs)
    val cv = new CountVectorizer().setInputCol("tokens").setOutputCol("features")
      .setVocabSize(64).fit(toks)
    val m = new LDA().setK(k).setMaxIter(10).setSeed(2020L)
      .setOptimizer("em").fit(cv.transform(toks))
    m.describeTopics(5)
      .select(col("topic"), posexplode(col("termIndices")).as(Seq("position", "term_index")))
      .orderBy("topic", "position")
  }

  /** events → per-user event-type sequences ordered by time → PrefixSpan
    * frequent sequential patterns. Output = (pattern, freq), canonical
    * string form like the reference (`PrefixSpanRunner.scala:156-161`). */
  def prefixSpan(spark: SparkSession, events: DataFrame,
      minSupport: Double = 0.2): DataFrame = {
    val seqs = events
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => array(e.getField("event_type")))
        .as("sequence"))
    new PrefixSpan().setMinSupport(minSupport).setMaxPatternLength(3)
      .setMaxLocalProjDBSize(32000000)
      .findFrequentSequentialPatterns(seqs)
      .select(
        concat_ws(";", transform(col("sequence"), s => concat_ws(",", s)))
          .as("pattern"),
        col("freq"))
      .orderBy("pattern")
  }
}

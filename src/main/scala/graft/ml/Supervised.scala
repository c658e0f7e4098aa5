package graft.ml

import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, LinearSVC, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.{DecisionTreeRegressor, GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Supervised-learning surface (SURVEY §2.B B2–B7): linear/logistic
  * regression, linear SVM, decision tree, random forest, GBT — all stock
  * `spark.ml` estimators (the reference wraps the same classes:
  * `ml/LinRRunner.scala:161-191`, `ml/LogRRunner.scala:146-161`,
  * `ml/SVMRunner.scala:112-143`, `ml/DTRunner.scala:236-302`,
  * `ml/RFRunner.scala:162-301`, `ml/GBDTRunner.scala:139-259`).
  *
  * Feature plumbing is columnar: `VectorAssembler` over numeric lineitem
  * columns for the regression tasks; `array_to_vector(embedding)` + the
  * fixture's `label` for multi-class tasks. Seeds are pinned
  * (reference pins seed 2020: `GBDTRunner.scala:182,198`). Outputs are
  * small deterministic summaries (coefficients / per-class counts /
  * accuracy), never the raw prediction set — driver-side result size is
  * O(features + classes) regardless of data scale.
  */
object Supervised {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The iteration caps on the SVC fits exist to dodge OWLQN's NaN
    * line-search thrash on flat hinge gradients — but a cap without a
    * convergence check silently under-converges on OTHER data. Warn when
    * a capped fit exhausts its iterations without meeting tol so the
    * condition is visible instead of silent. */
  private def warnIfCapped(name: String,
      totalIterations: Int, maxIter: Int): Unit =
    if (totalIterations >= maxIter)
      log.warn(s"$name hit its iteration cap ($maxIter) before the tol " +
        "convergence criterion; coefficients may be under-converged. The " +
        "cap avoids OWLQN NaN-thrash on flat hinge gradients — raise " +
        "maxIter only with data where the gradient stays informative.")

  /** OWLQN thrash detector: breeze's `Failure! Resetting history:
    * NaNHistory` shows up in `objectiveHistory` as a non-finite entry or
    * an objective INCREASE (the reset re-baselines the line search —
    * probed at sf0.1: [.., 0.7037, 0.99998, ..] and [.., 0.667, 2.705,
    * ..] around each logged reset). A healthy OWLQN trajectory is finite
    * and non-increasing. */
  private[ml] def owlqnHealthy(history: Array[Double]): Boolean =
    history.forall(v => !v.isNaN && !v.isInfinite) &&
      history.sliding(2).forall(p => p.length < 2 || p(1) <= p(0) + 1e-9)

  /** Converged-in-practice: the objective's tail improvement is below
    * `tol` relative — covers breeze runs that report totalIterations ≥
    * maxIter yet sit numerically flat (probed: cap-40 run reports 42
    * "iterations" with the last 10 entries identical to 1e-10). */
  private[ml] def tailFlat(history: Array[Double], tol: Double): Boolean =
    history.length >= 3 && {
      val last = history.takeRight(3)
      val base = math.max(math.abs(last.head), 1e-12)
      math.abs(last.head - last.last) / base <= tol * 10
    }

  /** lineitem → (features = [quantity, discount, tax], label = extendedprice). */
  def lineitemFeatures(lineitem: DataFrame): DataFrame =
    new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_discount", "l_tax"))
      .setOutputCol("features")
      .transform(lineitem)
      .select(col("features"), col("l_extendedprice").as("label"),
        (col("l_returnflag") === "R").cast("double").as("bin_label"))

  /** embeddings → (features = vector(embedding), label). */
  def embeddingFeatures(embeddings: DataFrame): DataFrame =
    embeddings.select(
      array_to_vector(col("embedding")).as("features"),
      col("label").cast("double").as("label"))

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** Standardize (features, y) before a linear fit: the raw lineitem
    * ranges differ ~500× (quantity 1–50 vs tax 0–0.08) and the hinge /
    * logistic OWLQN optimizer NaNs and restarts on them even with its
    * internal standardization on (observed: repeated `ERROR OWLQN:
    * Failure! Resetting history: breeze.optimize.NaNHistory` in every
    * bench run). Returns the scaled frame plus (mean, std) so fitted
    * coefficients can be mapped back to original feature units:
    * f(x) = Σ cᵢ(xᵢ−μᵢ)/σᵢ + b = Σ (cᵢ/σᵢ)xᵢ + (b − Σ cᵢμᵢ/σᵢ). */
  private def standardized(data: DataFrame): (DataFrame, Array[Double], Array[Double]) = {
    val sm = new org.apache.spark.ml.feature.StandardScaler()
      .setWithMean(true).setWithStd(true)
      .setInputCol("features").setOutputCol("scaled")
      .fit(data)
    val sd = sm.std.toArray.map(s => if (s == 0.0) 1.0 else s)
    // persisted: a raw isolated LinearSVC fit on the unpersisted chain
    // re-derives assembler+scaler from parquet (measured 15.1 -> 8.1 s
    // at sf0.1 when cached); in-library the fit's internal blockify
    // already amortizes most of that, so the e2e gain is modest — the
    // cache mainly spares the logistic summary pass. Callers unpersist
    // once the fit and its summary are read.
    (sm.transform(data).select(col("scaled").as("features"), col("y"))
      .persist(), sm.mean.toArray, sd)
  }

  private def linearSummary(coef: Array[Double], intercept: Double,
      mu: Array[Double], sd: Array[Double], acc: Double): Seq[(String, Double)] = {
    val orig = coef.zip(sd).map { case (c, s) => c / s }
    val b = intercept - orig.zip(mu).map { case (c, m) => c * m }.sum
    (orig.zipWithIndex.map { case (c, i) => (s"coef_$i", r4(c)) } :+
      ("intercept", r4(b)) :+ ("accuracy", r4(acc))).toSeq
  }

  /** Linear regression; output = per-feature coefficient + intercept + rmse. */
  def linearRegression(spark: SparkSession, lineitem: DataFrame): DataFrame =
    linearRegressionOn(spark, lineitem,
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice")

  /** [[linearRegression]] over an arbitrary feature subset + label —
    * regParam 0 keeps the fit on the closed-form normal-equation
    * solver at any column choice, so the Cramer oracle replays it
    * exactly (the fuzz grid permutes the lineitem numerics). */
  def linearRegressionOn(spark: SparkSession, lineitem: DataFrame,
      features: Seq[String], label: String): DataFrame = {
    import spark.implicits._
    val data = new VectorAssembler()
      .setInputCols(features.toArray).setOutputCol("features")
      .transform(lineitem)
      .select(col("features"), col(label).as("label"))
    val m = new LinearRegression().setMaxIter(10).setRegParam(0.0)
      .setLabelCol("label").fit(data)
    (m.coefficients.toArray.zipWithIndex
      .map { case (c, i) => (s"coef_$i", r4(c)) } :+
      ("intercept", r4(m.intercept)) :+
      ("rmse", r4(m.summary.rootMeanSquaredError)))
      .toSeq.toDF("term", "value").orderBy("term")
  }

  /** Binomial logistic regression; output = coefficients (original
    * feature units) + train accuracy. */
  def logisticRegression(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    val data = lineitemFeatures(lineitem).withColumnRenamed("bin_label", "y")
    val (scaled, mu, sd) = standardized(data)
    val m = new LogisticRegression().setMaxIter(10).setLabelCol("y").fit(scaled)
    // the fit already scored the training data: summary.accuracy is the
    // same y == prediction fraction, without re-running the assembler +
    // scaler + model over the corpus twice more
    val acc = m.summary.accuracy
    scaled.unpersist(blocking = false)
    linearSummary(m.coefficients.toArray, m.intercept, mu, sd, acc)
      .toDF("term", "value").orderBy("term")
  }

  /** Linear SVM (hinge loss); output = coefficients (original feature
    * units) + train accuracy. */
  def linearSvc(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    val data = lineitemFeatures(lineitem).withColumnRenamed("bin_label", "y")
    val (scaled, mu, sd) = standardized(data)
    // Data-driven iteration policy (round-8 verdict: a constant cap
    // tuned to this corpus is fragile if fixtures change). Fit cheap
    // (5 iters), then inspect the objective history: on a HEALTHY but
    // unconverged trajectory escalate once to a generous cap (the
    // gradient is informative — more iterations buy a better optimum);
    // on detected OWLQN NaN-thrash (history reset ⇒ objective increase,
    // the signature this lineitem fixture shows from iteration ~4 at
    // every SF) keep the capped fit — the probed cap-40 run spends 3×
    // the time recovering through two more resets only to land the same
    // near-zero-coefficient majority solution (acc 0.666625 = prior).
    def fitWith(cap: Int) = new LinearSVC().setMaxIter(cap).setTol(1e-6)
      .setRegParam(0.1).setLabelCol("y").fit(scaled)
    val tol = 1e-6
    val first = fitWith(5)
    val h0 = first.summary.objectiveHistory
    val m =
      if (!owlqnHealthy(h0)) {
        log.info("LinearSVC(linearSvc): OWLQN NaN-thrash detected in the " +
          "objective history (reset ⇒ increase); keeping the 5-iteration " +
          "fit rather than escalating through further resets.")
        first
      } else if (tailFlat(h0, tol) || first.summary.totalIterations < 5) {
        first // converged (by tol or numerically flat tail) — done
      } else {
        val second = fitWith(40)
        val h1 = second.summary.objectiveHistory
        if (!owlqnHealthy(h1)) {
          // the escalated run itself hit OWLQN NaN-thrash: its extra 35
          // iterations recovered through resets, not improvement — keep
          // the healthy 5-iteration fit (the same policy the initial
          // history gets; previously the health check only gated the log)
          log.info("LinearSVC(linearSvc): escalated 40-iteration fit " +
            "thrashed (reset ⇒ objective increase); keeping the healthy " +
            "5-iteration fit.")
          first
        } else {
          if (!tailFlat(h1, tol))
            warnIfCapped("LinearSVC(linearSvc)",
              second.summary.totalIterations, 40)
          second
        }
      }
    // same accuracy definition as the former transform+count, computed
    // by the fit's own training summary — saves two corpus passes
    val acc = m.summary.accuracy
    scaled.unpersist(blocking = false)
    linearSummary(m.coefficients.toArray, m.intercept, mu, sd, acc)
      .toDF("term", "value").orderBy("term")
  }

  /** Decision tree classifier on embeddings; output = confusion summary
    * (label, prediction, cnt). */
  def decisionTree(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val data = embeddingFeatures(embeddings)
    val m = new DecisionTreeClassifier().setMaxDepth(5).setSeed(2020L)
      .fit(data)
    m.transform(data)
      .groupBy(col("label").cast("long").as("label"),
        col("prediction").cast("long").as("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("label", "prediction")
  }

  /** Random forest on embeddings; output = accuracy + top feature importances. */
  def randomForest(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    import spark.implicits._
    val data = embeddingFeatures(embeddings)
    val m = new RandomForestClassifier().setNumTrees(10).setMaxDepth(5)
      .setSeed(2020L).fit(data)
    val acc = new MulticlassClassificationEvaluator().setMetricName("accuracy")
      .evaluate(m.transform(data))
    val top = m.featureImportances.toArray.zipWithIndex
      .sortBy { case (v, i) => (-v, i) }.take(5)
      .map { case (v, i) => (s"importance_$i", r4(v)) }
    (("accuracy", r4(acc)) +: top.toSeq).toDF("term", "value")
  }

  /** Tree-family regressors (the clf+reg dual surface of B5–B7; the
    * reference runs both heads of each family, `DTRunner.scala:347-407`,
    * `RFRunner.scala:162-301`, `GBDTRunner.scala:139-259`). Output =
    * (term, value) rmse summary — small and deterministic. */
  private def regSummary(spark: SparkSession, name: String,
      data: DataFrame, predicted: DataFrame): DataFrame = {
    import spark.implicits._
    val rmse = math.sqrt(predicted
      .select(avg(pow(col("label") - col("prediction"), 2)))
      .head().getDouble(0))
    Seq((s"${name}_rmse", r4(rmse))).toDF("term", "value")
  }

  def decisionTreeRegressor(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    val data = lineitemFeatures(lineitem)
    val m = new DecisionTreeRegressor().setMaxDepth(5).setSeed(2020L).fit(data)
    regSummary(spark, "dtree", data, m.transform(data))
  }

  def randomForestRegressor(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    val data = lineitemFeatures(lineitem)
    val m = new RandomForestRegressor().setNumTrees(10).setMaxDepth(5)
      .setSeed(2020L).fit(data)
    regSummary(spark, "rf", data, m.transform(data))
  }

  def gbtRegressor(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    val data = lineitemFeatures(lineitem)
    val m = new GBTRegressor().setMaxIter(5).setMaxDepth(3).setSeed(2020L)
      .fit(data)
    regSummary(spark, "gbt", data, m.transform(data))
  }

  /** Derived-rule fixture: label = a threshold rule on the first embedding
    * coordinate with the margin band EXCLUDED (|x| ≤ margin dropped), so a
    * correctly-fit model reproduces the rule exactly on the training set.
    * That makes the whole fit→predict path oracle-checkable: the DuckDB
    * oracle re-derives the rule instead of re-fitting the model (the
    * lloydFixed trick applied to supervised estimators). Classification
    * label = x > 0; regression label = 10 / 20 step. */
  private def ruleData(embeddings: DataFrame, margin: Double): DataFrame = {
    val x = element_at(col("embedding"), 1).cast("double")
    embeddings.filter(abs(x) > margin)
      .select(col("vec_id"),
        array_to_vector(slice(col("embedding"), 1, 1)).as("features"),
        (x > 0).cast("double").as("y"),
        when(x < 0, 10.0).otherwise(20.0).as("yr"))
  }

  /** Tree-family variant of the rule fixture: the feature is COARSE
    * (floor(5x) — a handful of distinct integer levels), so tree split
    * candidates are the midpoints between consecutive levels and the only
    * perfect split is the rule boundary itself. A continuous feature does
    * NOT work here: maxBins quantile thresholds rarely fall inside a
    * margin gap, and the off-gap split misclassifies edge points. */
  private def treeRuleData(embeddings: DataFrame): DataFrame = {
    val f = floor(element_at(col("embedding"), 1).cast("double") * 5)
    embeddings.select(col("vec_id"),
      array_to_vector(array(f)).as("features"),
      (f >= 0).cast("double").as("y"),
      when(f < 0, 10.0).otherwise(20.0).as("yr"))
  }

  private def rulePred(fitted: DataFrame): DataFrame =
    fitted.select(col("vec_id"), col("prediction")).orderBy("vec_id")

  private def rulePredR4(fitted: DataFrame): DataFrame =
    fitted.select(col("vec_id"),
      (floor(col("prediction") * 1e4 + 0.5) / 1e4).as("prediction"))
      .orderBy("vec_id")

  /** Classifier fit+predict paths over the separable rule fixture —
    * output (vec_id, prediction) hash-matches the rule itself. */
  def logRegRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = ruleData(embeddings, 0.03)
    rulePred(new LogisticRegression().setMaxIter(100).setRegParam(0.0)
      .setLabelCol("y").fit(d).transform(d))
  }

  def svcRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = ruleData(embeddings, 0.03)
    // 20 iterations, not 100: the separable fixture converges to the
    // same coefficient (21.9401 at sf0.1, 4 dp) by iteration 20; past
    // ~25 OWLQN enters benign-but-noisy NaNHistory line-search resets
    val m = new LinearSVC().setMaxIter(20).setTol(1e-6).setRegParam(0.01)
      .setLabelCol("y").fit(d)
    if (!tailFlat(m.summary.objectiveHistory, 1e-6))
      warnIfCapped("LinearSVC(svcRule)", m.summary.totalIterations, 20)
    rulePred(m.transform(d))
  }

  def decisionTreeRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePred(new DecisionTreeClassifier().setMaxDepth(3).setSeed(2020L)
      .setLabelCol("y").fit(d).transform(d))
  }

  def randomForestRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePred(new RandomForestClassifier().setNumTrees(10).setMaxDepth(3)
      .setSeed(2020L).setLabelCol("y").fit(d).transform(d))
  }

  def gbtRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePred(new GBTClassifier().setMaxIter(5).setMaxDepth(2).setSeed(2020L)
      .setLabelCol("y").fit(d).transform(d))
  }

  /** Regressor fit+predict paths over the 10/20 step fixture: pure leaves
    * predict the exact step values (GBT with stepSize 1.0 so the first
    * tree absorbs the full residual and later trees fit zero). */
  def decisionTreeRegRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePredR4(new DecisionTreeRegressor().setMaxDepth(3).setSeed(2020L)
      .setLabelCol("yr").fit(d).transform(d))
  }

  def randomForestRegRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePredR4(new RandomForestRegressor().setNumTrees(10).setMaxDepth(3)
      .setSeed(2020L).setLabelCol("yr").fit(d).transform(d))
  }

  def gbtRegRule(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    val d = treeRuleData(embeddings)
    rulePredR4(new GBTRegressor().setMaxIter(10).setMaxDepth(3)
      .setStepSize(1.0).setSeed(2020L).setLabelCol("yr").fit(d).transform(d))
  }

  /** GBT binary classifier (returnflag R vs not) on lineitem features. */
  def gbt(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    val data = lineitemFeatures(lineitem).withColumnRenamed("bin_label", "y")
    val m = new GBTClassifier().setMaxIter(5).setMaxDepth(3).setSeed(2020L)
      .setLabelCol("y").fit(data)
    val acc = m.transform(data)
      .filter(col("y") === col("prediction")).count().toDouble / data.count()
    Seq(("accuracy", r4(acc)), ("num_trees", m.getNumTrees.toDouble))
      .toDF("term", "value").orderBy("term")
  }
}

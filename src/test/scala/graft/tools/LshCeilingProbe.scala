package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Past-cap evidence for the round-11 sign-LSH rung: the projection
  * ladder used to SATURATE at 10 floors/table (the int64 fold cap,
  * ~614k vectors) with a scaladoc escape hatch ("raise numTables or
  * prefer semDedup"); now the key hashes ≤10-floor groups and
  * [[Similarity.adaptiveTables]] adds a table per two rungs.
  *
  * Corpus: deterministic UNIT-NORM vectors (hash-seeded Box–Muller,
  * normalized) — the distribution the blocking targets ("each
  * projection is ~N(0,1) on a unit-norm corpus") and the testdata
  * embeddings' actual geometry. The 4.3M `wide` stress corpus is NOT
  * usable here: its vectors have norm ≈ 4.6, spreading every
  * projection over dozens of floor values — buckets degenerate to
  * singletons and no sizing shows any volume at all (measured: 451
  * candidate pairs at 614k vectors even at the capped sizing).
  *
  * At 614,400 and 1,843,200 (3×) vectors, measures:
  *  - DETERMINISTIC candidate pair volume Σ c·(c−1)/2 over (t, b)
  *    buckets — the verify-join driver — for (a) the old capped sizing
  *    (nproj = 10, 3 tables), (b) the new ladder rung (auto h/tables),
  *    (c) the smooth rung. The capped form must show the ~N² cliff
  *    (9× for 3× data) and the rungs stay near-linear.
  *  - blocking recall of 500 planted near-dup twins (deterministic
  *    0.95·v + 0.05·shift(v) blend, measured cosine printed) — the
  *    extra projections' recall price and the added tables' repayment.
  *
  * Run: sbt "Test/runMain graft.tools.LshCeilingProbe" */
object LshCeilingProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic unit-norm corpus: component j of vector v is a
    // Box–Muller normal seeded by xxhash64(v·64 + j), then the vector
    // normalizes — uniform on the sphere, the engine's target geometry
    def corpus(n: Long): DataFrame = {
      val raw = spark.range(n).repartition(32)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0L), lit(63L)), j => {
            val s = col("id") * 64L + j
            val u1 = (pmod(xxhash64(s, lit(1)), lit(1000003L))
              .cast("double") + 0.5) / 1000003.0
            val u2 = (pmod(xxhash64(s, lit(2)), lit(1000003L))
              .cast("double") + 0.5) / 1000003.0
            sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
          }).as("raw"))
      raw.select(col("vec_id"),
        transform(col("raw"), v => (v / sqrt(aggregate(col("raw"),
          lit(0.0), (a, x) => a + x * x))).cast("float")).as("embedding"))
    }

    def buckets(e: DataFrame, nT: Int, perTable: Seq[Int]): DataFrame =
      e.select(col("vec_id"),
          explode(Similarity.signBucketsExprPerTable(2.0, nT, 64,
            perTable)).as("tb"))
        .select(col("vec_id"), col("tb.t").as("t"), col("tb.b").as("b"))

    def pairVol(e: DataFrame, nT: Int, perTable: Seq[Int]): (Long, Double) = {
      val t0 = System.nanoTime()
      val v = buckets(e, nT, perTable)
        .groupBy("t", "b").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
      (v, (System.nanoTime() - t0) / 1e9)
    }

    // planted twins: a·v + (1−a)·(v cyclically shifted one dim) —
    // deterministic, near-dup by construction (cosine printed below);
    // a = 0.95 lands at cos ≈ 0.9986 (the near-dup regime the table
    // schedule is calibrated for), a = 0.80 at a moderate cosine, to
    // price the extra projections outside the calibrated regime
    def twins(e: DataFrame, nPlant: Int, a: Float): DataFrame =
      e.filter(col("vec_id") < nPlant)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"),
          zip_with(col("embedding"),
            concat(slice(col("embedding"), 2, 63),
              slice(col("embedding"), 1, 1)),
            (v, s) => (v * a + s * (1.0f - a))).as("embedding"))

    // end-to-end mode: run the FULL cosineNearDupPairs operator (auto
    // sizing — hashed folds + adaptiveTables past the cap) on a 614k
    // corpus with planted exact dups: candidates, dedup, verify join
    // and output all exercised at past-cap scale, not just the bucket
    // volumes the default mode counts
    if (args.headOption.contains("e2e")) {
      val n = 614400L
      val e0 = corpus(n)
      val planted = e0.union(
        e0.filter(col("vec_id") < 5)
          .select((col("vec_id") + 10000000L).as("vec_id"),
            col("embedding"))).localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = Similarity.cosineNearDupPairs(planted, tau = 0.999)
        .localCheckpoint()
      val nPairs = pairs.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val found = pairs.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ok = (0L until 5L).forall(i => found((i, i + 10000000L)))
      println(f"LSHCEIL e2e n=$n pairs=$nPairs wall=$wall%7.1f s " +
        s"plantedFound=$ok tables=${Similarity.adaptiveTables(n)} " +
        s"proj=${Similarity.adaptiveProjections(n)}")
      spark.stop()
      return
    }

    val recallOnly = args.headOption.contains("recall")
    for (n <- if (recallOnly) Seq(614400L) else Seq(614400L, 1843200L)) {
      val e = corpus(n).localCheckpoint()
      val hOld = 10
      val hNew = Similarity.adaptiveProjections(n)
      val tNew = Similarity.adaptiveTables(n)
      val smooth = Similarity.smoothProjections(n, tNew)
      println(s"LSHCEIL n=$n hOld=$hOld/3t hNew=$hNew/${tNew}t smooth=$smooth")
      if (!recallOnly) {
        val (vOld, wOld) = pairVol(e, 3, Seq.fill(3)(hOld))
        println(f"LSHCEIL n=$n mode=capped   pairVol=$vOld%-13d wall=$wOld%7.1f s")
        val (vNew, wNew) = pairVol(e, tNew, Seq.fill(tNew)(hNew))
        println(f"LSHCEIL n=$n mode=ladder   pairVol=$vNew%-13d wall=$wNew%7.1f s")
        val (vSm, wSm) = pairVol(e, tNew, smooth)
        println(f"LSHCEIL n=$n mode=smooth   pairVol=$vSm%-13d wall=$wSm%7.1f s")
      }

      // blocking recall of planted twins under each sizing, at the
      // calibrated near-dup cosine AND a moderate one
      for (a <- Seq(0.95f, 0.80f)) {
      val nPlant = 500
      val tw = twins(e, nPlant, a).localCheckpoint()
      def dotC(a: String, b: String) = aggregate(
        zip_with(col(a), col(b),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val cosTw = e.filter(col("vec_id") < nPlant)
        .select(col("vec_id"), col("embedding").as("ea"))
        .join(tw.select((col("vec_id") - 10000000L).as("vec_id"),
          col("embedding").as("eb")), Seq("vec_id"))
        .select((dotC("ea", "eb") /
          (sqrt(dotC("ea", "ea")) * sqrt(dotC("eb", "eb")))).as("c"))
        .agg(min(col("c")), avg(col("c"))).head()
      println(f"LSHCEIL n=$n planted twin cosine min=${cosTw.getDouble(0)}%6.4f avg=${cosTw.getDouble(1)}%6.4f")
      for ((label, nT, per) <- Seq(
        ("capped", 3, Seq.fill(3)(hOld)),
        ("ladder", tNew, Seq.fill(tNew)(hNew)),
        ("smooth", tNew, smooth))) {
        val bo = buckets(e.filter(col("vec_id") < nPlant), nT, per)
        val bt = buckets(tw, nT, per)
          .select((col("vec_id") - 10000000L).as("vec_id"),
            col("t"), col("b"))
        val hit = bo.join(bt, Seq("vec_id", "t", "b"))
          .select("vec_id").distinct().count()
        println(f"LSHCEIL n=$n a=$a mode=$label%-8s plantedRecall=${hit.toDouble / nPlant}%5.3f ($hit/$nPlant)")
      }
      }
    }
    spark.stop()
  }
}

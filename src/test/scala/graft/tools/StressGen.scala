package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stress-corpus generator for the round-9 scaling-curve evidence
  * (SCALE_r9.md): writes ×3 / ×10 replicas of the sf0.1 tables plus a
  * deliberately skewed ×3 variant, so the scale-killer-prone families
  * (dedup, ANN, graph) can be measured at multiple sizes with the
  * EXISTING Bench main (SPARK_GRAFT_SF_DIR=<stress dir>).
  *
  * Replication discipline — replicas must scale the WORK, not plant
  * artificial quadratic output:
  *  - documents: replica k tags every token with a "~k" suffix, so the
  *    replica's internal shingle structure is EXACTLY the base corpus's
  *    (verified pairs scale exactly ×k) while cross-replica vocabularies
  *    are disjoint (zero cross-replica shingle overlap). An earlier
  *    k-salted hash-sort scramble failed this: sorting every doc's
  *    tokens by a shared content-hash order canonicalizes vocab-sharing
  *    docs into subsequences of one global order, inflating ×3 pair
  *    output 1,465× (256 → 374,904 measured) — runtime growth was the
  *    output exploding, not the engine.
  *  - embeddings: replica k is the base vector cyclically shifted by k
  *    dims — norm-preserving (corpus is unit-normalized), genuinely
  *    distinct vectors, identical distance-compute cost.
  *  - lineitem: orderkey AND partkey offsets per replica → k disjoint
  *    graph copies (|V| and |E| both scale ×k).
  *  - events: id/user offsets per replica.
  *
  * The skew variant (×3 base) layers three degeneracies:
  *  - hot LSH band: every 50th doc becomes one 40-token template (+ a
  *    unique trailing token) → one ~2% near-identical cluster whose
  *    band bucket is quadratic if the engine doesn't bound it.
  *  - high-df fingerprint vocabulary: 30% of docs carry the same
  *    10-token boilerplate tail → winnow/containment rarest-df
  *    degeneracy (exercises the dfCap AND-rule).
  *  - dominant embedding cell: 30% of vectors collapse to a blend
  *    around one anchor vector → one IVF/Lloyd cell holds 30% of the
  *    corpus (probe and semdedup blocking skew); dominant event user
  *    (50% of events on one user_id).
  *
  * Run: sbt "Test/runMain graft.tools.StressGen /tmp/stress"
  */
object StressGen {

  private val base = "/root/testdata/sf0.1"
  private val passthrough =
    Seq("region", "nation", "customer", "supplier", "part", "orders")

  // the documents/embeddings replica transforms live in main
  // (graft.sources.StressReplicas) since round 14 — the bench's gated
  // pipeline_x10 corpus and these SCALE-rung variants must share ONE
  // replication discipline
  import graft.sources.StressReplicas.{shiftedEmbedding, taggedText}

  private def replicate(spark: SparkSession, table: String, copies: Int)
      (one: (DataFrame, Int) => DataFrame): DataFrame = {
    val b = spark.read.parquet(s"$base/$table.parquet")
    (0 until copies).map(k => one(b, k)).reduce(_ unionByName _)
  }

  private val boiler = (1 to 10).map(i => s"boilerplate$i").mkString(" ")
  private val template = (1 to 40).map(i => s"hotband$i").mkString(" ")

  def writeVariant(spark: SparkSession, out: String, copies: Int,
      skew: Boolean): Unit = {
    val docs0 = replicate(spark, "documents", copies) { (b, k) =>
      b.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        taggedText(k).as("text"), col("lang"), col("source"))
    }
    val docs1 =
      if (!skew) docs0
      else docs0
        .withColumn("text",
          when(col("doc_id") % 50 === 0,
            concat(lit(template), lit(" v"), col("doc_id").cast("string")))
            .when(col("doc_id") % 10 < 3,
              concat(col("text"), lit(" "), lit(boiler)))
            .otherwise(col("text")))
        .withColumn("source",
          when((col("doc_id") % 10).between(4, 7), lit("src0"))
            .otherwise(col("source")))
    docs1.withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb0 = replicate(spark, "embeddings", copies) { (b, k) =>
      b.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        shiftedEmbedding(k).as("embedding"), col("label"))
    }
    val emb1 =
      if (!skew) emb0
      else {
        val anchor = spark.read.parquet(s"$base/embeddings.parquet")
          .orderBy("vec_id").limit(1)
          .select("embedding").head().getSeq[Float](0)
        // 30% of vectors pull toward one anchor: 0.4·anchor + 0.6·self.
        // The blend makes them co-assign to one Lloyd cell (occupancy
        // skew — the stress target) while typical blend-blend cosine is
        // α²/(α²+(1-α)²) ≈ 0.31 < tau = 0.4, so the skew does NOT plant
        // a quadratic mutual-near-dup cluster whose OUTPUT would
        // dominate runtime (an earlier 0.95 blend did: 1.6M output
        // pairs at ×3 — data reality, but it measures output size, not
        // blocking quality)
        emb0.withColumn("embedding",
          when(col("vec_id") % 10 < 3,
            zip_with(typedLit(anchor), col("embedding"),
              (a, e) => a * 0.4f + e * 0.6f))
            .otherwise(col("embedding")))
      }
    emb1.repartition(8).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    val ev0 = replicate(spark, "events", copies) { (b, k) =>
      b.select((col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    val ev1 =
      if (!skew) ev0
      else ev0.withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(777L))
          .otherwise(col("user_id")))
    ev1.repartition(8).write.mode("overwrite")
      .parquet(s"$out/events.parquet")

    replicate(spark, "lineitem", copies) { (b, k) =>
      b.select((col("l_orderkey") + lit(k * 100000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(k * 10000000L)).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }.repartition(16).write.mode("overwrite")
      .parquet(s"$out/lineitem.parquet")

    passthrough.foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/stress")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional variant list after the root: "x3 x10 skew3 x30" — a bare
    // xN writes an N-copy un-skewed replica, skewN layers the skew
    val variants =
      if (args.length > 1) args.drop(1).toSeq else Seq("x3", "x10", "skew3")
    val spec = "^(x|skew)(\\d+)$".r
    variants.foreach {
      case v @ spec(kind, n) =>
        writeVariant(spark, s"$root/$v", copies = n.toInt,
          skew = kind == "skew")
      case v => sys.error(s"bad variant '$v' (want xN or skewN)")
    }
    println(s"wrote ${variants.mkString(", ")} under $root")
    spark.stop()
  }
}

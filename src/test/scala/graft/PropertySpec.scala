package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Community, GraphSource, Iterative}
import graft.llm.{CorpusOps, Dedup, TextOps}

/** Property-based tests (SURVEY §5.4): invariants that must hold for any
  * input, not just the fixtures. Generators are driven directly (seeded)
  * since only scalacheck core is on the test classpath. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Deterministic sample stream from a generator. */
  private def forAll[T](gen: Gen[T], n: Int = 5)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(12)
    (0 until n).foreach { i =>
      gen(params, Seed(42L + i)).foreach(body)
    }
  }

  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 8)
    docs <- Gen.listOfN(n,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dog", "cat"))
        .map(_.mkString(" ")))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("fingerprints are permutation-sensitive but content-deterministic") {
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val fp1 = TextOps.fingerprint(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fp2 = TextOps.fingerprint(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fp1 == fp2)
      // same text ⇒ same fingerprint
      val byText = docs.groupBy(_._2).values
      byText.foreach { group =>
        assert(group.map(g => fp1(g._1)).distinct.length == 1)
      }
    }
  }

  test("exact dedup partitions the corpus: sum of dup counts = row count") {
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.exact(df).collect()
      assert(out.map(_.getLong(1)).sum == docs.length)
      assert(out.map(_.getLong(0)).distinct.length == out.length)
    }
  }

  test("near-dup jaccard is symmetric-by-construction and bounded") {
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val pairs = Dedup.nearDupPairs(df, shingleSize = 1, threshold = 0.0)
        .collect()
      pairs.foreach { p =>
        assert(p.getLong(0) < p.getLong(1)) // canonical orientation
        val j = p.getDouble(2)
        assert(j >= 0.0 && j <= 1.0)
      }
    }
  }

  private val edgeGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 8L); b <- Gen.choose(1L, 8L) if a != b
    } yield (a, b))
  } yield edges.distinct

  test("ANN and dedup results are partition-count invariant") {
    // the distributed-correctness property behind the rounding + id
    // tiebreak discipline: re-partitioning the input (different task
    // boundaries, different partial-agg merge orders) must not change
    // one output row. Exercised on the two families whose plans have
    // the most partial aggregation: top-k search and dedup groups.
    val e = graft.sources.Tables(spark, sf0001, "embeddings")
    val docs = graft.sources.Tables(spark, sf0001, "documents")
    val q = e.filter($"vec_id" < 5)
    for (parts <- Seq(3, 13)) {
      val ep = e.repartition(parts)
      val topk = graft.llm.Similarity.bruteForceTopK(q.repartition(2), ep, k = 5)
        .collect().toSeq
      val base = graft.llm.Similarity.bruteForceTopK(q, e, k = 5).collect().toSeq
      assert(topk == base, s"bruteForceTopK drifted at $parts partitions")
      val pq = graft.llm.Similarity.pqTopK(q.repartition(2), ep, k = 5,
        stride = 7).collect().toSeq
      val pqBase = graft.llm.Similarity.pqTopK(q, e, k = 5, stride = 7)
        .collect().toSeq
      assert(pq == pqBase, s"pqTopK drifted at $parts partitions")
      val g = Dedup.dedupGroups(docs.repartition(parts), shingleSize = 3,
        threshold = 0.5).collect().toSeq
      val gBase = Dedup.dedupGroups(docs, shingleSize = 3, threshold = 0.5)
        .collect().toSeq
      assert(g == gBase, s"dedupGroups drifted at $parts partitions")
    }
  }

  test("corpus hygiene results are partition-count invariant") {
    // contamination's distinct + left-join counts and the mix samplers'
    // hash ranks must not depend on task boundaries
    val docs = graft.sources.Tables(spark, sf0001, "documents")
    val rates = Map("en" -> 0.5, "de" -> 0.25, "es" -> 1.0, "zh" -> 0.125)
    val cBase = graft.llm.CorpusOps.contamination(docs).collect().toSeq
    val qBase = graft.llm.CorpusOps.mixQuota(docs, "lang", rates).collect().toSeq
    val wBase = Dedup.winnow(docs).collect().toSeq
    val eBase = TextOps.entropy(docs).collect().toSeq
    for (parts <- Seq(2, 11)) {
      val dp = docs.repartition(parts)
      assert(graft.llm.CorpusOps.contamination(dp).collect().toSeq == cBase,
        s"contamination drifted at $parts partitions")
      assert(graft.llm.CorpusOps.mixQuota(dp, "lang", rates).collect().toSeq == qBase,
        s"mixQuota drifted at $parts partitions")
      assert(Dedup.winnow(dp).collect().toSeq == wBase,
        s"winnow drifted at $parts partitions")
      assert(TextOps.entropy(dp).collect().toSeq == eBase,
        s"entropy drifted at $parts partitions")
    }
  }

  test("span-dup stats are row-order and partition-count invariant, " +
      "and bounded by span counts") {
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val base = Dedup.spanDups(df, span = 2).collect().toSeq
      // counts are global aggregates: task boundaries and input order
      // must not matter
      assert(Dedup.spanDups(df.repartition(5), span = 2).collect().toSeq
        == base)
      assert(Dedup.spanDups(df.orderBy(org.apache.spark.sql.functions
        .col("doc_id").desc), span = 2).collect().toSeq == base)
      base.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1), "dup spans exceed span count")
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      }
    }
  }

  test("semdedup always keeps the lowest id of every cell") {
    // low-id-wins: whatever the clustering does, the minimum vec_id of
    // each cell can have no lower-id cluster-mate, so it always keeps
    val dim = 8
    forAll(Gen.listOfN(12, Gen.choose(-5, 5)), n = 3) { seeds =>
      val e = seeds.zipWithIndex.map { case (s, i) =>
        (i.toLong, (0 until dim).map(j => (s * (j + 1) % 7).toFloat).toArray)
      }.toDF("vec_id", "embedding")
      val r = graft.llm.Similarity.semDedup(e, tau = 0.8, nlist = 3)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
      r.groupBy(_._2).foreach { case (_, members) =>
        assert(members.minBy(_._1)._3, s"cell min id dropped: $members")
      }
    }
  }

  test("modularity of any partition is in [-1, 1]") {
    forAll(edgeGen) { es =>
      whenever(es.nonEmpty) {
        val edges = es.map { case (a, b) => (a, b, 1.0) }
          .toDF("src", "dst", "weight")
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        val comm = nodes.map(n => (n, n % 2)).toDF("node", "community")
        val q = Iterative.modularity(spark, edges, comm).head().getDouble(0)
        assert(q >= -1.0 && q <= 1.0, s"Q=$q")
      }
    }
  }

  test("connected components labels are invariant under edge order permutation") {
    forAll(edgeGen) { es =>
      whenever(es.nonEmpty) {
        def cc(order: List[(Long, Long)]) = {
          val g = GraphSource.toGraph(
            order.map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight"))
          graft.graph.Builtins.connectedComponents(spark, g).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
        assert(cc(es) == cc(es.reverse))
      }
    }
  }

  test("louvain assigns every node exactly one community") {
    forAll(edgeGen) { es =>
      whenever(es.nonEmpty) {
        val edges = es.map { case (a, b) => (a, b, 1.0) }
          .toDF("src", "dst", "weight")
        val comm = Community.louvain(spark, edges, passes = 2, levels = 1)
          .collect()
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        assert(comm.map(_.getLong(0)).sorted.toSeq == nodes)
      }
    }
  }

  private val chunkParamGen: Gen[(Int, Int)] = for {
    window <- Gen.choose(2, 6)
    overlap <- Gen.choose(0, window - 1)
  } yield (window, overlap)

  test("chunk covers every token in order for any window/overlap") {
    forAll(docGen.flatMap(d => chunkParamGen.map(p => (d, p)))) {
      case (docs, (window, overlap)) =>
        val df = docs.toDF("doc_id", "text")
        val stride = window - overlap
        val chunks = TextOps.chunk(df, window, overlap).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
          .groupBy(_._1)
        docs.foreach { case (id, text) =>
          val toks = text.split(" ").toSeq
          val cs = chunks(id).sortBy(_._2).map(_._3.split(" ").toSeq)
          // every chunk except the last is exactly `window` tokens
          assert(cs.init.forall(_.length == window))
          // stride-stitching the chunks (drop each successor's first
          // `overlap` tokens) rebuilds the doc exactly
          val rebuilt = cs.head ++ cs.tail.flatMap(_.drop(overlap))
          assert(rebuilt == toks, s"window=$window overlap=$overlap")
        }
    }
  }

  test("pack never puts a sequence's token-start past the budget boundary") {
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val budget = 8
      val rows = graft.llm.CorpusOps.pack(df, budget = budget, nShards = 2,
        replicable = true).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      rows.groupBy(_._2).values.foreach { shardRows =>
        var cum = 0L
        shardRows.sortBy(_._1).foreach { case (_, _, n, seqId) =>
          // the defining invariant: a doc starts in the sequence its
          // preceding token count falls in
          assert(seqId == cum / budget)
          cum += n
        }
        // monotone: later docs never land in earlier sequences
        val ordered = shardRows.sortBy(_._1).map(_._4)
        assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a <= b })
      }
    }
  }

  test("split assignment is exhaustive, exclusive, and subset-stable " +
      "for any fraction list") {
    val fracGen = for {
      k <- Gen.choose(2, 4)
      ws <- Gen.listOfN(k, Gen.choose(1, 10))
    } yield {
      val tot = ws.sum.toDouble
      // exact-sum-to-1 by construction: last bucket takes the remainder
      val fs = ws.init.map(_ / tot)
      ws.indices.map(i => s"b$i").zip(fs :+ (1.0 - fs.sum)).toList
    }
    forAll(Gen.zip(docGen, fracGen)) { case (docs, fracs) =>
      val df = docs.toDF("doc_id", "text")
      val full = graft.llm.CorpusOps.splitAssign(df, fracs).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(full.size == docs.size, "one assignment per doc")
      assert(full.values.toSet.subsetOf(fracs.map(_._1).toSet))
      // dropping rows never changes a surviving row's bucket
      val sub = graft.llm.CorpusOps.splitAssign(
        df.filter($"doc_id" % 2 === 0), fracs).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(sub.forall { case (id, b) => full(id) == b })
    }
  }

  test("corpus monitor conserves docs and tokens across windows for any " +
      "corpus") {
    import java.sql.Timestamp
    forAll(docGen, n = 3) { docs =>
      val df = docs.map { case (id, t) =>
        (id, new Timestamp(1700000000000L + id * 60000L), t, s"s${id % 2}")
      }.toDF("doc_id", "ts", "text", "source")
      val m = graft.streaming.EventStreams.corpusMonitor(df).collect()
      assert(m.map(_.getLong(2)).sum == docs.size,
        "every doc lands in exactly one (window, source) row")
      val totTok = docs.map(_._2.split(" ").length.toLong).sum
      assert(m.map(_.getLong(3)).sum == totTok, "token totals conserve")
      m.foreach(r => assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1.0001,
        s"mean quality bounded: $r"))
    }
  }

  test("featurized embeddings are unit-norm (or zero) and text-functional " +
      "for any corpus") {
    forAll(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
      val f = TextOps.featurize(df, dim = 8).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      f.values.foreach { v =>
        assert(v.size == 8)
        val n2 = v.map(x => x * x).sum
        // all-cancelled (zero) vectors are legal; otherwise unit norm
        assert(n2 == 0.0 || math.abs(n2 - 1.0) < 2e-2, s"norm² $n2")
      }
      // same text ⇒ same vector, regardless of doc id
      docs.groupBy(_._2).values.foreach { group =>
        assert(group.map(g => f(g._1)).distinct.length == 1)
      }
    }
  }

  test("ngram novelty conserves first occurrences: sum of n_new = " +
      "distinct gram count, for any corpus") {
    import graft.llm.CorpusOps
    forAll(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
      val nov = CorpusOps.ngramNovelty(df, n = 1).collect()
      // every distinct gram is new for exactly one doc (its min id)
      val distinctGrams = Dedup.withShingleSets(df, 1)
        .select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("shingle_set")))
        .distinct().count()
      assert(nov.map(_.getLong(2)).sum == distinctGrams)
      // novelty bounded, counts consistent
      nov.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1))
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      }
    }
  }

  test("source overlap conserves the verified pair count, for any corpus") {
    import graft.llm.CorpusOps
    forAll(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
        .withColumn("source",
          org.apache.spark.sql.functions.expr("CASE WHEN doc_id % 2 = 0 " +
            "THEN 'web' ELSE 'books' END"))
      val total = Dedup.nearDupPairs(df, shingleSize = 1).count()
      val cells = CorpusOps.sourceOverlap(df, shingleSize = 1).collect()
      assert(cells.map(_.getLong(2)).sum == total)
      // undirected: cells are lexicographically ordered
      cells.foreach(c => assert(c.getString(0) <= c.getString(1)))
    }
  }

  test("boilerplate removal conserves tokens, removes nothing above " +
      "the corpus doc count, and is hash-key invariant") {
    forAll(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
      val r = Dedup.boilerplateRemove(df, span = 2, minDocs = 2).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      val orig = docs.toMap
      r.foreach { case (id, clean, nRem) =>
        val n0 = orig(id).split(" ").length
        val nc = if (clean.isEmpty) 0 else clean.split(" ").length
        assert(nc + nRem == n0, s"doc $id: $nc + $nRem != $n0")
      }
      val none = Dedup.boilerplateRemove(df, span = 2,
        minDocs = docs.length + 1).collect()
      assert(none.forall(_.getLong(2) == 0L))
      val hashed = Dedup.boilerplateRemove(df, span = 2, minDocs = 2,
        hashKeys = true).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
      assert(hashed.toSet == r.toSet)
    }
  }

  test("token-budget kept set is exactly the greedy quality prefix " +
      "for any corpus and budget") {
    forAll(docGen.flatMap(d => Gen.choose(1L, 30L).map(b => (d, b))),
      n = 3) { case (docs, budget) =>
      val df = docs.toDF("doc_id", "text")
      val r = CorpusOps.tokenBudgetSelect(df, budget).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getBoolean(3)))
      var before = 0L
      val expected = r.sortBy(x => (-x._2, x._1)).map { x =>
        val kept = before < budget
        before += x._3
        x._1 -> kept
      }.toMap
      assert(r.map(x => x._1 -> x._4).toMap == expected)
    }
  }

  test("keep-best picks a max-score member of every family (ties -> " +
      "min id) and marks exactly it kept") {
    forAll(docGen, n = 3) { docs =>
      val df = docs.toDF("doc_id", "text")
      val r = Dedup.dedupKeepBest(df, shingleSize = 1, threshold = 0.5)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getLong(3), x.getBoolean(4))).toList
      r.groupBy(_._2).foreach { case (_, members) =>
        val keeps = members.map(_._3).distinct
        assert(keeps.length == 1)
        val keep = keeps.head
        val keepScore = members.find(_._1 == keep).get._4
        members.foreach { m =>
          assert(keepScore > m._4 ||
            (keepScore == m._4 && keep <= m._1), s"$keep vs $m")
          assert(m._5 == (m._1 == keep))
        }
      }
    }
  }

  test("within-doc dedup equals corpus span-remove on single-doc " +
      "corpora (shared keep-first semantics)") {
    forAll(docGen, n = 3) { docs =>
      docs.take(3).foreach { case (id, text) =>
        val one = Seq((id, text)).toDF("doc_id", "text")
        val a = Dedup.withinDocDedup(one, span = 2).collect()
          .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
        val b = Dedup.spanRemove(one, span = 2).collect()
          .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSeq
        assert(a == b, s"doc $id: $a vs $b")
      }
    }
  }

  test("bpe vocab ids are contiguous, chars single, merges the learned " +
      "concatenations") {
    val docs = Seq((1L, "low low low lower lower newest"))
      .toDF("doc_id", "text")
    val vocab = TextOps.bpeVocab(docs, nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(vocab.map(_._1).toSeq == vocab.indices.map(_.toLong))
    val merges = TextOps.bpeLearn(docs, nMerges = 3).collect()
      .map(r => r.getString(1) + r.getString(2))
    val (chars, mergeToks) = vocab.splitAt(vocab.length - merges.length)
    assert(chars.forall(_._2.length == 1))
    assert(chars.map(_._2).toSeq == chars.map(_._2).sorted.toSeq)
    assert(mergeToks.map(_._2).toSeq == merges.toSeq)
  }
}

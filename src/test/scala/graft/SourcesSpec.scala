package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Readers

class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("orc round trip preserves rows and schema") {
    val df = graft.sources.Tables(spark, sf0001, "region")
    val path = java.nio.file.Files.createTempDirectory("orc")
      .resolve("out").toString
    graft.sources.Writers.orc(df, path)
    val back = Readers.orc(spark, path)
    assert(back.schema == df.schema)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("csv vectors") {
    val r = Readers.csvVectors(spark, res("vectors.csv")).collect()
    assert(r.length == 2)
    assert(r.map(_.getSeq[Double](1).toSeq).toSet ==
      Set(Seq(1.0, 2.0), Seq(3.0, 4.0)))
  }

  test("coo triplets skip nothing and parse numerics") {
    val r = Readers.coo(spark, res("matrix.coo")).collect()

    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getDouble(2))).toSet ==
      Set((0L, 0, 1.5), (0L, 2, 2.5), (1L, 1, 3.0)))
  }

  test("coo to sparse vectors") {
    val coo = Readers.coo(spark, res("matrix.coo"))
      .filter(org.apache.spark.sql.functions.col("row").isNotNull)
    val v = Readers.cooToSparseVectors(spark, coo, numCols = 4).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(v(0L).toArray.toSeq == Seq(1.5, 0.0, 2.5, 0.0))
    assert(v(1L).toArray.toSeq == Seq(0.0, 3.0, 0.0, 0.0))
  }

  test("edge list: comments and short lines skipped, self-loops dropped, weights defaulted") {
    val r = Readers.edgeList(spark, res("edges.txt")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(r == Set((1L, 2L, 1.0), (2L, 3L, 2.5), (1L, 3L, 0.5)))
  }

  test("community pairs strip parens") {
    val r = Readers.communityPairs(spark, res("community.txt")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 10L), (2L, 10L), (3L, 20L)))
  }

  test("IBM sequence format: -1 splits itemsets, -2 terminates") {
    val r = Readers.sequences(spark, res("sequences.txt")).collect()
      .map(_.getSeq[scala.collection.Seq[Int]](0).map(_.toSeq).toSeq)
    assert(r.toSet == Set(Seq(Seq(1, 2), Seq(3)), Seq(Seq(4), Seq(5, 6))))
  }

  test("svm csv: comma then space split") {
    val r = Readers.svmCsv(spark, res("svm.csv")).collect()
      .map(x => (x.getDouble(0), x.getSeq[Double](1).toSeq)).toSet
    assert(r == Set((1.0, Seq(0.5, 1.5)), (-1.0, Seq(2.5, 3.5))))
  }

  test("knn tsv: id below testNum marks query rows") {
    val r = Readers.knnTsv(spark, res("knn.tsv"), testNum = 2).collect()
      .map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(r == Map(0L -> true, 1L -> true, 5L -> false))
  }

  test("object-file vectors: sparse and dense round-trip exactly") {
    import org.apache.spark.ml.linalg.Vectors
    val dir = java.nio.file.Files
      .createTempDirectory("graft-objf").toString + "/vecs"
    val in = Seq(
      (1L, Vectors.sparse(5, Array(0, 3), Array(0.5, -2.0))),
      (2L, Vectors.dense(1.0, 2.0, 3.0, 4.0, 5.0)),
      (3L, Vectors.sparse(5, Array(), Array()))
    ).toDF("row", "features")
    Readers.saveObjectVectors(in, dir)
    val back = Readers.objectVectors(spark, dir).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(back.keySet == Set(1L, 2L, 3L))
    assert(back(1L) == Vectors.sparse(5, Array(0, 3), Array(0.5, -2.0)))
    assert(back(2L) == Vectors.dense(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(back(3L).numNonzeros == 0 && back(3L).size == 5)
  }

  test("object-file vectors: genuine mllib-typed reference files read via asML") {
    // the reference writes mllib types (LDARunner.scala:144 reads
    // RDD[(Long, mllib.Vector)]) — write exactly that shape with
    // saveAsObjectFile and read it back through the compat readers
    import org.apache.spark.mllib.linalg.{Vectors => MllibVectors}
    val base = java.nio.file.Files.createTempDirectory("graft-objf-mllib")
    val pairDir = base.toString + "/pairs"
    spark.sparkContext.parallelize(Seq(
      (1L, MllibVectors.sparse(4, Array(1, 2), Array(7.0, -1.5))
        : org.apache.spark.mllib.linalg.Vector),
      (2L, MllibVectors.dense(0.5, 0.0, 2.5, 9.0)
        : org.apache.spark.mllib.linalg.Vector)), 2)
      .saveAsObjectFile(pairDir)
    val pairs = Readers.objectVectors(spark, pairDir).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(pairs(1L) ==
      org.apache.spark.ml.linalg.Vectors.sparse(4, Array(1, 2), Array(7.0, -1.5)))
    assert(pairs(2L) ==
      org.apache.spark.ml.linalg.Vectors.dense(0.5, 0.0, 2.5, 9.0))

    // ALSRunner.scala:125 shape: bare RDD[mllib.SparseVector], no ids
    val rowsDir = base.toString + "/rows"
    spark.sparkContext.parallelize(Seq(
      new org.apache.spark.mllib.linalg.SparseVector(3, Array(0), Array(4.0)),
      new org.apache.spark.mllib.linalg.SparseVector(3, Array(2), Array(6.0))), 1)
      .saveAsObjectFile(rowsDir)
    val rows = Readers.objectSparseRows(spark, rowsDir).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(rows.keySet == Set(0L, 1L))
    assert(rows(0L)(0) == 4.0 && rows(1L)(2) == 6.0)

    // SimRankRunner.scala:110 shape: RDD[ml ALS.Rating[Int]]
    val ratingsDir = base.toString + "/ratings"
    spark.sparkContext.parallelize(Seq(
      org.apache.spark.ml.recommendation.ALS.Rating(1, 10, 0.5f),
      org.apache.spark.ml.recommendation.ALS.Rating(2, 20, 1.5f)), 1)
      .saveAsObjectFile(ratingsDir)
    val ratings = Readers.objectRatings(spark, ratingsDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(ratings == Set((1, 10, 0.5), (2, 20, 1.5)))
  }

  // ---- negative-path fixtures (round-9 verdict #7): the loader-family
  // contract is STRUCTURAL quirks skip (comments, blank/short lines,
  // non-numeric ids, unparseable weight columns), VALUE corruption
  // inside a structurally valid row rejects loudly, and truncated
  // binary containers reject — never silent wrong data.

  private def writeLines(name: String, lines: String*): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-neg")
      .resolve(name)
    java.nio.file.Files.writeString(p, lines.mkString("\n"))
    p.toString
  }

  test("negative: edge list skips comments, junk ids, short lines and " +
      "garbage weights; defaults only MISSING weights") {
    val path = writeLines("edges-bad.txt",
      "# header comment",
      "% matrix-market style comment",
      "1 2",          // valid, weight defaults to 1.0
      "2 3 2.5",      // valid, explicit weight
      "x 3",          // junk src -> skipped
      "4 y",          // junk dst -> skipped
      "7",            // short line -> skipped
      "5 6 heavy",    // PRESENT but unparseable weight -> skipped
      "8 8 1.0",      // self-loop -> dropped
      "")             // blank line -> skipped (short after split)
    val r = Readers.edgeList(spark, path).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(r == Set((1L, 2L, 1.0), (2L, 3L, 2.5)), r)
  }

  test("negative: coo skips comments, short lines and non-numeric cells") {
    val path = writeLines("coo-bad.txt",
      "% header",
      "0 0 1.5",
      "1 one 3.0",    // non-numeric col -> skipped
      "2 2",          // short -> skipped
      "bad 1 2.0",    // non-numeric row -> skipped
      "3 1 nope")     // non-numeric value -> skipped
    val r = Readers.coo(spark, path).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2))).toSet
    assert(r == Set((0L, 0, 1.5)), r)
  }

  test("negative: community pairs skip comments and non-numeric ids") {
    val path = writeLines("community-bad.txt",
      "# comment",
      "(1,10)",
      "(2,beta)",     // non-numeric community -> skipped
      "(gamma,20)",   // non-numeric node -> skipped
      "(3)",          // short -> skipped
      "(4,40)")
    val r = Readers.communityPairs(spark, path).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == Set((1L, 10L), (4L, 40L)), r)
  }

  test("negative: svm csv skips comma-less and junk-label lines; " +
      "corrupt feature values reject loudly") {
    val path = writeLines("svm-bad.csv",
      "1.0,0.5 1.5",
      "no-comma-line",     // skipped
      "abc,2.5 3.5",       // junk label -> skipped
      "-1.0,2.5 3.5")
    val ok = Readers.svmCsv(spark, path).collect()
      .map(x => (x.getDouble(0), x.getSeq[Double](1).toSeq)).toSet
    assert(ok == Set((1.0, Seq(0.5, 1.5)), (-1.0, Seq(2.5, 3.5))), ok)
    val corrupt = writeLines("svm-corrupt.csv", "1.0,0.5 BAD 1.5")
    val e = intercept[Exception] {
      Readers.svmCsv(spark, corrupt).collect()
    }
    assert(e.getMessage != null)
  }

  test("negative: csv vectors skip blank lines, reject corrupt values") {
    val path = writeLines("vec-bad.csv", "1.0,2.0", "", "3.0,4.0")
    assert(Readers.csvVectors(spark, path).collect().length == 2)
    val corrupt = writeLines("vec-corrupt.csv", "1.0,oops")
    intercept[Exception] {
      Readers.csvVectors(spark, corrupt).collect()
    }
  }

  test("negative: knn tsv skips tab-less and junk-id lines") {
    val path = writeLines("knn-bad.tsv",
      "0\t0.5,1.5",
      "no-tab-line",       // skipped
      "id\t1.0,2.0",       // junk id -> skipped
      "5\t2.5,3.5")
    val r = Readers.knnTsv(spark, path, testNum = 2).collect()
      .map(x => (x.getLong(0), x.getBoolean(2))).toMap
    assert(r == Map(0L -> true, 5L -> false), r)
  }

  test("negative: malformed libsvm rejects loudly (stock reader)") {
    val path = writeLines("bad.libsvm", "1.0 1:0.5 3:oops")
    intercept[Exception] {
      Readers.libsvm(spark, path, numFeatures = 4).collect()
    }
  }

  test("negative: truncated SequenceFile rejects with an IO error, " +
      "never returns partial silent data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seqtrunc")
    val full = dir.resolve("full").toString
    graft.sources.Writers.sequenceFile(
      (1 to 200).map(i => s"line-$i-padding-padding-padding")
        .toDF("value"), full)
    // truncate the (single) part file to 60% of its bytes
    val part = new java.io.File(full).listFiles()
      .filter(f => f.getName.startsWith("part-")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val cut = dir.resolve("cut").toString
    new java.io.File(cut).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(cut, part.getName),
      java.util.Arrays.copyOf(bytes, (bytes.length * 6) / 10))
    intercept[org.apache.spark.SparkException] {
      Readers.sequenceLines(spark, cut).collect()
    }
  }

  test("libsvm reader yields label/features") {
    val r = Readers.libsvm(spark, res("train.libsvm"), numFeatures = 4).collect()
    assert(r.length == 2)
    val byLabel = r.map(x => x.getDouble(0) ->
      x.getAs[org.apache.spark.ml.linalg.Vector](1)).toMap
    assert(byLabel(1.0).toArray.toSeq == Seq(0.5, 0.0, 1.5, 0.0))
    assert(byLabel(0.0).toArray.toSeq == Seq(0.0, 2.0, 0.0, 0.0))
  }

  test("mahout sequence-file vectors decode without the mahout jar") {
    // Build a genuine uncompressed Hadoop SequenceFile BY HAND, with the
    // header declaring org.apache.mahout.math.VectorWritable — the class
    // is NOT on the classpath, which is the whole point: the raw-binary
    // reader must decode the published wire format, not deserialize.
    import java.io.{ByteArrayOutputStream, DataOutputStream}
    def varint(out: DataOutputStream, value0: Int): Unit = {
      var value = value0
      while ((value & 0xFFFFFF80) != 0) {
        out.writeByte((value & 0x7F) | 0x80); value >>>= 7
      }
      out.writeByte(value & 0x7F)
    }
    // Hadoop Text.writeString: WritableUtils vint length + UTF-8 bytes
    // (class names are < 112 chars, so the vint is the single length byte)
    def hstring(out: DataOutputStream, s: String): Unit = {
      val b = s.getBytes("UTF-8"); out.writeByte(b.length); out.write(b)
    }
    def denseVec(lax: Boolean, named: Boolean, vs: Double*): Array[Byte] = {
      val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
      o.writeByte(0x01 | 0x02 | (if (named) 0x04 else 0) |
        (if (lax) 0x08 else 0))
      varint(o, vs.length)
      vs.foreach(v => if (lax) o.writeFloat(v.toFloat) else o.writeDouble(v))
      if (named) o.writeUTF("a name the decoder must not trip on")
      bo.toByteArray
    }
    def sparseVec(sequential: Boolean, size: Int,
        cells: Seq[(Int, Double)]): Array[Byte] = {
      val bo = new ByteArrayOutputStream(); val o = new DataOutputStream(bo)
      o.writeByte(if (sequential) 0x02 else 0x00)
      varint(o, size)
      varint(o, cells.length)
      var last = 0
      cells.foreach { case (idx, v) =>
        varint(o, if (sequential) { val d = idx - last; last = idx; d }
          else idx)
        o.writeDouble(v)
      }
      bo.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-mahout")
    val file = dir.resolve("part-00000").toFile
    val out = new DataOutputStream(new java.io.FileOutputStream(file))
    out.write("SEQ".getBytes("UTF-8")); out.writeByte(6) // version-6 header
    hstring(out, "org.apache.hadoop.io.LongWritable")
    hstring(out, "org.apache.mahout.math.VectorWritable")
    out.writeBoolean(false); out.writeBoolean(false) // no (block) compression
    out.writeInt(0) // empty metadata
    val sync = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    out.write(sync)
    // size 400 and index 350 force multi-byte varints in both the size
    // and the sequential-delta position
    val records = Seq(
      1L -> denseVec(lax = false, named = false, 1.5, -2.25, 3.0),
      2L -> sparseVec(sequential = true, 400, Seq(5 -> 7.5, 350 -> -4.0)),
      3L -> sparseVec(sequential = false, 6, Seq(4 -> 9.0, 1 -> 0.5)),
      4L -> denseVec(lax = true, named = true, 0.5, 8.25))
    records.foreach { case (id, value) =>
      val key = java.nio.ByteBuffer.allocate(8).putLong(id).array()
      out.writeInt(key.length + value.length)
      out.writeInt(key.length)
      out.write(key); out.write(value)
    }
    out.close()

    val got = Readers.mahoutVectors(spark, file.toString).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == Seq(1.5, -2.25, 3.0))
    assert(got(2L).length == 400 && got(2L)(5) == 7.5 &&
      got(2L)(350) == -4.0 && got(2L).count(_ != 0.0) == 2)
    assert(got(3L) == Seq(0.0, 0.5, 0.0, 0.0, 9.0, 0.0))
    assert(got(4L) == Seq(0.5, 8.25)) // lax floats widen exactly
  }
}

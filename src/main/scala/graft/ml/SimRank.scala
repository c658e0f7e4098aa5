package graft.ml

import org.apache.spark.mllib.linalg.distributed.{BlockMatrix, CoordinateMatrix, MatrixEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bipartite SimRank (SURVEY §2.B B20) — similarity of users via the
  * items they touch and vice versa, re-derived from Jeh & Widom 2002.
  * The reference's open-source path iterates a BlockMatrix product chain
  * (`SimRankOpenSource.scala:89-113`); this is the same formulation:
  *
  *   S_u ← c · Ŵr S_i Ŵrᵀ  (diag reset to 1; Ŵr row-normalized —
  *                           each user averages over its items)
  *   S_i ← c · Ŵcᵀ S_u Ŵc  (diag reset to 1; Ŵc column-normalized —
  *                           each item averages over its users)
  *
  * which reproduces the classic C/(|I(a)||I(b)|) Σ s(i,j) recurrence
  * (two users sharing their single item converge to C). Matrices stay
  * distributed (BlockMatrix, 1024² blocks); near-zero entries are pruned
  * every iteration so S keeps the sparsity that makes the multiply
  * feasible at scale (SURVEY §7 risk 3).
  */
object SimRank {

  /** ratings: (user, item, weight≥0) with dense int-ish ids.
    * Returns user-user similarities above `threshold`, excluding the
    * diagonal: (u1, u2, score) with u1 < u2. */
  def userSimilarity(spark: SparkSession, ratings: DataFrame,
      damp: Double = 0.6, iterations: Int = 5,
      threshold: Double = 1e-4, blockSize: Int = 1024): DataFrame = {
    import spark.implicits._
    val entries = ratings.select(col("user").cast("long"),
        col("item").cast("long"), col("weight").cast("double"))
      .rdd.map(r => MatrixEntry(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val users = entries.map(_.i).max() + 1
    val items = entries.map(_.j).max() + 1

    // normalization sums stay distributed (a collectAsMap here would put
    // O(|users|) on the driver — a non-starter at scale); the divide is a
    // keyed join against the reduced sums
    val rowSums = entries.map(e => (e.i, e.value)).reduceByKey(_ + _)
    val colSums = entries.map(e => (e.j, e.value)).reduceByKey(_ + _)
    val wRow = new CoordinateMatrix(
      entries.map(e => (e.i, e)).join(rowSums)
        .map { case (_, (e, s)) => MatrixEntry(e.i, e.j, e.value / s) },
      users, items).toBlockMatrix(blockSize, blockSize).cache()
    val wRowT = wRow.transpose.cache()
    val wCol = new CoordinateMatrix(
      entries.map(e => (e.j, e)).join(colSums)
        .map { case (_, (e, s)) => MatrixEntry(e.i, e.j, e.value / s) },
      users, items).toBlockMatrix(blockSize, blockSize).cache()
    val wColT = wCol.transpose.cache()

    def identity(n: Long): BlockMatrix =
      new CoordinateMatrix(
        spark.sparkContext.range(0L, n).map(i => MatrixEntry(i, i, 1.0)),
        n, n).toBlockMatrix(blockSize, blockSize)

    def resetDiagAndPrune(m: BlockMatrix, n: Long): BlockMatrix = {
      val pruned = m.toCoordinateMatrix().entries
        .filter(e => e.i != e.j && math.abs(e.value) >= threshold)
        .union(spark.sparkContext.range(0L, n).map(i => MatrixEntry(i, i, 1.0)))
      new CoordinateMatrix(pruned, n, n).toBlockMatrix(blockSize, blockSize)
    }

    var sUser = identity(users).cache()
    var sItem = identity(items).cache()
    var it = 0
    while (it < iterations) {
      val si = wColT.multiply(sUser).multiply(wCol)
      sItem = resetDiagAndPrune(scale(si, damp), items).cache()
      val su = wRow.multiply(sItem).multiply(wRowT)
      sUser = resetDiagAndPrune(scale(su, damp), users).cache()
      sUser.blocks.count() // materialize before next round
      it += 1
    }
    sUser.toCoordinateMatrix().entries
      .filter(e => e.i < e.j && e.value >= threshold)
      .map(e => (e.i, e.j, math.floor(e.value * 1e4 + 0.5) / 1e4))
      .toDF("u1", "u2", "score")
      .orderBy(desc("score"), col("u1"), col("u2"))
  }

  private def scale(m: BlockMatrix, c: Double): BlockMatrix =
    new BlockMatrix(m.blocks.mapValues {
      case dm: org.apache.spark.mllib.linalg.DenseMatrix =>
        new org.apache.spark.mllib.linalg.DenseMatrix(
          dm.numRows, dm.numCols, dm.values.map(_ * c), dm.isTransposed)
      case sm: org.apache.spark.mllib.linalg.SparseMatrix =>
        new org.apache.spark.mllib.linalg.SparseMatrix(
          sm.numRows, sm.numCols, sm.colPtrs, sm.rowIndices,
          sm.values.map(_ * c), sm.isTransposed)
    }, m.rowsPerBlock, m.colsPerBlock, m.numRows(), m.numCols())
}

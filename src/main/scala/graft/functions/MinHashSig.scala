package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row MinHash signature kernel:
  * `graft_minhash(shingle_set, numHashes, replicable) -> array<long>` —
  * the O(numHashes·|set|) hot loop of the STREAMING dedup path
  * ([[graft.llm.Dedup.minHashPerRow]]), which otherwise evaluates
  * `numHashes` × `array_min(transform(...))` interpreted lambda trees
  * per document and paced streamingNearDups at ~148 rows/s flat across
  * trigger rates (SCALE_r10 §4 — per-row compute, not state, was the
  * bound).
  *
  * Bit-identical to the declarative form by construction:
  *  - non-replicable (xxhash64 family): element hash =
  *    XXH64(utf8-bytes, seed 42) — exactly Spark's `xxhash64(sh)`; the
  *    mixed hash for signature slot s is `xxhash64(h, s)` =
  *    hashInt(s, hashLong(h, 42)), with hashLong(h, 42) hoisted out of
  *    the slot loop (the strength reduction the per-element lambda form
  *    cannot express).
  *  - replicable (cross-engine family): element hash =
  *    `conv(substring(sha2(sh, 256), 1, 15), 16, 10)` — the first 15
  *    hex nibbles of the SHA-256 digest as a non-negative long; slot
  *    mix = ((2s+3)·(h mod 2^52) + (104729s+12345)) mod (2^61−1), the
  *    exact [[graft.llm.Dedup]] mixMod arithmetic.
  *
  * Empty or null input yields null (the caller filters empty shingle
  * sets, matching the batch aggregate path where an empty document
  * produces no rows to aggregate). Eval-only (CodegenFallback at the
  * ROW level, the [[ShingleSet]] precedent): one compiled JVM method
  * per row replaces numHashes·|set| interpreted lambda dispatches. */
case class MinHashSig(set: Expression, numHashes: Expression,
    replicable: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = set
  override def second: Expression = numHashes
  override def third: Expression = replicable

  override def checkInputDataTypes(): TypeCheckResult =
    if (set.dataType.isInstanceOf[ArrayType] &&
      set.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      numHashes.dataType == IntegerType && numHashes.foldable &&
      replicable.dataType == BooleanType && replicable.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int, foldable " +
        s"boolean), got ${set.dataType.simpleString}, " +
        s"${numHashes.dataType.simpleString}, " +
        s"${replicable.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Always nullable: an EMPTY (or all-null-element, replicable-mode)
    * shingle set yields null even when every child is non-nullable —
    * the TernaryExpression default (children's nullability) mislabeled
    * that case and collect() crashed decoding the null. */
  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash"

  private val MixM = 4503599627370496L // 2^52
  private val MixP = 2305843009213693951L // 2^61 - 1

  @transient private lazy val sha = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  /** conv(substring(sha2(t, 256), 1, 15), 16, 10) as bit arithmetic:
    * the first 15 hex nibbles are the first 7 digest bytes plus the
    * high nibble of the 8th. */
  private def sha2Token(s: UTF8String): Long = {
    val d = sha.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xffL) >>> 4)
  }

  /** Null ELEMENTS match the declarative fallback (r11 advice — the
    * kernel used to NPE where the HOF form returned a value):
    *  - non-replicable: `xxhash64(null)` skips the null child and
    *    returns its seed 42, so the element hash is the literal 42L
    *    and the slot mix proceeds from hashLong(42, 42).
    *  - replicable: `sha2(null)` is null, the mix stays null, and
    *    `array_min` skips null elements — so null elements contribute
    *    nothing; an all-null array (no contributor) returns null like
    *    the empty set, and the sole caller
    *    ([[graft.llm.Dedup.minHashPerRowImpl]]) screens all-null sets
    *    before either hash family runs, so native ≡ HOF holds on every
    *    row that reaches a plan. */
  override protected def nullSafeEval(sv: Any, nv: Any, rv: Any): Any = {
    val arr = sv.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = nv.asInstanceOf[Int]
    val rep = rv.asInstanceOf[Boolean]
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var contributed = false
    var i = 0
    while (i < n) {
      if (rep) {
        if (!arr.isNullAt(i)) {
          contributed = true
          val hm = sha2Token(arr.getUTF8String(i)) % MixM
          var j = 0
          while (j < k) {
            val m = ((2L * j + 3L) * hm + (104729L * j + 12345L)) % MixP
            if (m < sig(j)) sig(j) = m
            j += 1
          }
        }
      } else {
        contributed = true
        // xxhash64(h, j) = hashInt(j, hashLong(h, 42)); hashLong hoisted
        val h = if (arr.isNullAt(i)) 42L
          else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val base = XXH64.hashLong(h, 42L)
        var j = 0
        while (j < k) {
          val m = XXH64.hashInt(j, base)
          if (m < sig(j)) sig(j) = m
          j += 1
        }
      }
      i += 1
    }
    if (!contributed) return null
    new GenericArrayData(sig)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MinHashSig =
    copy(set = newFirst, numHashes = newSecond, replicable = newThird)
}

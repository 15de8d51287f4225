package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketching hot loops.
  *
  * The pure higher-order-function formulations (aggregate/transform folds)
  * are semantically identical but interpreted: every merge step boxes
  * longs and allocates a fresh accumulator array — measured ~1 ms/doc at
  * 64 permutations. These expressions run the same arithmetic as a
  * primitive `while` loop over the input `ArrayData`, ~50-100x faster,
  * which is the difference between a sketch pass and a bottleneck on a
  * 100 TB corpus. Inputs are hash arrays produced by codegen'd built-ins
  * (`hash`/`xxhash64` inside `transform`), so the scan side stays in
  * whole-stage codegen.
  */

/** MinHash signature over a gram-hash array: out[j] = min over grams of
  * (a_j * (h & 0xFFFFFFFF) + b_j) mod p, p prime > 2^32. Coefficients are
  * drawn from `seed`, so signatures are deterministic across runs/JVMs.
  * Empty input yields Long.MaxValue per slot (same as the fold identity).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private val P = 4294967311L

  @transient private lazy val (as, bs) = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rng.nextInt((1 << 30) - 1).toLong)
    val b = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) & 0xFFFFFFFFL
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * h + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token-hash array: bit b of the output is set iff
  * sum over tokens of (bit b of hash ? +1 : -1) is non-negative.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokenize-and-hash in one primitive pass: FNV-1a 64 per
  * whitespace-delimited token, directly over the string bytes. The
  * `transform(tokens(c), xxhash64)` formulation is semantically the same
  * but pays interpreted-HOF + string-slice allocation per token.
  */
case class TokenHashesExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
        while (i < n && !isWs(bytes(i))) {
          h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        out += h
      }
    }
    new GenericArrayData(out.toArray)
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-n-gram hashes in one primitive pass: token hashes as in
  * TokenHashesExpr, each gram hash a polynomial combination of its n
  * token hashes. Feeds MinHashSignatureExpr without ever materializing
  * gram strings. Fewer than n tokens yields an empty array.
  */
case class WordNGramHashesExpr(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val th = TokenHashesExpr(child).nullSafeEval(input).asInstanceOf[GenericArrayData]
    val m = th.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var g = 0x9e3779b97f4a7c15L
      var k = 0
      while (k < n) {
        g = (g ^ th.getLong(i + k)) * 0xff51afd7ed558ccdL
        g ^= (g >>> 33)
        k += 1
      }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03 — the
  * MOSS algorithm): slide a window of `w` over the gram-hash sequence and
  * keep each window's minimum (rightmost on ties). Guarantees: any shared
  * substring of length >= w+n-1 tokens yields at least one shared
  * fingerprint, while storing ~2/(w+1) of the grams — the standard
  * near-copy detection sketch for document-scale corpora.
  */
case class WinnowFingerprintsExpr(child: Expression, w: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    if (m <= w) {
      var mn = arr.getLong(0)
      var i = 1
      while (i < m) { if (arr.getLong(i) <= mn) mn = arr.getLong(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastIdx = -1
    var start = 0
    while (start <= m - w) {
      var minIdx = start
      var i = start + 1
      while (i < start + w) {
        if (arr.getLong(i) <= arr.getLong(minIdx)) minIdx = i // rightmost min
        i += 1
      }
      if (minIdx != lastIdx) {
        out += arr.getLong(minIdx)
        lastIdx = minIdx
      }
      start += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<double> columns as a primitive loop — the
  * embedding hot path (scoring millions of candidate pairs) spends its
  * time here; the `aggregate(zip_with(...))` form allocates a zipped
  * array and boxes every element.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    java.lang.Double.valueOf(s)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane sign bits in one pass over the vector: bit i = sign of
  * v . plane_i. One expression instead of numPlanes separate dot columns.
  */
case class HyperplaneSignatureExpr(child: Expression, planes: Seq[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(dim, plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Winnowing fingerprints straight from text: token n-gram hashes ->
    * windowed minima. `w` is the winnowing window (guarantee threshold
    * t = w + n - 1 tokens).
    */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    column(WinnowFingerprintsExpr(WordNGramHashesExpr(expression(text), n), w))

  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def hyperplaneSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    column(HyperplaneSignatureExpr(expression(vec), planes))

  def minHashSignature(hashes: Column, numHashes: Int, seed: Long): Column =
    column(MinHashSignatureExpr(expression(hashes), numHashes, seed))

  def simHash64(hashes: Column): Column =
    column(SimHash64Expr(expression(hashes)))

  def tokenHashes(text: Column): Column = column(TokenHashesExpr(expression(text)))

  def wordNGramHashes(text: Column, n: Int): Column =
    column(WordNGramHashesExpr(expression(text), n))

  /** Fused text -> minhash signature (no intermediate arrays cross
    * expression boundaries beyond the gram-hash array).
    */
  def minHashFromText(text: Column, n: Int, numHashes: Int, seed: Long): Column =
    column(MinHashSignatureExpr(WordNGramHashesExpr(expression(text), n), numHashes, seed))

  def simHashFromText(text: Column): Column =
    column(SimHash64Expr(TokenHashesExpr(expression(text))))
}

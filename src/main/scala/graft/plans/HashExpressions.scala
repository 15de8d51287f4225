package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketching hot loops.
  *
  * The pure higher-order-function formulations (aggregate/transform folds)
  * are semantically identical but interpreted: every merge step boxes
  * longs and allocates a fresh accumulator array — measured ~1 ms/doc at
  * 64 permutations. These expressions run the same arithmetic as a
  * primitive `while` loop (graft.plans.Kernels), ~50-100x faster, which
  * is the difference between a sketch pass and a bottleneck on a 100 TB
  * corpus.
  *
  * All expressions implement `doGenCode` as a static call into Kernels,
  * so they participate in whole-stage codegen like built-ins — no
  * interpreted-eval boundary, no per-row boxing; the JIT inlines the
  * kernel into the generated task loop.
  */

/** MinHash signature over a gram-hash array: out[j] = min over grams of
  * (a_j * (h & 0xFFFFFFFF) + b_j) mod p, p prime > 2^32. Coefficients are
  * drawn from `seed`, so signatures are deterministic across runs/JVMs.
  * Empty input yields Long.MaxValue per slot (same as the fold identity).
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  @transient private lazy val (as, bs) = {
    val rng = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rng.nextInt((1 << 30) - 1).toLong)
    val b = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.minHashSig(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Kernels.minHashSig($c, $asRef, $bsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a token-hash array: bit b of the output is set iff
  * sum over tokens of (bit b of hash ? +1 : -1) is non-negative.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.simHash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokenize-and-hash in one primitive pass: FNV-1a 64 per
  * whitespace-delimited token, directly over the string bytes. The
  * `transform(tokens(c), xxhash64)` formulation is semantically the same
  * but pays interpreted-HOF + string-slice allocation per token.
  */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.tokenHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word-n-gram hashes in one primitive pass: token hashes as in
  * TokenHashesExpr, each gram hash a polynomial combination of its n
  * token hashes. Feeds MinHashSignatureExpr without ever materializing
  * gram strings. Fewer than n tokens yields an empty array.
  */
case class WordNGramHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.wordNGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.wordNGramHashes($c, $n)")

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
case class WinnowFingerprintsExpr(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.winnow(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.winnow($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<double> columns as a primitive loop — the
  * embedding hot path (scoring millions of candidate pairs) spends its
  * time here; the `aggregate(zip_with(...))` form allocates a zipped
  * array and boxes every element.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Kernel dispatch on element types — float arrays are consumed
    * in place (bit-identical results; floats promote to double at the
    * multiply) instead of forcing an array<double> cast copy per row.
    */
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  @transient private lazy val kernel: String = (elemIsFloat(left), elemIsFloat(right)) match {
    case (false, false) => "dot"
    case (true, true) => "dotFF"
    case (true, false) => "dotFD"
    case (false, true) => "dotDF" // handled by swapping below
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    java.lang.Double.valueOf(kernel match {
      case "dot" => Kernels.dot(a, b)
      case "dotFF" => Kernels.dotFF(a, b)
      case "dotFD" => Kernels.dotFD(a, b)
      case "dotDF" => Kernels.dotFD(b, a)
    })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => kernel match {
      case "dotDF" => s"graft.plans.Kernels.dotFD($b, $a)"
      case k => s"graft.plans.Kernels.$k($a, $b)"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane sign bits in one pass over the vector: bit i = sign of
  * v . plane_i. One expression instead of numPlanes separate dot columns.
  */
case class HyperplaneSignatureExpr(child: Expression, planes: Seq[Array[Double]])
    extends UnaryExpression {

  @transient private lazy val planesArr: Array[Array[Double]] = planes.toArray

  override def dataType: DataType = LongType

  private lazy val isFloat: Boolean = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(
      if (isFloat) Kernels.hyperplaneSigF(v, planesArr)
      else Kernels.hyperplaneSig(v, planesArr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planesArr, "double[][]")
    val fn = if (isFloat) "hyperplaneSigF" else "hyperplaneSig"
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.$fn($c, $planesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ encode: array<double> vector -> array<int> of m codebook indices.
  * Codebook travels as a flat Seq (value equality for the case class)
  * and is referenced, not embedded, in generated code.
  */
case class PqEncodeExpr(child: Expression, codebook: Seq[Double], m: Int, kc: Int, subDim: Int)
    extends UnaryExpression {

  @transient private lazy val cb: Array[Double] = codebook.toArray

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType)

  override def nullSafeEval(input: Any): Any =
    Kernels.pqEncode(input.asInstanceOf[ArrayData], cb, m, kc, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.pqEncode($c, $ref, $m, $kc, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ decode: array<int> codes -> array<double> reconstruction. */
case class PqDecodeExpr(child: Expression, codebook: Seq[Double], m: Int, kc: Int, subDim: Int)
    extends UnaryExpression {

  @transient private lazy val cb: Array[Double] = codebook.toArray

  override def dataType: DataType = ArrayType(DoubleType)

  override def nullSafeEval(input: Any): Any =
    Kernels.pqDecode(input.asInstanceOf[ArrayData], cb, m, kc, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", cb, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.pqDecode($c, $ref, $m, $kc, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 1-bit sign quantization: array<double> -> packed array<long>
  * (bit i of word i/64 = v(i) > 0). No model state — see
  * Kernels.signPack.
  */
case class SignPackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.signPack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.signPack($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance of packed sign words to a driver-packed query:
  * xor + popcount per word.
  */
case class HammingToExpr(child: Expression, query: Seq[Long]) extends UnaryExpression {

  @transient private lazy val q: Array[Long] = query.toArray

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.hammingTo(input.asInstanceOf[ArrayData], q))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hammingQuery", q, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.hammingTo($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pairwise Hamming over two packed-sign columns (batch probes). */
case class HammingPairExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    Integer.valueOf(Kernels.hammingPair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Kernels.hammingPair($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric distance computation against a per-query lookup table:
  * array<int> codes -> double score, m lookups per row.
  */
case class PqAdcExpr(child: Expression, lut: Seq[Double], kc: Int)
    extends UnaryExpression {

  @transient private lazy val lutArr: Array[Double] = lut.toArray

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Kernels.pqAdc(input.asInstanceOf[ArrayData], lutArr, kc))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", lutArr, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.pqAdc($c, $ref, $kc)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of array<long> elements a bloom filter might contain. The
  * filter travels as its serialized bytes (value equality, compact in
  * the plan); each task deserializes once via the transient lazy and
  * the generated code references the LIVE filter object.
  */
case class BloomCountExpr(child: Expression, bloomBytes: Seq[Byte])
    extends UnaryExpression {

  @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes.toArray))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.bloomHitCount(input.asInstanceOf[ArrayData], bf))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.bloomHitCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Scalar bloom membership over a LONG key — the probe-side prefilter
  * of [[graft.operators.BloomJoin]]. Same serialized-bytes transport
  * and transient-lazy deserialization as [[BloomCountExpr]]; codegen
  * calls the live filter object directly (one virtual call per row,
  * no kernel indirection needed for a scalar).
  */
case class BloomMightContainExpr(child: Expression, bloomBytes: Seq[Byte])
    extends UnaryExpression {

  @transient private lazy val bf: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes.toArray))

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(bf.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dense rotation (row-major d x d) of an array<double> vector — the
  * OPQ-lite step in front of PQ encoding.
  */
case class MatVecExpr(child: Expression, matrix: Seq[Double], d: Int)
    extends UnaryExpression {

  @transient private lazy val mat: Array[Double] = matrix.toArray

  override def dataType: DataType = ArrayType(DoubleType)

  override def nullSafeEval(input: Any): Any =
    Kernels.matVec(input.asInstanceOf[ArrayData], mat, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rotMatrix", mat, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.matVec($c, $ref, $d)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rectangular affine mat-vec (rows x cols, minus a constant offset) —
  * the PCA projection step: y = A·x − A·μ.
  */
case class MatVecAffineExpr(
    child: Expression, matrix: Seq[Double], offset: Seq[Double],
    rows: Int, cols: Int)
    extends UnaryExpression {

  @transient private lazy val mat: Array[Double] = matrix.toArray
  @transient private lazy val off: Array[Double] = offset.toArray

  override def dataType: DataType = ArrayType(DoubleType)

  override def nullSafeEval(input: Any): Any =
    Kernels.matVecAffine(input.asInstanceOf[ArrayData], mat, off, rows, cols)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mref = ctx.addReferenceObj("projMatrix", mat, "double[]")
    val oref = ctx.addReferenceObj("projOffset", off, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Kernels.matVecAffine($c, $mref, $oref, $rows, $cols)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registered-domain extraction under a public-suffix rule snapshot —
  * the PSL matching algorithm as one row-local codegen'd probe loop
  * (labels of the host, longest-match against a prebuilt hash table;
  * [[Kernels.registeredDomain]]). Rules travel as the raw PSL-format
  * lines (value equality for the case class); the parsed flag table is
  * built once per expression and shipped as a codegen reference
  * object, like the PQ codebooks.
  */
case class RegisteredDomainExpr(child: Expression, rules: Seq[String])
    extends UnaryExpression {

  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](rules.size * 2)
    def add(key: String, flag: Int): Unit = {
      val prev = m.get(key)
      m.put(key, Integer.valueOf(if (prev == null) flag else prev.intValue() | flag))
    }
    rules.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("//"))
      .foreach { l =>
        if (l.startsWith("!")) add(l.substring(1), 4)
        else if (l.startsWith("*.")) add(l.substring(2), 2)
        else add(l, 1)
      }
    m
  }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(input: Any): Any =
    Kernels.registeredDomain(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslTable", table, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.registeredDomain($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered lookup-sum over an int-bucket array against a constant
  * double table — the DSIR scoring fold ([[graft.operators.Dsir]]):
  * Σ table[b] over the (sorted) bucket occurrences, left-associated,
  * bit-identical to the HOF `aggregate` + `element_at` formulation it
  * replaces (HOF lambdas evaluate interpreted per element; this is one
  * codegen'd primitive loop).
  */
case class LookupSumExpr(child: Expression, table: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val tab: Array[Double] = table.toArray

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    Kernels.lookupSum(input.asInstanceOf[ArrayData], tab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lookupTable", tab, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.lookupSum($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace-token count — codegen'd `size(regexp_extract_all(c, '\S+'))`. */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.tokenCount(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DSIR hashed uni+bigram feature buckets, sorted — one tokenize+md5
  * pass per document; see [[Kernels.dsirBuckets]].
  */
case class DsirBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.dsirBuckets(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.dsirBuckets($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused portable MinHash signature (md5 + affine family + running
  * element-wise min in one byte pass); see [[Kernels.minhashSig]].
  */
case class MinHashSigExpr(child: Expression, n: Int, perms: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Kernels.minhashSig(input.asInstanceOf[UTF8String], n, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.minhashSig($c, $n, $perms)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DEFLATE-compressed byte count (zlib level 6) — the compression-ratio
  * quality signal's numerator; see [[Kernels.deflateSize]].
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Kernels.deflateSize(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.deflateSize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher top-gram fraction — codegen'd one-pass replacement for the
  * array_sort + interpreted aggregate-fold formulation (kept as the
  * property-tested HOF twin, TextFunctions.topGramFractionHof).
  */
case class TopGramFracExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"n must be positive, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Kernels.topGramFrac(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.topGramFrac($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ASCII character-class count — codegen'd
  * `size(regexp_extract_all(c, '[<chars>]'))` for ASCII-only classes.
  */
case class AsciiSetCountExpr(child: Expression, chars: String)
    extends UnaryExpression {

  require(chars.forall(_ < 128), s"class must be ASCII-only: $chars")

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.asciiSetCount(input.asInstanceOf[UTF8String], table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("asciiTable", table, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.asciiSetCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused token statistics — one byte pass produces
  * struct(n_tokens, total_len, n_stopwords), replacing the interpreted
  * aggregate-fold formulation (which also leaned on a CollapseProject
  * subtlety to avoid re-tokenization; a cheap kernel makes that moot).
  */
case class TokenStatsExpr(child: Expression, set: Seq[String])
    extends UnaryExpression {

  @transient private lazy val setRef: java.util.HashSet[UTF8String] = {
    val h = new java.util.HashSet[UTF8String](math.max(8, set.size * 2))
    set.foreach(s => h.add(UTF8String.fromString(s)))
    h
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("total_len",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_stopwords",
      org.apache.spark.sql.types.IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    Kernels.tokenStatsRow(input.asInstanceOf[UTF8String], setRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenStatsSet", setRef, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.tokenStatsRow($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass case/whitespace canonicalization — codegen'd
  * `trim(regexp_replace(lower(c), '\s+', ' '))`.
  */
case class NormalizeWsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    Kernels.normalizeWs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.normalizeWs($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Four-pattern PII redaction cascade (EMAIL -> IP -> SSN -> PHONE) as
  * ONE codegen'd kernel call — byte-exact to the four-regexp_replace
  * formulation over TextFunctions.PiiPatterns (property-tested in
  * RedactKernelSpec), with the per-kind prescan folded in so clean
  * documents cost one classification scan and zero copies.
  */
case class RedactPiiExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    Kernels.redactPii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.redactPii($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Non-ASCII presence test — early-exit byte scan, the cheap guard in
  * front of script-range regex routing (which can only match above
  * U+0080).
  */
case class HasNonAsciiExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(Kernels.hasNonAscii(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.hasNonAscii($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of whitespace-delimited tokens contained in a fixed string set
  * — the codegen'd form of `size(filter(tokens(c), isin(set)))`. The
  * HOF form tokenizes via regex and evaluates its predicate interpreted
  * per token; this is one primitive byte loop per row. Used by the
  * stopword scoring in quality/language annotation, which runs five
  * such counts per document on the corpus hot path.
  */
case class TokenSetCountExpr(child: Expression, set: Seq[String])
    extends UnaryExpression {

  @transient private lazy val setRef: java.util.HashSet[UTF8String] = {
    val h = new java.util.HashSet[UTF8String](math.max(8, set.size * 2))
    set.foreach(s => h.add(UTF8String.fromString(s)))
    h
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.tokenSetCount(input.asInstanceOf[UTF8String], setRef))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSet", setRef, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.tokenSetCount($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass multi-set token argmax ([[Kernels.tokenSetBest]]): the
  * label of the first set with the strictly-max hit count, else the
  * fallback label (last in `labels`). The language-ID hot loop.
  */
case class TokenSetBestExpr(
    child: Expression, sets: Seq[Seq[String]], labels: Seq[String])
    extends UnaryExpression {
  require(labels.size == sets.size + 1,
    "labels must carry one entry per set plus the zero-hit fallback")

  @transient private lazy val setsRef: Array[java.util.HashSet[UTF8String]] =
    sets.map { set =>
      val h = new java.util.HashSet[UTF8String](math.max(8, set.size * 2))
      set.foreach(s => h.add(UTF8String.fromString(s)))
      h
    }.toArray

  @transient private lazy val labelsRef: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    Kernels.tokenSetBest(input.asInstanceOf[UTF8String], setsRef, labelsRef)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsR = ctx.addReferenceObj("tokenSets", setsRef, "java.util.HashSet[]")
    val labelsR = ctx.addReferenceObj("bestLabels", labelsRef,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Kernels.tokenSetBest($c, $setsR, $labelsR)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct-members-present token census ([[Kernels.tokenSetDistinct]]). */
case class TokenSetDistinctExpr(child: Expression, members: Seq[String])
    extends UnaryExpression {

  @transient private lazy val membersRef: Array[UTF8String] =
    members.map(UTF8String.fromString).toArray

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(
      Kernels.tokenSetDistinct(input.asInstanceOf[UTF8String], membersRef))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("distinctMembers", membersRef,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.Kernels.tokenSetDistinct($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Tokens containing an ASCII letter ([[Kernels.alphaTokenCount]]). */
case class AlphaTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    Integer.valueOf(Kernels.alphaTokenCount(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.alphaTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-distribution Shannon entropy (bits) — codegen'd single pass;
  * see [[Kernels.byteEntropy]] for the summation-order contract.
  */
case class ByteEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(Kernels.byteEntropy(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.byteEntropy($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** NFC normalization via [[Kernels.nfcNormalize]] (ASCII fast path). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    Kernels.nfcNormalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Kernels.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def tokenSetCount(text: Column, set: Seq[String]): Column =
    column(TokenSetCountExpr(expression(text), set))

  def tokenSetBest(text: Column, sets: Seq[Seq[String]], labels: Seq[String]): Column =
    column(TokenSetBestExpr(expression(text), sets, labels))

  def tokenSetDistinct(text: Column, members: Seq[String]): Column =
    column(TokenSetDistinctExpr(expression(text), members))

  def alphaTokenCount(text: Column): Column =
    column(AlphaTokenCountExpr(expression(text)))

  def tokenCount(text: Column): Column = column(TokenCountExpr(expression(text)))

  def deflateSize(text: Column): Column = column(DeflateSizeExpr(expression(text)))

  def dsirBuckets(text: Column, buckets: Int): Column =
    column(DsirBucketsExpr(expression(text), buckets))

  def minhashSig(text: Column, n: Int, perms: Int): Column =
    column(MinHashSigExpr(expression(text), n, perms))

  def topGramFrac(text: Column, n: Int): Column = column(TopGramFracExpr(expression(text), n))

  def asciiSetCount(text: Column, chars: String): Column =
    column(AsciiSetCountExpr(expression(text), chars))

  def hasNonAscii(text: Column): Column = column(HasNonAsciiExpr(expression(text)))

  def tokenStats(text: Column, set: Seq[String]): Column =
    column(TokenStatsExpr(expression(text), set))

  def normalizeWs(text: Column): Column = column(NormalizeWsExpr(expression(text)))

  def byteEntropy(text: Column): Column = column(ByteEntropyExpr(expression(text)))

  def nfcNormalize(text: Column): Column = column(NfcNormalizeExpr(expression(text)))

  def redactPii(text: Column): Column = column(RedactPiiExpr(expression(text)))

  def signPack(vec: Column): Column = column(SignPackExpr(expression(vec)))

  def hammingTo(packed: Column, query: Seq[Long]): Column =
    column(HammingToExpr(expression(packed), query))

  def hammingPair(a: Column, b: Column): Column =
    column(HammingPairExpr(expression(a), expression(b)))

  def pqEncode(vec: Column, codebook: Seq[Double], m: Int, kc: Int, subDim: Int): Column =
    column(PqEncodeExpr(expression(vec), codebook, m, kc, subDim))

  def pqDecode(codes: Column, codebook: Seq[Double], m: Int, kc: Int, subDim: Int): Column =
    column(PqDecodeExpr(expression(codes), codebook, m, kc, subDim))

  def pqAdc(codes: Column, lut: Seq[Double], kc: Int): Column =
    column(PqAdcExpr(expression(codes), lut, kc))

  def matVec(vec: Column, matrix: Seq[Double], d: Int): Column =
    column(MatVecExpr(expression(vec), matrix, d))

  def matVecAffine(
      vec: Column, matrix: Seq[Double], offset: Seq[Double],
      rows: Int, cols: Int): Column =
    column(MatVecAffineExpr(expression(vec), matrix, offset, rows, cols))

  def lookupSum(buckets: Column, table: Seq[Double]): Column =
    column(LookupSumExpr(expression(buckets), table))

  def registeredDomain(host: Column, rules: Seq[String]): Column =
    column(RegisteredDomainExpr(expression(host), rules))

  def bloomCount(hashes: Column, bloomBytes: Seq[Byte]): Column =
    column(BloomCountExpr(expression(hashes), bloomBytes))

  def bloomMightContain(keyHash: Column, bloomBytes: Seq[Byte]): Column =
    column(BloomMightContainExpr(expression(keyHash), bloomBytes))

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

  /** Winnowing over an arbitrary pre-hashed gram array — the same kernel
    * as [[winnowFingerprints]] with the hash source decoupled, so the
    * selection algorithm can be pinned against an engine-independent
    * hash (md5-derived) by an external SQL oracle.
    */
  def winnowHashes(hashes: Column, w: Int): Column =
    column(WinnowFingerprintsExpr(expression(hashes), w))

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

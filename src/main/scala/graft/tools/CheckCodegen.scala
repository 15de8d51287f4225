package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.VectorOps
import graft.plans.HashExpressions
import graft.sources.TableIO

/** Dev check: custom expressions must produce compilable generated code
  * (codegen failures fall back silently — this surfaces them). Prints the
  * WholeStageCodegen spans and fails loudly on FALLBACK-mode mismatch.
  */
object CheckCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4)
    // CODEGEN_ONLY: throw instead of silently interpreting.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")

    val docs = TableIO.table(spark, sfDir, "documents")
    val emb = TableIO.table(spark, sfDir, "embeddings")
    val planes = VectorOps.randomPlanes(8, 64, 42L)

    val checks: Seq[(String, () => Long)] = Seq(
      "minHashFromText" -> (() => docs.select(
        HashExpressions.minHashFromText(col("text"), 3, 64, 42L)).count()),
      "simHashFromText" -> (() => docs.select(
        HashExpressions.simHashFromText(col("text"))).count()),
      "wordNGramHashes" -> (() => docs.select(
        HashExpressions.wordNGramHashes(col("text"), 3)).count()),
      "winnowFingerprints" -> (() => docs.select(
        HashExpressions.winnowFingerprints(col("text"), 3, 4)).count()),
      "dotProduct" -> (() => emb.select(
        HashExpressions.dotProduct(
          VectorOps.asDouble(col("embedding")), VectorOps.asDouble(col("embedding")))).count()),
      "hyperplaneSignature" -> (() => emb.select(
        HashExpressions.hyperplaneSignature(
          VectorOps.asDouble(col("embedding")), planes)).count()),
      "tokenSetCount" -> (() => docs.select(
        HashExpressions.tokenSetCount(lower(col("text")),
          graft.functions.TextFunctions.Stopwords("en"))).count()),
      "tokenCount" -> (() => docs.select(
        HashExpressions.tokenCount(col("text"))).count()),
      "deflateSize" -> (() => docs.select(
        HashExpressions.deflateSize(col("text"))).count()),
      "dsirBuckets" -> (() => docs.select(
        HashExpressions.dsirBuckets(col("text"), 1024)).count()),
      "minhashSig" -> (() => docs.select(
        HashExpressions.minhashSig(col("text"), 3, 16)).count()),
      "asciiSetCount" -> (() => docs.select(
        HashExpressions.asciiSetCount(col("text"), ".,;:!?")).count()),
      "tokenStats" -> (() => docs.select(
        HashExpressions.tokenStats(col("text"),
          graft.functions.TextFunctions.Stopwords("en"))).count()),
      "hasNonAscii" -> (() => docs.select(
        HashExpressions.hasNonAscii(col("text"))).count()),
      "redactPii" -> (() => docs.select(
        HashExpressions.redactPii(col("text"))).count()),
      "topGramFrac" -> (() => docs.select(
        HashExpressions.topGramFrac(col("text"), 2)).count()),
      "signPackHamming" -> (() => emb.select(
        HashExpressions.hammingTo(
          HashExpressions.signPack(VectorOps.asDouble(col("embedding"))),
          Seq(0L))).count()),
      "pqEncodeDecodeAdc" -> (() => {
        // tiny fixed codebook: 2 subspaces x 2 centroids over 64 dims
        val cb = Seq.tabulate(2 * 2 * 32)(i => (i % 7).toDouble)
        val lut = Seq.tabulate(2 * 2)(_.toDouble)
        emb.select(
          HashExpressions.pqAdc(
            HashExpressions.pqEncode(
              VectorOps.asDouble(col("embedding")), cb, 2, 2, 32), lut, 2),
          HashExpressions.pqDecode(
            HashExpressions.pqEncode(
              VectorOps.asDouble(col("embedding")), cb, 2, 2, 32), cb, 2, 2, 32)).count()
      }),
      "bloomCount" -> (() => {
        val bf = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
        bf.putLong(42L)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        docs.select(HashExpressions.bloomCount(
          HashExpressions.wordNGramHashes(col("text"), 3), bos.toByteArray.toSeq)).count()
      }),
      "bloomMightContain" -> (() => {
        val bf = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
        bf.putLong(42L)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        docs.select(HashExpressions.bloomMightContain(
          org.apache.spark.sql.functions.xxhash64(col("doc_id")),
          bos.toByteArray.toSeq)).count()
      }),
      "matVec" -> (() => {
        val rot = graft.operators.Quantization.seededRotation(64, 42L)
        emb.select(
          HashExpressions.matVec(VectorOps.asDouble(col("embedding")), rot, 64)).count()
      }),
      "quantileFromState" -> (() => {
        import graft.plans.QuantileStateAgg.{quantileFromState, quantileState}
        docs.groupBy(col("lang"))
          .agg(quantileState(col("n_chars").cast("double")).as("qs"))
          .select(quantileFromState(col("qs"), 0.5)).count()
      }))

    var failed = false
    checks.foreach { case (name, run) =>
      try { run(); println(s"[codegen] $name OK") }
      catch { case e: Throwable =>
        failed = true
        println(s"[codegen] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}

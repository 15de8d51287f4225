package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session-extension registration for the graft sketch expressions, so
  * they are callable from SQL text as well as the Column API:
  *
  *   spark.sql("SELECT graft_simhash(text) FROM docs")
  *
  * Two wiring paths, same registry entries:
  *  - production: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (applied when the session is instantiated);
  *  - live session / tests: `GraftExtensions.register(spark)`.
  *
  * Integer parameters (n, numHashes, seed, w) must be literals — they
  * parameterize code generation, not per-row inputs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name must be an Int-range integer literal, got $other")
  }

  // Seeds are genuinely 64-bit: accept any integral literal untruncated so
  // SQL-text seeds match the Column API bit for bit.
  private def longArg(e: Expression, name: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def entry(
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft", null, name, usage, ""), builder)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("graft_token_hashes",
      "graft_token_hashes(text) - FNV-1a 64 hash per whitespace token",
      args => TokenHashesExpr(args.head)),
    entry("graft_ngram_hashes",
      "graft_ngram_hashes(text, n) - 64-bit word-n-gram hashes",
      args => WordNGramHashesExpr(args.head, intArg(args(1), "n"))),
    entry("graft_simhash",
      "graft_simhash(text) - 64-bit SimHash fingerprint",
      args => SimHash64Expr(TokenHashesExpr(args.head))),
    entry("graft_minhash",
      "graft_minhash(text, n, numHashes, seed) - MinHash signature over word n-grams",
      args => MinHashSignatureExpr(
        WordNGramHashesExpr(args.head, intArg(args(1), "n")),
        intArg(args(2), "numHashes"), longArg(args(3), "seed"))),
    entry("graft_winnow",
      "graft_winnow(text, n, w) - winnowing fingerprints (MOSS) over word n-grams",
      args => WinnowFingerprintsExpr(
        WordNGramHashesExpr(args.head, intArg(args(1), "n")), intArg(args(2), "w"))),
    entry("graft_dot",
      "graft_dot(a, b) - sequential-sum dot product of two double arrays",
      args => DotProductExpr(args(0), args(1))),
    entry("graft_token_count",
      "graft_token_count(text) - whitespace-token count (codegen'd byte loop)",
      args => TokenCountExpr(args.head)),
    entry("graft_topgram_frac",
      "graft_topgram_frac(text, n) - max n-gram multiplicity share (Gopher signal)",
      args => TopGramFracExpr(args.head, intArg(args(1), "n"))),
    entry("graft_byte_entropy",
      "graft_byte_entropy(text) - Shannon entropy of the UTF-8 bytes",
      args => ByteEntropyExpr(args.head)),
    entry("graft_nfc",
      "graft_nfc(text) - Unicode NFC normalization (ASCII fast path)",
      args => NfcNormalizeExpr(args.head)),
    entry("graft_redact_pii",
      "graft_redact_pii(text) - email/IP/SSN/phone redaction, one byte-scan kernel",
      args => RedactPiiExpr(args.head)),
    entry("graft_registered_domain",
      "graft_registered_domain(host) - PSL registered domain (shipped snapshot rules)",
      args => RegisteredDomainExpr(
        args.head, graft.functions.PublicSuffix.snapshotRules)))

  /** Register on a live session (same entries the extension injects). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.plans.Kernels

/** Byte-exactness of the redactPii kernel against an INDEPENDENT
  * reference: java.util.regex replaceAll over the same four patterns in
  * cascade order — the exact engine Spark's regexp_replace uses. Pure
  * JVM (no Spark session), so thousands of cases are cheap.
  */
class RedactKernelSpec extends AnyFunSuite {

  private val compiled = TextFunctions.PiiPatterns.map {
    case (kind, p) => java.util.regex.Pattern.compile(p) -> s"[$kind]"
  }

  private def reference(s: String): String =
    compiled.foldLeft(s) { case (acc, (p, tok)) => p.matcher(acc).replaceAll(tok) }

  private def kernel(s: String): String =
    Kernels.redactPii(UTF8String.fromString(s)).toString

  private def agree(s: String): Unit =
    assert(kernel(s) == reference(s), s"input: ${s.take(200)}")

  test("well-formed PII of every kind redacts identically") {
    agree("contact bob.smith+spam@mail.example.co.uk today")
    agree("from 10.0.0.1 and 255.255.255.255.")
    agree("ssn 123-45-6789 end")
    agree("call +1 555-123-4567 or (555) 123 4567 or 5551234567")
    agree("mixed: a@b.io 1.2.3.4 123-45-6789 +12 555 123 4567 done")
  }

  test("overlap and boundary torture cases redact identically") {
    // IP-like local part consumed by the earlier EMAIL pass
    agree("1.2.3.4@x.com")
    agree("12 1.2.3.4@x.com")
    // EMAIL inside a phone-like span: cascade order decides
    agree("555 123 4567@x.com")
    // digit runs too long for IP groups / SSN groups
    agree("1234.5.6.7 and 1.2.3.4567 and 1234-56-7890")
    // ten-digit run: PHONE has no left \b and matches at offset 1
    agree("12345678901")
    // word boundaries blocked by letters/underscore
    agree("x1.2.3.4 1.2.3.4x _123-45-6789 123-45-6789_")
    // double @, empty local/domain parts
    agree("a@b@c.com @x.com a@ .@. a@.com a@b.c")
    // multibyte neighbors around matches
    agree("é1.2.3.4é and café@münchen.example.com")
    // combining marks: Pattern.Bound's NON_SPACING_MARK clause — a mark
    // with a base letter/digit is a WORD char, so a mark directly after
    // a match blocks the trailing \b (valid UTF-8, not just malformed)
    agree("1.2.3.4́ and 123-45-6789́")
    agree("5551234567́x and x́ 1.2.3.4")
    agree("́ 1.2.3.4 ́́123-45-6789")
    // phone optional-group backtracking: separator consumed then given back
    agree("555 12345678 and 55-555-1234567 and +1 (555) 123-4567")
    // SSN first then phone cannot reuse its digits
    agree("123-45-6789 4567")
    // idempotence inputs: tokens must not re-match
    agree("[EMAIL] [IP] [SSN] [PHONE] 123-45-6789")
  }

  test("kernel is idempotent") {
    val s = "a@b.cc 1.2.3.4 123-45-6789 (555) 123 4567"
    assert(kernel(kernel(s)) == kernel(s))
  }

  test("property: kernel == regex cascade on PII-dense random strings") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf(" ", "  ", "-", ".", "@", "+", "(", ")", "_", "x", "ab", "é", "word"),
      Gen.choose(0, 99999).map(_.toString),
      Gen.oneOf(
        "a@b.co", "a.b@c.d.ee", "@nope", "user%x+y@host-1.io",
        "1.2.3.4", "10.00.250.3", "999.999.999.999", "1.2.3",
        "123-45-6789", "12-345-6789", "123-456-789",
        "5551234567", "555 123 4567", "(555)123-4567", "+1 555-123-4567",
        "+12-555 123 4567", "555  123 4567"))
    val docGen: Gen[String] =
      Gen.chooseNum(0, 12).flatMap(k => Gen.listOfN(k, piece)).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000).withWorkers(1),
      Prop.forAll(docGen) { s => kernel(s) == reference(s) })
    assert(res.passed, res.status.toString)
  }

  test("property: kernel == regex cascade on adversarial character soup") {
    // Raw chars (not PII-shaped pieces): maximizes boundary/backtracking
    // interactions the piece generator can't produce mid-token.
    val alphabet = "0159.-+() ab@_éé世́"
    val soupGen: Gen[String] = Gen.chooseNum(0, 40)
      .flatMap(k => Gen.listOfN(k, Gen.oneOf(alphabet.toSeq))).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5000).withWorkers(1),
      Prop.forAll(soupGen) { s => kernel(s) == reference(s) })
    assert(res.passed, res.status.toString)
  }

  // --- malformed UTF-8: the kernel operates on RAW bytes while the
  // regex twin operates on the String Spark hands regexp_replace, i.e.
  // UTF8String.toString — whose decoder substitutes U+FFFD for every
  // ill-formed sequence. The contract: decoding the kernel's output
  // equals running the regex cascade over the decoded input. (Outputs
  // can't be compared byte-wise — the kernel preserves malformed bytes
  // verbatim where the String path already replaced them.)

  private def agreeBytes(bytes: Array[Byte]): Unit = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val decodedIn = new String(bytes, utf8)
    val kernelOut = new String(
      Kernels.redactPii(UTF8String.fromBytes(bytes)).getBytes, utf8)
    assert(kernelOut == reference(decodedIn),
      s"bytes: ${bytes.map(b => f"$b%02x").mkString(" ")}")
  }

  private def B(parts: Any*): Array[Byte] = parts.flatMap {
    case s: String => s.getBytes("UTF-8").toSeq
    case i: Int => Seq(i.toByte)
  }.toArray

  test("malformed UTF-8 neighbors decode as U+FFFD, never as boundary-suppressing letters") {
    // valid lead + non-continuation byte directly before a match: the
    // old decode read 0xC3 '1' as 'Ñ' (a letter) and suppressed the \b
    // the regex honors via U+FFFD
    agreeBytes(B(0xC3, "1.2.3.4 x"))
    agreeBytes(B("x ", 0xC3, "123-45-6789"))
    // stray continuation bytes before/after a match
    agreeBytes(B(0x80, "1.2.3.4", 0x80))
    agreeBytes(B("a", 0x80, "5551234567"))
    // truncated 3-byte prefix (two valid bytes, then a digit)
    agreeBytes(B(0xE0, 0xA0, "123-45-6789"))
    // overlong encodings — 2-byte 'A' (0xC1 0x81), 3-byte NUL — must be
    // U+FFFD, not the letter they'd naively decode to
    agreeBytes(B(0xC1, 0x81, "1.2.3.4"))
    agreeBytes(B(0xE0, 0x80, 0x80, "a@b.co"))
    // surrogate half and beyond-U+10FFFF
    agreeBytes(B(0xED, 0xA0, 0x80, "123-45-6789"))
    agreeBytes(B(0xF4, 0x90, 0x80, 0x80, "1.2.3.4"))
    // lone/truncated leads at end of input
    agreeBytes(B("1.2.3.4", 0xC3))
    agreeBytes(B("a@b.co", 0xF0, 0x9F))
    // well-formed multibyte still blocks boundaries as before
    agreeBytes(B("é", "1.2.3.4"))
  }

  test("property: kernel == regex on arbitrary byte soup") {
    val pieceBytes: Gen[Seq[Byte]] = Gen.frequency(
      3 -> Gen.oneOf("1.2.3.4", "a@b.co", "123-45-6789", "555 123 4567", " ", "x")
        .map(_.getBytes("UTF-8").toSeq),
      2 -> Gen.choose(0x80, 0xFF).map(b => Seq(b.toByte)),
      1 -> Gen.oneOf(Seq(0xC3), Seq(0xE0, 0xA0), Seq(0xF0, 0x9F, 0x98))
        .map(_.map(_.toByte)))
    val soup: Gen[Array[Byte]] =
      Gen.chooseNum(0, 10).flatMap(k => Gen.listOfN(k, pieceBytes)).map(_.flatten.toArray)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(3000).withWorkers(1),
      Prop.forAll(soup) { bytes =>
        new String(Kernels.redactPii(UTF8String.fromBytes(bytes)).getBytes, utf8) ==
          reference(new String(bytes, utf8))
      })
    assert(res.passed, res.status.toString)
  }

  test("clean text returns without copying") {
    val u = UTF8String.fromString("no personal data in this prose at all")
    assert(Kernels.redactPii(u) eq u)
  }
}

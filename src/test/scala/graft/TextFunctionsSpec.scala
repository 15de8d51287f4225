package graft

import org.apache.spark.sql.functions.{abs, col, sum}

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).collect()(0).get(0)

  test("tokenCount ignores leading/trailing/repeated whitespace") {
    assert(one("  a  b \t c ", tokenCount(col("t"))) == 3)
    assert(one("", tokenCount(col("t"))) == 0)
  }

  test("normalizeAggressive: punctuation unified, digits bucketed, invisibles gone") {
    // smart quotes/dashes -> ASCII, ZWSP (\u200B) deleted, tab collapses
    // to one space, digits -> 0, case folds
    val messy = "He said \u201CIt\u2019s\u201D \u2014 twice on 2024-03-17\u200B!\tok"
    assert(one(messy, normalizeAggressive(col("t"))) ==
      "he said \"it's\" - twice on 0000-00-00! ok")
    // NBSP becomes a regular space and collapses with its neighbors;
    // control bytes vanish entirely
    assert(one("a\u00A0\u0001 bc", normalizeAggressive(col("t"))) == "a bc")
    // leading/trailing whitespace (incl. NBSP-derived) trims away
    assert(one("\u00A0 padded \u00A0", normalizeAggressive(col("t"))) == "padded")
  }

  test("fingerprintAggressive collapses trivially-variant copies; fingerprint does not") {
    val a = "It’s device 12345 — ready"
    val b = "it's device 99999 - READY"
    assert(one(a, fingerprintAggressive(col("t"))) ==
      one(b, fingerprintAggressive(col("t"))))
    assert(one(a, fingerprint(col("t"))) != one(b, fingerprint(col("t"))))
    // content changes still change the key
    assert(one(a, fingerprintAggressive(col("t"))) !=
      one("it's device 12345 - not ready", fingerprintAggressive(col("t"))))
  }

  test("fingerprint is invariant to case and whitespace, sensitive to content") {
    val a = one("Hello   World", fingerprint(col("t")))
    val b = one("hello world", fingerprint(col("t")))
    val c = one("hello worlds", fingerprint(col("t")))
    assert(a == b)
    assert(a != c)
  }

  test("wordNGrams produces sliding space-joined windows; short docs give empty") {
    assert(one("a b c d", wordNGrams(col("t"), 3)) == Seq("a b c", "b c d"))
    assert(one("a b", wordNGrams(col("t"), 3)) == Seq())
  }

  test("topGramFraction finds the dominant gram's share; short docs give 0") {
    // "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" 3/5
    assert(one("a b a b a b", topGramFraction(col("t"), 2)) == 0.6)
    // all grams distinct -> 1/n_grams
    assert(math.abs(
      one("a b c d", topGramFraction(col("t"), 2)).asInstanceOf[Double] - 1.0 / 3.0) < 1e-12)
    // fewer tokens than n -> no grams -> 0.0
    assert(one("a", topGramFraction(col("t"), 2)) == 0.0)
    assert(one("", topGramFraction(col("t"), 2)) == 0.0)
  }

  test("topGramFraction kernel == HOF twin on the documents table and torture docs") {
    val docs = graft.sources.TableIO.table(spark, Sf0001, "documents")
      .select(col("text").as("t"))
      .unionAll(Seq(
        "", " ", "a", "loop loop loop loop", "a  b\t a  b \n a",
        "é 世 é 世 é", "x " * 200 + "tail").toDF("t"))
    for (n <- Seq(1, 2, 3)) {
      val diff = docs.select(
        sum(abs(topGramFraction(col("t"), n) - topGramFractionHof(col("t"), n))))
        .head().getDouble(0)
      assert(diff == 0.0, s"kernel and HOF fold diverge for n=$n (sum|diff|=$diff)")
    }
  }

  test("charNGrams slides over normalized text") {
    assert(one("ab cd", charNGrams(col("t"), 3)) == Seq("ab ", "b c", " cd"))
  }

  test("bpeTokenCount splits contractions, numbers, punctuation") {
    // don't -> [don]['t]; 3 words + number + ! as separate runs
    assert(one("don't stop", bpeTokenCount(col("t"))) == 3)
    assert(one("abc 123 def!", bpeTokenCount(col("t"))) == 4)
    assert(one("plain words only", bpeTokenCount(col("t"))) == 3)
  }

  test("languageId identifies stopword-distinct languages and CJK") {
    assert(one("the cat is in the house and it is good", languageId(col("t"))) == "en")
    assert(one("el perro y la casa en un dia que es bueno", languageId(col("t"))) == "es")
    assert(one("der hund und die katze ist ein tier und nicht klein", languageId(col("t"))) == "de")
    assert(one("le chat et les maisons est une chose pour tous", languageId(col("t"))) == "fr")
    assert(one("这是一个测试文档", languageId(col("t"))) == "zh")
    assert(one("xyzzy qwerty zzz", languageId(col("t"))) == "und")
  }

  test("languageId (tokenSetBest kernel) equals the CaseWhen-fold reference, nulls included") {
    import org.apache.spark.sql.functions._
    // the pre-r20 formulation, verbatim: four separate stopwordCount
    // kernels folded through a CaseWhen running-max, wrapped by the
    // same script routing — the kernel rewrite must be bitwise this
    def referenceLanguageId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val scores = Seq("en", "es", "de", "fr").map(l => l -> stopwordCount(c, l))
      val best = scores.tail.foldLeft((lit("en"), scores.head._2)) {
        case ((bestLang, bestScore), (l, s)) =>
          (when(s > bestScore, lit(l)).otherwise(bestLang),
            when(s > bestScore, s).otherwise(bestScore))
      }
      val latin = when(best._2 > 0, best._1).otherwise("und")
      val scriptRanges = Seq(
        "ja" -> """[ぁ-ゟ゠-ヿ]""", "ko" -> """[가-힣]""", "zh" -> """[一-鿿]""",
        "ru" -> """[А-яЁё]""", "ar" -> """[؀-ۿ]""", "hi" -> """[ऀ-ॿ]""")
      val scriptRouted = scriptRanges.foldRight(latin) {
        case ((lang, pattern), fallback) =>
          when(c.rlike(pattern), lang).otherwise(fallback)
      }
      when(graft.plans.HashExpressions.hasNonAscii(c), scriptRouted).otherwise(latin)
    }
    // adversarial corpus: shared stopwords across languages ("de" is
    // both Spanish and French; "la" Spanish and French), exact ties,
    // zero hits, mixed scripts, empty and NULL text
    val texts: Seq[String] = Seq(
      "the cat is in the house", "el perro y la casa", "der hund und die katze",
      "le chat et les maisons", "de la", "de", "la de le el", "und",
      "the el der le", "the the el el", "", "xyzzy", "  \t ",
      "これはテストです", "русский the текст", "mixé the accénts",
      null.asInstanceOf[String]) ++
      (0 until 200).map { i =>
        val vocab = Seq("the", "a", "of", "el", "la", "de", "der", "und",
          "le", "les", "et", "que", "en", "zz", "qqq")
        val rnd = new scala.util.Random(i)
        (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), languageId(col("t")).as("k"),
        referenceLanguageId(col("t")).as("r"))
      .collect()
    got.foreach { row =>
      assert(row.get(1) == row.get(2),
        s"id=${row.getLong(0)}: kernel=${row.get(1)} reference=${row.get(2)}")
    }
  }

  test("qualityScore lands in [0,1] and penalizes degenerate docs") {
    val good = one("the quick brown fox jumps over the lazy dog and runs away", qualityScore(col("t"))).asInstanceOf[Double]
    val bad = one("a", qualityScore(col("t"))).asInstanceOf[Double]
    assert(good >= 0.0 && good <= 1.0 && bad >= 0.0 && bad <= 1.0)
    assert(good > bad)
  }

  test("languageId routes non-Latin scripts before stopword scoring") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "日本語のテキストです漢字も含む"),     // kana + kanji -> ja, not zh
      (2L, "한국어 텍스트 입니다"),               // hangul -> ko
      (3L, "Это русский текст для проверки"),     // cyrillic -> ru
      (4L, "هذا نص عربي للاختبار"),               // arabic -> ar
      (5L, "यह परीक्षण के लिए हिंदी पाठ है"),        // devanagari -> hi
      (6L, "这是一段中文测试文本")                 // han only -> zh
    ).toDF("id", "text")
    val got = docs.select(col("id"), graft.functions.TextFunctions.languageId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "ja", 2L -> "ko", 3L -> "ru", 4L -> "ar", 5L -> "hi", 6L -> "zh"))
  }

  test("repetitionRatio: duplicate n-gram fraction, 0 for short docs") {
    // "a b c a b c a b c": 7 trigrams, 3 distinct -> 1 - 3/7
    assert(math.abs(one("a b c a b c a b c", repetitionRatio(col("t"))).asInstanceOf[Double]
      - (1.0 - 3.0 / 7.0)) < 1e-9)
    // all-distinct grams -> 0
    assert(one("v w x y z", repetitionRatio(col("t"))) == 0.0)
    // < n tokens -> no grams -> 0
    assert(one("a b", repetitionRatio(col("t"))) == 0.0)
  }

  test("tokenStats single pass equals the per-stat functions") {
    import org.apache.spark.sql.functions.{aggregate, length, lit, transform}
    import graft.functions.TextFunctions
    val docs = Seq(
      "The quick brown fox and the lazy dog",
      "  padded   whitespace  a of IT ",
      "no-stopwords-here xyzzy",
      "").toDF("text")
    val rows = docs.select(
      TextFunctions.tokenStats(col("text")).as("st"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.stopwordCount(col("text")).as("sw"),
      aggregate(transform(TextFunctions.tokens(col("text")), t => length(t)),
        lit(0), (a, x) => a + x).as("len")).collect()
    rows.foreach { r =>
      val st = r.getStruct(0)
      assert(st.getInt(0) == r.getInt(1), "n_tokens")
      assert(st.getInt(1) == r.getInt(3), "total_len")
      assert(st.getInt(2) == r.getInt(2), "n_stopwords")
    }
  }

  test("normalizeWhitespace kernel equals the regex formulation") {
    import org.apache.spark.sql.functions.{lit, lower, regexp_replace, trim}
    val texts = Seq(
      "  Hello   World  ", "a\tb\nc", "", "   ", "ONE", "Héllo  Wörld",
      "\t\n mixed \r\f ws  here ")
    texts.foreach { t =>
      assert(one(t, normalizeWhitespace(col("t"))) ==
        one(t, trim(regexp_replace(lower(col("t")), lit("""\s+"""), lit(" ")))),
        s"normalize '$t'")
    }
  }

  test("tokenCount and punctCount kernels equal their regex formulations") {
    import org.apache.spark.sql.functions.{lit, regexp_extract_all, size}
    val texts = Seq(
      "a b  c", " x ", "", "   ", "one", "a,b;c!?", """quote "d" (e) [f] {g}-""",
      "héllo wörld… punct.", "tab\tand\nnewline")
    texts.foreach { t =>
      assert(one(t, tokenCount(col("t"))) ==
        one(t, size(tokens(col("t")))), s"tokenCount '$t'")
      assert(one(t, punctCount(col("t"))) ==
        one(t, size(regexp_extract_all(col("t"), lit(PunctClass), lit(0)))),
        s"punctCount '$t'")
    }
  }

  test("stopwordCount kernel equals the HOF formulation on edge cases") {
    import org.apache.spark.sql.functions.{filter, lower, size}
    val texts = Seq(
      "the the a of", " the\tof\nand ", "", "THE A Of", "xa the, then of",
      "of-the a", "   ", "the")
    texts.foreach { t =>
      val kernel = one(t, stopwordCount(col("t")))
      val hof = one(t, size(filter(tokens(lower(col("t"))),
        x => x.isin(Stopwords("en"): _*))))
      assert(kernel == hof, s"mismatch on '$t': kernel=$kernel hof=$hof")
    }
  }

  test("redactPii replaces every kind and counts match the spans") {
    val text = "mail a.user+x@sub.example.org or call (555) 123-4567, " +
      "server 192.168.0.1, ssn 123-45-6789, intl +1 555 123 4567"
    val red = one(text, redactPii(col("t"))).asInstanceOf[String]
    assert(red.contains("[EMAIL]") && red.contains("[IP]") &&
      red.contains("[SSN]") && red.contains("[PHONE]"))
    assert(!red.contains("@") && !red.contains("123-45-6789") &&
      !red.contains("192.168.0.1") && !red.contains("4567"))
    assert(one(text, piiCount(col("t"), "EMAIL")) == 1)
    assert(one(text, piiCount(col("t"), "IP")) == 1)
    assert(one(text, piiCount(col("t"), "SSN")) == 1)
    assert(one(text, piiCount(col("t"), "PHONE")) == 2)
  }

  test("redactPii kernel column equals the regex-cascade column on mixed docs") {
    // Wiring-level identity (the kernel itself is property-tested in
    // RedactKernelSpec): both COLUMN formulations agree through Spark.
    val docs = Seq(
      "a@b.cc then 1.2.3.4 and 123-45-6789 call (555) 123 4567",
      "digits 123 but no pii shapes 9999",
      "only an email user+tag@host.example.org trailing",
      "clean prose with no digits or at signs at all",
      "é1.2.3.4 unicode boundary 12345678901")
    import spark.implicits._
    val df = docs.toDF("t")
    val both = df.select(
      redactPii(org.apache.spark.sql.functions.col("t")).as("k"),
      redactPiiRegex(org.apache.spark.sql.functions.col("t")).as("r")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1), r.getString(1)))
  }

  test("redactPii is idempotent and order-safe (SSN consumed before PHONE)") {
    val text = "ssn 123-45-6789 end"
    val once = one(text, redactPii(col("t"))).asInstanceOf[String]
    assert(once == "ssn [SSN] end")
    val twice = Seq(once).toDF("t")
      .select(redactPii(col("t"))).collect()(0).getString(0)
    assert(twice == once)
    // clean text passes through untouched
    assert(one("no pii here at all", redactPii(col("t"))) == "no pii here at all")
  }

  test("lexiconHitCount: case-insensitive exact token membership, empty list rejected") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = Seq(
      (1L, "Slow query on a SLOW corrupt table"),
      (2L, "slowly is not slow-ish nor slow"),
      (3L, "clean text here"))
      .toDF("id", "t")
      .select(col("id"),
        graft.functions.TextFunctions.lexiconHitCount(col("t"), Seq("SLOW", "corrupt")))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 3, s"two slows + one corrupt: $got") // Slow, SLOW, corrupt
    assert(got(2L) == 1, "substrings and hyphenates do not match; bare token does")
    assert(got(3L) == 0)
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.lexiconHitCount(col("t"), Seq.empty)
    }
  }

  test("byteEntropy: hand values, reference implementation agreement on random text") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ent(texts: String*): Seq[Double] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
        .orderBy("id")
        .select(graft.functions.TextFunctions.byteEntropy(col("t")))
        .as[Double].collect().toSeq
    val Seq(e0, e1, e2, e3) = ent("aaaa", "ab", "abcd", "")
    assert(e0 == 0.0 && e3 == 0.0)
    assert(math.abs(e1 - 1.0) < 1e-12)
    assert(math.abs(e2 - 2.0) < 1e-12)

    // reference fold (ascending byte order) on pseudo-random ASCII
    def ref(t: String): Double = {
      val bs = t.getBytes("UTF-8")
      if (bs.isEmpty) 0.0
      else {
        val counts = new Array[Int](256)
        bs.foreach(b => counts(b & 0xff) += 1)
        counts.filter(_ > 0).foldLeft(0.0) { (h, c) =>
          val p = c.toDouble / bs.length
          h + -(p * (math.log(p) / math.log(2.0)))
        }
      }
    }
    val rnd = new scala.util.Random(7)
    val samples = (1 to 50).map(_ =>
      (1 to rnd.nextInt(200) + 1).map(_ => (rnd.nextInt(94) + 33).toChar).mkString)
    val got = ent(samples: _*)
    samples.zip(got).foreach { case (t, g) =>
      assert(g == ref(t), s"mismatch for ${t.take(20)}...")
    }
    // prose sits between degenerate and uniform
    val Seq(prose) = ent("the quick brown fox jumps over the lazy dog")
    assert(prose > 3.0 && prose < 5.0)
  }

  test("stripMarkup: script/style content dies, tags space-separate, entities once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def strip(t: String): String =
      Seq(Tuple1(t)).toDF("t")
        .select(graft.functions.TextFunctions.stripMarkup(col("t")))
        .as[String].collect().head
    assert(strip("<p>hello</p><p>world</p>").trim.split("\\s+").toSeq ==
      Seq("hello", "world"), "tags must not glue words")
    assert(!strip("<script>var secret = 1;</script>keep").contains("secret"))
    assert(!strip("<style>p {color: red}</style>keep").contains("color"))
    assert(strip("""<SCRIPT type="x">a</SCRIPT>ok""").trim == "ok",
      "case-insensitive element match")
    // double-escaped entity decodes exactly ONCE
    assert(strip("&amp;lt;").trim == "&lt;")
    assert(strip("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;").trim ==
      """a & b <c> "d" 'e'""")
    assert(strip("plain text unchanged") == "plain text unchanged")
  }

  test("normalizeNfc: decomposed composes, fingerprints unify, ASCII is identity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val decomposed = "cafe\u0301"
    val composed = "caf\u00e9"
    val rows = Seq((1L, decomposed), (2L, composed), (3L, "ascii only"))
      .toDF("id", "t")
      .select(col("id"),
        graft.functions.TextFunctions.normalizeNfc(col("t")).as("n"),
        octet_length(col("t")).as("b0"),
        octet_length(graft.functions.TextFunctions.normalizeNfc(col("t"))).as("b1"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(1L)._1 == composed, "NFC must compose e + combining acute")
    assert(rows(1L)._2 == 6 && rows(1L)._3 == 5)
    assert(rows(2L)._1 == composed && rows(2L)._2 == 5)
    assert(rows(3L)._1 == "ascii only" && rows(3L)._2 == rows(3L)._3)
    // fingerprints unify across encoding forms only AFTER NFC
    val fp = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
      .select(
        graft.functions.TextFunctions.fingerprint(col("t")).as("raw"),
        graft.functions.TextFunctions.fingerprint(
          graft.functions.TextFunctions.normalizeNfc(col("t"))).as("nfc"))
      .collect()
    assert(fp(0).getString(0) != fp(1).getString(0))
    assert(fp(0).getString(1) == fp(1).getString(1))
  }

  test("urlHost: scheme/credentials/port/path/query stripped, lowercased; non-URLs empty") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      "https://En.Wikipedia.Org/wiki/Spark" -> "en.wikipedia.org",
      "http://user:pw@example.com:8080/x?q=1#f" -> "example.com",
      "ftp://files.example.net" -> "files.example.net",
      "https://example.org" -> "example.org",
      "no scheme here" -> "",
      "" -> "")
    val got = cases.map(_._1).toDF("u")
      .select(graft.functions.TextFunctions.urlHost(col("u")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("registeredDomain: two labels pass through, ccTLD second-levels keep three") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cases = Seq(
      "en.wikipedia.org" -> "wikipedia.org",
      "news.bbc.co.uk" -> "bbc.co.uk",
      "cdn.a.co.jp" -> "a.co.jp",
      "www.gov.uk" -> "www.gov.uk", // gov.uk is itself a public suffix
      "example.net" -> "example.net",
      "localhost" -> "localhost",
      "a.b.c.example.com" -> "example.com")
    val got = cases.map(_._1).toDF("h")
      .select(graft.functions.TextFunctions.registeredDomain(col("h")))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("script counts: explicit code-point ranges, dominant-script tie precedence") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tf = graft.functions.TextFunctions
    val got = Seq(
      "abc Привет 你好 123",  // 3 latin, 6 cyrillic, 2 cjk, 3 digit
      "Привет мир",           // cyrillic dominant
      "你好世界",               // cjk only
      "abc абв",              // 3 vs 3: tie -> latin precedence
      "12345", "").toDF("t")
      .select(
        tf.scriptCount(col("t"), "latin"), tf.scriptCount(col("t"), "cyrillic"),
        tf.scriptCount(col("t"), "cjk"), tf.scriptCount(col("t"), "digit"),
        tf.mainScript(col("t")))
      .as[(Int, Int, Int, Int, String)].collect()
    assert(got(0) == ((3, 6, 2, 3, "cyrillic")))
    assert(got(1)._5 == "cyrillic" && got(1)._2 == 9)
    assert(got(2) == ((0, 0, 4, 0, "cjk")))
    assert(got(3) == ((3, 3, 0, 0, "latin")), "equal counts break to latin")
    assert(got(4) == ((0, 0, 0, 5, "none")), "digits alone name no script")
    assert(got(5) == ((0, 0, 0, 0, "none")))
  }

  test("readability: hand-checked Flesch/FK, vowel-less word floor, empty-text null") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val tf = graft.functions.TextFunctions
    def counters(s: String): (Int, Int, Int) = {
      val r = Seq(s).toDF("t").select(
        tf.tokenCount(col("t")), tf.sentenceCount(col("t")),
        tf.syllableCount(col("t"))).as[(Int, Int, Int)].collect().head
      r
    }
    // "The cat sat. The dog ran!": 6 words, 2 sentence runs, 6 single
    // vowel groups.
    assert(counters("The cat sat. The dog ran!") == ((6, 2, 6)))
    // Vowel-less words get the >= 1 syllable floor.
    assert(counters("hmm shh.") == ((2, 1, 2)))
    // Multi-group words: "beautiful" -> eau|i|u = 3 groups.
    assert(counters("beautiful") == ((1, 1, 3)))
    // No terminator -> sentence floor 1.
    assert(counters("no terminator here") == ((3, 1, 7)))
    val f = Seq("The cat sat. The dog ran!").toDF("t").select(
      tf.fleschReadingEase(col("t")), tf.fleschKincaidGrade(col("t")))
      .as[(Double, Double)].collect().head
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    assert(f._1 == math.rint((206.835 - 1.015 * 3.0 - 84.6) * 1e4) / 1e4)
    // fk = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert(f._2 == math.rint((0.39 * 3.0 + 11.8 - 15.59) * 1e4) / 1e4)
    val empty = Seq("").toDF("t")
      .select(tf.fleschReadingEase(col("t"))).collect().head
    assert(empty.isNullAt(0))
  }

  test("compressionRatio: repetitive text crushes, high-entropy text does not, " +
    "deterministic, empty null") {
    val tf = graft.functions.TextFunctions
    val rep = "the same line over and over " * 200
    // pseudo-random hex-ish text: md5 chains, poorly compressible
    val rnd = (1 to 50).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"seed$i".getBytes).map("%02x".format(_)).mkString).mkString(" ")
    val df = Seq((1L, rep), (2L, rnd), (3L, "")).toDF("id", "t")
    val got = df.select(col("id"), tf.deflateSize(col("t")),
        tf.compressionRatio(col("t")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(got(1L)._2 < 0.05, s"repetitive ratio ${got(1L)._2}")
    assert(got(2L)._2 > 0.3, s"high-entropy ratio ${got(2L)._2}")
    assert(got(3L)._1 >= 0L && got(3L)._2.isNaN, "empty text -> null ratio")
    // deterministic across evaluations (interpreted == codegen'd too:
    // both call the same Kernels.deflateSize)
    val again = df.select(tf.compressionRatio(col("t"))).collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val first = df.select(tf.compressionRatio(col("t"))).collect()
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    assert(again.zip(first).forall { case (a, b) => a == b || (a.isNaN && b.isNaN) })
    // interpreted path agrees with the plan path
    val interp = graft.plans.Kernels.deflateSize(
      org.apache.spark.unsafe.types.UTF8String.fromString(rep))
    assert(interp == got(1L)._1)
  }

  test("canonicalUrl: each normalization rule by hand; survivors untouched") {
    val cases = Seq(
      // fragment + mixed-case scheme/host (path case preserved)
      ("HTTPS://EN.Wikipedia.ORG/Path/One#frag", "https://en.wikipedia.org/Path/One"),
      // default ports on both schemes
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:80/x", "http://a.com/x"),
      // non-default port survives
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      // tracking params: mid, leading, only, mixed survivors
      ("https://a.com/p?id=1&utm_source=f&x=2", "https://a.com/p?id=1&x=2"),
      ("https://a.com/p?utm_source=f&id=1", "https://a.com/p?id=1"),
      ("https://a.com/p?utm_source=f&fbclid=z", "https://a.com/p"),
      ("https://a.com/p?gclid=g&ref=h&keep=1", "https://a.com/p?keep=1"),
      // trailing slashes
      ("https://a.com/dir/", "https://a.com/dir"),
      ("https://a.com/", "https://a.com"),
      // everything at once
      ("HTTP://A.com:80/Dir/?utm_campaign=c&q=Z#s", "http://a.com/Dir/?q=Z"),
      // schemeless / non-URL inputs fall back to the fragment-stripped
      // input instead of collapsing to '' (one shared empty dedup key
      // would silently merge every malformed URL)
      ("example.com/p#frag", "example.com/p"),
      ("mailto:a@b.com", "mailto:a@b.com"),
      ("/relative/path/", "/relative/path"))
    val df = cases.zipWithIndex.map { case ((u, _), i) => (i.toLong, u) }
      .toDF("id", "url")
    val got = df.select(col("id"),
        graft.functions.TextFunctions.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"canonicalUrl($u) = ${got(i.toLong)}, want $want")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.plans.{GraftExtensions, HashExpressions}

/** SQL-text access to the custom expressions must agree exactly with the
  * Column-API forms (same expression classes underneath).
  */
class GraftExtensionsSpec extends SparkSpec {

  import spark.implicits._

  GraftExtensions.register(spark)

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox leaps over the lazy dog"),
    (3L, "completely different content here")).toDF("doc_id", "text")

  test("graft_simhash from SQL equals the Column API form") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_simhash(text) AS sh FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = docs.select(col("doc_id"), HashExpressions.simHashFromText(col("text")).as("sh"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.sameElements(viaCol))
  }

  test("graft_minhash and graft_ngram_hashes from SQL equal the Column API") {
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_minhash(text, 3, 16, 42) AS sig, size(graft_ngram_hashes(text, 3)) AS ng " +
        "FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2)))
    val viaCol = docs.select(
      col("doc_id"),
      HashExpressions.minHashFromText(col("text"), 3, 16, 42L).as("sig"),
      size(HashExpressions.wordNGramHashes(col("text"), 3)).as("ng"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("graft_minhash SQL seed beyond Int range matches the Column API untruncated") {
    docs.createOrReplaceTempView("ext_docs")
    val bigSeed = 4294967298L // 2^32 + 2: truncation to Int would yield 2
    val viaSql = spark.sql(
      s"SELECT doc_id, graft_minhash(text, 3, 16, ${bigSeed}L) AS sig FROM ext_docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaCol = docs.select(
      col("doc_id"), HashExpressions.minHashFromText(col("text"), 3, 16, bigSeed).as("sig"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaSql.toSeq == viaCol.toSeq)
    val truncated = docs.select(
      HashExpressions.minHashFromText(col("text"), 3, 16, 2L).as("sig"))
      .head().getSeq[Long](0)
    assert(viaSql.head._2 != truncated, "big seed must not silently truncate to its low 32 bits")
  }

  test("graft_dot from SQL computes the sequential dot product") {
    val out = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(out == 32.0)
  }

  test("graft_winnow selects a subset of the gram hashes") {
    docs.createOrReplaceTempView("ext_docs")
    val rows = spark.sql(
      "SELECT size(graft_winnow(text, 3, 4)) AS nf, size(graft_ngram_hashes(text, 3)) AS ng " +
        "FROM ext_docs").collect()
    assert(rows.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= r.getInt(1)))
  }

  test("r13 SQL surface: text kernels and PSL domain equal the Column API") {
    val rows = Seq(
      (1L, "the  quick   fox", "news.bbc.co.uk"),
      (2L, "café café", "www.school.pvt.k12.ma.us"),
      (3L, "mail user@example.com from 10.0.0.7", "alice.github.io"))
      .toDF("id", "text", "host")
    rows.createOrReplaceTempView("ext_r13")
    val viaSql = spark.sql(
      """SELECT id, graft_token_count(text) AS tc,
        |       graft_topgram_frac(text, 2) AS tg,
        |       round(graft_byte_entropy(text), 6) AS be,
        |       graft_nfc(text) AS nf,
        |       graft_redact_pii(text) AS rp,
        |       graft_registered_domain(host) AS rd
        |FROM ext_r13 ORDER BY id""".stripMargin).collect()
    val viaCol = rows.select(col("id"),
        HashExpressions.tokenCount(col("text")).as("tc"),
        HashExpressions.topGramFrac(col("text"), 2).as("tg"),
        round(HashExpressions.byteEntropy(col("text")), 6).as("be"),
        HashExpressions.nfcNormalize(col("text")).as("nf"),
        HashExpressions.redactPii(col("text")).as("rp"),
        graft.functions.PublicSuffix.registeredDomain(col("host")).as("rd"))
      .orderBy("id").collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // sanity: the SQL path really did the work
    assert(viaSql(2).getString(5).contains("[EMAIL]"))
    assert(viaSql(1).getString(6) == "school.pvt.k12.ma.us")
  }

  test("non-literal parameter is rejected with a clear error") {
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ngram_hashes(text, doc_id) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}

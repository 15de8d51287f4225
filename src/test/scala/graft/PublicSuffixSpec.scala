package graft

import org.apache.spark.sql.functions._

import graft.functions.{PublicSuffix, TextFunctions}

/** PSL registered-domain extraction: hand-derived expectations for every
  * rule class (plain multi-label suffix, deep suffix, wildcard,
  * exception, private-section, implicit default), the pass-through
  * convention, and agreement with the label heuristic on the hosts that
  * heuristic was built for.
  */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def reg(hosts: String*): Map[String, String] =
    hosts.toDF("host")
      .select($"host", TextFunctions.registeredDomainPsl($"host").as("d"))
      .as[(String, String)].collect().toMap

  test("snapshot loads and parses: rules present for every class") {
    val rules = PublicSuffix.snapshotRules
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    assert(rules.contains("co.uk"))
    assert(rules.contains("pvt.k12.ma.us"), "deep 4-label suffix")
    assert(rules.contains("*.kawasaki.jp"), "wildcard")
    assert(rules.contains("!city.kawasaki.jp"), "exception")
    assert(rules.contains("github.io"), "private section")
    assert(rules.size > 400)
  }

  test("multi-label suffixes: the cases the heuristic misclassifies") {
    val d = reg(
      "school.pvt.k12.ma.us", "www.school.pvt.k12.ma.us",
      "district.k12.ca.us", "library.lib.tx.us",
      "news.bbc.co.uk", "www.gov.uk")
    // pvt.k12.ma.us is itself a public suffix: 4 suffix labels + 1.
    assert(d("school.pvt.k12.ma.us") == "school.pvt.k12.ma.us")
    assert(d("www.school.pvt.k12.ma.us") == "school.pvt.k12.ma.us")
    assert(d("district.k12.ca.us") == "district.k12.ca.us")
    assert(d("library.lib.tx.us") == "library.lib.tx.us")
    assert(d("news.bbc.co.uk") == "bbc.co.uk")
    assert(d("www.gov.uk") == "www.gov.uk") // departments register under gov.uk
  }

  test("wildcards and exceptions: the kawasaki.jp / ck shapes") {
    val d = reg(
      "city.kawasaki.jp", "sub.city.kawasaki.jp", // exception: city.* IS registrable
      "foo.kawasaki.jp", "bar.foo.kawasaki.jp",   // wildcard: foo.kawasaki.jp is a suffix
      "www.ck", "shop.www.ck",                    // !www.ck under *.ck
      "anything.ck", "site.anything.ck")
    assert(d("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(d("sub.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(d("foo.kawasaki.jp") == "foo.kawasaki.jp") // is a suffix: pass-through
    assert(d("bar.foo.kawasaki.jp") == "bar.foo.kawasaki.jp")
    assert(d("www.ck") == "www.ck")
    assert(d("shop.www.ck") == "www.ck")
    assert(d("anything.ck") == "anything.ck") // is a suffix: pass-through
    assert(d("site.anything.ck") == "site.anything.ck")
  }

  test("private section: each platform customer is its own domain") {
    val d = reg("alice.github.io", "www.alice.github.io", "bob.blogspot.com")
    assert(d("alice.github.io") == "alice.github.io")
    assert(d("www.alice.github.io") == "alice.github.io")
    assert(d("bob.blogspot.com") == "bob.blogspot.com")
  }

  test("implicit default rule, pass-through, and null/empty handling") {
    val d = reg("deep.sub.example.com", "example.com", "com", "co.uk", "localhost", "")
    assert(d("deep.sub.example.com") == "example.com") // default: TLD + 1
    assert(d("example.com") == "example.com")
    assert(d("com") == "com")       // bare TLD: pass-through
    assert(d("co.uk") == "co.uk")   // host IS a suffix: pass-through
    assert(d("localhost") == "localhost")
    assert(d("") == "")
    val n = Seq[(Integer, String)]((1, null)).toDF("i", "host")
      .select(TextFunctions.registeredDomainPsl($"host")).collect().head
    assert(n.isNullAt(0))
  }

  test("agrees with the label heuristic on the hosts it was built for") {
    val hosts = Seq("en.wikipedia.org", "news.bbc.co.uk", "blogs.example.com",
      "www.gov.uk", "cdn.a.co.jp", "example.net")
    val both = hosts.toDF("host")
      .select(
        TextFunctions.registeredDomain($"host").as("heur"),
        TextFunctions.registeredDomainPsl($"host").as("psl"))
      .as[(String, String)].collect()
    both.foreach { case (h, p) => assert(h == p, s"heuristic $h vs psl $p") }
  }
}

package graft.functions

import org.apache.spark.sql.Column

/** Public-suffix list snapshot — the data file behind
  * [[TextFunctions.registeredDomainPsl]].
  *
  * The PSL is a DATA problem, not an algorithm: multi-label registry
  * suffixes (`co.uk`, `k12.ma.us`, the `*.kawasaki.jp` wildcard with
  * its `!city.kawasaki.jp` exception) can't be derived from the host
  * string. The snapshot ships as a classpath resource in the public
  * publicsuffix.org FORMAT (rule / `*.`wildcard / `!`exception /
  * `#` comments), so tracking the live list is a file swap — the
  * documented seam from the r11/r12 label heuristic, now carrying real
  * rules. Matching runs row-local against a driver-built hash table
  * ([[graft.plans.Kernels.registeredDomain]]): the table is
  * metadata-sized (the full live list is ~10k rules) and rides the
  * expression as a codegen reference object — the broadcast-join seam
  * collapsed into a zero-shuffle probe, the lexicon-kernel pattern.
  */
object PublicSuffix {

  val ResourcePath = "/graft/public_suffix_snapshot.dat"

  /** The snapshot's raw rule lines (comments and blanks included —
    * parsing is the expression's job, so a swapped-in raw PSL download
    * works unmodified).
    */
  lazy val snapshotRules: Seq[String] = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"public-suffix snapshot missing from classpath: $ResourcePath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Registered (pay-level) domain of a lowercased host column under
    * the snapshot rules. Hosts that ARE a public suffix (or empty)
    * pass through unchanged, matching
    * [[TextFunctions.registeredDomain]]'s convention.
    */
  def registeredDomain(host: Column): Column =
    graft.plans.HashExpressions.registeredDomain(host, snapshotRules)

  /** Same matcher over caller-supplied rules (a live PSL download). */
  def registeredDomain(host: Column, rules: Seq[String]): Column =
    graft.plans.HashExpressions.registeredDomain(host, rules)
}

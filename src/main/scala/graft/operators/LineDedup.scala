package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LINE/PARAGRAPH-grain deduplication (the Dolma/RefinedWeb pass):
  * boilerplate in web corpora repeats at the LINE level — nav menus,
  * cookie banners, footers, license blurbs — and line-exact matching
  * catches it orders of magnitude cheaper than the character-gram span
  * machinery ([[SubstringDedup]]), which stays the tool for duplicated
  * PROSE that doesn't respect line boundaries. Splitting on a paragraph
  * separator instead of '\n' is the same operator (`sep` parameter).
  *
  * Scale shape: one line explode (rows = corpus lines, each a few
  * hundred bytes), a map-side-combined census on the line hash, and a
  * semi/anti join back — no window in the `dropAll` path, and the
  * `keepFirst` window is per-LINE over occurrence rows (a hot
  * boilerplate line concentrates its occurrences on ONE window task —
  * for Zipf-hot boilerplate at extreme scale, prefer `dropAll`, which
  * is also what Dolma's production pass does with its bloom filter).
  * Measured (ScaleStress `lines` arm, 500k docs with one planted
  * 5M-site footer line): keepFirst's longest task is the footer's
  * single rank-window reducer at 6.7s and grows linearly with the hot
  * line's multiplicity; dropAll's longest task (4.3s) is a plain
  * partition-sized scan/agg task — bounded by partitioning, not by any
  * key's multiplicity. Rebuild is one groupBy(doc) over kept lines.
  */
object LineDedup {

  private def lines(df: DataFrame, idCol: String, textCol: String, sep: String) =
    df.select(
        col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("line_idx", "line")))

  /** Corpus-wide duplicated lines: (line, n_sites, n_docs) for every
    * line occurring more than once — the boilerplate inventory a
    * curation pass reviews before choosing a strip mode.
    */
  def duplicatedLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame =
    lines(df, idCol, textCol, sep)
      .groupBy(col("line"))
      .agg(
        count(lit(1)).as("n_sites"),
        countDistinct(col("doc_id")).as("n_docs"))
      .where(col("n_sites") > 1)

  /** Strip corpus-duplicated lines and rebuild each document.
    *
    * `keepFirst = false` (dropAll, the default and the scale-safe
    * shape): EVERY occurrence of a line that appears more than once
    * corpus-wide is removed — census + anti-join, no per-key window.
    * `keepFirst = true`: the single occurrence with the lowest
    * (doc_id, line_idx) survives (Dolma's mark-duplicates-after-first
    * semantics), via a rank window keyed by the line.
    *
    * Line ORDER inside each document is preserved; documents whose
    * every line was boilerplate come back as empty text, not dropped —
    * the caller decides whether empties die at the quality gate.
    */
  def stripDuplicatedLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      keepFirst: Boolean = false): DataFrame = {
    val ls = lines(df, idCol, textCol, sep)
    val kept =
      if (keepFirst) {
        val w = Window.partitionBy(col("line"))
          .orderBy(col("doc_id"), col("line_idx"))
        ls.withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .drop("__rn")
      } else {
        val dups = ls.groupBy(col("line")).agg(count(lit(1)).as("n"))
          .where(col("n") > 1)
          .select("line")
        ls.join(dups, Seq("line"), "left_anti")
      }
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(concat_ws(sep,
        transform(
          array_sort(collect_list(struct(col("line_idx"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    df.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** WITHIN-document line dedup as a pure row-local column (the
    * MassiveText "remove duplicated lines within document" repetition
    * fix): keep each line's FIRST in-document occurrence, preserve
    * order. Zero shuffle — this belongs in the annotate scan next to
    * the other row-local signals.
    */
  def dedupLinesInDoc(c: Column, sep: String = "\n"): Column = {
    val ls = split(c, java.util.regex.Pattern.quote(sep))
    array_join(
      filter(ls, (x, i) => array_position(ls, x) === i + 1),
      sep)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance-1 fuzzy join via deletion neighborhoods (the
  * FastSS dictionary of Bocek et al. 2007): index every string under
  * itself plus its |s| one-character-deletion variants. Two strings
  * within Levenshtein distance 1 ALWAYS share a key — a substitution
  * at i collides after both delete position i, an insertion/deletion
  * collides with the other side's original — so a plain equi-join on
  * the variant key is a SOUND candidate generator, and one final
  * `levenshtein` check removes the collisions that aren't real
  * matches. No similarity threshold tuning, no recall loss: the
  * DuckDB oracle brute-forces all pairs and the hashes match, which
  * is the point.
  *
  * 100 TB shape: key fan-out is len+1 per string (bounded by the
  * string-length cap), the join is a standard hash equi-join on the
  * variant key — never an all-pairs comparison — and the verify
  * filter runs per candidate pair. Popular variants (e.g. deleting
  * the one char that makes two product lines collide) are ordinary
  * join skew, handled by AQE like any hot key. This is the same
  * "signature → bucket join → verify" architecture as MinHash/LSH
  * dedup, with an EXACT signature instead of a probabilistic one.
  */
object FuzzyJoin {

  /** The string plus every one-character-deletion variant, deduped. */
  def deletionKeys(c: Column): Column =
    array_distinct(concat(
      array(c),
      transform(sequence(lit(1), length(c)),
        i => concat(c.substr(lit(1), i - 1),
          c.substr(i + 1, length(c) - i)))))

  /** All (leftId, rightId) pairs with levenshtein(leftStr, rightStr)
    * <= 1, plus the distance — exact, via the deletion-neighborhood
    * candidate join. Identical strings count (distance 0).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftStr: String,
      rightId: String,
      rightStr: String): DataFrame = {
    val lk = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"),
      explode(deletionKeys(col(leftStr))).as("__k"))
    val rk = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"),
      explode(deletionKeys(col(rightStr))).as("__k"))
    lk.join(rk, "__k")
      .select(col("__lid"), col("__ls"), col("__rid"), col("__rs"))
      .distinct()
      .withColumn("distance", levenshtein(col("__ls"), col("__rs")))
      .filter(col("distance") <= 1)
      .select(col("__lid").as(leftId), col("__rid").as(rightId),
        col("distance"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ml.QualityClassifier

/** Weak-label quality classifier: separable synthetic corpus trains to
  * high AUC, scoring is deterministic and shuffle-free, and the scores
  * generalize the weak label beyond the training slice.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // prose vocabulary vs gibberish vocabulary — disjoint token sets
  private def prose(i: Int) =
    s"the quick brown fox number $i jumps over the lazy dog and " +
      "tells a complete story with a beginning and an end"
  private def junk(i: Int) =
    s"zxq$i qqzz xjxj vvkk zzzz qpqp mmnn zxzx wwww kkkk jjjj item$i"

  test("separable weak labels train to AUC ~1; held-out docs score on the right side") {
    val labeled = ((1 to 40).map(i => (prose(i), 1)) ++
      (1 to 40).map(i => (junk(i), 0))).toDF("text", "label")
    val model = QualityClassifier.train(labeled, "text", "label")
    assert(QualityClassifier.auc(model, labeled, "text", "label") > 0.99)
    // held-out docs (ids the training never saw) score decisively
    val holdout = Seq(
      (1L, prose(999)), (2L, junk(999))).toDF("doc_id", "text")
    val scores = QualityClassifier.score(model, holdout, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 0.8, s"prose must score high: $scores")
    assert(scores(2L) < 0.2, s"gibberish must score low: $scores")
    // deterministic: retrain + rescore is bit-identical
    val model2 = QualityClassifier.train(labeled, "text", "label")
    val scores2 = QualityClassifier.score(model2, holdout, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores2 == scores)
  }

  test("scoring plan is shuffle-free (broadcast model, map-side inference)") {
    val labeled = ((1 to 20).map(i => (prose(i), 1)) ++
      (1 to 20).map(i => (junk(i), 0))).toDF("text", "label")
    val model = QualityClassifier.train(labeled, "text", "label")
    val docs = graft.sources.TableIO.table(spark, Sf0001, "documents")
    val plan = QualityClassifier.score(model, docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"inference must not shuffle:\n$plan")
    // and it runs over the real corpus
    val n = QualityClassifier.score(model, docs, "doc_id", "text")
      .where(col("quality_score").between(0, 1)).count()
    assert(n == docs.count())
  }
}

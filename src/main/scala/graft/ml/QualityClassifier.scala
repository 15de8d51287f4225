package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastText-style QUALITY CLASSIFIER over document text — the
  * GPT-3-lineage corpus filter (Brown et al. 2020 trained a classifier
  * with curated text as positives and raw CommonCrawl as negatives,
  * then kept documents by score): hashed bag-of-words features into a
  * logistic regression, trained on WEAK LABELS the pipeline already has
  * (a curated source column, a heuristic-quality band, a hand-labeled
  * seed set), scored over the full corpus as one batch pass.
  *
  * Spark-first shape: `RegexTokenizer` -> `HashingTF` (fixed-width
  * hashed features — no vocabulary state to ship, the property that
  * makes the model a few KB regardless of corpus size) -> L2 logistic
  * regression. Training runs on the (small) labeled slice; scoring is a
  * broadcast of the coefficient vector and one codegen'd pass — no
  * shuffle at all in inference.
  *
  * Deterministic end to end: the tokenizer and feature hash are pure
  * functions and LBFGS on a fixed dataset converges identically, so
  * the contract query re-trains bit-stably (rows-only because MLlib's
  * internal numerics are not SQL-replayable — same §8 class as the
  * fraud model).
  */
object QualityClassifier {

  val NumFeatures: Int = 1 << 15

  def buildPipeline(regParam: Double = 0.01, maxIter: Int = 50): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("__words")
      .setPattern("\\s+") // split on whitespace: TextFunctions.tokens parity
    val tf = new HashingTF()
      .setInputCol("__words").setOutputCol("features")
      .setNumFeatures(NumFeatures)
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setRegParam(regParam).setMaxIter(maxIter)
      .setProbabilityCol("quality_prob")
    new Pipeline().setStages(Array(tok, tf, lr))
  }

  /** Train on a weakly-labeled frame (`textCol`, integer `labelCol`
    * with 1 = high quality). The labeled slice is small by contract —
    * curated positives vs raw negatives.
    */
  def train(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      regParam: Double = 0.01,
      maxIter: Int = 50): PipelineModel =
    buildPipeline(regParam, maxIter).fit(
      labeled.select(
        col(textCol).as("text"), col(labelCol).cast("double").as("label")))

  /** Score a corpus: input columns + `quality_score` (P(high quality)).
    * Pure map-side inference — the model broadcasts, nothing shuffles.
    */
  def score(
      model: PipelineModel,
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val out = model.transform(
      df.select(col(idCol), col(textCol).as("text")))
    out.select(
      col(idCol),
      element_at(
        org.apache.spark.ml.functions.vector_to_array(col("quality_prob")), 2)
        .as("quality_score"))
  }

  /** AUC of a trained model on a labeled holdout. */
  def auc(model: PipelineModel, labeled: DataFrame, textCol: String, labelCol: String): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .evaluate(model.transform(labeled.select(
        col(textCol).as("text"), col(labelCol).cast("double").as("label"))))
}

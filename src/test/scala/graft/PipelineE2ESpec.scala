package graft

import java.nio.file.{Files, Paths}

import scala.util.Random

import graft.app.RunPipeline
import graft.core.PipelineConfig

/** Raw CSV -> bronze -> silver -> features -> gold, golden-path assertions
  * (SURVEY §5 tier 4). Training is exercised separately in FraudModelSpec;
  * here train=false keeps the e2e fast.
  */
class PipelineE2ESpec extends SparkSpec {

  // Unique per run: the quarantine sink is append-mode (as in the
  // reference), so a reused root accumulates rows across test runs.
  private val root = s"target/tmp/pipeline_e2e_${System.nanoTime()}"

  private def writeFixture(): Unit = {
    val rng = new Random(11)
    val dir = Paths.get(s"$root/raw/transactions")
    Files.createDirectories(dir)
    val header = "transaction_id,timestamp,sender_account,receiver_account,amount," +
      "transaction_type,merchant_category,location,device_used,is_fraud,fraud_type," +
      "time_since_last_transaction,spending_deviation_score,velocity_score," +
      "geo_anomaly_score,payment_channel,ip_address,device_hash"
    val rows = (0 until 300).map { i =>
      val month = 1 + rng.nextInt(12)
      val fraud = rng.nextDouble() < 0.1
      f"tx$i%04d,2023-$month%02d-15T${rng.nextInt(24)}%02d:30:00.000000,a${i % 20},b${i % 30}," +
        f"${10 + rng.nextDouble() * 100}%.2f,payment,grocery,Berlin,atm,$fraud," +
        s"${if (fraud) "card_not_present" else ""},1.0,0.5,3,0.1,card,ip,d$i"
    } :+ "bad,row,only"
    Files.writeString(dir.resolve("part.csv"), (header +: rows).mkString("\n"))
  }

  test("full medallion run produces quarantine, split silver, features, gold") {
    writeFixture()
    val cfg = PipelineConfig(root)
    RunPipeline.run(spark, cfg, train = false)

    assert(spark.read.parquet(cfg.quarantine).count() == 1)
    val silverTrain = spark.read.parquet(cfg.silver("train"))
    val silverTest = spark.read.parquet(cfg.silver("test"))
    assert(silverTrain.count() + silverTest.count() == 300)
    assert(silverTrain.filter(silverTrain("timestamp") >= cfg.splitTimestamp).count() == 0)

    val feats = spark.read.parquet(cfg.features("train"))
    assert(Seq("velocity_1h", "avg_diff_24h", "merchant_diversity")
      .forall(feats.columns.contains))

    val daily = spark.read.parquet(cfg.goldDaily)
    assert(daily.count() > 0)
    val rates = daily.select("fraud_rate").collect().map(_.getDouble(0))
    assert(rates.forall(r => r >= 0.0 && r <= 1.0))
    assert(spark.read.parquet(cfg.goldHourly).count() <= 24)
  }

  test("jdbcMartUrl exports gold summaries to the RDBMS losslessly") {
    writeFixture()
    val url = graft.sources.JdbcIO.derbyUrl(s"target/tmp/derby/mart_${System.nanoTime()}")
    val cfg = PipelineConfig(root, jdbcMartUrl = Some(url))
    RunPipeline.run(spark, cfg, train = false)
    for ((path, table) <- Seq(
        cfg.goldDaily -> "mart_daily_fraud_summary",
        cfg.goldHourly -> "mart_hourly_patterns")) {
      val gold = spark.read.parquet(path)
      val mart = graft.sources.JdbcIO.read(spark, url, table)
        .select(gold.columns.map(org.apache.spark.sql.functions.col): _*)
      val key = gold.columns.head
      assert(mart.orderBy(key).collect().toSeq == gold.orderBy(key).collect().toSeq,
        s"$table diverged from $path")
    }
  }

  test("blockedFeatures config produces an identical silver->features->gold run") {
    writeFixture()
    val plainCfg = PipelineConfig(root)
    val blockedRoot = s"$root/blocked"
    // Same raw input, blocked window plan.
    val src = Paths.get(s"$root/raw/transactions/part.csv")
    val dst = Paths.get(s"$blockedRoot/raw/transactions/part.csv")
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val blockedCfg = PipelineConfig(blockedRoot, blockedFeatures = true)
    RunPipeline.run(spark, plainCfg, train = false)
    RunPipeline.run(spark, blockedCfg, train = false)

    for (split <- Seq("train", "test")) {
      val plain = spark.read.parquet(plainCfg.features(split))
      val blocked = spark.read.parquet(blockedCfg.features(split))
      assert(plain.columns.sameElements(blocked.columns),
        s"blocked features must keep the exact schema ($split)")
      assert(blocked.exceptAll(plain).isEmpty && plain.exceptAll(blocked).isEmpty,
        s"blocked pipeline features must be bit-identical to plain ($split)")
    }
    // Downstream gold is silver-derived, but assert it anyway: the two
    // configurations must be indistinguishable to every consumer.
    val goldPlain = spark.read.parquet(plainCfg.goldDaily)
    val goldBlocked = spark.read.parquet(blockedCfg.goldDaily)
    assert(goldBlocked.exceptAll(goldPlain).isEmpty && goldPlain.exceptAll(goldBlocked).isEmpty)
  }
}

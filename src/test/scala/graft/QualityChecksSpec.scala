package graft

import graft.quality._

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("t1", Some(10.0), 5, 0),
    ("t2", Some(-3.0), 30, 1),   // amount below range
    ("t3", None, 23, 0),         // null amount
    ("t4", Some(7.5), 2, 9)      // label out of set
  ).toDF("transaction_id", "amount", "txn_hour", "label")

  test("fused suite counts each violation class in one pass") {
    val report = CheckSuite.run(df, Seq(
      ColumnExists("transaction_id"),
      ColumnExists("nope"),
      NotNull("amount"),
      Between("amount", 0, 1000),
      Between("txn_hour", 0, 23),
      InSet("label", Seq(0, 1))))
    assert(report.rows == 4)
    assert(report.missingColumns == Seq("nope"))
    assert(report.violations("not_null(amount)") == 1)
    assert(report.violations("between(amount,0.0,1000.0)") == 1)
    assert(report.violations("between(txn_hour,0.0,23.0)") == 1) // t2: txn_hour=30
    assert(report.violations("in_set(label)") == 1)
    assert(!report.passed)
  }

  test("requirePass throws fail-closed and passes on clean data") {
    intercept[DataQualityException] {
      CheckSuite.requirePass(df, Seq(NotNull("amount")))
    }
    val clean = df.filter($"transaction_id" === "t1")
    CheckSuite.requirePass(clean, Seq(NotNull("amount"), InSet("label", Seq(0, 1))))
  }
}

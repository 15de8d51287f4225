package graft

import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added/removed/changed; unchanged filtered by default") {
    val before = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")).toDF("id", "t", "s")
    val after = Seq((2L, "b", "y"), (3L, "C", "z"), (4L, "d", "w")).toDF("id", "t", "s")
    val got = SnapshotDiff.snapshotDiff(before, after, "id", Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val all = SnapshotDiff.snapshotDiff(before, after, "id", Seq("t", "s"),
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(2L) == "unchanged" && all.size == 4)
  }

  test("null-safe separator framing: shifts and nulls are real changes") {
    // ("ab","c") vs ("a","bc") must differ; null vs "" must differ
    val before = Seq((1L, Some("ab"), Some("c")), (2L, None: Option[String], Some("")))
      .toDF("id", "t", "s")
    val after = Seq((1L, Some("a"), Some("bc")), (2L, Some(""), Some("")))
      .toDF("id", "t", "s")
    val got = SnapshotDiff.snapshotDiff(before, after, "id", Seq("t", "s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "changed", 2L -> "changed"))
  }

  test("identical snapshots produce an empty delta") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(SnapshotDiff.snapshotDiff(df, df, "id", Seq("t")).count() == 0)
  }
}

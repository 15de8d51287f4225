package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "v")

  test("applyChangelog: latest seq wins per key, deletes drop, inserts land") {
    val changes = Seq(
      (1L, "a1", 11.0, 1L, "upsert"),   // superseded
      (1L, "a2", 12.0, 3L, "upsert"),   // winner for key 1
      (2L, "b", 0.0, 2L, "DELETE"),     // delete (case-insensitive)
      (4L, "d", 40.0, 1L, "upsert"),    // brand-new key
      (5L, "e", 50.0, 1L, "delete")     // delete of absent key: no-op
    ).toDF("id", "name", "v", "seq", "op")
    val got = Cdc.applyChangelog(snap, changes, "id", "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> ("a2", 12.0), 3L -> ("c", 30.0), 4L -> ("d", 40.0)))
  }

  test("applyChangelog: delete-then-reinsert resolves by latest seq, both orders") {
    val reinsert = Seq(
      (3L, "x", 0.0, 10L, "delete"), (3L, "c2", 31.0, 11L, "upsert")
    ).toDF("id", "name", "v", "seq", "op")
    val a = Cdc.applyChangelog(snap, reinsert, "id", "seq", "op")
    assert(a.filter(col("id") === 3L).select("name").as[String].head() == "c2")
    val dropLast = Seq(
      (3L, "c2", 31.0, 10L, "upsert"), (3L, "x", 0.0, 11L, "delete")
    ).toDF("id", "name", "v", "seq", "op")
    val b = Cdc.applyChangelog(snap, dropLast, "id", "seq", "op")
    assert(b.filter(col("id") === 3L).count() == 0)
  }

  test("scd2: init opens one current version per key") {
    val dim = Cdc.scd2Init(snap, lit(Date.valueOf("2024-01-01")))
    assert(dim.filter(col("is_current") && col("valid_to").isNull).count() == 3)
    assert(dim.columns.takeRight(3).toSeq == Seq("valid_from", "valid_to", "is_current"))
  }

  test("scd2Apply: changed keys close + reopen, new keys open, unchanged untouched") {
    val d0 = Date.valueOf("2024-01-01")
    val d1 = Date.valueOf("2024-02-01")
    val dim = Cdc.scd2Init(snap, lit(d0))
    val updates = Seq(
      (1L, "a", 10.0),    // unchanged
      (2L, "b", 21.0),    // changed attr
      (4L, "d", 40.0)     // new key
    ).toDF("id", "name", "v")
    val out = Cdc.scd2Apply(dim, updates, "id", Seq("name", "v"), lit(d1))
    val rows = out.collect().map(r => (
      r.getLong(r.fieldIndex("id")), r.getDouble(r.fieldIndex("v")),
      Option(r.getDate(r.fieldIndex("valid_to"))), r.getBoolean(r.fieldIndex("is_current"))))
    assert(rows.length == 5)
    // key 2: closed old version + open new one
    assert(rows.count(t => t._1 == 2L) == 2)
    assert(rows.contains((2L, 20.0, Some(d1), false)))
    assert(rows.contains((2L, 21.0, None, true)))
    // key 1 unchanged: original open row intact
    assert(rows.contains((1L, 10.0, None, true)))
    // key 3 absent from updates: stays open (Kimball no-delete)
    assert(rows.contains((3L, 30.0, None, true)))
    // key 4 new
    assert(rows.contains((4L, 40.0, None, true)))
  }

  test("scd2Apply: second fold only touches re-changed keys; history accumulates") {
    val d0 = lit(Date.valueOf("2024-01-01"))
    val d1 = lit(Date.valueOf("2024-02-01"))
    val d2 = lit(Date.valueOf("2024-03-01"))
    val dim0 = Cdc.scd2Init(snap, d0)
    val dim1 = Cdc.scd2Apply(dim0, Seq((2L, "b", 21.0)).toDF("id", "name", "v"),
      "id", Seq("name", "v"), d1)
    val dim2 = Cdc.scd2Apply(dim1, Seq((2L, "b", 22.0)).toDF("id", "name", "v"),
      "id", Seq("name", "v"), d2)
    val k2 = dim2.filter(col("id") === 2L)
      .orderBy(col("valid_from"))
      .select("v", "is_current").as[(Double, Boolean)].collect().toSeq
    assert(k2 == Seq((20.0, false), (21.0, false), (22.0, true)))
    // dim1's other keys flow through dim2 byte-identically
    assert(dim2.filter(col("id") =!= 2L).count() == 2)
  }

  test("scd2Apply: null attributes are real values and framing is null-safe") {
    val dim = Cdc.scd2Init(
      Seq((1L, Some("ab"), Some("c"))).toDF("id", "x", "y"), lit(Date.valueOf("2024-01-01")))
    // ("ab","c") -> ("a","bc"): shifted concat must register as changed
    val out = Cdc.scd2Apply(dim,
      Seq((1L, Some("a"), Some("bc"))).toDF("id", "x", "y"),
      "id", Seq("x", "y"), lit(Date.valueOf("2024-02-01")))
    assert(out.filter(col("is_current")).select("x").as[String].head() == "a")
    assert(out.count() == 2)
    // null vs "" must register as changed too
    val out2 = Cdc.scd2Apply(dim,
      Seq((1L, None: Option[String], Some("c"))).toDF("id", "x", "y"),
      "id", Seq("x", "y"), lit(Date.valueOf("2024-02-01")))
    assert(out2.count() == 2)
  }

  test("scd2Apply rejects updates that already carry SCD columns") {
    val dim = Cdc.scd2Init(snap, lit(Date.valueOf("2024-01-01")))
    intercept[IllegalArgumentException] {
      Cdc.scd2Apply(dim, dim, "id", Seq("name"), lit(Date.valueOf("2024-02-01")))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.RetrievalIndex
import graft.operators.TfIdf
import graft.sources.TableIO

class RetrievalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("hash", "join", "window")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "dl", "score", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  test("restriction law: probing the folded store equals the one-shot corpus scan") {
    val docs = TableIO.table(spark, Sf0001, "documents")
    val store = s"target/tmp/rindex_${System.nanoTime()}"
    RetrievalIndex.appendBatch(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", store, 0L)
    RetrievalIndex.appendBatch(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", store, 1L)
    val viaIndex = rows(RetrievalIndex.bm25TopK(spark, store, terms, k = 10).orderBy("rk"))
    val oneShot = rows(TfIdf.bm25TopDocs(docs, "doc_id", "text", terms, k = 10).orderBy("rk"))
    assert(viaIndex == oneShot)

    // replaying an already-landed batch is a no-op (overwrite-idempotent)
    RetrievalIndex.appendBatch(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", store, 1L)
    assert(rows(RetrievalIndex.bm25TopK(spark, store, terms, k = 10).orderBy("rk")) == oneShot)
  }

  test("probe plan: term filter pushes down to the postings scan; no doc-level join") {
    val docs = TableIO.table(spark, Sf0001, "documents").limit(50)
    val store = s"target/tmp/rindex_plan_${System.nanoTime()}"
    RetrievalIndex.appendBatch(docs, "doc_id", "text", store, 0L)
    val plan = RetrievalIndex.bm25TopK(spark, store, terms, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term filter must reach the parquet scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"probe must not join doc-level data:\n$plan")
  }

  test("streaming index sink: streamed store == batch store") {
    val root = s"target/tmp/rindex_stream_${System.nanoTime()}"
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val docs = TableIO.table(spark, Sf0001, "documents").select("doc_id", "text")
    def feed(i: Int, part: org.apache.spark.sql.DataFrame): Unit = {
      val stage = s"$root/stage$i"
      part.coalesce(1).write.parquet(stage)
      val f = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(f, java.nio.file.Paths.get(s"$in/b$i.parquet"))
    }
    feed(0, docs.filter(col("doc_id") % 2 === 0))
    val schema = spark.read.parquet(in).schema
    val q = RetrievalIndex.indexSink(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", s"$root/store", s"$root/ckpt")
    q.processAllAvailable()
    feed(1, docs.filter(col("doc_id") % 2 === 1))
    q.processAllAvailable()
    q.stop()
    val streamed = rows(RetrievalIndex.bm25TopK(spark, s"$root/store", terms, k = 10).orderBy("rk"))
    val oneShot = rows(TfIdf.bm25TopDocs(docs, "doc_id", "text", terms, k = 10).orderBy("rk"))
    assert(streamed == oneShot)
  }

  test("argument guards") {
    val docs = TableIO.table(spark, Sf0001, "documents").limit(5)
    val store = s"target/tmp/rindex_guard_${System.nanoTime()}"
    RetrievalIndex.appendBatch(docs, "doc_id", "text", store, 0L)
    intercept[IllegalArgumentException] {
      RetrievalIndex.bm25TopK(spark, store, Seq.empty, k = 5)
    }
    intercept[IllegalArgumentException] {
      RetrievalIndex.bm25TopK(spark, store, terms, k = 0)
    }
    intercept[IllegalArgumentException] {
      RetrievalIndex.appendBatch(docs, "doc_id", "text", store, -1L)
    }
  }
}

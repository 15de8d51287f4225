package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.VectorOps
import graft.operators.Dedup
import graft.sources.TableIO

/** Dev profiler: embedding near-dup LSH stage timings + candidate volume. */
object ProfileEmb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val emb = TableIO.table(spark, sfDir, "embeddings")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("emb.count")(emb.count())
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = VectorOps.randomPlanes(16, dim, 42L)
    val v = emb.select(col("vec_id").as("id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("sig", VectorOps.hyperplaneSignature(col("v"), planes))
    time("signatures")(v.count())

    val chunks = 3
    val bitsPer = (16 + chunks - 1) / chunks
    val chunkCols = (0 until chunks).map { c =>
      val start = c * bitsPer
      val width = math.max(1, math.min(bitsPer, 16 - start))
      struct(lit(c).as("chunk"),
        shiftrightunsigned(col("sig"), start).bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }
    val exploded = v.select(col("id"), explode(array(chunkCols: _*)).as("ch"))
      .select(col("id"), col("ch.chunk").as("chunk"), col("ch.cv").as("cv"))
    time("bucket histogram")(
      exploded.groupBy("chunk", "cv").count().orderBy(desc("count")).show(10))
    val cands = exploded.select(col("id").as("id_a"), col("chunk"), col("cv"))
      .join(exploded.select(col("id").as("id_b"), col("chunk"), col("cv")), Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
    time("raw collisions")(println("[profile] n_collisions = " + cands.count()))
    time("distinct pairs")(println("[profile] n_pairs = " +
      cands.select("id_a", "id_b").distinct().count()))
    for (run <- 1 to 2) {
      time(s"full lsh near-dup run $run")(println("[profile] n_out = " +
        Dedup.embeddingNearDuplicatesLSH(emb, "vec_id", "embedding", 0.5).count()))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

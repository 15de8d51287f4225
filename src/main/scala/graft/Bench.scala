package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Contract default is local[32]; SPARK_GRAFT_CPUS overrides for
    // iterating on smaller boxes.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup: run every bench query once on the tiny sf so
    // headline timings measure the queries, not first-use classloading and
    // codegen of each operator's expression tree.
    SparkEntry.benchQueries.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // Two timed runs per query, report the min: a single pass conflates
    // engine throughput with whatever GC debt the preceding 30+ plans
    // left behind (observed 3-5x swings on the same query in one session).
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      var ok = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); ok = true } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        // Drop intermediates persisted by operators (dedup gram/band
        // tables) so successive runs are timed from a clean state.
        spark.catalog.clearCache()
        dt
      }
      name -> (if (ok) times.min else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

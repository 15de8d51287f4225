package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dev tool: time a named subset of the contract queries with the same
  * protocol as Bench (warmup pass at sf0.001, then N separated full
  * passes, min per query) — for A/B'ing two operators without paying
  * for the whole bench list.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <q1,q2,...> [passes]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq)
      .getOrElse(Seq("q_dedup_minhash", "q_dedup_jaccard"))
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val bad = names.filterNot(SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      spark.catalog.clearCache()
    }
    val samples = (1 to passes).map { p =>
      names.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[time] pass $p $n%-24s $dt%7.2f s")
        n -> dt
      }
    }
    names.foreach { n =>
      val ts = samples.map(_.toMap.apply(n))
      println(f"[time] MIN  $n%-24s ${ts.min}%7.2f s   (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}

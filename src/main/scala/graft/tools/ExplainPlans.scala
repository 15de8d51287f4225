package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Dev tool: dump formatted physical plans for selected queries so scan
  * pruning, pushdown, broadcast choices, and exchange counts can be
  * inspected (the "is this the plan you'd want at 100 TB" check).
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_scan_filter_project", "q_join_revenue", "q_window_velocity",
      "q_agg_daily", "q_topk_limit")
    val spark = GraftSession.local(8)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

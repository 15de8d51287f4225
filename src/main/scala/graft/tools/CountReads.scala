package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scan-work meter for A/B'ing query internals: runs each named
  * contract query once and reports the TOTAL records/bytes read by all
  * its jobs (task InputMetrics summed across every action the query
  * fires internally — persist fills, driver folds, checkpoints). Wall
  * clock on a local[32] box mixes stage-scheduling overhead into every
  * measurement; records-read is the scale-relevant term (it is what
  * grows 1000x when the comparison source does).
  *
  *   sbt "runMain graft.tools.CountReads /root/testdata/sf0.1 q_a,q_b"
  */
object CountReads {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CountReads <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.core.GraftSession.local()
    val bytes = new AtomicLong(0L)
    val records = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.inputMetrics.bytesRead)
          records.addAndGet(m.inputMetrics.recordsRead)
        }
      }
    })
    def drain(): Unit = Thread.sleep(1500) // let straggler task-end events land
    // JVM/classloader warm on the TARGET data dir (r18 advice: the
    // hardcoded sf0.001 path threw on any other layout); warm-up
    // failure is non-fatal — it only costs cold-number comparability
    try graft.SparkEntry.queries(names.head)(spark, sfDir).collect()
    catch { case _: Throwable => () }
    drain()
    for (n <- names) {
      // cold = the first call in a session (what a pipeline pays);
      // repeat = a second identical call (shows whether leaked caches
      // from call 1 are silently servicing call 2 via the CacheManager
      // plan-canonicalization lookup)
      for (label <- Seq("cold  ", "repeat")) {
        bytes.set(0L); records.set(0L)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).collect()
        val sec = (System.nanoTime() - t0) / 1e9
        drain()
        println(f"[reads] $label $n%-28s recordsRead=${records.get}%12d " +
          f"bytesRead=${bytes.get}%14d wall=$sec%7.2f s")
      }
    }
    spark.stop()
  }
}

package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.SparkEntry

/** Where-does-the-time-go meter for the optimization loop (guide §1):
  * runs each named contract query with the Bench session shape and
  * reports wall clock alongside the job/stage/task counts and the
  * aggregate task metrics (executor run time, shuffle bytes, input
  * records). On local[32] over sf0.1 the per-query wall is mostly
  * scheduling floor (jobs x stages x task launch), so the counts — not
  * the bytes — are what a plan change must move; the same counts ARE
  * the shuffle/pass structure that dominates at 100 TB.
  *
  *   sbt "runMain graft.tools.ProfileJobs /root/testdata/sf0.1 q_a,q_b"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileJobs <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val bad = names.filterNot(SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // A/B harness: extra session confs via SPARK_GRAFT_CONF=k=v;k=v
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicLong(0L)
    val stages = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    val runMs = new AtomicLong(0L)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    val inRec = new AtomicLong(0L)
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val verbose = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(e.stageInfo.stageId,
          e.stageInfo.name.take(60) + " @" + e.stageInfo.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("tools"))
            .getOrElse("").trim.take(80))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inRec.addAndGet(m.inputMetrics.recordsRead)
          perStage.merge(e.stageId, (1L, m.executorRunTime, m.executorDeserializeTime),
            (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        }
      }
    })
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0)
      shufR.set(0); shufW.set(0); inRec.set(0)
      perStage.clear(); stageNames.clear()
    }
    def drain(): Unit = Thread.sleep(1200)
    // warm codegen/classloaders on the tiny sf, Bench-style
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    drain()
    for (n <- names) {
      reset()
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      spark.catalog.clearCache()
      drain()
      println(f"[prof] $n%-28s wall=$sec%6.2f s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d " +
        f"taskTime=${runMs.get / 1000.0}%7.2f s " +
        f"shufR=${shufR.get}%10d shufW=${shufW.get}%10d " +
        f"inRec=${inRec.get}%10d")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        perStage.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (sid, (nt, rt, dt)) =>
            println(f"[stage] $sid%5d tasks=$nt%4d run=${rt / 1000.0}%7.2f s " +
              f"deser=${dt / 1000.0}%6.2f s  ${stageNames.getOrDefault(sid, "?")}")
        }
      }
    }
    spark.stop()
  }
}

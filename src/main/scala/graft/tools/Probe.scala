package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Catalog

/** Dev-only timing probe: run one named query N times in a warm session to
  * split plan/codegen/JIT warmup from steady-state. Usage:
  * runMain graft.tools.Probe <name> [reps] [sfDir]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val reps  = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
    // extra confs from env, e.g. SPARK_GRAFT_CONF="spark.sql.codegen.wholeStage=false;spark.x=y"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for { s <- si.submissionTime; c <- si.completionTime } yield c - s
        println(s"[stage] id=${si.stageId} tasks=${si.numTasks} " +
          s"dur=${dur.getOrElse(-1L)}ms name=${si.name.take(60)}")
      }
    })
    val q = Catalog.byName(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      q.fn(spark, sfDir).explain("formatted")
    // PROBE_NOOP=1 executes via the full-plan noop sink exactly like Bench
    // (count() lets Catalyst PRUNE aggregate expressions the count doesn't
    // need, so the two modes can legitimately measure different work —
    // compare both before calling a bench number noise)
    val useNoop = sys.env.contains("PROBE_NOOP")
    // same fixed pure-CPU canary as graft.Bench (graft.HostCanary),
    // printed per rep so a probe taken in a degraded-host window is
    // visibly degraded (don't adjudicate bench numbers with an
    // uncanaried probe)
    def canarySec(): Double = graft.HostCanary.sec()
    canarySec() // JIT-warm the canary loop itself
    (1 to reps).foreach { i =>
      val c  = canarySec()
      val t0 = System.nanoTime()
      val df = q.fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n  = if (useNoop) {
        df.write.format("noop").mode("overwrite").save(); -1L
      } else df.count()
      val t2 = System.nanoTime()
      println(f"[probe] $name rep$i: build=${(t1 - t0) / 1e9}%.3f s " +
        f"exec=${(t2 - t1) / 1e9}%.3f s canary=$c%.2f s ($n rows)")
    }
    spark.stop()
  }
}

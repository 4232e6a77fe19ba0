package graft

/** Fixed pure-CPU canary shared by every measurement tool (Bench, Probe,
  * ThroughputBench, DataPipelineBench): ~0.2-0.3 s of 64-bit mixing on a
  * quiet box, no Spark, no I/O, no allocation. The value is the host-health
  * context for a timing: the harness box shows sustained degraded windows
  * (co-tenant vCPU steal) that inflate every rep of a measurement together,
  * which a corroborated-min protocol cannot detect from the measurements
  * alone — BENCH_r08 recorded five queries at 7-12x their true numbers this
  * way. Emitting the canary next to every number makes a polluted
  * measurement visibly polluted to any later reader, and lets protocols
  * discard reps whose canary exceeds the run median (see graft.Bench).
  *
  * Caveat: the canary is single-threaded, so it catches whole-JVM freezes
  * and frequency drops but NOT parallel-capacity steal (loadavg spikes with
  * flat single-thread speed) — compare loadavg too when adjudicating a
  * many-core stage.
  */
object HostCanary {
  @volatile private var sink = 0L

  /** Seconds for the fixed workload; call once untimed to JIT-warm. */
  def sec(): Double = {
    val t0 = System.nanoTime()
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < 150000000) { h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i; i += 1 }
    sink += h // defeat dead-code elimination of the loop
    (System.nanoTime() - t0) / 1e9
  }
}

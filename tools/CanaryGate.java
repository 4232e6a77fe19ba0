// Standalone host-health gate for launching measured runs in a CLEAN
// window: the same fixed 64-bit-mixing canary workload as
// graft.HostCanary (serial + all-cores parallel), runnable without
// Spark/sbt startup cost. Exits 0 when both canaries are inside the
// given bands, 1 otherwise. Usage:
//   javac tools/CanaryGate.java -d /tmp/cgate
//   java -cp /tmp/cgate CanaryGate <serialMax> <parMax>
// Callers loop until exit 0 (with a deadline) before starting a leg.
public final class CanaryGate {
  private static volatile long sink = 0L;

  private static long mix(long seed, int iters) {
    long h = seed;
    for (int i = 0; i < iters; i++) h = (h ^ (h >>> 33)) * 0xFF51AFD7ED558CCDL + i;
    return h;
  }

  private static double sec() {
    long t0 = System.nanoTime();
    sink += mix(0x9E3779B97F4A7C15L, 150000000);
    return (System.nanoTime() - t0) / 1e9;
  }

  private static double parSec() throws InterruptedException {
    int n = Math.max(1, Runtime.getRuntime().availableProcessors());
    Thread[] ts = new Thread[n];
    long t0 = System.nanoTime();
    for (int i = 0; i < n; i++) {
      final int tid = i;
      ts[i] = new Thread(() -> { sink += mix(0x9E3779B97F4A7C15L + tid, 50000000); });
      ts[i].setDaemon(true); ts[i].start();
    }
    for (Thread t : ts) t.join();
    return (System.nanoTime() - t0) / 1e9;
  }

  public static void main(String[] args) throws Exception {
    double serialMax = args.length > 0 ? Double.parseDouble(args[0]) : 0.46;
    double parMax = args.length > 1 ? Double.parseDouble(args[1]) : 0.22;
    sec(); parSec(); // JIT-warm untimed
    double s = Double.MAX_VALUE, p = Double.MAX_VALUE;
    for (int i = 0; i < 3; i++) { s = Math.min(s, sec()); p = Math.min(p, parSec()); }
    System.out.printf(java.util.Locale.ROOT,
        "canary serial=%.3f (max %.3f) parallel=%.3f (max %.3f)%n",
        s, serialMax, p, parMax);
    System.exit(s <= serialMax && p <= parMax ? 0 : 1);
  }
}

package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** File persistence for benchmark mains. The round driver captures stdout's
  * TAIL, which has truncated long runs into unparseable fragments (round
  * 10's bench artifact lost its total line this way) — so every bench main
  * also writes its final summary to `target/<name>.json` (one parseable
  * JSON object, atomically replaced per run) and appends its per-query
  * lines to `target/<name>.jsonl` (truncated at run start). Paths are
  * relative to the working directory, which for every documented invocation
  * (`sbt "runMain graft.Bench"`) is the repo root.
  */
object BenchOut {
  private def dir = {
    val d = Paths.get("target")
    if (!Files.exists(d)) Files.createDirectories(d)
    d
  }

  /** Run-start truncation markers, so the first append of a run resets the
    * jsonl from the previous run. */
  private val started = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def appendLine(name: String, line: String): Unit = synchronized {
    try {
      val p = dir.resolve(s"$name.jsonl")
      val opts =
        if (started.add(name))
          Array(StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        else
          Array(StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      Files.write(p, (line + "\n").getBytes(StandardCharsets.UTF_8), opts: _*)
    } catch { case e: Exception =>
      System.err.println(s"[bench] persist $name.jsonl failed: $e")
    }
  }

  def writeSummary(name: String, json: String): Unit = synchronized {
    try
      Files.write(dir.resolve(s"$name.json"),
        (json + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    catch { case e: Exception =>
      System.err.println(s"[bench] persist $name.json failed: $e")
    }
  }
}

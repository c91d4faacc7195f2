package graft

import java.io.File
import java.nio.file.{Files, Path, Paths}

/** Per-JVM scratch directories for queries that persist an intermediate
  * artifact (round-trip sinks, the LSH index, the rollup history).
  *
  * Paths are keyed by pid so concurrent graft JVMs (a bench next to a
  * test run, parallel CI workers) cannot race each other's write→read
  * directories. A single shutdown hook removes everything this process
  * allocated, so no `graft_*` directory outlives the session.
  */
object Scratch {

  private val root: Path = Paths.get(
    System.getProperty("java.io.tmpdir"),
    s"graft_scratch_${ProcessHandle.current().pid()}")

  // Pid-keyed paths are only fresh if no earlier KILLED process (whose
  // shutdown hook never ran) left the same recycled pid's root behind —
  // a stale streaming checkpoint under a reused pid would poison a
  // later run. The root can only ever be leftovers at init: clear it.
  deleteRecursively(root.toFile)

  // Registered once for all scratch users. JVM shutdown hooks run
  // unordered, but deletion doesn't contend with Spark's own hooks: by
  // then every query's write→read pair has long completed.
  Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(root.toFile)))

  /** Absolute scratch path `<tmp>/graft_scratch_<pid>/<name>`. */
  def dir(name: String): String = {
    Files.createDirectories(root)
    root.resolve(name).toString
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}

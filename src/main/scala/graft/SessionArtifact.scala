package graft

/** Per-(JVM, key) pointer to a persisted on-disk session artifact —
  * the ONE implementation of the memoized index pattern the registered
  * queries share (shingle index, SimHash signature table, versioned
  * shingle snapshot):
  *
  *  - consumers [[ensure]]-build: at most one build per (JVM, key),
  *    double-checked under a lock, losers of the race read the
  *    winner's files;
  *  - the designated MEASURED query [[rebuild]]s unconditionally into
  *    a FRESH directory and swaps the pointer, so the build cost stays
  *    a first-class bench entry and concurrent readers (Verify dumps
  *    queries through a thread pool) keep reading a complete artifact
  *    — the old directory is never mutated, only unpointed.
  *
  * This is the single-session stand-in for a STORED table a daily
  * batch maintains: consumers probe it instead of recomputing the
  * corpus-wide derivation once per query, and every consumer's
  * raw-input oracle keeps gating artifact-build + probe ≡ direct
  * computation as an exact value match. Directories live under
  * [[Scratch]] (per-pid, swept at JVM exit).
  */
final class SessionArtifact(label: String) {
  private val paths = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  private def buildFresh(build: String => Unit): String = {
    val p = Scratch.dir(s"${label}_${seq.incrementAndGet()}")
    build(p)
    p
  }

  /** The artifact path for `key`, building at most once per JVM. */
  def ensure(key: String)(build: String => Unit): String =
    Option(paths.get(key)).getOrElse(
      paths.synchronized {
        Option(paths.get(key)).getOrElse {
          val p = buildFresh(build)
          paths.put(key, p)
          p
        }
      })

  /** Build unconditionally into a fresh directory and publish it as
    * `key`'s artifact (the measured-build query's entry point).
    */
  def rebuild(key: String)(build: String => Unit): String = {
    val p = buildFresh(build)
    paths.put(key, p)
    p
  }
}

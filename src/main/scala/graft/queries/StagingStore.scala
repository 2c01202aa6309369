package graft.queries

/** Cross-JVM persistent store for fingerprint-keyed fixture layouts —
  * the `SharedBases` snapshot-store discipline (r13 ADVICE-hardened:
  * stage + atomic rename, evict-after-land) extracted for the staging
  * fixtures (`StreamStaging`, `IncrFixture`, `FormatFixture`).
  *
  * Why: the staged layouts are pure functions of (testdata dir, table
  * fingerprint), yet each bench/verify JVM rebuilt them from scratch —
  * ~5 s of every sweep's shared-base phase re-deriving byte-identical
  * corpus copies. Production pipelines stage once and reuse; the store
  * is that shape: the first JVM builds, every later sweep of the same
  * testdata reuses, and a regenerated corpus misses structurally (the
  * fingerprint is in the leaf name) and rebuilds.
  *
  * Layout: `$tmpdir/graft_stage_store/<md5(dir)·12>/<kind>@<fp>`.
  * Concurrency: builders write to a dot-prefixed staging sibling and
  * atomically RENAME into the generation path — two concurrent cold
  * JVMs race the rename, the loser discards its staging dir and serves
  * the winner's; a reader can never observe a half-written generation
  * (`_SUCCESS` arrives with the rename). Older generations of the same
  * kind are evicted only after the rename lands; the dot prefix keeps
  * in-flight staging dirs structurally outside the eviction glob.
  * Validation failures (torn dir, missing `_SUCCESS`) fall back to a
  * rebuild instead of propagating.
  */
private[graft] object StagingStore {

  /** The store root all generations live under. */
  private[graft] val root: java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stage_store")

  /** True iff `p` is a path INSIDE the store — the real marker consumers
    * (e.g. StreamingPipeline's schema memo) should key immutability
    * decisions on, instead of a substring match that any ad-hoc temp dir
    * could accidentally satisfy. Normalized prefix compare, not string
    * `contains`.
    */
  private[graft] def isStorePath(p: String): Boolean =
    try java.nio.file.Paths.get(p).toAbsolutePath.normalize
      .startsWith(root.toAbsolutePath.normalize)
    catch { case _: java.nio.file.InvalidPathException => false }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def genPath(dir: String, kind: String,
                      fp: String): java.nio.file.Path =
    root.resolve(md5(dir).take(12)).resolve(s"$kind@$fp")

  /** The staged directory for (dir, kind, fp), building via `write`
    * (given the path to produce, including `_SUCCESS` — every Spark
    * writer emits one) when the generation is absent. The returned path
    * is always a landed generation with `_SUCCESS` present.
    */
  def getOrBuild(dir: String, kind: String, fp: String)(
      write: String => Unit): String = {
    val p = genPath(dir, kind, fp)
    if (java.nio.file.Files.exists(p.resolve("_SUCCESS"))) return p.toString
    val tmp = p.getParent.resolve(
      s".staging-${p.getFileName}-${ProcessHandle.current.pid}")
    java.nio.file.Files.createDirectories(p.getParent)
    try {
      graft.util.Fs.deleteRecursively(tmp)
      write(tmp.toString)
      try {
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        // evict older generations only after the new one is live
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(p.getParent).iterator.asScala.toSeq
          .filter(q => q != p && q.getFileName.toString.startsWith(s"$kind@"))
          .foreach(graft.util.Fs.deleteRecursively)
      } catch {
        // lost the race to a concurrent builder (or the fs refused the
        // atomic move onto the landed winner): keep theirs, drop ours
        case _: java.io.IOException =>
          graft.util.Fs.deleteRecursively(tmp)
      }
      if (!java.nio.file.Files.exists(p.resolve("_SUCCESS")))
        throw new IllegalStateException(
          s"staging for $kind@$fp landed without _SUCCESS")
      p.toString
    } catch {
      case e: Exception =>
        graft.util.Fs.deleteRecursively(tmp)
        throw e
    }
  }
}

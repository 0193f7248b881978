package graft.util

/** Best-effort recursive cleanup for the deploy gates' per-invocation
  * temp artifact dirs (ADVICE r17: repeated gate/bench runs must not
  * accumulate artifact dirs). Every caller loads (collects or
  * localCheckpoints) what it needs from the store BEFORE deleting, so
  * the search/score plan never reads the removed files. */
object TempArtifacts {

  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    // NonFatal only (ADVICE r18): cleanup must not swallow OOM/fatal
    // errors or a thread interrupt
    try rm(new java.io.File(path))
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Create a temp dir, run `body` with its path, delete it after —
    * the save→load round-trip shape every deploy gate shares. */
  def withTempDir[A](prefix: String)(body: String => A): A = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(p) finally deleteRecursively(p)
  }
}

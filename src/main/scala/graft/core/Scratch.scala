package graft.core

/** Deterministic per-purpose scratch directories for the write-then-read
  * capability queries: every writer uses mode("overwrite"), so repeated
  * gate/bench/spec runs reuse ONE path per purpose instead of
  * accumulating orphaned `createTempDirectory` trees in /tmp. */
object Scratch {
  def dir(name: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_scratch_$name")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}

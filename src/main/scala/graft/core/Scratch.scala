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

  /** Like [[dir]], but emptied first — for multi-commit lifecycles
    * (manifest tables) where "overwrite" is not a single write mode and
    * stale state from a previous gate run would change the result. */
  def wiped(name: String): String = {
    val root = java.nio.file.Paths.get(dir(name))
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(root)
      try {
        // sorted() drains the walk before the first delete runs
        walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala
          .filter(_ != root)
          .foreach(java.nio.file.Files.delete)
      } finally walk.close()
    }
    root.toString
  }
}

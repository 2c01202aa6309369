package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem helpers shared by the fixture builders and the
  * streaming gate entry — one copy of the recursive delete instead of a
  * divergence-prone snippet per caller, and the `Files.walk` stream is
  * actually closed (its javadoc requires try-with-resources; an
  * unclosed walk pins directory descriptors until GC).
  */
object Fs {

  /** Delete `root` and everything under it; missing paths and files that
    * vanish mid-walk are ignored.
    */
  def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () })
      finally walk.close()
    }
}

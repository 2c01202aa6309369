package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session — Spark
  * startup dominates suite time otherwise).
  */
/** Tracked temp dirs for specs/test tools, deleted by ONE shutdown hook —
  * test JVMs previously leaked dozens of graft-* dirs to /tmp per run
  * (r7 verdict #7 temp-dir audit).
  */
object TempDirs {
  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.forEach { p =>
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(f => try java.nio.file.Files.deleteIfExists(f)
              catch { case _: java.io.IOException => () })
      }))
  def create(prefix: String): String = {
    hook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }
}

object SparkSpec {
  private val warehouseDir = TempDirs.create("graft-warehouse")

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // ns-precision events.parquet read as LongType ns (same flag as
    // GraftSession.builder — set at build time, never per-query)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same threshold as GraftSession: the hot-bucket caps (4096) must
    // compile to map-side WindowGroupLimits in tests as in production
    .config("spark.sql.optimizer.windowGroupLimitThreshold", "5000")
    .config("spark.ui.enabled", "false")
    // same streaming state store as GraftSession: RocksDB off-heap +
    // changelog checkpointing — the streaming specs must exercise the
    // production provider, not the heap-backed default
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "true")
    // mirror GraftSession: row-count tracking off (write-heavy tuning);
    // the eviction spec re-enables it around its own query
    .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
      "false")
    .config("spark.sql.warehouse.dir", warehouseDir)
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf0001 = "/root/testdata/sf0.001"
  def sf01 = "/root/testdata/sf0.1"
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults — the one place the
  * 100 TB-relevant knobs live:
  *
  *  - shuffle partitions sized to the cluster (caller passes cores for
  *    local mode; a real cluster wants 2-3× total cores, or AQE
  *    coalescing from a high initial count);
  *  - AQE on (it is by default, pinned here against env drift) —
  *    runtime re-planning gives broadcast-join demotion/promotion, skew
  *    split, partition coalescing;
  *  - 128 MB scan partitions (`files.maxPartitionBytes` default, pinned)
  *    — the parquet-scan parallelism unit;
  *  - UTC session timezone (oracle + reproducibility);
  *  - graft SQL functions registered via GraftExtensions.
  */
object GraftSession {

  /** Env-var boolean with fail-fast parsing: a raw env value fed into a
    * boolean Spark conf ("1", "TRUE ", a typo) would otherwise surface as
    * a parse error deep inside RocksDB conf handling at the FIRST stateful
    * query, long after session construction. Accepts the usual spellings
    * case-insensitively; anything else is an immediate, named error.
    */
  private[graft] def envFlag(name: String, default: Boolean): Boolean =
    sys.env.get(name).map(_.trim.toLowerCase) match {
      case None | Some("") => default
      case Some("1" | "true" | "yes" | "on") => true
      case Some("0" | "false" | "no" | "off") => false
      case Some(v) => throw new IllegalArgumentException(
        s"$name must be a boolean (got '$v'); use true/false, 1/0, yes/no, on/off")
    }

  def builder(appName: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Join strategy (r16 optimization, guide §3.1/§9): let the planner
      // pick shuffled-hash over sort-merge when a side's per-partition
      // build fits — SMJ pays two sorts the hash join skips; SHJ's OOM
      // risk is bounded by the same size checks the planner already
      // applies, and AQE's runtime rewrite below converts residual SMJs
      // whose post-shuffle partitions measure under 64 MB (size-bounded,
      // not core-count-tuned — valid at any scale; Spark's default of 0
      // simply disables the rewrite).
      // Known failure mode (r16 ADVICE): the static planner's SHJ pick
      // runs on COMPILE-TIME size estimates — a badly mis-estimated
      // build side that AQE doesn't rewrite can OOM where SMJ would
      // have spilled. Bridge.resetStats frames are safe (reset stats
      // default large, so they stay SMJ-eligible), but parquet-stat
      // misestimates are not; the oracle/bench sweeps run every query
      // at the largest SF so a mis-planned SHJ surfaces there before
      // production-scale data.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        (64L << 20).toString)
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ns-precision timestamps, which Spark 4
      // refuses to read as TimestampType ([PARQUET_TYPE_ILLEGAL]);
      // surface them as LongType ns-since-epoch. Set once here (not as a
      // side effect of loading a table — session config mutation mid-query
      // is race-prone under concurrent query construction).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // InferWindowGroupLimit only rewrites rank filters whose limit is
      // BELOW this threshold (default 1000). The kNN/semdedup hot-bucket
      // caps rank-filter at maxBucket=4096; raising the threshold past
      // them makes the caps map-side group limits too — an adversarial
      // million-row bucket is cut to 4096 rows per map task BEFORE the
      // shuffle, not after. Plan-asserted in PlanAuditSpec.
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "5000")
      // Streaming state off-heap: the default HDFS-backed provider keeps
      // every key in executor heap — at 100 TB (billions of dedup keys,
      // wide stream-stream join buffers) that OOMs long before the
      // watermark bounds kick in. RocksDB spills state to local disk,
      // and changelog checkpointing uploads per-batch deltas instead of
      // re-snapshotting the full store.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      // Write-heavy stateful streams: maintaining the exact state-row
      // count costs a RocksDB get per put (and count bookkeeping at
      // commit) for a metric only dashboards read — Spark's own tuning
      // guidance for write-heavy workloads is to disable it. Measured
      // ~5% off a drain's wall at the gate sizing; at 100 TB state the
      // per-put get is the difference between one and two RocksDB ops
      // per updated key. numRowsTotal then reads -1; specs that assert
      // state-row eviction re-enable it per query.
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        envFlag("SPARK_GRAFT_TRACK_ROWS", default = false).toString)
      // catalog-table storage (bucketed layouts) goes to a per-process
      // temp dir, never ./spark-warehouse in the caller's CWD; pid
      // suffix keeps concurrent driver/bench JVMs from clobbering each
      // other's table directories
      .config("spark.sql.warehouse.dir",
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
          s"graft-warehouse-${ProcessHandle.current.pid}").toString)

  /** Local session (tests, Verify/Bench, standalone CLI).
    *
    * Scratch space (`spark.local.dir` — shuffle files, block-manager
    * disk blocks, RocksDB working dirs) goes to tmpfs when available:
    * it is ephemeral by definition and the single-box bench showed the
    * interval-join drains paying ~20% of their wall to /tmp disk I/O
    * for files that never outlive the JVM. Local-mode-only by design —
    * a real cluster's resource manager owns executor local dirs
    * (YARN/K8s override `spark.local.dir`), and at 100 TB scratch
    * belongs on provisioned disks, not RAM. Honored only if the caller
    * hasn't already routed it (SPARK_LOCAL_DIRS / spark.local.dir).
    */
  def local(appName: String, cores: Int): SparkSession = {
    val b = builder(appName, cores).master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
    val shm = java.nio.file.Paths.get("/dev/shm")
    val routed = sys.env.contains("SPARK_LOCAL_DIRS") ||
      sys.props.contains("spark.local.dir")
    if (!routed && java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm)) {
      // per-pid subdir: Spark creates and deletes its own spark-*/
      // blockmgr-* dirs inside on stop; the pid scope keeps concurrent
      // driver/bench JVMs apart (same discipline as the warehouse dir)
      val scratch = shm.resolve(
        s"graft-local-${ProcessHandle.current.pid}")
      java.nio.file.Files.createDirectories(scratch)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.util.Fs.deleteRecursively(scratch)))
      b.config("spark.local.dir", scratch.toString).getOrCreate()
    } else b.getOrCreate()
  }
}

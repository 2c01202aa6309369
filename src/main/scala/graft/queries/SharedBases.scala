package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.ops.llm.Dedup

/** Session-scoped shared operator bases for the declared-query registry.
  *
  * Seven declared queries consume the SAME MinHash near-dup pair mining
  * over `documents` (clusters, survivors, keep-best, calibration, source
  * overlap, impact, triangles) and two more the same exact-Jaccard
  * mining. In production that mining is a persisted signature index
  * built once and reused (see `Dedup.minhashDeltaPairs`'s index note);
  * inside one session the equivalent is computing the base once,
  * persisting it, and letting every consumer chain off it. Each consumer
  * query is unchanged semantically — the memo returns the identical
  * DataFrame the query would have built itself (same params, same
  * determinism conventions), just materialized once.
  *
  * Mechanics: the built result is dropped to an explicitly persisted
  * RDD[Row] wrapped back into a DataFrame, so (a) this object holds the
  * only handle and exposes the RDD ids via [[retainedRddIds]] for
  * benchmark cleanup to SPARE (the bases model an index, not per-query
  * scratch), and (b) a reuse first validates the RDD is still
  * registered and transparently rebuilds when an external cleanup
  * dropped it. Lineage is preserved (plain persist, not checkpoint), so
  * block eviction falls back to recompute instead of failing.
  *
  * Keyed by table directory; parameters are the declared-family
  * constants (n=3, bands=4, tau=8/10) by design — a different
  * parameterization must not silently share.
  */
object SharedBases {

  private case class Entry(df: DataFrame, rddId: Int)
  private val cache = scala.collection.mutable.HashMap.empty[String, Entry]
  private val retained = java.util.concurrent.ConcurrentHashMap
    .newKeySet[Integer]()

  /** Live shared-base RDD ids — inter-query benchmark cleanup unpersists
    * everything EXCEPT these.
    */
  def retainedRddIds: java.util.Set[Integer] = retained

  /** Drop every shared base (benchmark hygiene: called after the untimed
    * warmup so the first TIMED consumer pays the index build inside its
    * own timer — warmup must buy JIT state, not precomputed results).
    */
  def invalidateAll(s: SparkSession): Unit = synchronized {
    cache.values.foreach { e =>
      s.sparkContext.getPersistentRDDs.get(e.rddId)
        .foreach(_.unpersist(blocking = true))
    }
    cache.clear()
    retained.clear()
  }

  private def alive(s: SparkSession, e: Entry): Boolean =
    s.sparkContext.getPersistentRDDs.contains(e.rddId)

  /** Fingerprint of the backing `documents` parquet: sorted
    * (name, length, modTime) of its data files, hashed. Folded into every
    * cache key so a table rewritten mid-session misses the memo and
    * rebuilds instead of serving stale bases — the directory path alone
    * cannot see a rewrite (aliveness only detects external unpersist).
    * One cheap driver-side listing per lookup; no Spark job.
    *
    * The hash is the full 128-bit MD5 of the listing string (not 32-bit
    * String.hashCode, whose collision odds at repeated rewrites are
    * real): a rewrite changing ANY file name, length, or modTime always
    * changes the key. Known limitation, inherent to listing-based
    * fingerprints: a rewrite that preserves every (name, length) pair
    * WITHIN the filesystem's mtime granularity (coarse-mtime stores,
    * sub-granularity copy-back) is invisible — callers that rewrite
    * tables in place should touch a file or change a part name.
    */
  private[graft] def fingerprint(s: SparkSession, dir: String,
      tableFile: String = "documents.parquet"): String = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$tableFile")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(path)) Seq("absent")
      else fs.listStatus(path).toSeq
        .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
        .sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def put(s: SparkSession, key: String, src: DataFrame): Entry = {
    val rdd = src.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count() // materialize eagerly: consumers must see a warm index
    retained.add(rdd.id)
    val e = Entry(s.createDataFrame(rdd, src.schema), rdd.id)
    cache.put(key, e)
    e
  }

  /** Drop every cached entry for `prefix` regardless of fingerprint —
    * called on a miss so bases built against a since-rewritten table
    * don't linger as retained-but-unreachable RDDs.
    */
  private def dropPrefix(s: SparkSession, prefix: String): Unit =
    cache.keys.filter(_.startsWith(prefix)).toSeq.foreach { k =>
      cache.remove(k).foreach { e =>
        s.sparkContext.getPersistentRDDs.get(e.rddId)
          .foreach(_.unpersist(blocking = false))
        retained.remove(Integer.valueOf(e.rddId))
      }
    }

  /** Verified MinHash near-dup pairs (a, b, inter, uni) over
    * `documents` at the declared-family parameters.
    */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashBoth(s, dir)._1

  /** MinHash signature table (doc, sig0..sig7) from the SAME mining pass
    * as [[minhashPairs]] — the pair a calibration needs.
    */
  def minhashSigs(s: SparkSession, dir: String): DataFrame =
    minhashBoth(s, dir)._2

  private def minhashBoth(s: SparkSession,
                          dir: String): (DataFrame, DataFrame) =
    synchronized {
      val fp = fingerprint(s, dir)
      val kp = s"mh_pairs:$dir@$fp"
      val ks = s"mh_sigs:$dir@$fp"
      (cache.get(kp), cache.get(ks)) match {
        case (Some(p), Some(g)) if alive(s, p) && alive(s, g) =>
          (p.df, g.df)
        case _ =>
          dropPrefix(s, s"mh_pairs:$dir@")
          dropPrefix(s, s"mh_sigs:$dir@")
          val (pairs, sigs) = Dedup.minhashDedupWithSigs(
            Tables.table(s, dir, "documents"), "doc_id", "text",
            n = 3, bands = 4, num = 8, den = 10)
          // pairs first: its materialization builds the checkpointed
          // shingle base the sigs pass then reuses
          (put(s, kp, pairs).df, put(s, ks, sigs).df)
      }
    }

  /** DBSCAN role/cluster table over `embeddings` at the declared-family
    * parameters (τ=0.35, minPts=4) — shared by q_dbscan and
    * q_dbscan_prune, whose dominant cost is the SAME exact pair-mining
    * front-end. Keyed on the embeddings fingerprint (not documents).
    */
  def dbscanRoles(s: SparkSession, dir: String): DataFrame = synchronized {
    val fp = fingerprint(s, dir, "embeddings.parquet")
    val k = s"dbscan:$dir@$fp"
    cache.get(k) match {
      case Some(e) if alive(s, e) => e.df
      case _ =>
        dropPrefix(s, s"dbscan:$dir@")
        val e = Tables.table(s, dir, "embeddings")
        val roles = graft.ops.llm.Similarity.dbscan(
          e.select(e("vec_id"),
            e("embedding").cast("array<double>")),
          tau = 0.35, minPts = 4)
        put(s, k, roles).df
    }
  }

  /** The k=5 Jaccard kNN document graph at the declared-family
    * parameters — the edge set three graph consumers (q_pagerank's
    * rank iteration, q_label_prop's vote rounds, q_knn_clusters'
    * mutual-CC) previously each rebuilt from scratch; their operator
    * identity is the DOWNSTREAM computation, so the shared build moves
    * ~1.5 s × 3 of identical mining into one billed base line
    * (q_knn_graph itself keeps building its own graph: it IS the
    * audited graph-build operator and its plan evidence must stay a
    * real end-to-end pipeline).
    */
  def knnEdges(s: SparkSession, dir: String): DataFrame = synchronized {
    val fp = fingerprint(s, dir)
    val k = s"knn_edges:$dir@$fp"
    cache.get(k) match {
      case Some(e) if alive(s, e) => e.df
      case _ =>
        dropPrefix(s, s"knn_edges:$dir@")
        val g = Dedup.knnGraph(
          Tables.table(s, dir, "documents"), "doc_id", "text", k = 5)
        put(s, k, g).df
    }
  }

  /** Cross-session persistence: write the MinHash index behind the
    * shared bases as bucketed metastore tables (`<prefix>_bands` on
    * (band, bkey), `<prefix>_base` on doc) — exactly the
    * `Dedup.minhashIndex` + `Sinks.writeBucketed` contract the
    * incremental miner (`minhashDeltaPairsIndexed`) already consumes. A
    * LATER session calls [[minhashPairsFromStore]] and serves the whole
    * dedup family from bucketed scans without ever re-shingling the
    * corpus — the cross-session twin of the session-scoped memo above.
    */
  def persistIndex(s: SparkSession, dir: String,
                   prefix: String = "graft_sb_mh"): (String, String) = {
    val (bands, base) = Dedup.minhashIndex(
      Tables.table(s, dir, "documents"), "doc_id", "text",
      n = 3, bands = 4)
    val bandsT = s"${prefix}_bands"
    val baseT = s"${prefix}_base"
    graft.io.Sinks.writeBucketed(bands, bandsT, buckets = 4,
      keys = Seq("band", "bkey"))
    graft.io.Sinks.writeBucketed(base, baseT, buckets = 4,
      keys = Seq("doc"))
    (bandsT, baseT)
  }

  /** Verified near-dup pair base served from the STORED index tables of
    * [[persistIndex]] — row-identical to [[minhashPairs]] at the
    * declared-family parameters (spec-asserted), costing bucketed scans
    * instead of a corpus shingle pass. The consumer chain (clusters,
    * survivors, keep-best, triangles) composes off this exactly as off
    * the in-session memo.
    */
  def minhashPairsFromStore(s: SparkSession,
                            prefix: String = "graft_sb_mh",
                            num: Int = 8, den: Int = 10): DataFrame =
    Dedup.minhashPairsFromIndex(s.table(s"${prefix}_bands"),
      s.table(s"${prefix}_base"), num, den)

  /** Cross-session persistence for the exact-Jaccard tier (the
    * [[persistIndex]] recipe applied to PPJoin): the shingle-set base of
    * `Dedup.jaccardIndex` written as a bucketed metastore table
    * (`<prefix>_base` on doc). A later session calls
    * [[jaccardPairsFromStore]] and mines row-identically without
    * re-tokenizing the corpus — the shingle pass is what dominates the
    * standalone miner.
    */
  def persistJaccardBase(s: SparkSession, dir: String,
                         prefix: String = "graft_sb_jac"): String = {
    val base = Dedup.jaccardIndex(
      Tables.table(s, dir, "documents"), "doc_id", "text", n = 3)
    val baseT = s"${prefix}_base"
    graft.io.Sinks.writeBucketed(base, baseT, buckets = 4,
      keys = Seq("doc"))
    baseT
  }

  /** Verified exact-Jaccard pair base served from the STORED shingle
    * table of [[persistJaccardBase]] — row-identical to [[jaccardPairs]]
    * at the declared-family parameters (spec-asserted).
    */
  def jaccardPairsFromStore(s: SparkSession,
                            prefix: String = "graft_sb_jac",
                            num: Int = 8, den: Int = 10): DataFrame =
    Dedup.ngramJaccardPairsFromIndex(s.table(s"${prefix}_base"), num, den)

  /** Cross-session persistence for the dense-ANN tier — the
    * [[persistIndex]] recipe applied to IVF: the digest-seeded int8
    * quantizer (cid, cc, cn2) and the corpus cell assignments
    * (cid, id, cv, mxv) of `Ivf.int8Index` written as bucketed
    * metastore tables, the assignments bucketed on cid (the probe-join
    * key). A later session calls [[ivfTopKFromStore]] and searches
    * row-identically to `Ivf.int8TopKExact` without re-coding or
    * re-assigning the corpus — at 100 TB the assignment pass is the
    * corpus-sized cost, so loading it is the whole point of an index.
    */
  def persistIvfIndex(s: SparkSession, dir: String,
                      prefix: String = "graft_sb_ivf",
                      nClusters: Int = 16): (String, String) = {
    val (cents, cells) = graft.ops.llm.Ivf.int8Index(
      Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>")),
      nClusters)
    val centsT = s"${prefix}_cents"
    val cellsT = s"${prefix}_cells"
    graft.io.Sinks.writeBucketed(cells, cellsT, buckets = 4,
      keys = Seq("cid"))
    graft.io.Sinks.writeBucketed(cents, centsT, buckets = 1,
      keys = Seq("cid"))
    (centsT, cellsT)
  }

  /** IVF top-k served from the STORED index tables of
    * [[persistIvfIndex]] — row-identical to `Ivf.int8TopKExact` on the
    * corpus the index was built from (spec-asserted).
    */
  def ivfTopKFromStore(s: SparkSession, queries: DataFrame, k: Int,
                       nprobe: Int = 4,
                       prefix: String = "graft_sb_ivf"): DataFrame =
    graft.ops.llm.Ivf.int8TopKFromIndex(s.table(s"${prefix}_cents"),
      s.table(s"${prefix}_cells"), queries, k, nprobe)

  /** Cross-session persistence for the PQ tier: the per-subspace
    * codebooks (sub, code, cvec) and the one-byte code table
    * (id, sub, code) of `Pq.fitCodebooks`/`Pq.encode` written as
    * bucketed metastore tables on (sub, code) — the ADC lookup-join
    * key. Codebook fitting is the Lloyd-iteration cost and encoding is
    * the corpus-sized pass; a later session serves
    * [[pqRefineFromStore]] paying neither. Gate-family parameters
    * (m=8, k=64, iters=1) are the defaults so the stored index is
    * bit-compatible with q_pq_refine.
    */
  def persistPqIndex(s: SparkSession, dir: String,
                     prefix: String = "graft_sb_pq", m: Int = 8,
                     k: Int = 64, iters: Int = 1): (String, String) = {
    val vecs = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .toDF("id", "vec")
    val books = graft.ops.llm.Pq.fitCodebooks(vecs, m, k, iters)
    val codes = graft.ops.llm.Pq.encode(vecs, books, m)
    val booksT = s"${prefix}_books"
    val codesT = s"${prefix}_codes"
    graft.io.Sinks.writeBucketed(books, booksT, buckets = 1,
      keys = Seq("sub", "code"))
    graft.io.Sinks.writeBucketed(codes, codesT, buckets = 4,
      keys = Seq("sub", "code"))
    (booksT, codesT)
  }

  /** PQ ADC-shortlist + exact-integer refine served from the STORED
    * codebook/code tables of [[persistPqIndex]] — row-identical to
    * `Pq.refineTopKInt` at the same parameters (spec-asserted). The
    * full vectors are re-read only for the refine rescoring, which by
    * construction touches shortlist × queries rows, never the corpus.
    */
  def pqRefineFromStore(s: SparkSession, dir: String, queries: DataFrame,
                        k: Int, shortlist: Int, m: Int = 8,
                        prefix: String = "graft_sb_pq"): DataFrame = {
    val vecs = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .toDF("id", "vec")
    graft.ops.llm.Pq.refineTopKInt(vecs, s.table(s"${prefix}_codes"),
      s.table(s"${prefix}_books"), queries, m, k, shortlist)
  }

  /** The digest-seeded int8 IVF quantizer over `embeddings`, hydrated
    * from the cross-JVM [[StagingStore]] when a landed generation
    * matches the table fingerprint — what `streamIvfAssign` routes new
    * vectors by: the first session pays the corpus coding pass, every
    * later drain of the same testdata loads `nClusters` rows. The
    * seeding is deterministic, so the stored and rebuilt tables are
    * identical and serving warm cannot move a hash; a regenerated
    * embeddings table misses structurally (fingerprint in the leaf
    * name) and rebuilds.
    */
  def ivfQuantizer(s: SparkSession, dir: String,
                   nClusters: Int = 16): DataFrame = {
    val fp = fingerprint(s, dir, "embeddings.parquet")
    val path = StagingStore.getOrBuild(dir, s"ivf_quantizer_$nClusters",
      fp) { dest =>
      graft.ops.llm.Ivf.int8Quantizer(
        Tables.table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>")),
        nClusters).coalesce(1).write.parquet(dest)
    }
    s.read.parquet(path)
  }

  /** Verified exact-Jaccard pairs (a, b, inter, uni) over `documents`
    * at the declared-family parameters.
    */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    synchronized {
      val key = s"jac_pairs:$dir@${fingerprint(s, dir)}"
      cache.get(key) match {
        case Some(e) if alive(s, e) => e.df
        case _ =>
          dropPrefix(s, s"jac_pairs:$dir@")
          put(s, key, Dedup.ngramJaccardPairs(
            Tables.table(s, dir, "documents"), "doc_id", "text",
            n = 3, num = 8, den = 10)).df
      }
    }

  // ---- cross-sweep snapshot store (r12 verdict #7) -------------------

  /** The five expensive memo bases with the table whose fingerprint
    * keys each (the builders' own key discipline). The snapshot is a
    * MATERIALIZED VIEW of the memo: the rows written are exactly the
    * rows the cold build produced and [[put]] registered, so a warm
    * sweep's consumers are row-identical by construction — the
    * bucketed-INDEX route for cross-session re-MINING (new corpus
    * deltas against a stored index) is [[persistIndex]] /
    * [[persistJaccardBase]]; this store answers the cheaper question
    * "same corpus, next sweep" without re-mining at all.
    */
  private val snapshotBases: Seq[(String, String)] = Seq(
    "mh_pairs" -> "documents.parquet",
    "mh_sigs" -> "documents.parquet",
    "jac_pairs" -> "documents.parquet",
    "knn_edges" -> "documents.parquet",
    "dbscan" -> "embeddings.parquet")

  private def md5Hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Store layout: tmpdir/graft_sb_store/<dir-hash>/<name>@<table-fp>.
    * The fingerprint in the leaf name makes staleness structural — a
    * regenerated corpus simply misses the store and rebuilds cold; the
    * snapshot writer evicts older generations of the same base so
    * repeated regenerations don't accumulate pair-table copies.
    * Deliberately NOT pid-scoped: the point is reuse across bench JVMs
    * on the same testdata.
    */
  private def storePath(dir: String, name: String,
                        fp: String): java.nio.file.Path =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_sb_store", md5Hex(dir).take(12), s"$name@$fp")

  /** The bases that are built AND consumed as a pair: [[minhashBoth]]
    * only serves from the memo when both mh_pairs and mh_sigs are alive,
    * so hydration must treat them atomically — a torn store (interrupted
    * snapshot) serving one of the two would publish a warm count the
    * consumers never actually benefit from.
    */
  private val pairedBases = Set("mh_pairs", "mh_sigs")

  /** Hydrate the memo from the snapshot store where fingerprints match
    * (cheap parquet load instead of re-mining); returns name → warm so
    * the caller can publish which path paid. A base already live in the
    * memo counts as warm. Misses are left for the normal cold builders.
    *
    * Robustness (r13 ADVICE): a failed store read (concurrent eviction,
    * torn files) falls back to the cold builder instead of propagating;
    * the mh_pairs/mh_sigs pair is hydrated all-or-nothing so the
    * published warm count matches what [[minhashBoth]] will serve.
    */
  def warmStart(s: SparkSession, dir: String): Map[String, Boolean] =
    synchronized {
      def hydrate(name: String, tableFile: String): Boolean = {
        val fp = fingerprint(s, dir, tableFile)
        val key = s"$name:$dir@$fp"
        cache.get(key).exists(alive(s, _)) || {
          val p = storePath(dir, name, fp)
          java.nio.file.Files.exists(p.resolve("_SUCCESS")) &&
            (try {
              dropPrefix(s, s"$name:$dir@")
              put(s, key, s.read.parquet(p.toString))
              true
            } catch { case _: Exception => false })
        }
      }
      val raw = snapshotBases.map { case (name, tableFile) =>
        name -> hydrate(name, tableFile)
      }.toMap
      val pairWarm = pairedBases.forall(raw)
      if (!pairWarm)
        // drop any half-hydrated member: minhashBoth cannot serve a
        // single, and a lingering entry would hold a retained RDD that
        // the cold rebuild then replaces anyway
        pairedBases.foreach(n => dropPrefix(s, s"$n:$dir@"))
      raw.map { case (n, w) =>
        n -> (if (pairedBases(n)) pairWarm else w)
      }
    }

  /** Write every live memo base missing from the store (the cold
    * sweep's closing step — the build itself was already billed to the
    * named base phases; this bills only the one-off snapshot write).
    *
    * Concurrency (r13 ADVICE): the store is deliberately shared across
    * bench JVMs, so the write is staged to a dot-prefixed temp sibling
    * and atomically renamed into the fingerprinted path — two concurrent
    * cold sweeps both passing the existence check race the RENAME, not
    * the data: the loser discards its staging dir and keeps the winner,
    * and a warm reader can never observe a half-written generation.
    * Older generations are evicted only AFTER the rename lands (and
    * never the staging dirs of in-flight writers — they are dot-prefixed
    * so the `name@` eviction filter skips them structurally).
    */
  def snapshot(s: SparkSession, dir: String): Unit = synchronized {
    snapshotBases.foreach { case (name, tableFile) =>
      val fp = fingerprint(s, dir, tableFile)
      cache.get(s"$name:$dir@$fp").filter(alive(s, _)).foreach { e =>
        val p = storePath(dir, name, fp)
        if (!java.nio.file.Files.exists(p.resolve("_SUCCESS"))) {
          val tmp = p.getParent.resolve(
            s".staging-${p.getFileName}-${ProcessHandle.current.pid}")
          try {
            // pair/role tables are key-table-sized (never corpus-sized);
            // a handful of files keeps the warm load scan cheap
            e.df.coalesce(4).write.mode("overwrite").parquet(tmp.toString)
            try {
              java.nio.file.Files.move(tmp, p,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.list(p.getParent).iterator.asScala.toSeq
                .filter(q => q != p &&
                  q.getFileName.toString.startsWith(s"$name@"))
                .foreach(graft.util.Fs.deleteRecursively)
            } catch {
              // lost the race (or the fs refused the atomic move):
              // keep the winner's generation, discard ours
              case _: java.io.IOException =>
                graft.util.Fs.deleteRecursively(tmp)
            }
          } catch {
            case ex: Exception =>
              graft.util.Fs.deleteRecursively(tmp)
              System.err.println(
                s"[shared-bases] snapshot of $name skipped: ${ex.getMessage}")
          }
        }
      }
    }
  }
}

package graft.ops.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DBSCAN over cosine neighborhoods: exact role/cluster assignment on a
  * hand-built geometry covering every case (clique clusters, a border
  * point, a singleton core whose neighbors are all border, noise), plus
  * role-partition invariants on the real sf0.001 embeddings.
  */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  // unit vectors; tau = cos(25 deg) so "neighbor" = angular distance < 25
  private val tau = math.cos(math.toRadians(25))

  private def onCircle(deg: Double): Array[Double] = {
    val r = math.toRadians(deg)
    Array(math.cos(r), math.sin(r), 0.0)
  }

  test("exact roles and cluster labels on a constructed geometry") {
    val c = math.cos(math.toRadians(23)); val s = math.sin(math.toRadians(23))
    val pts = Seq[(Long, Array[Double])](
      // clique A: pairwise <= 15 deg apart -> 4 cores, cluster = min id 0
      0L -> onCircle(0), 1L -> onCircle(5), 2L -> onCircle(10),
      3L -> onCircle(15),
      // border of A: within 25 deg of ids 2 and 3 only -> |N|=3 < minPts
      4L -> onCircle(32),
      // clique B: 4 cores, cluster = min id 10
      10L -> onCircle(180), 11L -> onCircle(186), 12L -> onCircle(192),
      13L -> onCircle(198),
      // noise: >= 58 deg from everything
      20L -> onCircle(90),
      // star at (0,-1,0): center adjacent to 3 leaves (23 deg each), the
      // leaves pairwise NON-adjacent (cos^2 23 = 0.847 < tau) -> center is
      // a core with zero core neighbors (singleton cluster labeled by its
      // own id), leaves are border
      30L -> Array(0.0, -1.0, 0.0),
      31L -> Array(s, -c, 0.0),
      32L -> Array(-s, -c, 0.0),
      33L -> Array(0.0, -c, s))
    val df = pts.toDF("id", "vec")
    val out = Similarity.dbscan(df, tau, minPts = 4)
      .as[(Long, String, Long)].collect().toSet
    val expected = Set[(Long, String, Long)](
      (0L, "core", 0L), (1L, "core", 0L), (2L, "core", 0L), (3L, "core", 0L),
      (4L, "border", 0L),
      (10L, "core", 10L), (11L, "core", 10L), (12L, "core", 10L),
      (13L, "core", 10L),
      (20L, "noise", -1L),
      (30L, "core", 30L),
      (31L, "border", 30L), (32L, "border", 30L), (33L, "border", 30L))
    assert(out == expected)
    // partitioning must not reach roles or labels
    val again = Similarity.dbscan(df.repartition(7), tau, minPts = 4)
      .as[(Long, String, Long)].collect().toSet
    assert(again == expected)
  }

  test("role invariants on real embeddings") {
    val e = graft.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val out = Similarity.dbscan(e, 0.35, minPts = 4)
    val n = e.count()
    // roles partition the corpus
    assert(out.count() == n)
    assert(out.select("vec_id").distinct().count() == n)
    val byRole = out.groupBy("role").count().as[(String, Long)]
      .collect().toMap
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    // the chosen (tau, minPts) must exercise all three roles on this data
    assert(Set("core", "border", "noise").subsetOf(byRole.keySet), s"$byRole")
    // noise is unlabeled, everything else carries a real cluster id
    assert(out.filter(col("role") === "noise" && col("cluster") =!= -1L)
      .count() == 0)
    assert(out.filter(col("role") =!= "noise" && col("cluster") < 0L)
      .count() == 0)
    // every cluster label is that cluster's MIN CORE id (borders may have
    // smaller ids — labels come from cores only)
    val labels = out.filter(col("role") === "core")
      .groupBy("cluster").agg(min("vec_id").as("lo")).as[(Long, Long)]
      .collect()
    assert(labels.forall { case (cl, lo) => cl == lo })
    // border clusters all exist among core clusters
    val coreClusters = labels.map(_._1).toSet
    val borderClusters = out.filter(col("role") === "border")
      .select("cluster").distinct().as[Long].collect().toSet
    assert(borderClusters.subsetOf(coreClusters))
  }

  test("ANN front-end reproduces the exact clustering on real embeddings") {
    // the q_dbscan_ann contract: at 24 tables x 2 planes the per-pair
    // miss bound is far below one expected miss on the organic pair
    // count, so the LSH candidate front-end + exact cosine scoring must
    // yield the IDENTICAL (vec_id, role, cluster) table — the swap-in
    // the dbscan scaladoc promises, downstream untouched
    val e = graft.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = Similarity.dbscan(e, 0.35, minPts = 4)
      .as[(Long, String, Long)].collect().toSet
    val ann = Similarity.dbscanAnn(e, 0.35, minPts = 4,
        planesPerTable = Seq.fill(24)(2))
      .as[(Long, String, Long)].collect().toSet
    assert(ann == exact,
      s"ann/exact divergence: ${(ann diff exact) ++ (exact diff ann)}")
  }

  test("starved ANN tables only DEMOTE — the recall contract under divergence") {
    // where the miss bound is NOT driven to zero (here: a single
    // 6-plane table), the ANN form may miss true neighbor pairs but can
    // never invent one (every candidate is exactly scored). Degrees are
    // therefore pointwise <= the exact form's: the ANN core set is a
    // subset of the exact core set, and every exact-noise point stays
    // noise under ANN. This is the documented failure DIRECTION a
    // production sweep reasons about when tuning tables against recall.
    val e = graft.Tables.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = Similarity.dbscan(e, 0.35, minPts = 4)
    val starved = Similarity.dbscanAnn(e, 0.35, minPts = 4,
      planesPerTable = Seq(6))
    def roleSet(df: org.apache.spark.sql.DataFrame, role: String) =
      df.filter(col("role") === role).select("vec_id").as[Long]
        .collect().toSet
    val exactCore = roleSet(exact, "core")
    val annCore = roleSet(starved, "core")
    assert(annCore.subsetOf(exactCore),
      s"ANN promoted non-cores: ${annCore diff exactCore}")
    val exactNoise = roleSet(exact, "noise")
    val annNoise = roleSet(starved, "noise")
    assert(exactNoise.subsetOf(annNoise),
      s"ANN rescued exact-noise points: ${exactNoise diff annNoise}")
    // and the starvation is real on this data — the sets genuinely differ
    assert(annCore != exactCore,
      "expected a single coarse table to miss pairs; widen the starvation")
  }
}

package graft.ops.llm

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>` cast to
  * double for stable math).
  *
  * Two paths:
  *  - brute-force cosine top-k: the exact, oracle-checked baseline. The
  *    query set is broadcast, so the big side streams once with no shuffle —
  *    fine whenever |queries| is small, at any corpus size.
  *  - LSH-bucketed ANN (`annTopK`): random-hyperplane signatures put each
  *    vector in one of 2^planes buckets; queries probe their own bucket plus
  *    all Hamming-1 neighbors. Join is bucket-equi (shuffle on an 8-char
  *    key), never all-pairs — the 100 TB path. Recall vs brute force is
  *    asserted in SimilaritySpec.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions —
  * codegen-friendly, no UDF serialization per row.
  */
object Similarity {

  /** Codegen'd dot product (see functions.VectorMath — the HOF
    * `aggregate(zip_with(...))` formulation is interpreted per element and
    * dominates all-pairs queries).
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorMath.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) given precomputed norms (avoid recomputing the heavy part
    * per candidate pair).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query vector. `vectors` = (id, vec),
    * `queries` = (qid, qvec); self-pairs excluded by id. Output:
    * (qid, id, rnk, score4) — rnk from the un-rounded score with id
    * tie-break, score rounded to 4 dp for display.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val v = vectors.toDF("id", "vec").withColumn("nv", l2norm(col("vec")))
    val q = queries.toDF("qid", "qvec").withColumn("nq", l2norm(col("qvec")))
    val scored = v.join(broadcast(q), col("id") =!= col("qid"))
      .withColumn("score",
        cosine(col("qvec"), col("vec"), col("nq"), col("nv")))
    val top = graft.ops.TopK(scored, Seq("qid"), scored("score"),
      Seq(scored("id")), k)
    top.select(col("qid"), col("id"), col("rnk"),
      round(col("score"), 4).as("score4"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-dup
    * detection. Exact (one triangular join); the ANN bucket variant is the
    * scale path.
    */
  def cosinePairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val l = vectors.toDF("a", "va").withColumn("na", l2norm(col("va")))
    val r = vectors.toDF("b", "vb").withColumn("nb", l2norm(col("vb")))
    l.join(r, col("a") < col("b"))
      .withColumn("score", cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("score") >= threshold)
      .select(col("a"), col("b"), round(col("score"), 4).as("score4"))
  }

  /** Deterministic random hyperplanes: `planes` rows of `dim` components in
    * [-1, 1), from a fixed seed. Returned as a literal nested array column —
    * broadcast by value inside the plan.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Column = {
    val rnd = new Random(seed)
    val w = Array.fill(planes, dim)(rnd.nextDouble() * 2 - 1)
    array(w.map(p => array(p.map(lit): _*)): _*)
  }

  /** Sign-bit bucket string of `vec` against `planesCol` ("1011...", one
    * char per plane).
    */
  def bucketOf(vec: Column, planesCol: Column): Column =
    concat_ws("",
      transform(planesCol, p => when(dot(p, vec) >= 0, "1").otherwise("0")))

  /** Multi-probe buckets for a query: its own bucket plus every Hamming-1
    * flip (planes+1 probes total).
    */
  def probeBuckets(bucket: Column, planes: Int): Column = {
    val flips = (1 to planes).map { i =>
      val flipped = when(substring(bucket, i, 1) === "1", "0").otherwise("1")
      concat(substring(bucket, 1, i - 1), flipped,
        substring(bucket, i + 1, planes - i))
    }
    array_distinct(array(bucket +: flips: _*))
  }

  /** ANN top-k: hyperplane-bucketed candidates (query probes its bucket +
    * Hamming-1 neighbors), exact cosine re-rank within candidates.
    *
    * `dim` is the embedding dimensionality; pass it when known, else it is
    * read from the first vector (a one-row scan). A wrong dim would silently
    * truncate/zero-pad the hyperplane dot products and degrade buckets.
    */
  def annTopK(vectors: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, seed: Long = 42L, dim: Int = 0): DataFrame = {
    val v0 = vectors.toDF("id", "vec")
    val q0 = queries.toDF("qid", "qvec")
    // Infer from the corpus, falling back to the query side — an empty
    // corpus with non-empty queries still evaluates bucketOf on the
    // query rows, and mismatched plane length would make the strict
    // graft_dot throw. Null vectors are skipped; all-empty clamps to 1
    // (nothing is evaluated then).
    def firstDim(df: DataFrame, c: String): Int =
      df.select(size(col(c)).as("d")).na.drop().limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
    val d = math.max(1,
      if (dim > 0) dim
      else { val dv = firstDim(v0, "vec")
             if (dv > 0) dv else firstDim(q0, "qvec") })
    val pl = hyperplanes(planes, d, seed)
    val v = v0
      .withColumn("nv", l2norm(col("vec")))
      .withColumn("bucket", bucketOf(col("vec"), pl))
    val q = q0
      .withColumn("nq", l2norm(col("qvec")))
      .withColumn("probe",
        explode(probeBuckets(bucketOf(col("qvec"), pl), planes)))
    val scored = v.join(broadcast(q),
        col("bucket") === col("probe") && col("id") =!= col("qid"))
      .withColumn("score",
        cosine(col("qvec"), col("vec"), col("nq"), col("nv")))
    graft.ops.TopK(scored, Seq("qid"), scored("score"), Seq(scored("id")), k)
      .select(col("qid"), col("id"), col("rnk"),
        round(col("score"), 4).as("score4"))
  }
}

package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline tier.
  *
  * Three tiers, all bucketed (never all-pairs) so they survive 100 TB:
  *  - exact: group by sha256 of normalized text — the shuffle key is a fixed
  *    32-byte digest, not the document body, so a 100 MB document costs the
  *    same shuffle bytes as a tweet;
  *  - exact n-gram Jaccard: inverted-index join (shingle → docs) — only
  *    pairs sharing ≥1 shingle are compared. Jaccard thresholds are integer
  *    cross-multiplications (`inter*den >= uni*num`), never float division,
  *    so results hash-match the DuckDB oracle exactly;
  *  - MinHash + banded LSH: per-doc k signatures, banded into `bands`
  *    buckets; only same-bucket docs become candidates, then candidates are
  *    verified with exact Jaccard. Candidate volume is controlled by (k,
  *    bands) — the standard S-curve — independent of corpus size.
  *
  * Hash choice: the oracle-checked path uses sha256 (bit-identical in Spark
  * and DuckDB); `minhashSigsFast` swaps in xxhash64 (one 64-bit mix per
  * shingle instead of a crypto digest) for production throughput — same
  * algebra, different hash family.
  */
object Dedup {

  /** Exact dedup: (text_sha, keep_id = min id, n_dups) per distinct
    * normalized text. Survivors are `keep_id`; `n_dups-1` rows drop.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(TextOps.normalized(df(textCol)), 256).as("text_sha"))
      .agg(min(df(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Pairs (a < b) whose distinct n-word-shingle Jaccard >= num/den, via
    * inverted-index join. Output: (a, b, inter, uni) — jaccard = inter/uni.
    *
    * Scale note: common shingles (stop-phrase buckets) blow up the index
    * join; production corpora prune high-document-frequency shingles first
    * (prefix filtering). `maxShingleDf` drops shingles appearing in more
    * than that many docs — 0 disables (the testdata vocabulary is tiny, so
    * the oracle query keeps everything).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, num: Int, den: Int,
                        maxShingleDf: Int = 0): DataFrame = {
    val sh = df
      .select(df(idCol).as("doc"),
        explode(TextOps.shingleSet(df(textCol), n)).as("g"))
    val pruned =
      if (maxShingleDf <= 0) sh
      else {
        val dfreq = sh.groupBy("g").agg(count(lit(1)).as("df_"))
          .filter(col("df_") <= maxShingleDf).select("g")
        sh.join(broadcast(dfreq), "g")
      }
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_"))
    val l = pruned.toDF("a", "g")
    val r = pruned.toDF("b", "g2")
    val inter = l.join(r, l("g") === r("g2") && l("a") < r("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    thresholded(inter, sizes, num, den)
  }

  /** MinHash signature j over a distinct-shingle array: min over shingles of
    * sha256("j:" + shingle). Oracle-parity variant (sha256 exists in DuckDB).
    */
  def minhashSig(shingleSet: Column, j: Int): Column =
    array_min(transform(shingleSet, sh => sha2(concat(lit(s"$j:"), sh), 256)))

  /** Production-speed signature: xxhash64 with per-signature seed. Not
    * oracle-checked (xxhash64 is Spark-specific); covered by DedupSpec.
    */
  def minhashSigFast(shingleSet: Column, j: Int): Column =
    array_min(transform(shingleSet, sh => xxhash64(lit(j), sh)))

  /** MinHash+LSH near-dup pairs: k=2*bands sha256 signatures, banded r=2,
    * candidates from same-(band, bandkey) buckets, verified with exact
    * shingle Jaccard >= num/den. Output (a, b, inter, uni).
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, bands: Int = 4, num: Int = 8, den: Int = 10)
      : DataFrame = {
    val base = df.select(df(idCol).as("doc"),
      TextOps.shingleSet(df(textCol), n).as("sh"))
    val sigCols = (0 until 2 * bands).map(j =>
      minhashSig(col("sh"), j).as(s"sig$j"))
    val sigs = base.select(col("doc") +: sigCols: _*)
    val bandKeys = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        concat(col(s"sig${2 * b}"), col(s"sig${2 * b + 1}")).as("bkey"))): _*)
    val banded = sigs
      .select(col("doc"), explode(bandKeys).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val l = banded.toDF("a", "band", "bkey")
    val r = banded.toDF("b", "band2", "bkey2")
    val cand = l.join(r,
        l("band") === r("band2") && l("bkey") === r("bkey2") &&
          l("a") < r("b"))
      .select("a", "b").distinct()
    val withSets = cand
      .join(base.toDF("a", "sh_a"), "a")
      .join(base.toDF("b", "sh_b"), "b")
    val interC = size(array_intersect(col("sh_a"), col("sh_b")))
    val uniC = size(col("sh_a")) + size(col("sh_b")) - interC
    withSets
      .select(col("a"), col("b"), interC.as("inter"), uniC.as("uni"))
      .filter(col("inter") * den >= col("uni") * num)
  }

  /** join candidate-pair intersection counts with per-doc set sizes and keep
    * pairs with inter/uni >= num/den (integer cross-multiply).
    */
  private def thresholded(inter: DataFrame, sizes: DataFrame,
                          num: Int, den: Int): DataFrame = {
    val out = inter
      .join(sizes.toDF("a", "na"), "a")
      .join(sizes.toDF("b", "nb"), "b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
    out.select(col("a"), col("b"),
      col("inter").cast("int").as("inter"), col("uni").cast("int").as("uni"))
  }
}

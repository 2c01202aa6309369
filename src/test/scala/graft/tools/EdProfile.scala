package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for editDistancePairs: times each internal
  * phase of the Ed-Join pipeline separately so optimization effort lands
  * where the seconds are. sbt "Test/runMain graft.tools.EdProfile [sfDir]"
  */
object EdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-edprofile", 32)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = 3; val maxDist = 2; val prefixChars = 64
    val par = spark.sparkContext.defaultParallelism

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val norm = df.select(col("doc_id").as("doc"),
        substring(lower(trim(col("text"))), 1, prefixChars).as("s"))
      .repartition(par)
      .withColumn("len", length(col("s")))
      .localCheckpoint(false)
    t("norm count")(println("  docs=" + norm.count()))

    val smallCut = q * (maxDist + 1)
    val big = norm.filter(col("len") >= smallCut)
    val grams = big.select(col("doc"), col("len"),
        posexplode(transform(
          sequence(lit(1), greatest(col("len") - (q - 1), lit(1))),
          i => col("s").substr(i, lit(q)))).as(Seq("pos", "g")))
    t("grams count")(println("  grams=" + grams.count()))

    val dfreq = grams.withColumn("df_",
      count(lit(1)).over(Window.partitionBy("g"))).localCheckpoint(false)
    t("dfreq materialize")(println("  dfreq=" + dfreq.count()))

    val ranked = dfreq.withColumn("rk", row_number().over(
      Window.partitionBy("doc").orderBy(col("df_"), col("g"), col("pos"))))
    val binW = maxDist + 1
    val prefix = ranked.filter(col("rk") <= q * maxDist + 1)
      .select(col("doc").as("a"), col("len").as("la"),
        col("g"), col("pos").as("pa"),
        explode(array(expr(s"pos div $binW") - 1, expr(s"pos div $binW"),
          expr(s"pos div $binW") + 1)).as("bin"))
      .localCheckpoint(false)
    t("prefix materialize")(println("  prefix=" + prefix.count()))

    val full = dfreq.select(col("doc").as("b"), col("len").as("lb"),
      col("g").as("g2"), col("pos").as("pb"),
      expr(s"pos div $binW").as("bin2"))
    val joined = prefix.join(full,
      prefix("g") === full("g2") && col("bin") === col("bin2") &&
        col("a") < col("b") &&
        abs(col("pa") - col("pb")) <= maxDist &&
        abs(col("la") - col("lb")) <= maxDist)
    t("join raw matches")(println("  matches=" + joined.count()))

    val candBig = joined.select("a", "b").distinct().localCheckpoint(false)
    t("candBig distinct")(println("  cand=" + candBig.count()))

    val verified = candBig
      .join(norm.select(col("doc").as("a"), col("s").as("sa")), "a")
      .join(norm.select(col("doc").as("b"), col("s").as("sb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= maxDist)
    t("verify levenshtein")(println("  pairs=" + verified.count()))

    val verifiedBand = candBig
      .join(norm.select(col("doc").as("a"), col("s").as("sa")), "a")
      .join(norm.select(col("doc").as("b"), col("s").as("sb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("sa"), col("sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
    t("verify lev banded")(println("  pairs=" + verifiedBand.count()))

    val gsets = norm.select(col("doc"),
      array_distinct(transform(
        sequence(lit(1), greatest(col("len") - (q - 1), lit(1))),
        i => xxhash64(col("s").substr(i, lit(q))))).as("gs"))
      .localCheckpoint(false)
    t("gram sets")(println("  gsets=" + gsets.count()))
    val verifiedCnt = candBig
      .join(gsets.select(col("doc").as("a"), col("gs").as("ga")), "a")
      .join(gsets.select(col("doc").as("b"), col("gs").as("gb")), "b")
      .filter(size(array_intersect(col("ga"), col("gb"))) >=
        greatest(size(col("ga")), size(col("gb"))) - q * maxDist)
      .select("a", "b")
    t("count filter")(println("  survivors=" + verifiedCnt.count()))
    val verifiedBoth = verifiedCnt
      .join(norm.select(col("doc").as("a"), col("s").as("sa")), "a")
      .join(norm.select(col("doc").as("b"), col("s").as("sb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("sa"), col("sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
    t("count+banded lev")(println("  pairs=" + verifiedBoth.count()))

    spark.stop()
  }
}

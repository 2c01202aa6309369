package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CharHistStats, CmsEstimate, DotProduct, GreedySpanScan, NgramStats, WordShingles}

/** Session-extensions entry point: registers the native graft expressions
  * as SQL functions, so `spark.sql("... graft_dot(a, b) ...")` works in
  * any session created with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` (or
  * spark-submit `--conf` of the same). The Scala column API
  * (`functions.VectorMath.dot`, `TextOps.shingleSet`) does not require
  * registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName,
        "graft_word_shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(n: Int, IntegerType)) => WordShingles(text, n)
        case _ => throw new IllegalArgumentException(
          "graft_word_shingles(text, <int literal n>)")
      }))
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // internal runtime row-group filtering but does not register them in
    // the public function registry; graft exposes them for probe-set
    // prefilters that are too large to broadcast as literal arrays
    // (test-set decontamination against millions of probe shingles).
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        val agg = children match {
          case Seq(c) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c)
          case Seq(c, est) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c, est)
          case Seq(c, est, bits) =>
            new org.apache.spark.sql.catalyst.expressions.aggregate
              .BloomFilterAggregate(c, est, bits)
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg(xxhash64Col[, estItems[, numBits]])")
        }
        agg.toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_might_contain(bloomBinary, xxhash64Value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
    // per-ROW bloom probe for zone-map tables (BloomFilterMightContain
    // requires a constant filter; a zone map carries one bloom per row)
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[graft.functions.BloomContains].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_bloom_contains(bloomBinaryCol, xxhash64Value)")
        graft.functions.BloomContains(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_stats"),
      new ExpressionInfo(classOf[NgramStats].getName,
        "graft_ngram_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(text, Literal(n: Int, IntegerType)) => NgramStats(text, n)
        case _ => throw new IllegalArgumentException(
          "graft_ngram_stats(text, <int literal n>)")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_hist"),
      new ExpressionInfo(classOf[CharHistStats].getName,
        "graft_char_hist"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_char_hist(text)")
        CharHistStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_greedy_span_scan"),
      new ExpressionInfo(classOf[GreedySpanScan].getName,
        "graft_greedy_span_scan"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_greedy_span_scan(array<struct<pos,tok,len,tag>>)")
        GreedySpanScan(children.head)
      }))
    // read side of Spark's count_min_sketch aggregate (which IS in the
    // public registry but has no SQL-consumable probe)
    ext.injectFunction((
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName,
        "graft_cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_cms_estimate(sketchBinary, item)")
        CmsEstimate(children.head, children(1))
      }))
  }
}

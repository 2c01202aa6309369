package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NER-style entity templating — the reference's one planned-but-never-
  * built feature (`NER-Explanation.txt:1-9`, `NER.help.txt:1-3`: "how to
  * install docker in linux" → "how to install APPLICATION in OS",
  * intended for query normalization ahead of the autocomplete
  * aggregation), rebuilt as a relational operator instead of a
  * model-serving call: recognized surface forms come from a dictionary
  * table and are replaced by their entity type tag.
  */
object Entities {

  /** Canonical dictionary shape shared by both templating forms: the
    * token stream is lowercased and trimmed before lookup, so surfaces
    * must be too or they silently never match; and a surface listed
    * twice (two tags) would multiply token rows through the broadcast
    * left join, corrupting the reassembly. Normalize + keep the
    * lexicographically smallest tag per surface (deterministic, so the
    * declared queries hash stably whatever the input order).
    */
  private def canonicalDict(entities: DataFrame): DataFrame =
    entities.toDF("surface", "tag")
      .select(lower(trim(col("surface"))).as("surface"), col("tag"))
      .where(length(col("surface")) > 0)
      .groupBy("surface").agg(min("tag").as("tag"))

  /** Replace every whitespace token whose lowercase form appears in
    * `entities` = (surface, tag) with its tag; all other tokens pass
    * through lowercased. Output: (id, templated).
    *
    * Scale shape: tokens posexplode scan-side and LEFT-join the
    * dictionary with an explicit `broadcast` (a dictionary is
    * broadcast-sized by nature — thousands of surface forms, not
    * corpus-sized), so the token stream never shuffles for the lookup;
    * the one hash exchange is the per-doc reassembly, whose
    * sort_array over (pos, token) structs makes the rebuilt order exact
    * under any partitioning (the repo determinism convention).
    * Multi-token surface forms can be layered by running the same join
    * over n-gram windows before the single-token pass; the declared
    * query exercises the single-token contract the reference describes.
    */
  def template(df: DataFrame, idCol: String, textCol: String,
               entities: DataFrame): DataFrame = {
    val toks = df.select(df(idCol).as("id"),
      posexplode(split(lower(trim(df(textCol))), "\\s+"))
        .as(Seq("pos", "tok")))
    val dict = canonicalDict(entities)
    toks.join(broadcast(dict), toks("tok") === dict("surface"), "left")
      .groupBy(col("id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("tag"), col("tok")).as("out")))),
        e => e.getField("out")), " ").as("templated"))
  }

  /** Multi-token entity templating with GREEDY LEFTMOST-LONGEST match —
    * the semantics every gazetteer tagger uses ("new york city" must
    * become one CITY tag, not CITY + leftover tokens): at each position
    * the longest dictionary surface form starting there wins, its tokens
    * are consumed, and matching resumes after it. Surfaces are
    * whitespace-joined token sequences of 1..`maxLen` tokens.
    *
    * Scale shape: span candidates come from `lead()` windows over the
    * token stream (one per-doc exchange, no self-joins), each span
    * length LEFT-joins the broadcast dictionary once, and the
    * leftmost-longest scan is ONE codegen expression
    * ([[graft.functions.GreedySpanScan]]) over the collected
    * (pos, tok, len, tag) array — sequential semantics made relational
    * by bounding the state (skip counter) inside one row, without the
    * interpreted `aggregate`-HOF fold that previously broke the
    * whole-stage span of the reassembly stage. Nothing but the
    * reassembly shuffles. Output: (id, templated).
    */
  def templateSpans(df: DataFrame, idCol: String, textCol: String,
                    entities: DataFrame, maxLen: Int = 3): DataFrame = {
    val perPos = templateSpanInput(df, idCol, textCol, entities, maxLen)
    // greedy leftmost-longest scan over the position-sorted array with
    // (out, skip) state — skip>0 means this token was consumed by an
    // accepted match to its left. One codegen expression
    // (functions.GreedySpanScan) does the walk and the re-join in a
    // single linear pass; the interpreted fold it replaced survives as
    // [[templateSpansHof]], the bit-parity oracle.
    perPos.groupBy(col("id"))
      .agg(graft.functions.GreedySpanScan(
        sort_array(collect_list(col("e")))).as("templated"))
  }

  /** Shared front half of both templateSpans forms: the per-position
    * (pos, tok, len, tag) candidate table, `len` the longest dictionary
    * match starting at pos (0 = none). Output: (id, e:struct).
    */
  private def templateSpanInput(df: DataFrame, idCol: String,
                                textCol: String, entities: DataFrame,
                                maxLen: Int): DataFrame = {
    require(maxLen >= 1, "maxLen must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val dict = canonicalDict(entities)
    val w = Window.partitionBy("id").orderBy("pos")
    val toks = df.select(df(idCol).as("id"),
      posexplode(split(lower(trim(df(textCol))), "\\s+"))
        .as(Seq("pos", "tok")))
    // span text of length L starting at pos (null when it runs off the
    // doc end — lead() yields null and concat_ws skips nothing: guard
    // with an explicit null check on the last member)
    def spanCol(l: Int): Column =
      when(lead(col("tok"), l - 1).over(w).isNotNull,
        concat_ws(" ", (0 until l).map(i =>
          lead(col("tok"), i).over(w)): _*))
    val withSpans = (2 to maxLen).foldLeft(
      toks.withColumn("span1", col("tok"))) { (d, l) =>
      d.withColumn(s"span$l", spanCol(l))
    }
    // one broadcast left join per span length; longest match wins
    val matched = (1 to maxLen).foldLeft(withSpans) { (d, l) =>
      d.join(broadcast(dict.select(col("surface").as(s"surf$l"),
          col("tag").as(s"tag$l"))),
        d(s"span$l") === col(s"surf$l"), "left")
    }
    // fold 1..maxLen so the OUTERMOST when is the longest span — the
    // greedy contract is longest-match-wins at each position
    val lenExpr = (1 to maxLen).foldLeft(lit(0)) { (acc, l) =>
      when(col(s"tag$l").isNotNull, l).otherwise(acc)
    }
    val tagExpr = (1 to maxLen).foldLeft(lit(null).cast("string")) {
      (acc, l) => when(col(s"tag$l").isNotNull, col(s"tag$l")).otherwise(acc)
    }
    matched.select(col("id"),
      struct(col("pos"), col("tok"), lenExpr.as("len"), tagExpr.as("tag"))
        .as("e"))
  }

  /** The interpreted `aggregate`-HOF form of [[templateSpans]]' greedy
    * walk — kept as the bit-parity oracle for the codegen
    * [[graft.functions.GreedySpanScan]] (NativeExpressionsSpec asserts
    * equality on every doc). Not a production path: the fold's per-step
    * array concats are O(n²) per doc and break whole-stage codegen.
    */
  private[graft] def templateSpansHof(df: DataFrame, idCol: String,
                                      textCol: String, entities: DataFrame,
                                      maxLen: Int = 3): DataFrame = {
    val perPos = templateSpanInput(df, idCol, textCol, entities, maxLen)
    perPos.groupBy(col("id"))
      .agg(array_join(aggregate(
        sort_array(collect_list(col("e"))),
        struct(array().cast("array<string>").as("out"),
          lit(0).as("skip")),
        (acc, e) => {
          val out = acc.getField("out"); val skip = acc.getField("skip")
          when(skip > 0,
            struct(out.as("out"), (skip - 1).as("skip")))
          .when(e.getField("len") >= 1,
            struct(concat(out, array(e.getField("tag"))).as("out"),
              (e.getField("len") - 1).as("skip")))
          .otherwise(
            struct(concat(out, array(e.getField("tok"))).as("out"),
              lit(0).as("skip")))
        },
        acc => acc.getField("out")), " ").as("templated"))
  }
}

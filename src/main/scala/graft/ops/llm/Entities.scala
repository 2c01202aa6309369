package graft.ops.llm

import org.apache.spark.sql.DataFrame
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
    val dict = entities.toDF("surface", "tag")
    toks.join(broadcast(dict), toks("tok") === dict("surface"), "left")
      .groupBy(col("id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("tag"), col("tok")).as("out")))),
        e => e.getField("out")), " ").as("templated"))
  }
}

package graft.operators

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline mandate:
  * per-document quality scoring and a language-ID heuristic. Everything is
  * built-in Catalyst expressions (codegen'd, one narrow pass per doc for
  * L8, explode + broadcast join for L9) and SQL-reproducible.
  */
object TextAnalysis {

  /** Deterministic stopword set for the ratio feature. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** L43 core — per-source intra-document trigram repetition rollup (the
    * Gopher within-doc repetition gate). Input needs (doc_id, source,
    * text); docs with fewer than 3 tokens contribute no trigrams and drop
    * out before the per-doc rollup. No cross-doc join anywhere: the
    * explode is per-document and the (doc, gram) aggregate is one hash
    * shuffle keyed by doc — embarrassingly parallel at any corpus size.
    */
  def intraDocRepetition(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
              explode(graft.functions.TextFunctions.wordNgrams("text", 3))
                .as("gram"))
      .groupBy(col("doc_id"), col("source"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt")).as("n_grams"),
           sum(col("cnt") - 1).as("n_rep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_grams")).as("n_grams"),
           sum(col("n_rep")).as("n_rep"),
           Q.round4Ratio(sum(col("n_rep")), sum(col("n_grams")))
             .as("rep_frac"),
           sum(when(col("n_rep") * 5 > col("n_grams"), 1L).otherwise(0L))
             .as("n_flagged"))
      .orderBy("source")

  /** Per-document quality features + composite flag:
    * n_tokens, total token chars, avg token length (ROUND 4, exact integer
    * formula), stopword ratio (ROUND 4), alpha-space purity ratio, and
    * `keep` = the composite filter a pipeline would apply before training.
    * Single projection pass — no shuffle, scales linearly.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = expr("filter(split(text, ' '), t -> t != '')")
    val stopArr = array(Stopwords.map(lit): _*)
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("tok_chars",
        expr("aggregate(filter(split(text, ' '), t -> t != ''), 0L, (acc, t) -> acc + length(t))"))
      .withColumn("n_stop",
        size(expr(s"filter(filter(split(text, ' '), t -> t != ''), t -> array_contains(array(${Stopwords.map("'" + _ + "'").mkString(",")}), t))")).cast("long"))
      .withColumn("clean_chars",
        length(regexp_replace(col("text"), "[^a-z ]", "")).cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        Q.round4Ratio(col("tok_chars"), greatest(col("n_tokens"), lit(1L)))
          .as("avg_token_len"),
        Q.round4Ratio(col("n_stop"), greatest(col("n_tokens"), lit(1L)))
          .as("stopword_ratio"),
        Q.round4Ratio(col("clean_chars"), greatest(length(col("text")).cast("long"), lit(1L)))
          .as("alpha_ratio"),
        (col("n_tokens").between(5, 1000) &&
         col("clean_chars") === length(col("text"))).as("keep"))
  }

  /** Marker-token language profiles: tiny broadcast dimension. */
  val Profiles: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of",
    "de" -> "der", "de" -> "die", "de" -> "und",
    "es" -> "el", "es" -> "la", "es" -> "de",
    "fr" -> "le", "fr" -> "la", "fr" -> "et")

  /** Language-ID heuristic: explode tokens, count marker hits per candidate
    * profile (broadcast join — the profile table is tiny at any corpus
    * size), argmax with deterministic tie-break (score desc, lang asc);
    * docs with zero marker hits are labeled 'und'. The classic n-gram
    * profile method with word-level markers.
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val profiles = Profiles.toDF("cand", "marker")
    val toks = docs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), t -> t != '')")).as("tok"))
    val scores = toks.join(broadcast(profiles), col("tok") === col("marker"))
      .groupBy(col("doc_id"), col("cand"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand").asc)
    val best = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id").as("bid"), col("cand"), col("score"))
    docs.select(col("doc_id"))
      .join(best, col("doc_id") === col("bid"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("cand"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }
}

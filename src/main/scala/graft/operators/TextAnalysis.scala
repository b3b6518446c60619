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

  /** Sentinel for BPE symbol framing (US, 0x1f). */
  private val BpeS = "\u001f"

  /** Corpus → the BPE trainer's word-frequency contraction, grouped by
    * `extraKeys` (empty for the corpus-wide learn table; `lang` for the
    * per-language apply table): each word's initial symbol sequence is
    * every codepoint wrapped in US sentinels ((?s): dot must also take any
    * newline a whitespace-split token can still contain).
    */
  private def bpeWordSeqs(docs: DataFrame, extraKeys: Seq[String]): DataFrame = {
    val S = BpeS
    val keys = extraKeys.map(col)
    docs
      .select(keys :+ explode(graft.functions.TextFunctions
        .tokens("lower(text)")).as("word"): _*)
      .groupBy(keys :+ col("word"): _*).agg(count(lit(1)).as("freq"))
      // A token carrying the sentinel itself would corrupt the framing
      // (⟨us⟩ inside a symbol mis-segments the split) — excluded by
      // contract, identically in the oracle. Real tokenizer trainers
      // strip control characters in exactly this normalization step.
      .filter(!col("word").contains(S))
      .select(keys ++ Seq(
        regexp_replace(col("word"), "(?s)(.)", s"$S$$1$S").as("seq"),
        col("freq")): _*)
  }

  /** The merge-round learn loop over a (seq, freq) word table: each round
    * aggregates adjacent-pair counts (vocab-sized, map-side combined),
    * takes ONE argmax row to the driver, and rewrites the table with the
    * winning merge. Returns (round, lhs, rhs, merged, pair_count) rows.
    */
  private def learnMerges(words: DataFrame,
                          rounds: Int): Seq[(Long, String, String, String, Long)] = {
    val S = BpeS
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var cur = words
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val l = split(trim(col("seq"), S), s"$S$S")
      val n = greatest(size(l) - 1, lit(0))
      val pairs = cur
        .select(explode(zip_with(slice(l, lit(1), n), slice(l, lit(2), n),
                  (x, y) => struct(x.as("a"), y.as("b")))).as("p"),
                col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((r.toLong, a, b, a + b, cnt))
        cur = cur.withColumn("seq",
          replace(col("seq"), lit(s"$S$a$S$S$b$S"), lit(s"$S$a$b$S")))
        // A production run learns thousands of merges: without lineage
        // cuts each round re-executes every prior replace (O(r²) work and
        // an r-deep plan). Fold the accumulated rewrites into a new
        // vocab-sized materialization every 8 rounds — but never after
        // the FINAL merge, whose rewrite no later round reads.
        if (r % 8 == 0 && r < rounds) cur = cur.localCheckpoint(true)
        r += 1
      }
    }
    out.result()
  }

  /** L53 core — distributed BPE merge-round induction (Sennrich et al.
    * 2016): the first `rounds` byte-pair-encoding merges learned from the
    * corpus, each round reporting the winning adjacent-symbol pair, the
    * merged symbol, and its frequency-weighted count.
    *
    * Built on the WORD-FREQUENCY CONTRACTION every production BPE trainer
    * uses: the corpus collapses once into (word, freq) — vocabulary-sized,
    * not corpus-sized — and all subsequent rounds run over that table, so
    * at 100 TB the per-round cost is one vocab-sized hash aggregate on
    * (a, b) partial counts (map-side combined) plus a map-only merge
    * rewrite; the corpus is read exactly once. Rounds are inherently
    * sequential (each merge redefines the pair distribution — the BPE
    * contract), and per-round driver traffic is ONE row (the argmax pair,
    * a TakeOrdered(1), never a whole-distribution collect).
    *
    * Symbol sequences are kept as strings with each symbol wrapped in a
    * US (0x1f) sentinel pair — `⟨us⟩sym⟨us⟩` — so a merge of (a, b) is one
    * literal `replace(seq, ⟨us⟩a⟨us⟩⟨us⟩b⟨us⟩ → ⟨us⟩ab⟨us⟩)`: standard
    * left-to-right non-overlapping string replace IS BPE's greedy-left
    * merge ("aaa" under merge (a,a) → [aa, a]), and Spark and DuckDB
    * implement the identical semantics, which keeps the oracle exact.
    * Ties in the argmax break lexicographically on (a, b); counts are
    * integers — deterministic cross-engine.
    */
  def bpeMerges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val words = bpeWordSeqs(docs, Seq.empty)
      .localCheckpoint(true) // the single corpus read; rounds are vocab-sized
    import spark.implicits._
    learnMerges(words, rounds)
      .toDF("round", "lhs", "rhs", "merged", "pair_count")
      .orderBy("round")
  }

  /** L56 core — BPE APPLICATION (Sennrich et al. 2016 §3, the encode side
    * of [[bpeMerges]]'s learn side): encode the corpus with the first
    * `rounds` merges learned from it and report per-language compression —
    * words, base symbols (codepoints), post-merge tokens, the ROUND(tokens
    * / base, 4) compression ratio, and the post-merge symbol vocabulary
    * size. The "how well does the learned vocabulary compress each
    * language" readout a tokenizer-training pipeline checks before
    * committing to a merge table.
    *
    * Scale shape: ONE corpus read builds the (lang, word, freq)
    * contraction (vocabulary-sized per language, checkpointed — tiny at
    * any corpus scale, the l53 contract); the corpus-wide learn table is a
    * further contraction of it (`groupBy(seq)` — word↔seq is a bijection,
    * so the pair statistics equal l53's exactly); each learned merge
    * applies as one narrow codegen'd `replace` over the word table
    * (greedy-left by the sentinel-string contract — see [[bpeMerges]]);
    * the rollups are one weighted aggregate plus one distinct-symbol
    * aggregate, both vocabulary-bounded. Driver traffic stays ONE argmax
    * row per round.
    */
  def bpeApply(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val S = BpeS
    val syms = (c: org.apache.spark.sql.Column) => split(trim(c, S), s"$S$S")
    val wl = bpeWordSeqs(docs, Seq("lang"))
      .withColumn("n_pre", size(syms(col("seq"))).cast("long"))
      .localCheckpoint(true) // the single corpus read; all else vocab-sized
    val corpusWords = wl.groupBy(col("seq")).agg(sum(col("freq")).as("freq"))
    val merges = learnMerges(corpusWords, rounds)
    val encoded = merges.foldLeft(wl) { case (acc, (_, a, b, _, _)) =>
      acc.withColumn("seq",
        replace(col("seq"), lit(s"$S$a$S$S$b$S"), lit(s"$S$a$b$S")))
    }.withColumn("n_post", size(syms(col("seq"))).cast("long"))
    val stats = encoded.groupBy(col("lang"))
      .agg(sum(col("freq")).as("n_words"),
           sum(col("freq") * col("n_pre")).as("n_base"),
           sum(col("freq") * col("n_post")).as("n_tokens"))
    val vocab = encoded
      .select(col("lang").as("_vlang"), explode(syms(col("seq"))).as("sym"))
      .groupBy(col("_vlang"))
      .agg(countDistinct(col("sym")).as("vocab_size"))
    stats.join(vocab, col("lang") <=> col("_vlang"))
      .select(col("lang"), col("n_words"), col("n_base"), col("n_tokens"),
              col("vocab_size"),
              Q.round4Ratio(col("n_tokens"), col("n_base")).as("compression"))
      .orderBy("lang")
  }

  /** L43 core — per-source intra-document trigram repetition rollup (the
    * Gopher within-doc repetition gate). Input needs (doc_id, source,
    * text); docs with fewer than 3 tokens contribute no trigrams and drop
    * out before the per-doc rollup. No cross-doc join anywhere: the
    * explode is per-document and the (doc, gram) aggregate is one hash
    * shuffle keyed by doc — embarrassingly parallel at any corpus size.
    */
  def intraDocRepetition(docs: DataFrame): DataFrame =
    // Spread before the explode (guide §2.5): single-split corpus scans
    // otherwise serialize the trigram explode on one core (Tables.spread).
    graft.Tables.spread(docs)
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

  /** L45 core — DSIR-shaped importance resampling (scaladoc at the gate):
    * hashed-token frequency-ratio scores against a target subset
    * (doc_id ≡ 0 mod 10), top fifth kept per language. Shared with
    * `ScaleProbe` so the scaling column measures the gate's own dataflow.
    */
  def importanceResample(docsDf: DataFrame): DataFrame = {
    import graft.functions.TextFunctions
    // Spread A/B'd and REJECTED here (round 15): tokens() is cheap per
    // row and the added round-robin exchange re-runs in the rank/boundary
    // passes — measured 2.78 s unspread vs 3.39 s spread at sf0.1.
    val toks = docsDf
      .select(col("doc_id"), col("lang"),
              explode(TextFunctions.tokens("text")).as("tok"))
      .withColumn("b", TextFunctions.tokenHash("tok") % 256)
    // One bucket aggregate carries BOTH distributions (corpus count +
    // conditional target count) — one hash pass over the tokens, not two.
    val bucketed = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
           sum(when(col("doc_id") % 10 === 0, 1L).otherwise(0L)).as("ct"))
    val totals = bucketed.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    // DECIMAL-lifted BEFORE the multiply (the l47 pattern; r8 ADVICE):
    // ct·nr·10^4 in LONG wraps past 2^63 at large corpora while the
    // DuckDB oracle lifts to HUGEINT first — lift both operand products
    // so the engines stay aligned at any scale.
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val weights = bucketed
      .crossJoin(broadcast(totals))
      .select(col("b"),
        Q.intDiv(dec(col("ct")) * dec(col("nr")) * 10000L,
                 dec(col("cr")) * dec(col("nt"))).as("w"))
    // Round 13: the former per-lang rank/count WINDOW put each language's
    // whole score table in one task (data-sized partitions); rank now
    // comes from the grouped two-pass prefix sum (1 + running count of
    // ones). Round 14: OrderOps no longer checkpoints — the G-row
    // language-size broadcast aggregates the INPUT `scores` (the smallest
    // subtree with the right rows), and the score pipeline's exchanges
    // (token bucketing, the doc-level score agg) are deduped across the
    // rank/broadcast branches by ReuseExchange within the one final plan,
    // so only narrow post-shuffle compute re-runs per consumer. The
    // boundary-sampling pass pays one extra (column-pruned) upstream
    // execution — the declared constant traded for removing the corpus-
    // sized lineage-truncating checkpoint (a persist(scores) A/B measured
    // the same wall-clock at sf0.1 while hiding the plan from the audit,
    // so the lazy form is kept). Null-safe join keys match the window
    // formulation's NULL-is-its-own-group behavior.
    val scores = toks.join(broadcast(weights), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("w")).as("score"))
    val cum = OrderOps.groupedRunningSum(scores, Seq("lang"),
        Seq(col("score").desc, col("doc_id").asc), lit(1L))
      .withColumn("rnk", col("cum_before") + 1L)
    val nLang = scores.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      .withColumnRenamed("lang", "_nlang")
    val ranked = cum
      .join(broadcast(nLang), col("lang") <=> col("_nlang"))
      .drop("_nlang")
      .withColumn("kept",
        col("rnk") <= greatest(lit(1L), Q.intDiv(col("n_lang"), lit(5L))))
    ranked.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
           sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
           sum(when(col("kept"), col("score"))).as("sum_kept_score"),
           max(col("score")).as("max_score"),
           min(when(col("kept"), col("score"))).as("min_kept_score"))
      .orderBy("lang")
  }

  /** L48 core — accretive n-gram novelty (scaladoc at the gate): distinct
    * word 5-grams novel iff first seen in this doc; per-source rollup.
    * Shared with `ScaleProbe`.
    */
  def ngramNovelty(docsDf: DataFrame): DataFrame = {
    // Spread before the explode (guide §2.5, Tables.spread scaladoc).
    val grams = graft.Tables.spread(docsDf)
      .select(col("doc_id"), col("source"),
              explode(graft.functions.TextFunctions.wordNgrams("text", 5))
                .as("gram"))
      .select(col("doc_id"), col("source"), col("gram")).distinct()
    val first = grams.groupBy(col("gram"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "gram")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_grams"),
           sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
             .as("n_novel"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_grams")).as("n_grams"),
           sum(col("n_novel")).as("n_novel"),
           Q.round4Ratio(sum(col("n_novel")), sum(col("n_grams")))
             .as("novelty_frac"),
           sum(when(col("n_novel") * 2 < col("n_grams"), 1L).otherwise(0L))
             .as("n_mostly_copied"))
      .orderBy("source")
  }

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

package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-based document quality gates — the pre-training corpus filter
  * family published as Gopher's quality heuristics (Rae et al. 2021,
  * "Scaling Language Models: Methods, Analysis & Insights from Training
  * Gopher", Table A1), the standard first pass before the learned
  * scorers ([[QualityClassifier]]) and repetition gates
  * ([[TextAnalysis.repetitionStats]]).
  *
  * 100-TB shape: every statistic is a scalar expression over the in-row
  * text — split / HOF filter / aggregate — pure map-side, ZERO shuffle,
  * inside whole-stage codegen. The filter composes with any downstream
  * pipeline by gating on `keep` without moving the corpus. */
object QualityFilters {

  /** Gopher's "at least two of" stop-word list (Table A1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherStopwordsSql: String =
    gopherStopwords.map(s => s"'$s'").mkString(", ")

  /** The Gopher rule battery, one column per rule input plus the fused
    * `keep` verdict:
    *  - `n_words` in [minWords, maxWords]  (paper: 50..100k),
    *  - `mean_word_len` in [3, 10] characters,
    *  - `symbol_ratio` (hash or ellipsis occurrences per word) < 0.1,
    *  - `bullet_ratio` (lines starting with a bullet) < 0.9,
    *  - `ellipsis_ratio` (lines ending in an ellipsis) < 0.3,
    *  - `alpha_word_ratio` (words containing a letter) > 0.8,
    *  - `n_stopwords` (distinct hits from [[gopherStopwords]]) >=
    *    `minStopwords` (paper: 2; the registered query pins 1 because
    *    the synthetic corpus vocabulary carries a single stop word —
    *    the statistic is computed identically either way).
    * Word-level rules use the whitespace word definition shared with
    * the quality-ratio family (x1/x5), NOT the packing tokenizer — these
    * are linguistic heuristics over words, per the documented split in
    * the token-budget unification. The line rules are computed over
    * newline-split lines and degrade gracefully to a single line on
    * line-free corpora. */
  def gopherRules(df: DataFrame, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minStopwords: Long = 2L): DataFrame = {
    val t = textCol
    val stops = gopherStopwords.map(s => s"'$s'").mkString(", ")
    df.withColumn("w", expr(s"filter(split($t, ' '), x -> x <> '')"))
      .withColumn("lines", expr(s"split($t, '\n')"))
      .withColumn("n_words", expr("size(w)").cast("long"))
      .withColumn("n_lines", expr("size(lines)").cast("long"))
      // Σ word length as exact integers; the mean is one double division
      .withColumn("chars_sum",
        expr("aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x))"))
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          graft.queries.Det.dround(
            col("chars_sum").cast("double") / col("n_words"), 6)))
      // '#' occurrences + '...' occurrences + '…' occurrences per word
      .withColumn("n_symbols",
        (length(col(t)) - length(regexp_replace(col(t), "#", ""))).cast("long") +
        ((length(col(t)) - length(regexp_replace(col(t), "\\.\\.\\.", ""))) / 3).cast("long") +
        (length(col(t)) - length(regexp_replace(col(t), "…", ""))).cast("long"))
      .withColumn("symbol_ratio",
        when(col("n_words") > 0,
          graft.queries.Det.dround(
            col("n_symbols").cast("double") / col("n_words"), 6)))
      .withColumn("n_bullet_lines",
        expr("size(filter(lines, x -> x LIKE '- %' OR x LIKE '* %' OR x LIKE '• %'))").cast("long"))
      .withColumn("bullet_ratio",
        when(col("n_lines") > 0,
          graft.queries.Det.dround(
            col("n_bullet_lines").cast("double") / col("n_lines"), 6)))
      .withColumn("n_ellipsis_lines",
        expr("size(filter(lines, x -> x LIKE '%...' OR x LIKE '%…'))").cast("long"))
      .withColumn("ellipsis_ratio",
        when(col("n_lines") > 0,
          graft.queries.Det.dround(
            col("n_ellipsis_lines").cast("double") / col("n_lines"), 6)))
      .withColumn("n_alpha_words",
        expr("size(filter(w, x -> x rlike '[a-zA-Z]'))").cast("long"))
      .withColumn("alpha_word_ratio",
        when(col("n_words") > 0,
          graft.queries.Det.dround(
            col("n_alpha_words").cast("double") / col("n_words"), 6)))
      .withColumn("n_stopwords",
        expr(s"size(filter(array($stops), s -> array_contains(w, s)))").cast("long"))
      .withColumn("keep", coalesce(
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") < 0.1 &&
        col("bullet_ratio") < 0.9 &&
        col("ellipsis_ratio") < 0.3 &&
        col("alpha_word_ratio") > 0.8 &&
        col("n_stopwords") >= minStopwords, lit(false)))
      .drop("w", "lines", "chars_sum", "n_symbols", "n_bullet_lines",
            "n_ellipsis_lines", "n_lines")
  }

  /** The C4 cleaning battery (Raffel et al. 2020, "Exploring the Limits
    * of Transfer Learning with a Unified Text-to-Text Transformer",
    * §2.2) — the rule set that produced C4 from Common Crawl, the
    * complement to [[gopherRules]]' statistical gates:
    *  - `n_sents` (period-delimited non-empty segments) >= minSents
    *    (paper: 3 sentences per page),
    *  - `n_words` >= minWords (paper: every retained line >= 3 words;
    *    applied at the document grain here),
    *  - no "lorem ipsum" placeholder text (case-insensitive),
    *  - no curly brace `{` (the paper's code-page marker),
    *  - `term_line_ratio`: share of newline-split lines ending in a
    *    terminal punctuation mark . ! ? " (the paper keeps only such
    *    lines; reported as a ratio so the caller can gate at any
    *    threshold — the fused keep uses > 0, i.e. at least one
    *    sentence-like line).
    * Same 100-TB shape as [[gopherRules]]: pure map-side scalar
    * expressions, zero shuffle, codegen-friendly. */
  def c4Rules(df: DataFrame, textCol: String,
              minSents: Long = 3L, minWords: Long = 5L): DataFrame = {
    val t = textCol
    df.withColumn("w", expr(s"filter(split($t, ' '), x -> x <> '')"))
      .withColumn("lines", expr(s"split($t, '\n')"))
      .withColumn("n_words", expr("size(w)").cast("long"))
      .withColumn("n_sents",
        expr(s"size(filter(split($t, '\\\\.'), x -> trim(x) <> ''))").cast("long"))
      .withColumn("has_lorem", lower(col(t)).contains("lorem ipsum"))
      .withColumn("has_brace", col(t).contains("{"))
      .withColumn("n_term_lines",
        expr("size(filter(lines, x -> x LIKE '%.' OR x LIKE '%!' OR " +
          "x LIKE '%?' OR x LIKE '%\"'))").cast("long"))
      .withColumn("n_lines", expr("size(lines)").cast("long"))
      .withColumn("term_line_ratio",
        when(col("n_lines") > 0,
          graft.queries.Det.dround(
            col("n_term_lines").cast("double") / col("n_lines"), 6)))
      .withColumn("keep", coalesce(
        col("n_sents") >= minSents &&
        col("n_words") >= minWords &&
        !col("has_lorem") && !col("has_brace") &&
        col("term_line_ratio") > 0.0, lit(false)))
      .drop("w", "lines", "n_term_lines", "n_lines")
  }

  /** Code keyword vocabulary for [[codeDetect]] — shared verbatim with
    * oracle generators. */
  val codeKeywords: Seq[String] =
    Seq("def", "class", "import", "return", "function", "var", "const",
        "void", "int", "public")

  /** Code-vs-prose detection — the corpus ROUTER in front of every
    * text-quality gate (C4/Gopher thresholds tuned for prose destroy
    * code, and vice versa; cf. the separate code pipelines in The Stack
    * / StarCoder data work): per doc,
    *  - `sym_ratio`: share of characters in the code-symbol class
    *    ;{}()[]<>=_ (prose sits well under 0.02, code well over),
    *  - `kw_hits`: DISTINCT [[codeKeywords]] appearing as whole tokens,
    *  - `is_code`: sym_ratio > symThresh OR kw_hits >= kwThresh.
    * Pure map-side scalar expressions, zero shuffle, codegen-friendly;
    * the regex is in the portable Java∩RE2 subset (the x6 discipline).
    * Emits (id…, n_chars, sym_ratio, kw_hits, is_code). */
  def codeDetect(df: DataFrame, textCol: String,
                 symThresh: Double = 0.05, kwThresh: Long = 2L): DataFrame = {
    val t = textCol
    val kws = codeKeywords.map(k => s"'$k'").mkString(", ")
    df.withColumn("n_chars", length(col(t)).cast("long"))
      .withColumn("n_sym",
        (length(col(t)) -
          length(regexp_replace(col(t), "[;{}()\\[\\]<>=_]", ""))).cast("long"))
      .withColumn("sym_ratio",
        when(col("n_chars") > 0,
          graft.queries.Det.dround(
            col("n_sym").cast("double") / col("n_chars"), 6)))
      .withColumn("kw_hits",
        expr(s"size(filter(array($kws), k -> " +
          s"array_contains(filter(split($t, ' '), x -> x <> ''), k)))")
          .cast("long"))
      .withColumn("is_code", coalesce(
        col("sym_ratio") > symThresh || col("kw_hits") >= kwThresh,
        lit(false)))
      .drop("n_sym")
  }
}

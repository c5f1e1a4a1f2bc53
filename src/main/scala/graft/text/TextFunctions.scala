package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword n-gram heuristic), quality scoring, token
  * counting (whitespace + BPE-ish regex), document fingerprinting.
  *
  * All are pure Column expressions over `functions._` — whole-stage
  * codegen applies, no UDFs, no shuffle; they scale embarrassingly to
  * any corpus size and push straight down onto a parquet scan.
  */
object TextFunctions {

  /** Whitespace-token count: number of \S+ runs. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0))).cast("long")

  /** BPE-ish token estimate: letter runs, single digits, single
    * punctuation marks — a cheap stand-in for a real BPE vocabulary
    * that needs no model file. */
  def bpeTokenEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}+|\\p{N}|[^\\s\\p{L}\\p{N}]"), lit(0))).cast("long")

  private val stopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|that|it)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|mit|ein)\\b",
    "es" -> "\\b(el|la|los|de|que|y|en|un)\\b",
    "fr" -> "\\b(le|la|les|et|est|que|dans|un)\\b")

  /** Per-language stopword hit count. */
  def stopwordHits(text: Column, lang: String): Column = {
    val pat = stopwords.toMap.apply(lang)
    size(regexp_extract_all(lower(text), lit(pat), lit(0))).cast("long")
  }

  /** Language-ID heuristic: argmax of stopword hits with a fixed
    * preference order (en > de > es > fr) on ties. */
  def langId(text: Column): Column = {
    val Seq(en, de, es, fr) = stopwords.map(s => stopwordHits(text, s._1))
    when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  /** Composite quality score in [0,1]-ish: penalizes very short docs,
    * extreme mean word length, punctuation-heavy and stopword-free
    * text. Deterministic double arithmetic (single expression tree). */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val punct = size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast("double")
    val stop = stopwordHits(text, "en").cast("double")
    val lenScore = least(toks / lit(20.0), lit(1.0))
    val wordLen = chars / greatest(toks, lit(1.0))
    val wordLenScore = when(wordLen >= 3.0 && wordLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
    val punctScore = lit(1.0) - least(punct / greatest(toks, lit(1.0)), lit(1.0))
    val stopScore = least(stop * lit(4.0) / greatest(toks, lit(1.0)), lit(1.0))
    round((lenScore * lit(0.3) + wordLenScore * lit(0.2) +
           punctScore * lit(0.2) + stopScore * lit(0.3)), 6)
  }

  /** Canonical whitespace-collapsed lowercase form. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Content fingerprint: md5 of the normalized text (stable across
    * whitespace/case variation — the rolling-hash fingerprint role). */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Token-budget truncation: the normalized text cut to its first
    * `maxTokens` whitespace tokens (the pre-packing length clamp of a
    * training pipeline — documents above a context budget truncate
    * at a word boundary, never mid-token). Pure Column expression,
    * map-only and codegen'd at any corpus size; the split binds once
    * per row (no HOF re-evaluation). */
  def truncateTokens(text: Column, maxTokens: Int): Column = {
    require(maxTokens >= 0, s"maxTokens must be >= 0, got $maxTokens")
    array_join(slice(split(normalized(text), " "), 1, maxTokens), " ")
  }

  /** Corpus n-gram vocabulary statistics: the top `k` word n-grams of
    * the normalized corpus by occurrence count, ties broken
    * lexicographically (a total order, so the cut at rank k is
    * engine-independent) — the tokenizer-/BPE-training corpus
    * statistics pass of a data pipeline. Counting is one map-side-
    * combined aggregate keyed on the n-gram; the final top-k plans as
    * TakeOrdered (per-partition heads + a k-row driver merge), so no
    * global sort materializes at corpus scale. The word array binds
    * to its own projection per the HOF-lambda rule. */
  def topNgrams(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      n: Int = 2, k: Int = 100): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    graft.core.Parallelism.ensure(df)
      .select(split(normalized(col(textCol)), " ").as("_w"))
      .select(explode(graft.dedup.Dedup.shinglesOfWords(col("_w"), n)).as("ngram"))
      .where(col("ngram") =!= "")
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }

  /** Repetition ratio: fraction of whitespace tokens that are repeats
    * of an earlier token, `1 - distinct/total` (0 for empty text) — a
    * standard training-data quality signal (boilerplate, keyword
    * stuffing, decoding loops score high). Pure Column expression,
    * map-only at any corpus size. */
  def repetitionRatio(text: Column): Column = {
    val toks = regexp_extract_all(text, lit("\\S+"), lit(0))
    val n = size(toks).cast("double")
    when(n <= 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / n)
  }

  /** PII patterns for the pre-training scrub — deliberately RE2-safe
    * (character classes, bounded repetition, word boundaries; no
    * backreferences or lookaround) so Java-regex Spark and RE2-family
    * engines match the SAME spans and the redaction is
    * engine-reproducible. */
  private[text] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"))

  /** PII-scrubbed text: emails, IPv4 addresses and xxx-xxx-xxxx phone
    * numbers replaced with typed placeholder tokens — the standard
    * redaction pass a pipeline runs before training. Replacement
    * order is fixed (email first: an address contains digit runs a
    * later pattern must not re-match). Map-only, whole-stage codegen. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, pat, token)) =>
      regexp_replace(acc, pat, token)
    }

  /** Count of matches for one PII class (`email` | `ip` | `phone`). */
  def piiCount(text: Column, kind: String): Column = {
    val pat = PiiPatterns.collectFirst { case (k, p, _) if k == kind => p }
      .getOrElse(throw new IllegalArgumentException(s"unknown PII kind '$kind'"))
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines: find
  * documents that share verbatim token n-grams with an evaluation
  * set, the standard test-set-leakage guard run before every
  * large-scale training job.
  *
  * Spark-first shape: both sides explode their DISTINCT n-gram sets
  * and equi-join — the shuffle is keyed on the n-gram's xxhash64 (the
  * string rides along and is compared too, so a 64-bit collision can
  * never fabricate a contamination pair), the benchmark side is tiny
  * in practice and broadcasts under AQE, and the doc side streams
  * map-only out of the scan (tokenize/slice/hash are all
  * whole-stage-codegen Column expressions — no UDF). At 100 TB the
  * cost is one shuffle of (docId, 8-byte hash, n-gram) rows, linear
  * in corpus token count. */
object Decontaminate {

  /** Distinct space-joined `n`-token windows of a TOKEN ARRAY column;
    * empty array when it has fewer than `n` tokens. Callers should
    * bind the tokenization to its own projection first (see
    * [[ngramSet]]) — referencing `split(...)` directly here would let
    * the lambda re-evaluate the regex once per n-gram position. */
  def ngramSetOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct space-joined `n`-token windows of `text` (whitespace
    * tokenization); empty array when the text has fewer than `n`
    * tokens. */
  def ngramSet(text: Column, n: Int): Column =
    ngramSetOfTokens(split(text, "\\s+"), n)

  /** Contaminated (doc, benchmark) pairs: documents sharing at least
    * `minShared` distinct `n`-grams with a benchmark text. Output:
    * `(doc_id, bench_id, n_shared)`. */
  def contaminationPairs(
      docs: DataFrame, bench: DataFrame, textCol: String,
      docIdCol: String, benchIdCol: String,
      n: Int = 5, minShared: Long = 1L): DataFrame = {
    def grams(df: DataFrame, idCol: String, outId: String) = df
      // tokenization bound to its own projection: the n-gram lambda
      // must see a materialized array, not re-run the regex per slice
      .select(col(idCol).as(outId), split(col(textCol), "\\s+").as("_toks"))
      .select(col(outId), explode(ngramSetOfTokens(col("_toks"), n)).as("_ng"))
      .select(col(outId), col("_ng"), xxhash64(col("_ng")).as("_h"))
    val dg = grams(docs, docIdCol, "doc_id")
    val bg = grams(bench, benchIdCol, "bench_id")
      .withColumnRenamed("_ng", "_bng").withColumnRenamed("_h", "_bh")
    dg.join(bg, col("_h") === col("_bh") && col("_ng") === col("_bng"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Per-document contamination summary: how many benchmark texts a
    * document collides with and the total distinct shared n-grams —
    * the frame a pipeline filters on before training. */
  def contaminationSummary(
      docs: DataFrame, bench: DataFrame, textCol: String,
      docIdCol: String, benchIdCol: String,
      n: Int = 5, minShared: Long = 1L): DataFrame =
    contaminationPairs(docs, bench, textCol, docIdCol, benchIdCol, n, minShared)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_benchmarks"), sum(col("n_shared")).as("n_shared_total"))
}

package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators: deterministic sequence packing
  * and hash-based dataset splits — the last mile between a cleaned
  * corpus and a training run. */
object Packing {

  /** Bucket width (documents per prefix-sum slice) for the packing
    * cumsum — same rationale as the interval sweeps: a global-order
    * window is a single-task ceiling; bucketing by `id DIV width`
    * with a tiny per-bucket carry keeps the plan fully parallel.
    * Overridable via `spark.bio.pack.idBucketWidth`. */
  private val DefaultIdBucketWidth = 1L << 16

  private def idBucketWidth(spark: SparkSession): Long = {
    val w = spark.conf.getOption("spark.bio.pack.idBucketWidth")
      .map(_.toLong).getOrElse(DefaultIdBucketWidth)
    require(w > 0, s"spark.bio.pack.idBucketWidth must be positive, got $w")
    w
  }

  /** Contiguous greedy sequence packing: documents in `idCol` order
    * are laid head-to-tail into a token stream and assigned to the
    * fixed-`budget` training bin where their FIRST token lands —
    * `bin = (running token count before the doc) DIV budget`, plus
    * the doc's offset within that stream. Deterministic (pure
    * function of the corpus), so shards can be rebuilt and resumed.
    *
    * The running count is a range-partitioned prefix sum: a window
    * per (idCol DIV width) bucket + a one-row-per-bucket carry frame
    * (sum of earlier buckets' tokens) broadcast back — no
    * global-order window, parallelism scales with corpus size.
    * Output: original columns + `n_tokens`, `stream_offset`, `bin`. */
  def packSequences(
      docs: DataFrame, textCol: String, idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val width = idBucketWidth(docs.sparkSession)
    val toks = TextFunctions.tokenCount(col(textCol))
    val bucketed = docs
      .withColumn("n_tokens", toks)
      .withColumn("_bkt", expr(s"CAST(`$idCol` AS BIGINT) DIV $width"))
    val wb = Window.partitionBy(col("_bkt")).orderBy(col(idCol))
    val wc = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("_lsum",
      coalesce(sum(col("n_tokens"))
        .over(wb.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // one row per bucket: carry-in = tokens in all earlier buckets
    val carry = bucketed.groupBy(col("_bkt"))
      .agg(sum(col("n_tokens")).as("_btoks"))
      .select(col("_bkt").as("_cb"),
        coalesce(sum(col("_btoks")).over(wc), lit(0L)).as("_carry"))
    local.join(broadcast(carry), col("_bkt") === col("_cb"))
      .withColumn("stream_offset", col("_lsum") + col("_carry"))
      .withColumn("bin", expr(s"stream_offset DIV $budget"))
      .drop("_bkt", "_cb", "_lsum", "_carry")
  }

  /** Deterministic hash split: assigns each row to a named dataset
    * slice by the md5 of its key — stable across runs, machines and
    * engines (no RNG), the standard leak-free train/val/test split.
    * `fractions` must sum to <= 1; rows hashing past the last
    * boundary fall into the final slice. */
  def hashSplit(
      df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      s"fractions must be non-empty and sum to <= 1: $fractions")
    // uniform in [0,1): first 15 hex digits of md5 (60 bits)
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
      .cast("double") / lit((1L << 60).toDouble)
    val bounds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    val expr0 = fractions.zip(bounds).reverse
      .foldLeft(lit(fractions.last._1)) { case (acc, ((name, _), hi)) =>
        when(u < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr0)
  }
}

package graft.vep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the e2e annotate pipeline (not
  * part of the library surface): times each candidate-generation and
  * assembly stage in isolation with a noop sink, twice, so the
  * per-variant-cost work targets the actual bottleneck instead of a guess.
  * Usage: runMain graft.vep.Profile /root/testdata/sf0.1 */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    import graft.Tables
    val vcf = Tables.vcf(spark, d)
    val cache = Tables.vepCache(spark, d)
    val tr = Tables.transcripts(spark, d)
    val ex = Tables.exons(spark, d)
    val sift = Tables.siftContext(spark, d)
    val pp = Tables.polyphenContext(spark, d)
    val reg = Tables.regulatory(spark, d)
    val mot = Tables.motifs(spark, d)

    def time(name: String)(df: => DataFrame): Unit = {
      for (rep <- 0 until 2) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name%-22s rep$rep: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    println(s"vcf rows: ${vcf.count()}  snv: ${vcf.where("length(ref)=1 and length(alt)=1").count()}")
    println(s"transcripts: ${tr.count()}  exons: ${ex.count()}")
    println(s"snv pairs: ${Splice.cdnaAnnotate(vcf, tr, ex).count()}")
    println(s"splice rows: ${Splice.spliceTerms(vcf, tr, ex).count()}")
    println(s"e2e out: ${Annotate.annotate(vcf, cache, tr, ex, sift, pp, reg, mot).count()}")

    time("snv_agg")(Splice.cdnaAnnotate(vcf, tr, ex).groupBy().count())
    time("codon")(Splice.splicedCodon(vcf, tr, ex))
    time("splice_terms")(Splice.spliceTerms(vcf, tr, ex))
    time("indel_hgvs")(Splice.indelHgvs(vcf, tr, ex))
    time("hgvsp_indel")(Hgvsp.hgvspIndel(vcf, tr, ex))
    time("lookup")(Vep.lookupVariants(vcf, cache))
    time("csq_assemble")(Splice.csqAssemble(vcf, tr, ex))
    time("e2e_full")(Annotate.annotate(vcf, cache, tr, ex, sift, pp, reg, mot))

    // job/stage census for one e2e run: with ~10K-row intermediates,
    // wall-clock here is scheduling + codegen overhead, so the lever
    // is the NUMBER of stages, not the bytes
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    Annotate.annotate(vcf, cache, tr, ex, sift, pp, reg, mot)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.removeSparkListener(listener)
    println(s"e2e jobs: ${jobs.get}  stages: ${stages.get}")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: cumulative timing of spanDedup's internal stages. */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        graft.Graft.shuffleWriterThreshold)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Graft.sparkLocalDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.install(spark)
    val docs = graft.Tables.t(spark, sfDir, "documents")
    import org.apache.spark.sql.graft.NativeTextExprs
    val k = 8
    def toks = docs.select(col("doc_id").as("g_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("g_toks"))
    def kg = toks.filter(size(col("g_toks")) >= k)
      .select(col("g_id"), posexplode(
        NativeTextExprs.spanWindowHashes(col("g_toks"), k)).as(Seq("g_pos", "g_h")))
    def timeIt(nm: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spanprobe] ${nm}%-16s min=${ts.min}%.3f reps=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    timeIt("toks")(toks)
    timeIt("kgrams")(kg)
    timeIt("dupcount") {
      kg.groupBy("g_h").agg(count(lit(1)).as("g_cnt"))
        .filter(col("g_cnt") >= 2).select("g_h")
    }
    timeIt("covered") {
      val kgc = kg
      val dup = kgc.groupBy("g_h").agg(count(lit(1)).as("g_cnt"))
        .filter(col("g_cnt") >= 2).select("g_h")
      kgc.join(dup, "g_h")
        .select(col("g_id"),
          explode(sequence(col("g_pos"), col("g_pos") + lit(k - 1))).as("g_cpos"))
        .groupBy("g_id")
        .agg(array_sort(collect_set(col("g_cpos"))).as("g_cov"))
    }
    timeIt("full") {
      graft.operators.Dedup.spanDedup(docs, "doc_id", "text", k = 8, minCount = 2)
    }
    spark.stop()
  }
}

package graft.tools

/** Design probe for the object-store cube (the manifest-reference carry
  * CubeGenerations' scaladoc names as the next step): can ONE parquet
  * relation serve bucket partitions referenced across SEVERAL immutable
  * generation directories — no union, partition pruning intact?
  * Measures three candidate mechanics on a real two-generation layout:
  *   (a) multi-path read with a shared basePath;
  *   (b) multi-path read, per-path Hive layout, no basePath;
  *   (c) N-way union of per-bucket scans (the fallback).
  * Prints which mechanics plan, their partition-pruning behavior
  * (files read under a bucket predicate) and row correctness.
  */
object MultiGenScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = "/root/repo/target/indexes/multigen_probe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // gen1 holds buckets 0..3, gen2 holds a REWRITTEN bucket 1 and a new
    // bucket 4 — the manifest would reference gen1/{0,2,3} + gen2/{1,4}
    (0 to 39).map(i => (i.toLong, i % 4, s"g1-$i")).toDF("id", "b", "v")
      .repartition(col("b")).write.partitionBy("b").parquet(s"$root/gen1")
    (0 to 19).map(i => (100L + i, if (i % 2 == 0) 1 else 4, s"g2-$i"))
      .toDF("id", "b", "v")
      .repartition(col("b")).write.partitionBy("b").parquet(s"$root/gen2")
    val refs = Seq(s"$root/gen1/b=0", s"$root/gen2/b=1",
      s"$root/gen1/b=2", s"$root/gen1/b=3", s"$root/gen2/b=4")
    val expectAll = 10 + 10 + 10 + 10 + 10
    val expectB1 = 10 // gen2's rewritten bucket only

    def files(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    def report(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val df = mk
        val n = df.count()
        val b1 = df.filter(col("b") === 1)
        val n1 = b1.count()
        val f1 = files(b1)
        val g2only = b1.filter(col("v").startsWith("g2")).count() == n1
        println(s"[probe] $name: rows=$n (want $expectAll) b=1 rows=$n1 " +
          s"(want $expectB1, all-gen2=$g2only) files-under-b=1-pred=$f1")
      } catch { case t: Throwable =>
        println(s"[probe] $name: FAILED ${t.toString.take(160)}")
      }

    report("basePath=root multi-path") {
      spark.read.option("basePath", root).parquet(refs: _*)
    }
    report("no basePath multi-path") {
      spark.read.parquet(refs: _*)
    }
    report("per-bucket union") {
      refs.map { p =>
        val b = p.substring(p.lastIndexOf("b=") + 2).toInt
        spark.read.parquet(p).withColumn("b", lit(b))
      }.reduce(_.unionByName(_))
    }
    spark.stop()
  }
}

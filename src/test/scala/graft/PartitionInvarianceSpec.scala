package graft

import org.scalatest.funsuite.AnyFunSuite

/** Results must be bit-identical under different shuffle partitionings —
  * the property every design choice for cross-engine parity rests on
  * (decimal-routed double sums, deterministic hash sampling, order-free
  * sketches, partitioning-free pack assignment). A query whose output
  * depends on partition count would pass a single-layout oracle run and
  * still be nondeterministic on a real cluster, where partition counts
  * change with data volume and AQE decisions.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark._

  // aggregation-, window-, and pipeline-heavy representatives; each
  // exercises a different order-sensitivity risk (double sums, percentile
  // interpolation, sketch merge order, prefix-sum packing, session
  // windows, LSH banding)
  private val names = Seq(
    "q01_pricing_summary", "q_percentile", "q_tfidf", "q_vocab",
    "q_dedup_minhash", "q_corpus_dedup", "q_seq_pack",
    "q_events_sessionize", "q_theta_setops", "q_rollup_quantile",
    "q_sample_importance", "q_bpe_encode", "q_pack_bpe", "q_quality_lm",
    "q_dedup_containment", "q_events_funnel_window", "q_events_retention",
    "q_bpe_ids", "q_ann_store")

  private def run(name: String, partitions: Int): Seq[String] = {
    spark.conf.set("spark.sql.shuffle.partitions", partitions)
    try SparkEntry.queries(name)(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", 4)
  }

  for (name <- names)
    test(s"$name is invariant to shuffle partition count (3 vs 17)") {
      val a = run(name, 3)
      val b = run(name, 17)
      assert(a.size == b.size, s"$name row count differs: ${a.size} vs ${b.size}")
      assert(a == b, s"$name rows differ between partitionings")
    }
}

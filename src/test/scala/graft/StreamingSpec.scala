package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.{Event, Session}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedTypeCounts over a stream matches the same transform over the batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 1, "view", 2.0),
      Event(3, ts(65), 2, "click", 3.0), Event(4, ts(70), 2, "click", 4.0),
      Event(5, ts(200), 1, "view", 5.0))

    val stream = MemoryStream[Event]
    val q = EventPipeline.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("wtc")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM wtc").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val want = EventPipeline.windowedTypeCounts(events.toDF()).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("streamed span-count ingest serves span dedup equal to the batch pass") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    import graft.operators.Dedup
    // the duplicated 8-gram spans batch 1 (docs 1,2) and batch 2 (doc 3):
    // only a store with cross-batch memory can see the duplication
    val b1 = Seq((1L, "a b c d e f g h i j"), (2L, "p q r s t u v w x y"))
    val b2 = Seq((3L, "z a b c d e f g h w"), (4L, "one two"))
    val dir = java.nio.file.Files.createTempDirectory("span_counts")
    val counts = dir.resolve("counts").toString
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Dedup.spanCountsIngest(batch, "doc_id", "text", k = 8, counts)
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (b1 ++ b2).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val served = rows(Dedup.spanDedupServe(all, "doc_id", "text", counts, k = 8))
    val batch = rows(Dedup.spanDedup(all, "doc_id", "text", k = 8))
    assert(served == batch)
    // and the cross-batch duplicate really was caught
    assert(served.exists { case (id, _, dropped) => id == 3L && dropped == 8L })
    // compaction merges the two batches' partials and serves identically
    def parquetFiles() = Option(new java.io.File(counts).listFiles())
      .toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val before = parquetFiles()
    Dedup.spanCountsCompact(spark, counts)
    assert(parquetFiles() < before, "compaction must shrink the file count")
    assert(rows(Dedup.spanDedupServe(all, "doc_id", "text", counts, k = 8)) == batch)
  }

  test("streamed IVF ingest builds the object-store index equal to the batch build") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    import graft.operators.{ArtifactStore, ManifestArtifactStore, Similarity}
    // ivfIngest IS the documented foreachBatch body — prove it through a
    // REAL stream onto a file:/// manifest root: each micro-batch lands
    // as one immutable published segment (the 100-TB streaming-ingest
    // deployment shape: no flock, no rename, readers never blocked)
    val embs = Tables.t(spark, sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 96)
    val cs = Similarity.trainKmeansCentroids(embs, "embedding", k = 4,
      iters = 1)
    val rows = embs.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val batches = rows.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2.toSeq)
    val dir = java.nio.file.Files.createTempDirectory("ivf_stream")
    val uri = "file://" + dir.resolve("store")
    val ckpt = dir.resolve("ckpt").toString
    val stream = MemoryStream[(Long, Array[Float])]
    val q = stream.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Similarity.ivfIngest(batch, "embedding", cs, uri)
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      for (b <- batches) { stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // one immutable segment per micro-batch, ingest-created kind metadata
    assert(ManifestArtifactStore.isManifestStore(uri.stripPrefix("file://")))
    assert(ArtifactStore.forPath(spark, uri).kindOf(uri).contains("ivf"))
    assert(ArtifactStore.forPath(spark, uri).snapshot(spark, uri)
      .dataPaths.size == batches.size, "one published segment per batch")
    val probeQ = rows.find(_._1 == 0L).get._2.toSeq
    def probe(path: String): Seq[(Long, Double)] =
      Similarity.ivfStoreProbe(spark, path, "vec_id", "embedding", probeQ,
          k = 10, cs, nprobe = cs.size)
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9) / 1e9))
        .toSeq
    val streamed = probe(uri)
    // batch-built twin over the same rows serves identically
    val pBatch = new java.io.File("/root/repo/target/indexes",
      "ivf_stream_twin_v1").getPath
    if (new java.io.File(pBatch).exists())
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(pBatch))
    Similarity.materializedIvfIndex(embs, "vec_id", "embedding", cs, pBatch)
    assert(streamed == probe(pBatch),
      "streamed store must serve exactly like the batch build")
    // post-stream maintenance under the same protocol: compaction folds
    // the per-batch segments back to one generation, serve unchanged
    Similarity.ivfCompact(spark, uri)
    assert(ArtifactStore.forPath(spark, uri).snapshot(spark, uri)
      .dataPaths.size == 1, "compaction must merge the segments")
    assert(probe(uri) == streamed)
  }

  test("funnel: strictly-after step ordering, hand-computed") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes all three — the click BEFORE the first view must not
      // count as step 1
      Event(1, ts(5), 1, "view", 0), Event(2, ts(3), 1, "click", 0),
      Event(3, ts(20), 1, "click", 0), Event(4, ts(25), 1, "purchase", 0),
      // u2 never views -> absent entirely
      Event(5, ts(1), 2, "click", 0), Event(6, ts(2), 2, "purchase", 0),
      // u3 views only
      Event(7, ts(4), 3, "view", 0)).toDF()
    val got = EventPipeline.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2)))
      .toSet
    assert(got == Set(
      (1L, 0, ts(5)), (1L, 1, ts(20)), (1L, 2, ts(25)),
      (3L, 0, ts(4))), got)
  }

  test("streaming funnel state matches the batch funnel across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    // funnel progress split across batches: u1 views in batch 1, converts
    // in batch 2 (the state must carry t0 across); u2's click precedes its
    // view, u4 converts outside the 30-minute window
    val b1 = Seq(
      Event(1, ts(5), 1, "view", 0), Event(2, ts(3), 2, "click", 0),
      Event(3, ts(8), 2, "view", 0), Event(4, ts(10), 4, "view", 0))
    val b2 = Seq(
      Event(5, ts(20), 1, "click", 0), Event(6, ts(25), 1, "purchase", 0),
      Event(7, ts(30), 2, "click", 0),
      Event(8, ts(35), 4, "click", 0), Event(9, ts(200), 4, "purchase", 0))
    val steps = Seq("view", "click", "purchase")
    val stream = MemoryStream[Event]
    val q = EventPipeline.funnelStream(stream.toDS(), steps,
        withinMinutes = Some(30))
      .writeStream.format("memory").queryName("fnl")
      .outputMode("update").start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // Update-mode sink: completion times only improve, so min per
      // (user, step) is the final state
      val got = spark.sql(
        """SELECT user_id, step, min(ts) AS ts FROM fnl
          |GROUP BY user_id, step""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSet
      val want = EventPipeline.funnel((b1 ++ b2).toDF(), "user_id",
          "event_type", "ts", steps, withinMinutes = Some(30))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2)))
        .toSet
      assert(got == want, s"stream $got != batch $want")
      // the window must have cut u4's purchase, u2's early click must not
      // count, and u1 must convert fully across the batch boundary
      assert(want == Set(
        (1L, 0, ts(5)), (1L, 1, ts(20)), (1L, 2, ts(25)),
        (2L, 0, ts(8)), (2L, 1, ts(30)),
        (4L, 0, ts(10)), (4L, 1, ts(35))), want)
    } finally q.stop()
  }

  test("funnel state TTL drops idle users at the event-time horizon") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val steps = Seq("view", "click")
    def run(ttl: Option[Long]): Set[(Long, Int)] = {
      val name = s"fnlttl${ttl.getOrElse(0L)}"
      val stream = MemoryStream[Event]
      val q = EventPipeline.funnelStream(
          stream.toDS().withWatermark("ts", "0 seconds"), steps,
          expireAfterMinutes = ttl)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // b1: user 7 views; b2 advances the watermark far past 7's
        // horizon via another user; b3 (no data for 7) fires the timeout;
        // b4: 7's click — with a 30-minute TTL the state was dropped, so
        // the click is a fresh funnel with no view and step 1 never
        // completes; without a TTL it converts
        stream.addData(Event(1, ts(5), 7, "view", 0)); q.processAllAvailable()
        stream.addData(Event(2, ts(100), 99, "view", 0)); q.processAllAvailable()
        stream.addData(Event(3, ts(101), 99, "view", 0)); q.processAllAvailable()
        stream.addData(Event(4, ts(105), 7, "click", 0)); q.processAllAvailable()
        spark.sql(s"SELECT user_id, step FROM $name").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
      } finally q.stop()
    }
    val withTtl = run(Some(30L))
    assert(withTtl.contains((7L, 0)) && !withTtl.contains((7L, 1)),
      s"TTL should have dropped user 7's state: $withTtl")
    val without = run(None)
    assert(without.contains((7L, 1)),
      s"without TTL the click must convert: $without")
  }

  test("retention horizon bounds state and matches the filtered batch triangle") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def at(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    val evs = Seq(
      Event(1, at(0, 10), 1, "view", 0), Event(2, at(1, 5), 1, "view", 0),
      Event(3, at(5, 0), 1, "view", 0),   // beyond the 2-day horizon
      Event(4, at(0, 30), 2, "view", 0), Event(5, at(2, 0), 2, "view", 0))
    val stream = MemoryStream[Event]
    val q = EventPipeline.retentionStream(stream.toDS(), period = "day",
        maxPeriods = Some(2))
      .writeStream.format("memory").queryName("reth")
      .outputMode("append").start()
    try {
      stream.addData(evs: _*); q.processAllAvailable()
      val got = spark.sql(
        """SELECT cohort_period, periods_since, count(*) AS n_users
          |FROM reth GROUP BY 1, 2""".stripMargin).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val want = EventPipeline.retention(evs.toDF(), "user_id", "ts", "day")
        .filter(col("periods_since") <= 2).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want, s"stream $got != batch-filtered $want")
      assert(!got.exists(_._2 > 2), s"beyond-horizon pair leaked: $got")
    } finally q.stop()
  }

  test("streaming retention pairs aggregate to the batch retention triangle") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def at(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d ${minute / 60}%02d:${minute % 60}%02d:00")
    // u1 active days 0,1,3 (twice on day 1 — must emit once); u2 day 1
    // only; u3 days 0 and 3, split across batches
    val b1 = Seq(
      Event(1, at(0, 10), 1, "view", 0), Event(2, at(1, 5), 1, "view", 0),
      Event(3, at(1, 50), 1, "click", 0), Event(4, at(1, 0), 2, "view", 0),
      Event(5, at(0, 30), 3, "view", 0))
    val b2 = Seq(
      Event(6, at(3, 10), 1, "view", 0), Event(7, at(3, 20), 3, "view", 0))
    val stream = MemoryStream[Event]
    val q = EventPipeline.retentionStream(stream.toDS(), period = "day")
      .writeStream.format("memory").queryName("ret")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // each (user, cohort, since) pair is emitted exactly once, so the
      // triangle is a plain grouped count over the sink
      val got = spark.sql(
        """SELECT cohort_period, periods_since, count(*) AS n_users
          |FROM ret GROUP BY 1, 2""".stripMargin).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val want = EventPipeline.retention((b1 ++ b2).toDF(), "user_id", "ts",
          period = "day").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == want, s"stream $got != batch $want")
      assert(want.exists { case (_, since, n) => since == 3 && n == 2L },
        s"expected two users retained at day 3: $want")
    } finally q.stop()
  }

  test("hopping-window stream aggregates equal the batch hop windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def at(d: Int, h: Int, m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-0$d $h%02d:$m%02d:00")
    val evs = Seq(
      Event(1, at(1, 10, 5), 1, "view", 2.0),
      Event(2, at(1, 10, 40), 2, "click", 1.0),
      Event(3, at(1, 11, 10), 1, "view", 3.0),
      Event(4, at(1, 11, 45), 3, "view", 1.0),
      Event(5, at(1, 15, 0), 1, "view", 1.0))
    val finalize1 = Event(6, at(1, 20, 0), 1, "view", 0.5)
    val finalize2 = Event(7, at(2, 0, 30), 1, "view", 0.0) // wm -> 22:30
    def hop(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))
    val stream = MemoryStream[Event]
    val q = hop(stream.toDF().withWatermark("ts", "2 hours"))
      .writeStream.format("memory").queryName("hopstream")
      .outputMode("append").start()
    try {
      // each batch's events advance the watermark for the NEXT trigger,
      // finalizing all hop windows of the earlier events
      stream.addData(evs: _*); q.processAllAvailable()
      stream.addData(finalize1); q.processAllAvailable()
      stream.addData(finalize2); q.processAllAvailable()
      val got = spark.sql(
        "SELECT ws, event_type, cnt, sum_value FROM hopstream").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      // batch twin over the finalized prefix (finalize2's own windows are
      // still open on the stream side, so it stays out of the batch input)
      val want = hop((evs :+ finalize1).toDF()).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == want, s"stream $got != batch $want")
      // hop semantics: every event lands in exactly two 1h/30m windows
      assert(got.toSeq.map(_._3).sum == 2L * (evs.size + 1), got.toString)
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped; batch re-run backfills them") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def at(h: Int, m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val onTime = Event(1, at(10, 0), 1, "view", 1.0)
    val advance = Event(2, at(15, 0), 1, "view", 1.0)  // watermark -> 13:00
    val kick = Event(3, at(15, 30), 1, "view", 1.0)
    val late = Event(4, at(10, 30), 2, "view", 1.0)    // behind the watermark
    val stream = MemoryStream[Event]
    val q = EventPipeline.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("latewin")
      .outputMode("append").start()
    try {
      // watermark updates apply on the NEXT trigger: batch 1 ingests and
      // advances, batch 2 finalizes + emits the 10:00 window
      stream.addData(onTime, advance); q.processAllAvailable()
      stream.addData(kick); q.processAllAvailable()
      def win10 = spark.sql(
        """SELECT cnt FROM latewin
          |WHERE ws = TIMESTAMP '2024-01-01 10:00:00'""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      assert(win10 == Seq(1L), s"10:00 window must finalize with 1 row: $win10")
      // the late event is older than the watermark: DROPPED — the window
      // is neither re-emitted nor its count revised
      stream.addData(late); q.processAllAvailable()
      assert(win10 == Seq(1L),
        s"late event must not revise or re-emit the finalized window: $win10")
      // exact late accounting = the documented batch backfill: the SAME
      // operator over the full store counts the late event
      val backfill = EventPipeline.windowedTypeCounts(
          Seq(onTime, advance, kick, late).toDF())
        .filter(col("ws") === at(10, 0)).collect()
      assert(backfill.map(_.getAs[Long]("cnt")).toSeq == Seq(2L),
        s"batch backfill must include the late event: ${backfill.mkString}")
    } finally q.stop()
  }

  test("retentionStream period edges follow the session time zone, matching batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try {
      def utc(s: String): Timestamp =
        Timestamp.from(java.time.Instant.parse(s))
      // in Asia/Kolkata (+05:30): e1 and e2 share local day Jan 2, e3 is
      // local Jan 3 — a fixed-UTC day floor would put e1 on Jan 1 and
      // shift the cohort down one period
      val evs = Seq(
        Event(1, utc("2024-01-01T19:00:00Z"), 1, "view", 0), // Kolkata Jan 2 00:30
        Event(2, utc("2024-01-02T10:00:00Z"), 1, "view", 0), // Kolkata Jan 2 15:30
        Event(3, utc("2024-01-02T19:30:00Z"), 1, "view", 0)) // Kolkata Jan 3 01:00
      val stream = MemoryStream[Event]
      val q = EventPipeline.retentionStream(stream.toDS(), period = "day")
        .writeStream.format("memory").queryName("rettz")
        .outputMode("append").start()
      try {
        stream.addData(evs: _*); q.processAllAvailable()
        val got = spark.sql("SELECT cohort_period, periods_since FROM rettz")
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
        val want = EventPipeline.retention(evs.toDF(), "user_id", "ts", "day")
          .select("cohort_period", "periods_since").collect()
          .map(r => (r.getInt(0), r.getInt(1))).toSet
        assert(got == want, s"stream $got != batch $want under Asia/Kolkata")
        val kolkataDay2 = java.time.LocalDate.of(2024, 1, 2).toEpochDay.toInt
        assert(got == Set((kolkataDay2, 0), (kolkataDay2, 1)),
          s"expected cohort on LOCAL Jan 2 with one retained local day: $got")
      } finally q.stop()
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("decontamination on a document stream matches the batch operator") {
    // stream-static shape: the benchmark shingle set is the static side of
    // the equi-join; the distinct-hit count runs as dropDuplicates state +
    // a plain streaming aggregation (count_distinct is not streamable)
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    import graft.operators.Dedup
    val bench = Seq(
      "what is the capital of france paris is the capital",
      "two plus two equals four in base ten arithmetic")
      .toDF("question")
    val docs = Seq(
      (1L, "trivia dump what is the capital of france paris is the capital end"),
      (2L, "two plus two equals four in base ten arithmetic obviously"),
      (3L, "completely clean document with no benchmark overlap at all yes"),
      // two distinct contaminated spans in one document
      (4L, "what is the capital of france paris is the capital and also " +
        "two plus two equals four in base ten arithmetic"))
    val stream = MemoryStream[(Long, String)]
    val q = Dedup.decontaminateStream(
        stream.toDF().select(col("_1").as("doc_id"), col("_2").as("text")),
        "doc_id", "text", bench, "question")
      .writeStream.format("memory").queryName("decon")
      .outputMode("complete").start()
    try {
      // two batches, so cross-batch duplicate shingle hits get deduped by
      // the streaming state, not within one microbatch
      stream.addData(docs.take(2): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM decon").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = Dedup.decontaminate(docs.toDF("doc_id", "text"),
          "doc_id", "text", bench, "question").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
      assert(want.map(_._1) == Set(1L, 2L, 4L)) // doc 3 is clean
    } finally q.stop()
  }

  test("text quality pipeline runs unchanged on a stream and matches batch") {
    // the corpus-ingest shape at 100 TB: quality scoring, language ID and
    // fingerprinting are pure codegen projections, so the SAME column
    // expressions run per-microbatch on a document stream with zero state —
    // no operator rewrite, no separate streaming implementation
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    import graft.functions.TextFunctions
    import graft.operators.Quality
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "foo bar foo bar foo bar foo bar"),
      (3L, "el rapido zorro marron salta sobre el perro"),
      (4L, ""),
      (5L, "### ... symbols ### everywhere ... ###"))
    def pipeline(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("doc_id"),
        TextFunctions.langId(col("_2")).as("lang"),
        Quality.meanWordLength(col("_2")).as("mwl"),
        Quality.alphaWordRatio(col("_2")).as("awr"),
        Quality.ngramRepetitionCols(col("_2"), n = 2).as("rep"),
        Quality.linearScore(col("_2")).as("model_score"),
        TextFunctions.fingerprint(col("_2")).as("fp"))
    val stream = MemoryStream[(Long, String)]
    val q = pipeline(stream.toDF())
      .writeStream.format("memory").queryName("textq")
      .outputMode("append").start()
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM textq").collect().map(_.toString).toSet
      val want = pipeline(docs.toDF()).collect().map(_.toString).toSet
      assert(got == want)
      assert(want.size == docs.size)
    } finally q.stop()
  }

  test("stateful sessionize emits closed sessions equal to the batch window version") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    // user 1: two sessions (gap 40min > 30min); user 2: one session
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(50), 1, "click", 3.0),
      Event(4, ts(0), 2, "view", 4.0), Event(5, ts(25), 2, "view", 5.0))

    val stream = MemoryStream[Event]
    val q = EventPipeline.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      // advance the watermark far enough to time out all open sessions
      stream.addData(Event(99, ts(600), 9, "click", 0.0))
      q.processAllAvailable()
      stream.addData(Event(100, ts(1200), 9, "click", 0.0))
      q.processAllAvailable()

      val got = spark.sql("SELECT user_id, start, end, nEvents, totalValue FROM sess")
        .as[Session].collect()
        .filter(_.user_id != 9)
        .map(s => (s.user_id, s.start, s.end, s.nEvents, s.totalValue)).toSet
      val want = EventPipeline.sessionizeBatch(events.toDF(), gapMinutes = 30)
        .select("user_id", "start", "end", "nEvents", "totalValue")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3), r.getDouble(4))).toSet
      assert(got == want)
      assert(want.size == 3, s"expected 3 sessions, got $want")
    } finally q.stop()
  }

  test("streaming dedup drops repeated fingerprints, matches batch dedup") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    // duplicate (user_id, value) payloads across distinct event ids
    val events = Seq(
      Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "click", 1.0),
      Event(3, ts(3), 2, "view", 2.0), Event(4, ts(4), 2, "view", 2.0),
      Event(5, ts(5), 2, "view", 3.0))
    val keys = Seq("user_id", "event_type", "value")

    val stream = MemoryStream[Event]
    val q = EventPipeline.dedupStream(stream.toDF(), keys)
      .writeStream.format("memory").queryName("dds")
      .outputMode("append").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, event_type, value FROM dds").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = EventPipeline.dedupStream(events.toDF(), keys)
        .select("user_id", "event_type", "value").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == want)
      assert(got.size == 3)
    } finally q.stop()
  }

  test("native session_window sessions agree with the custom sessionizer") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(60), 1, "click", 3.0), // 50 min gap: new session
      Event(4, ts(5), 2, "view", 4.0))

    val stream = MemoryStream[Event]
    val q = EventPipeline.sessionWindowAgg(stream.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("swa")
      .outputMode("complete").start()
    try {
      stream.addData(events: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getInt(3), r.getDouble(4))
      val got = spark.sql("SELECT * FROM swa").collect().map(key).toSet
      // same over the batch DataFrame (watermark no-ops)
      val batchSame = EventPipeline.sessionWindowAgg(events.toDF(), 30)
        .collect().map(key).toSet
      assert(got == batchSame)
      // correspondence with the custom sessionizer: same (user, start,
      // count, total); session_window.end = custom end + gap
      val custom = EventPipeline.sessionizeBatch(events.toDF(), 30)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1),
          new java.sql.Timestamp(r.getTimestamp(2).getTime + 30 * 60 * 1000L),
          r.getInt(3), r.getDouble(4))).toSet
      assert(got == custom)
      assert(got.size == 3)
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch range join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    // user 1: two views inside the hour before the purchase, one outside;
    // user 2: a view AFTER the purchase (must not match)
    val purchases = Seq(
      Event(10, ts(120), 1, "purchase", 9.0),
      Event(11, ts(100), 2, "purchase", 8.0))
    val views = Seq(
      Event(1, ts(30), 1, "view", 1.0),  // 90 min before: outside
      Event(2, ts(70), 1, "view", 2.0),  // 50 min before: match
      Event(3, ts(115), 1, "view", 3.0), // 5 min before: match
      Event(4, ts(110), 2, "view", 4.0)) // after user 2's purchase: no

    val ps = MemoryStream[Event]
    val vs = MemoryStream[Event]
    val q = EventPipeline.attributionJoin(ps.toDF(), vs.toDF())
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      ps.addData(purchases: _*)
      vs.addData(views: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
          r.getTimestamp(3), r.getDouble(4))
      val got = spark.sql("SELECT * FROM attrib").collect().map(key).toSet
      val want = EventPipeline.attributionJoin(
        purchases.toDF(), views.toDF()).collect().map(key).toSet
      assert(got == want)
      assert(want == Set(
        (1L, ts(120), 9.0, ts(70), 2.0),
        (1L, ts(120), 9.0, ts(115), 3.0)))
    } finally q.stop()
  }

  test("incremental rollup ingest merges to the same totals as batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ri_").toString
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.5), Event(2, ts(20), 2, "view", 2.5),
      Event(3, ts(65), 1, "click", 3.0), Event(4, ts(70), 3, "click", 4.0),
      Event(5, ts(200), 2, "view", 5.0), Event(6, ts(210), 2, "click", 6.0))

    val stream = MemoryStream[Event]
    val q = EventPipeline.rollupIngest(stream.toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      // two separate micro-batches -> two sets of partial rows per group
      stream.addData(events.take(3): _*); q.processAllAvailable()
      stream.addData(events.drop(3): _*); q.processAllAvailable()
    } finally q.stop()

    val got = EventPipeline.rollupServe(spark, s"$dir/data")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    val want = events.toDF()
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        percentile(col("value"), lit(0.5)).as("p50_value"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want)
    assert(got("click") == ((4L, 14.5, 3L, 3.5)))
    // streaming heavy hitters: user 1 clicked twice; users 3 and 2 once
    // (ties break on the item string) — merged across micro-batch partials
    val topUsers = EventPipeline.rollupServe(spark, s"$dir/data")
      .filter(col("event_type") === "click")
      .head().getSeq[org.apache.spark.sql.Row](5)
      .map(e => (e.getString(0), e.getLong(1)))
    assert(topUsers == Seq(("1", 2L), ("2", 1L), ("3", 1L)))

    // compaction collapses the multi-batch partials to one row per group,
    // and serving afterwards returns the identical answer. From r19 the
    // compaction is a GENERATION SWAP (CubeGenerations): the physical
    // reads below follow the CURRENT generation pointer — the pre-compact
    // generation is retained intact (keep-2) for in-flight readers
    import graft.cube.CubeGenerations
    val partialsBefore = spark.read.parquet(
      CubeGenerations.currentDir(s"$dir/data")).count()
    val compacted = EventPipeline.compactPartials(spark, s"$dir/data")
    assert(compacted.nonEmpty)
    val curGen = CubeGenerations.currentDir(s"$dir/data")
    assert(curGen != s"$dir/data",
      "compaction must publish a NEW generation, never rewrite in place")
    assert(spark.read.parquet(s"$dir/data").count() == partialsBefore,
      "the previous generation must be left whole for in-flight readers")
    val partialsAfter = spark.read.parquet(curGen).count()
    assert(partialsAfter < partialsBefore)
    val perGroup = spark.read.parquet(curGen)
      .groupBy("g_tbucket", "event_type").count()
      .collect().map(_.getLong(2))
    assert(perGroup.forall(_ == 1L))
    val served = EventPipeline.rollupServe(spark, s"$dir/data")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(served == want)
    // idempotent: nothing left to compact
    assert(EventPipeline.compactPartials(spark, s"$dir/data").isEmpty)
  }

  test("rollup ingest survives a restart from its checkpoint without double-counting") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_").toString
    val batch1 = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(20), 2, "view", 2.0))
    val batch2 = Seq(
      Event(3, ts(65), 1, "click", 3.0), Event(4, ts(70), 3, "view", 4.0))

    val stream = MemoryStream[Event]
    val q1 = EventPipeline.rollupIngest(stream.toDF(), s"$dir/data", s"$dir/ckpt")
    try {
      stream.addData(batch1: _*); q1.processAllAvailable()
    } finally q1.stop()

    // process crashes / redeploys: a NEW query resumes from the checkpoint
    stream.addData(batch2: _*)
    val q2 = EventPipeline.rollupIngest(stream.toDF(), s"$dir/data", s"$dir/ckpt")
    try q2.processAllAvailable() finally q2.stop()

    val got = EventPipeline.rollupServe(spark, s"$dir/data")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // exactly once: batch1 counted a single time despite the restart
    assert(got == Map("click" -> ((2L, 4.0)), "view" -> ((2L, 6.0))))
  }

  test("sessionizeBatch on the events table produces sane sessions") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val sessions = EventPipeline.sessionizeBatch(ev, gapMinutes = 30)
    val n = sessions.count()
    assert(n > 0 && n <= ev.count())
    val bad = sessions.filter(col("end") < col("start") || col("nEvents") <= 0).count()
    assert(bad == 0)
  }

  test("streaming ingest writes a time-bucketed cube layout") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val src = s"$tmp/src"; val dest = s"$tmp/dest"; val chk = s"$tmp/chk"
    new java.io.File(src).mkdirs()
    // stage the events parquet as the stream source
    Tables.events(spark, sf).write.mode("overwrite").parquet(src)
    val q = EventPipeline.ingestToCube(spark, src, dest, chk)
    try q.processAllAvailable() finally q.stop()
    val out = spark.read.parquet(dest)
    assert(out.count() == Tables.events(spark, sf).count())
    assert(out.columns.contains("g_tbucket"))
    val buckets = new java.io.File(dest).listFiles().map(_.getName).filter(_.startsWith("g_tbucket="))
    assert(buckets.nonEmpty, "expected partitioned output dirs")
  }
}

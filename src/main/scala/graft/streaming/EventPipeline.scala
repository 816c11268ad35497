package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming ingestion and aggregation over the `events` stream.
  *
  * Beyond-parity relative to the reference (which is batch-only and
  * delegates real-time ingest to Druid's realtime nodes — SURVEY.md §2.10):
  * here the same declarative transforms serve batch DataFrames and
  * streaming DataFrames, which is the Spark-native way to keep one code
  * path for both. Stateful sessionization uses
  * `flatMapGroupsWithState` with an event-time timeout — the
  * init/update/merge contract the reference expresses as its JS aggregate
  * triple (`JSAggGenerator.scala:93-104`), re-expressed on Spark state.
  */
object EventPipeline {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                     nEvents: Int, totalValue: Double)

  /** Tumbling-window per-type aggregate. Works unchanged on a batch or a
    * streaming DataFrame; on a stream the 2h watermark bounds state.
    *
    * LATE-DATA CONTRACT (StreamingSpec "late events beyond the watermark
    * are dropped..." locks it): in Append mode a window is finalized and
    * emitted once the watermark passes its end; an event arriving with
    * event time older than the watermark is DROPPED — the emitted counts
    * never include it and the window is never re-emitted. Exact late-data
    * accounting is a batch re-run of this same operator over the event
    * store (it is batch/stream polymorphic by construction) — the
    * backfill contract shared by [[funnelStream]], [[retentionStream]]
    * and [[sessionizeBatch]].
    */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Per-user session gap logic: events within `gapMinutes` of the previous
    * event belong to one session. Emits closed sessions.
    *
    * State = the open session per user; event-time timeout closes sessions
    * when the watermark passes start + gap. Scales with #concurrent users
    * (one state row each), not with event volume.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[Session]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val closed = state.get
        state.remove()
        Iterator(closed)
      } else {
        var open = state.getOption
        val closed = Seq.newBuilder[Session]
        for (e <- it.toSeq.sortBy(_.ts.getTime)) {
          open match {
            case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
              open = Some(s.copy(end = e.ts, nEvents = s.nEvents + 1,
                totalValue = s.totalValue + e.value))
            case Some(s) =>
              closed += s
              open = Some(Session(userId, e.ts, e.ts, 1, e.value))
            case None =>
              open = Some(Session(userId, e.ts, e.ts, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end.getTime + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Batch-mode sessionization of the same semantics, expressed with window
    * functions (for the differential test against the stateful version and
    * for backfills): a session starts where the gap from the previous event
    * exceeds the threshold.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapMs = gapMinutes * 60 * 1000L
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    events
      .withColumn("g_prev", lag(col("ts"), 1).over(byUser))
      .withColumn("g_new",
        (col("g_prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("g_prev")) > gapMs)
          .cast("int"))
      .withColumn("g_sess", sum(col("g_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "g_sess")
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).cast("int").as("nEvents"),
        sum(col("value")).as("totalValue"))
      .drop("g_sess")
  }

  /** Per-user sessions via Spark's native `session_window` — the built-in
    * alternative to the custom [[sessionize]] state machine. Same gap
    * semantics (events ≤ `gapMinutes` apart merge); `session_window.end`
    * is last-event + gap, where [[sessionizeBatch]] reports the last event
    * itself — StreamingSpec pins the exact correspondence. Prefer this
    * form when the aggregate is expressible declaratively: the state store
    * merges windows without user code, and batch/stream share the plan.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).cast("int").as("nEvents"),
        graft.Tables.dsum(col("value")).as("totalValue"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("nEvents"), col("totalValue"))

  /** Streaming exact deduplication: drop events whose content fingerprint
    * was already seen within the watermark horizon. `dropDuplicates` keeps
    * one state row per distinct key and the watermark bounds state size —
    * the streaming twin of [[graft.operators.Dedup.exactDedup]], and the
    * ingestion-time guard a training-data pipeline puts in front of the
    * corpus store. Works identically on a batch DataFrame (global dedup).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols)

  /** Watermarked stream-stream attribution join: every purchase picks up
    * each view by the same user within the preceding `withinMinutes` — the
    * streaming form of event attribution (which ad/click view led to this
    * purchase). The event-time range condition plus the watermarks let
    * Spark bound the join state: a buffered view can be dropped once the
    * watermark passes `v_ts + within` (no future purchase can match it), so
    * state scales with the event rate × window, not with history. On batch
    * DataFrames `withWatermark` is a no-op and this is a plain range
    * equi-join — one code path, both modes (oracle: `q_events_attrib`).
    */
  def attributionJoin(purchases: DataFrame, views: DataFrame,
                      withinMinutes: Int = 60): DataFrame = {
    val p = purchases
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", "2 hours")
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
      .withWatermark("v_ts", "2 hours")
    p.join(v,
        col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("p_ts"), col("p_value"),
        col("v_ts"), col("v_value"))
  }

  /** Incremental rollup maintenance from a stream: each micro-batch is
    * pre-aggregated to (time bucket × dims) partial rows with MERGEABLE
    * metrics — counts, DECIMAL sums, KMV distinct sketches, gated quantile
    * sketches, Misra-Gries heavy-hitter sketches — and unioned into the
    * rollup table's bucket partitions.
    * Readers merge partials exactly like [[graft.cube.RollupCube]] merges
    * lattice nodes (`sum(cnt)`, `sum(sum_value)`, `kmv_merge_estimate`,
    * `qsk_percentile`), so the store needs no read-modify-write: appending
    * partials IS the update, and a compaction (re-aggregating a partition
    * in place) is an optimization, not a correctness step. This is the
    * realtime-ingest role Druid's realtime nodes play for the reference, on
    * Structured Streaming.
    */
  def rollupIngest(events: DataFrame, destDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.graft.{FreqSketch, KmvSketch, QuantileSketch}
    events
      .withWatermark("ts", "2 hours")
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // each micro-batch appends into the CURRENT generation, under the
        // store root's maintenance lock (r19, CubeGenerations): without
        // it, a batch landing after a racing compactPartials' staging
        // read — in-place OR generational — is silently superseded by
        // the compaction's publish and its counts lost. The lock is a
        // local flock (µs per batch); the compaction holds it across
        // read+stage+publish, so late batches land in the new generation.
        graft.operators.Artifacts.maintenanceLocked(
            graft.cube.CubeGenerations.rootOf(destDir)) {
          batch
            .withColumn("g_tbucket",
              (year(col("ts")) - 1970) * 12 + month(col("ts")) - 1)
            .groupBy(col("g_tbucket"), col("event_type"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("value").cast("decimal(28,6)")).as("sum_value"),
              KmvSketch.kmvSketch(col("user_id")).as("user_kmv"),
              QuantileSketch.qskSketch(col("value")).as("value_qsk"),
              FreqSketch.freqSketch(col("user_id")).as("user_freq"))
            .write.mode("append").partitionBy("g_tbucket")
            .parquet(graft.cube.CubeGenerations.currentDir(destDir))
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Merged view of an incrementally-maintained rollup (see
    * [[rollupIngest]]): partial rows collapse to final per-group metrics.
    * The served median is exact below the quantile sketch's capacity and
    * NULL past it (the gated-refusal contract, never a silently
    * approximate number).
    */
  def rollupServe(spark: SparkSession, destDir: String): DataFrame = {
    import org.apache.spark.sql.graft.{FreqSketch, KmvSketch, QuantileSketch}
    // the shared file-status cache has no TTL by default: without this, a
    // serve AFTER further ingested micro-batches could silently miss the
    // newly appended partial files
    org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
    spark.read.parquet(graft.cube.CubeGenerations.currentDir(destDir))
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_value")).cast("double").as("sum_value"),
        KmvSketch.kmvMergeEstimate(col("user_kmv")).as("n_users"),
        QuantileSketch.qskPercentile(col("value_qsk"), 0.5).as("p50_value"),
        // streaming heavy hitters: top users per event type from the
        // incrementally-maintained Misra-Gries sketches (exact below k)
        slice(FreqSketch.freqMergeItems(col("user_freq")), 1, 3).as("top_users"))
  }

  /** Compact an incrementally-maintained rollup: collapse each bucket's
    * accumulated micro-batch partials to ONE final row per group (the
    * mergeable metrics make this safe at any time — see [[rollupIngest]]).
    * From r19 the rewrite is a GENERATION SWAP on the cube consistency
    * seam ([[graft.cube.CubeGenerations]]): quiet buckets are hard-linked
    * into a fresh `.gen-N` sibling, dirty buckets written merged, and the
    * store repoints atomically — a serve racing the compaction reads one
    * whole generation, an ingest batch racing it waits on the store's
    * maintenance lock and lands in whichever generation is current when
    * it commits (never superseded silently), and a crash mid-stage leaves
    * no visible change. Old generations collect past keep-2 + the
    * `spark.graft.artifact.gcGraceMs` age grace. At 100 TB this is the
    * steady-state maintenance loop: hot buckets accrue a partial per
    * micro-batch per shuffle partition, and a periodic compaction keeps
    * serve-time merge fan-in (and file counts) bounded without ever
    * blocking ingest correctness.
    * Returns the set of compacted buckets.
    */
  def compactPartials(spark: SparkSession, destDir: String): Seq[Int] = {
    import org.apache.spark.sql.graft.{FreqSketch, KmvSketch, QuantileSketch}
    import graft.cube.CubeGenerations
    graft.operators.Artifacts.maintenanceLocked(
        CubeGenerations.rootOf(destDir)) {
    org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
    val cur = CubeGenerations.currentDir(destDir)
    val partials = spark.read.parquet(cur)
    val dirty = partials
      .groupBy("g_tbucket", "event_type").count()
      .filter(col("count") > 1)
      .select("g_tbucket").distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (dirty.nonEmpty) {
      val next = CubeGenerations.nextDir(destDir)
      val dirtyDirs = dirty.map(b => s"g_tbucket=$b").toSet
      CubeGenerations.stageCarry(cur, next)(name =>
        name.startsWith("g_tbucket=") && !dirtyDirs.contains(name))
      partials
        .filter(col("g_tbucket").isin(dirty: _*))
        .groupBy("g_tbucket", "event_type")
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("sum_value")).as("sum_value"),
          KmvSketch.kmvUnion(col("user_kmv")).as("user_kmv"),
          QuantileSketch.qskUnion(col("value_qsk")).as("value_qsk"),
          FreqSketch.freqMerge(col("user_freq")).as("user_freq"))
        .repartition(col("g_tbucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("g_tbucket")
        .parquet(next)
      CubeGenerations.publish(destDir, next)
      org.apache.spark.sql.graft.FileListingCache.invalidateAll(spark)
      CubeGenerations.gc(spark, destDir)
    }
    dirty
    }
  }

  /** Continuous ingest of event files into a time-bucketed cube layout:
    * readStream → derive the partition column → writeStream partitioned
    * parquet with checkpointing. The streaming analog of
    * [[graft.cube.TpchCube.ensure]]'s batch materialization.
    */
  def ingestToCube(spark: SparkSession, srcDir: String, destDir: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val in = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(srcDir)
    in.withColumn("g_tbucket",
        ((year(col("ts")) - 1970) * 12 + month(col("ts")) - 1))
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("g_tbucket")
      .outputMode(OutputMode.Append)
      .start()
  }

  /** Cohort retention: users bucketed by the period of their FIRST event
    * (the cohort), counted once per later period they were active — the
    * classic retention triangle `(cohort_period, periods_since, n_users)`.
    * `period` is `"day"`, `"week"` or `"month"`. Two shuffles regardless
    * of history: a per-user min (map-side combined) and a distinct over
    * (user, period) pairs — never a per-user timeline array.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                period: String = "day"): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    def periodOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      period match {
        case "day"   => datediff(c.cast("date"), epoch).cast("int")
        case "week"  => floor(datediff(c.cast("date"), epoch) / 7).cast("int")
        case "month" => ((year(c) - 1970) * 12 + month(c) - 1).cast("int")
        case other => throw new IllegalArgumentException(
          s"period must be day/week/month, got $other")
      }
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("g_first"))
      .select(col(userCol), periodOf(col("g_first")).as("g_cohort"))
    val active = events
      .select(col(userCol), periodOf(col(tsCol)).as("g_m"))
      .distinct()
    active.join(first, Seq(userCol))
      .groupBy(col("g_cohort").as("cohort_period"),
        (col("g_m") - col("g_cohort")).as("periods_since"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered funnel analysis: for each user, the earliest time each step
    * of `steps` completed STRICTLY AFTER the previous step — the classic
    * product-analytics conversion query. Output: one row per (user,
    * completed step): `(userCol, step, ts)`; a user appears for steps
    * 0..j where j is how far they got.
    *
    * Shape at scale: k-1 user-keyed equi-joins over per-step MIN
    * aggregates — each pass shuffles user-level partials (map-side
    * combined), never raw events twice, and nothing collects a per-user
    * event array (the fold-over-sorted-events alternative holds a power
    * user's whole history in one task). Funnels are short (k ≤ ~5), so
    * the pass count is a constant; every join key is the user id —
    * co-partitioned end to end, AQE handles the skewed-user case.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             withinMinutes: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // optional conversion window: step k must land within `withinMinutes`
    // of step k-1 (strictly after either way)
    def inWindow(prev: org.apache.spark.sql.Column) = withinMinutes match {
      case Some(m) => col(tsCol) > prev &&
        unix_millis(col(tsCol)) - unix_millis(prev) <= m * 60000L
      case None => col(tsCol) > prev
    }
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("g_t0"))
    var out = acc.select(col(userCol), lit(0).as("step"),
      col("g_t0").as("ts"))
    for (k <- 1 until steps.size) {
      acc = events.filter(col(typeCol) === steps(k))
        .join(acc, Seq(userCol))
        .filter(inWindow(col(s"g_t${k - 1}")))
        .groupBy(col(userCol) +: (0 until k).map(i => col(s"g_t$i")): _*)
        .agg(min(col(tsCol)).as(s"g_t$k"))
      out = out.unionByName(acc.select(col(userCol), lit(k).as("step"),
        col(s"g_t$k").as("ts")))
    }
    out
  }

  /** Streaming twin of [[funnel]]: per-user step-min state folded per
    * micro-batch. State is exactly `steps.size` longs per user (the
    * earliest completion time of each step so far — `Long.MaxValue` =
    * not reached), so state scales with the user population, never with
    * event volume or history. Emits `(user_id, step, ts)` whenever a
    * step's completion time is first set or improves (Update semantics:
    * the latest — equivalently the MIN — row per (user, step) is the
    * answer, matching [[funnel]]'s output rows).
    *
    * Equal to the batch funnel when each user's events are processed in
    * event-time order across micro-batches (each batch is sorted
    * internally, so only CROSS-batch reordering matters): completion
    * times only ever decrease, and a step-j event at time t qualifies
    * against the running min of step j-1 over events with earlier
    * timestamps — which under in-order delivery equals the batch
    * funnel's global min whenever the strict `t > t_{j-1}` test can pass
    * (StreamingSpec pins the differential). A late event that would have
    * lowered an already-used predecessor time can under-count relative
    * to a batch backfill — re-run [[funnel]] over the store for exact
    * late-data accounting, the same batch-backfill contract as
    * [[sessionizeBatch]].
    *
    * `expireAfterMinutes` bounds state for an UNBOUNDED user population:
    * a user idle past the horizon (event time, measured against the
    * stream's watermark — the input must carry one) has their funnel
    * state dropped, so a later conversion restarts from scratch — the
    * product-analytics "conversion horizon" semantics, and the difference
    * between state that scales with ACTIVE users and state that scales
    * with all users ever seen. `None` keeps state forever (test/demo
    * scale, or bounded populations).
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   withinMinutes: Option[Long] = None,
                   expireAfterMinutes: Option[Long] = None): DataFrame = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val idx: Map[String, Int] = steps.zipWithIndex.toMap
    val k = steps.size
    val windowMs = withinMinutes.map(_ * 60000L)
    val ttlMs = expireAfterMinutes.map(_ * 60000L)

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[Seq[Long]]): Iterator[(Long, Int, Timestamp)] = {
      if (state.hasTimedOut) {
        state.remove()
        return Iterator.empty
      }
      val cur = state.getOption.map(_.toArray)
        .getOrElse(Array.fill(k)(Long.MaxValue))
      val before = cur.clone()
      var maxT = Long.MinValue
      for (e <- it.toSeq.sortBy(_.ts.getTime); j <- idx.get(e.event_type)) {
        val t = e.ts.getTime
        maxT = math.max(maxT, t)
        val qualifies =
          if (j == 0) true
          else cur(j - 1) != Long.MaxValue && t > cur(j - 1) &&
            windowMs.forall(w => t - cur(j - 1) <= w)
        if (qualifies && t < cur(j)) cur(j) = t
      }
      if (!java.util.Arrays.equals(before, cur)) state.update(cur.toSeq)
      ttlMs.foreach { ttl =>
        // clamp above the watermark: a badly late batch's maxT + ttl could
        // already be in the past, which Spark rejects
        if (maxT != Long.MinValue && state.exists)
          state.setTimeoutTimestamp(
            math.max(state.getCurrentWatermarkMs() + 1, maxT + ttl))
      }
      (0 until k).iterator
        .filter(j => cur(j) != Long.MaxValue && cur(j) != before(j))
        .map(j => (userId, j, new Timestamp(cur(j))))
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fold)
      .toDF("user_id", "step", "ts")
  }

  /** Streaming twin of [[retention]]: per-user state = the cohort period
    * (period of the user's first event) plus the `periods_since` deltas
    * already emitted, so each `(user, cohort_period, periods_since)` pair
    * is emitted exactly once and the retention triangle is a plain
    * `GROUP BY cohort_period, periods_since COUNT(*)` over the sink —
    * bit-equal to [[retention]]'s `n_users` (StreamingSpec pins it).
    * State per user is one int + one int per DISTINCT active period —
    * days of history at worst, so `maxPeriods` is the production bound:
    * activity beyond the horizon emits nothing and is never tracked
    * (state stays <= maxPeriods + 1 ints per user), matching the batch
    * triangle filtered to `periods_since <= maxPeriods` — retention
    * analyses always have a horizon; `None` tracks forever.
    *
    * Requires per-user event-time order ACROSS micro-batches for the
    * cohort to be final once set (within a batch order is irrelevant —
    * the batch min is taken). An out-of-order event that lands BEFORE
    * its user's recorded cohort cannot be merged (already-emitted deltas
    * would all shift) — it fails the stream loudly rather than diverge
    * silently; backfill with the batch [[retention]] in that case.
    */
  def retentionStream(events: Dataset[Event],
                      period: String = "day",
                      maxPeriods: Option[Int] = None): DataFrame = {
    import events.sparkSession.implicits._
    // period boundaries follow the SESSION time zone, exactly like the
    // batch twin's `cast(ts as date)` (which Spark evaluates in
    // spark.sql.session.timeZone) — a fixed-UTC floor would shift day/
    // week/month edges for any non-UTC session and the twins would
    // diverge on boundary-straddling events (TimezoneSpec locks the
    // differential). Captured once at operator-call time and shipped in
    // the closure; ZoneId is Serializable.
    val zone = java.time.ZoneId.of(
      events.sparkSession.conf.get("spark.sql.session.timeZone"))
    def localDate(t: Timestamp): java.time.LocalDate =
      t.toInstant.atZone(zone).toLocalDate
    val periodOf: Timestamp => Int = period match {
      case "day"  => t => localDate(t).toEpochDay.toInt
      case "week" => t => math.floorDiv(localDate(t).toEpochDay, 7L).toInt
      case "month" => t => {
        val d = localDate(t)
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      }
      case other => throw new IllegalArgumentException(
        s"period must be day/week/month, got $other")
    }

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[(Int, Seq[Int])]): Iterator[(Long, Int, Int)] = {
      val ps = it.map(e => periodOf(e.ts)).toSeq
      if (ps.isEmpty) Iterator.empty
      else {
        val (cohort, seen) = state.getOption.getOrElse((ps.min, Seq.empty[Int]))
        if (ps.min < cohort)
          throw new IllegalStateException(
            s"user $userId: event period ${ps.min} precedes the recorded " +
              s"cohort $cohort — retentionStream requires per-user " +
              "event-time-ordered micro-batches; backfill with batch retention")
        val seenSet = seen.toSet
        val fresh = ps.map(_ - cohort).distinct.filterNot(seenSet)
          .filter(d => maxPeriods.forall(d <= _))
        // a first batch always has a fresh delta (0), so the state is
        // guaranteed to be initialized on first contact
        if (fresh.nonEmpty) state.update((cohort, seen ++ fresh))
        fresh.iterator.map(d => (userId, cohort, d))
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
      .toDF("user_id", "cohort_period", "periods_since")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.QueryDef.sql
import graft.core.Tables
import graft.functions.{offset_by, seconds_of_day}

/** Reference-pipeline semantics (SURVEY §2 EP1/EP2) generalized onto the
  * driver `events` table: recency split, gap sessionization, adaptive
  * percentile thresholds, JSON props extraction, calendar offsets,
  * time-of-day codec, fixed-size chunking.
  *
  * All window work partitions by `user_id` — the same per-user partitioning
  * the reference gets from Dagster dynamic partitions — so at 100 TB each
  * user's timeline is one shuffle partition stream, never a global sort.
  */
object EventQueries {

  def all: Seq[QueryDef] = Seq(
    q16RecencySplit, q17Sessionize, q18Thresholds, q19JsonExtract,
    q20IntervalOffset, q21TimeOfDay, q22Chunking, q23TumblingWindow,
    q24SlidingWindow, q29AsOfJoin, q63Pivot, q133StreamSessions,
    q138FunnelSteps, q139RetentionCohorts, q151StreamIntervalJoin,
    q152StreamDedup, q156StreamOuterJoin, q157StreamTumbling,
    q188MadOutliers, q195DriftChiSq, q198ContribBound, q211RollingHll)

  /** Rolling 7-day distinct users from MERGED daily HLL sketches —
    * register-level mergeability doing the job a 7-day `count(DISTINCT)`
    * rescan cannot afford at 100 TB: each day is sketched ONCE (64
    * registers), and every window estimate is an element-wise max over
    * ≤ 7 register tables — the q136 sketch composed over time (the
    * Agarwal mergeable-summaries motivation, applied to the dashboard
    * query every event pipeline runs). The raw FFGM estimate rides the
    * q136 dyadic-sum determinism; `small_range` marks the regime where
    * the HLL paper prescribes the linear-counting correction
    * (raw_est ≤ 2.5·m with empty registers — a serving layer corrects
    * there; the flag is pure integer). Outside it, a measured 2× bound
    * vs the exact recount is pinned (observed ratios ≤ 1.31 at sf0.1).
    * Exact recount shuffles (user, day) DISTINCT pairs — bounded by the
    * 30-day×users grid, not events. */
  val q211RollingHll: QueryDef = sql(
    "q211_rolling_hll",
    """WITH ev AS (
      |  SELECT DISTINCT user_id,
      |         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS day
      |  FROM events),
      |days AS (SELECT DISTINCT day FROM ev),
      |h AS (SELECT day,
      |             ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|hll-v1'), 1, 12))::BIGINT AS h
      |      FROM ev),
      |r AS (SELECT day, h // 4398046511104 AS reg,
      |             CASE WHEN h % 4398046511104 = 0 THEN CAST(43 AS BIGINT)
      |                  ELSE 43 - length(bin(h % 4398046511104)) END AS rho
      |      FROM h),
      |roll AS (
      |  SELECT d.day AS wday, r.reg, CAST(max(r.rho) AS BIGINT) AS max_rho
      |  FROM r JOIN days d ON r.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day, r.reg),
      |e AS (SELECT wday, sum(power(2.0, -max_rho)) AS s, count(*) AS nreg
      |      FROM roll GROUP BY wday),
      |est AS (
      |  SELECT wday, CAST(floor(0.709 * 4096.0 / (s + (64 - nreg))) AS BIGINT) AS raw_est,
      |         CAST(64 - nreg AS BIGINT) AS n_empty
      |  FROM e),
      |ex AS (
      |  SELECT d.day AS wday, CAST(count(DISTINCT ev.user_id) AS BIGINT) AS exact_users
      |  FROM ev JOIN days d ON ev.day BETWEEN d.day - 6 AND d.day
      |  GROUP BY d.day)
      |SELECT est.wday AS day, est.raw_est, est.n_empty, ex.exact_users,
      |       CAST(CASE WHEN est.raw_est <= 160 AND est.n_empty > 0
      |                 THEN 1 ELSE 0 END AS INT) AS small_range,
      |       CAST(CASE WHEN est.raw_est <= 160 AND est.n_empty > 0 THEN 1
      |                 WHEN est.raw_est <= 2 * ex.exact_users
      |                  AND ex.exact_users <= 2 * est.raw_est THEN 1
      |                 ELSE 0 END AS INT) AS within_2x
      |FROM est JOIN ex USING (wday)
      |ORDER BY day""".stripMargin) { (s, d) =>
    import graft.operators.HllSketch
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        datediff(col("ts").cast("timestamp").cast("date"),
          lit("2024-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val days = ev.select(col("day")).distinct()
    val daily = HllSketch.registers(ev, "day", "user_id")
    val rolled = daily
      .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "wday"), "wday")
      .groupBy(col("wday"), col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))
    val est = HllSketch.rawEstimate(rolled, "wday")
    val exact = ev
      .withColumn("wday", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "wday"), "wday")
      .groupBy(col("wday"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "wday")
      .select(col("wday").as("day"), col("raw_est"), col("n_empty"),
        col("exact_users"),
        (col("raw_est") <= 160 && col("n_empty") > 0).cast("int")
          .as("small_range"),
        when(col("raw_est") <= 160 && col("n_empty") > 0, lit(1))
          .otherwise((col("raw_est") <= col("exact_users") * 2 &&
            col("exact_users") <= col("raw_est") * 2).cast("int"))
          .cast("int").as("within_2x"))
      .orderBy(col("day"))
  }

  /** Recency split vs per-user max timestamp (SURVEY §2.2 op 10,
    * assets/takeout.py:70-72): keep events within "-15d" of the user's
    * latest event — data-relative, not wall-clock. */
  val q16RecencySplit: QueryDef = sql(
    "q16_recency_split",
    """SELECT event_id, user_id, ts
      |FROM (SELECT event_id, user_id, ts,
      |             max(ts) OVER (PARTITION BY user_id) AS mx
      |      FROM events)
      |WHERE ts > mx - INTERVAL 15 DAY
      |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, d)
      .withColumn("mx", max(col("ts")).over(w))
      .filter(col("ts") > offset_by(col("mx"), "-15d"))
      .select(col("event_id"), col("user_id"), col("ts"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Gap-based sessionization (SURVEY §2.10; the reference's session merge
    * time-threshold semantic, op 62): 30-minute inactivity gap splits a
    * user's event stream into sessions. lag → flag → running sum → agg. */
  val q17Sessionize: QueryDef = sql(
    "q17_sessionize",
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                        + INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull
          || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        oround(sum(col("value")), 2).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Adaptive per-user thresholds (SURVEY §2.9 op 62 /
    * assets/recent_history.py:244-341): percentiles of inter-event gaps —
    * the 10th-pct gap drives session merging, 90th-pct drives similarity.
    * Integer epoch-millis gaps → exact percentile interpolation parity. */
  val q18Thresholds: QueryDef = sql(
    "q18_thresholds",
    """WITH gaps AS (
      |  SELECT user_id,
      |         CAST(epoch_ms(ts) - lag(epoch_ms(ts))
      |              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS gap_ms
      |  FROM events)
      |SELECT user_id,
      |       round(CAST(percentile_cont(0.1) WITHIN GROUP (ORDER BY gap_ms) AS DOUBLE), 3) AS p10_gap_ms,
      |       round(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY gap_ms) AS DOUBLE), 3) AS p90_gap_ms,
      |       count(gap_ms) AS n_gaps
      |FROM gaps
      |WHERE gap_ms IS NOT NULL
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("gap_ms",
        (epochMs(col("ts")) - lag(epochMs(col("ts")), 1).over(w)).cast("double"))
      .filter(col("gap_ms").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        oround(expr("percentile(gap_ms, 0.1)"), 3).as("p10_gap_ms"),
        oround(expr("percentile(gap_ms, 0.9)"), 3).as("p90_gap_ms"),
        count(col("gap_ms")).as("n_gaps"))
      .orderBy(col("user_id"))
  }

  /** JSON extraction from the `props` column (SURVEY §2.8 op 50 surface —
    * the well-formed-JSON half; noisy-text extraction is covered by the
    * ExtractJsonObjects expression + its spec). */
  val q19JsonExtract: QueryDef = sql(
    "q19_json_extract",
    """SELECT event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), oround(avg(k), 4).as("avg_k"))
      .orderBy(col("event_type"))
  }

  /** Polars offset-language arithmetic (SURVEY §2.8 op 41): "-15d", "-3mo",
    * "1h30m" applied via the PolarsOffset parser — calendar months clamp
    * exactly like `ts - INTERVAL n MONTH`. */
  val q20IntervalOffset: QueryDef = sql(
    "q20_interval_offset",
    """SELECT event_id, ts,
      |       ts - INTERVAL 15 DAY AS ts_m15d,
      |       ts - INTERVAL 3 MONTH AS ts_m3mo,
      |       ts + INTERVAL 90 MINUTE AS ts_p90m
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("ts"),
        offset_by(col("ts"), "-15d").as("ts_m15d"),
        offset_by(col("ts"), "-3mo").as("ts_m3mo"),
        offset_by(col("ts"), "1h30m").as("ts_p90m"))
      .orderBy(col("event_id"))
  }

  /** Time-of-day codec (SURVEY §1.2, §2.8 ops 40,42,45): HH:mm rendering,
    * seconds-of-day integers, and date+time reassembly into a timestamp. */
  val q21TimeOfDay: QueryDef = sql(
    "q21_time_of_day",
    """SELECT event_id,
      |       strftime(ts, '%H:%M') AS hhmm,
      |       CAST(ts AS DATE) AS d,
      |       CAST(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60 AS BIGINT) AS sec_of_day,
      |       CAST(CAST(CAST(ts AS DATE) AS VARCHAR) || ' ' || strftime(ts, '%H:%M') || ':00' AS TIMESTAMP) AS ts_rebuilt
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val ts = col("ts").cast("timestamp")
    Tables.events(s, d)
      .select(col("event_id"),
        date_format(ts, "HH:mm").as("hhmm"),
        to_date(ts).as("d"),
        seconds_of_day(date_format(ts, "HH:mm")).cast("long").as("sec_of_day"),
        to_timestamp(concat(to_date(ts).cast("string"), lit(" "), date_format(ts, "HH:mm"), lit(":00")))
          .as("ts_rebuilt"))
      .orderBy(col("event_id"))
  }

  /** Fixed-size chunking within (user, day) groups (SURVEY §2.4 op 28 —
    * the reference's 15-row LLM prompt chunks): row_number → chunk id. */
  val q22Chunking: QueryDef = sql(
    "q22_chunking",
    """WITH numbered AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d, ts, event_id,
      |         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT user_id, d, CAST(floor((rn - 1) / 15) AS BIGINT) AS chunk_id,
      |       count(*) AS n_rows, min(ts) AS chunk_start, max(ts) AS chunk_end
      |FROM numbered
      |GROUP BY user_id, d, chunk_id
      |ORDER BY user_id, d, chunk_id""".stripMargin) { (s, d) =>
    val day = col("ts").cast("timestamp")
    val w = Window.partitionBy(col("user_id"), col("d")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("d", to_date(day))
      .withColumn("rn", row_number().over(w))
      .withColumn("chunk_id", floor((col("rn") - 1) / 15).cast("long"))
      .groupBy(col("user_id"), col("d"), col("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ts")).as("chunk_start"), max(col("ts")).as("chunk_end"))
      .orderBy(col("user_id"), col("d"), col("chunk_id"))
  }

  /** Tumbling event-time windows — batch twin of StreamOps.tumblingAgg
    * (StreamingSpec asserts stream == batch on identical input). */
  val q23TumblingWindow: QueryDef = sql(
    "q23_tumbling_window",
    """SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
      |       time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
      |       event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), oround(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Sliding windows (10 min / 5 min) — every event lands in exactly two
    * windows; the oracle materializes both via unnest. Batch twin of
    * StreamOps.slidingAgg. */
  val q24SlidingWindow: QueryDef = sql(
    "q24_sliding_window",
    """WITH starts AS (
      |  SELECT event_type,
      |         unnest([time_bucket(INTERVAL 5 MINUTE, ts),
      |                 time_bucket(INTERVAL 5 MINUTE, ts) - INTERVAL 5 MINUTE]) AS window_start
      |  FROM events)
      |SELECT window_start, window_start + INTERVAL 10 MINUTE AS window_end,
      |       event_type, count(*) AS n
      |FROM starts
      |GROUP BY 1, 2, 3
      |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** As-of join: each click enriched with the user's most recent purchase
    * at-or-before it (AsOfJoin operator: union + carry-forward window, one
    * shuffle, no pair blowup). Oracle = correlated argmax subqueries.
    * Epoch-micros keys keep the comparison exact on both engines. */
  val q29AsOfJoin: QueryDef = sql(
    "q29_asof_join",
    """SELECT c.event_id, c.user_id,
      |       (SELECT epoch_us(p.ts) FROM events p
      |        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      |          AND p.ts <= c.ts
      |        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_us,
      |       (SELECT p.value FROM events p
      |        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
      |          AND p.ts <= c.ts
      |        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS purchase_value
      |FROM events c
      |WHERE c.event_type = 'click'
      |ORDER BY c.event_id""".stripMargin) { (s, d) =>
    import graft.operators.AsOfJoin
    val ev = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id").as("p_event_id"),
        col("us").as("purchase_us"), col("value").as("purchase_value"))
    AsOfJoin.join(clicks, purchases, Seq("user_id"),
        leftTs = "us", rightTs = "us",
        payload = Seq("purchase_us", "purchase_value"),
        rightTiebreak = Some("p_event_id"))
      .select(col("event_id"), col("user_id"), col("purchase_us"), col("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Pivot (long→wide): per-user event-type counts as columns. Oracle =
    * FILTERed counts, the portable formulation of the same rotation. */
  val q63Pivot: QueryDef = sql(
    "q63_pivot",
    """SELECT user_id,
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'error') AS error,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy(col("user_id"))
  }

  /** Stateful streaming sessionization driver-checked END TO END (SURVEY
    * §2.10; the incremental twin of q17): the events table replays through
    * a file-source micro-batch stream into `StatefulSessionize`
    * (`flatMapGroupsWithState`, EventTimeTimeout), the real incremental
    * path a 100 TB deployment would run instead of re-sessionizing the
    * full history each tick. Determinism of the emitted set — the part a
    * stream normally can't promise — comes from two watermark-advancing
    * sentinel batches appended after the corpus: the first jumps the
    * watermark past every real session's timeout, the second is a DATA
    * batch processed at that advanced watermark, so every open session is
    * evicted through the state-timeout path regardless of whether the
    * engine schedules a no-data batch. Emitted set ≡ batch sessionization
    * exactly (successor-closed sessions from batch 0, each user's last via
    * timeout), so DuckDB replays it scratch-free with q17's gap SQL plus
    * the per-session ordered event-id digest the aggregate form can't
    * carry (the reference keeps session members for the LLM prompt,
    * assets/recent_history.py:244-341). */
  val q133StreamSessions: QueryDef = sql(
    "q133_stream_sessions",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                        + INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |sessions AS (
      |  SELECT user_id, event_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |       epoch_us(min(ts)) AS start_us,
      |       epoch_us(max(ts)) AS end_us,
      |       count(*) AS n_events,
      |       md5(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)) AS ids_md5
      |FROM sessions
      |GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin) { (s, d) =>
    import graft.streaming.StatefulSessionize
    val gapUs = 30L * 60 * 1000000
    val tmp = graft.core.Scratch.tempDir("q133stream")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"))
    ev.write.parquet(inDir)
    val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
    // schema of the files just written from `ev` — no inference job
    val schema = graft.streaming.StreamOps.stagedSchema(ev)
    graft.streaming.StreamOps.withStatePartitions(s, 8) { ss =>
      val stream = StatefulSessionize.fromEventsFrame(
        ss.readStream.schema(schema).parquet(inDir))
      val q = StatefulSessionize.sessionize(stream, gapUs)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      def sentinel(uid: Long, plusMs: Long): Unit = {
        import s.implicits._
        Seq((uid, new java.sql.Timestamp(mx.getTime + plusMs), -1L))
          .toDF("user_id", "ts", "event_id")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      sentinel(-1L, 315360000000L) // +10y: watermark passes every real timeout
      sentinel(-2L, 315360001000L) // data batch AT that watermark: evicts all
      q.stop()
    }
    s.read.parquet(outDir)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"),
        md5(concat_ws(",", expr("transform(event_ids, x -> CAST(x AS STRING))")))
          .as("ids_md5"))
      .orderBy(col("user_id"), col("start_us"))
  }

  /** Stream-stream interval join driver-checked END TO END (SURVEY §2.10;
    * q133's mechanism applied to the second stateful streaming operator):
    * the events table replays through TWO file-source micro-batch streams
    * (clicks and purchases) into `StreamOps.intervalJoin` — each click
    * paired with the same user's purchases within [click, click + 30 min].
    * Both sides are watermarked and the join carries the time-range
    * condition, so buffered state is bounded on each side — the
    * unbounded-state trap this operator exists to avoid at 100 TB. An
    * INNER time-interval join emits matches eagerly (watermarks only gate
    * state eviction), so AvailableNow + processAllAvailable drains the
    * complete result with no sentinel batches. DuckDB replays the join
    * scratch-free; StreamingSpec separately pins stream ≡ batch on the
    * same operator. */
  val q151StreamIntervalJoin: QueryDef = sql(
    "q151_stream_interval_join",
    """SELECT c.user_id, c.event_id AS l_event_id, p.event_id AS r_event_id,
      |       epoch_us(CAST(c.ts AS TIMESTAMP)) AS l_us,
      |       epoch_us(CAST(p.ts AS TIMESTAMP)) AS r_us
      |FROM events c JOIN events p
      |  ON p.user_id = c.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY c.user_id, l_event_id, r_event_id""".stripMargin) { (s, d) =>
    import graft.streaming.StreamOps
    val tmp = graft.core.Scratch.tempDir("q151stream")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    ev.write.parquet(inDir)
    // schema of the files just written from `ev` — no inference job
    val schema = graft.streaming.StreamOps.stagedSchema(ev)
    def joinedOn(sess: org.apache.spark.sql.SparkSession) = {
      def src() = sess.readStream.schema(schema).parquet(inDir)
      StreamOps.intervalJoin(
        src().filter(col("event_type") === "click"),
        src().filter(col("event_type") === "purchase"),
        horizon = "30 MINUTES")
        .select(col("user_id"), col("l_event_id"), col("r_event_id"),
          unix_micros(col("l_ts")).as("l_us"), unix_micros(col("r_ts")).as("r_us"))
    }
    StreamOps.withStatePartitions(s, 8) { ss =>
      val q = joinedOn(ss)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    // explicit schema: a zero-match run writes no parquet files, and a
    // schema-inferring read would then fail instead of returning 0 rows
    s.read.schema(joinedOn(s).schema).parquet(outDir)
      .orderBy(col("user_id"), col("l_event_id"), col("r_event_id"))
  }

  /** LEFT-OUTER stream-stream interval join driver-checked END TO END —
    * the watermark-driven mechanism q151's inner join never exercises:
    * an unmatched click emits its null-padded row only after the
    * watermark passes `click.ts + horizon` AND a subsequent batch evicts
    * its buffered state. Determinism of the emitted set comes from
    * q133's sentinel mechanism: after the corpus drains, two
    * watermark-advancing sentinel batches (each carrying a far-future
    * click AND purchase so BOTH sources advance) flush every unmatched
    * left row through the state-expiry path. Emitted set ≡ the batch
    * left join exactly, which DuckDB replays scratch-free. */
  val q156StreamOuterJoin: QueryDef = sql(
    "q156_stream_outer_join",
    """SELECT c.user_id, c.event_id AS l_event_id, p.event_id AS r_event_id,
      |       epoch_us(CAST(c.ts AS TIMESTAMP)) AS l_us,
      |       epoch_us(CAST(p.ts AS TIMESTAMP)) AS r_us
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON p.user_id = c.user_id
      | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY c.user_id, l_event_id, r_event_id""".stripMargin) { (s, d) =>
    import graft.streaming.StreamOps
    val tmp = graft.core.Scratch.tempDir("q156stream")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    ev.write.parquet(inDir)
    val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
    // schema of the files just written from `ev` — no inference job
    val schema = graft.streaming.StreamOps.stagedSchema(ev)
    def joinedOn(sess: org.apache.spark.sql.SparkSession) = {
      def src() = sess.readStream.schema(schema).parquet(inDir)
      StreamOps.intervalJoin(
        src().filter(col("event_type") === "click"),
        src().filter(col("event_type") === "purchase"),
        horizon = "30 MINUTES", joinType = "left_outer")
        .select(col("user_id"), col("l_event_id"), col("r_event_id"),
          unix_micros(col("l_ts")).as("l_us"), unix_micros(col("r_ts")).as("r_us"))
    }
    StreamOps.withStatePartitions(s, 8) { ss =>
      val q = joinedOn(ss)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      def sentinel(uidBase: Long, plusMs: Long): Unit = {
        import s.implicits._
        Seq((uidBase, new java.sql.Timestamp(mx.getTime + plusMs), uidBase, "click"),
            (uidBase - 1, new java.sql.Timestamp(mx.getTime + plusMs), uidBase - 1, "purchase"))
          .toDF("user_id", "ts", "event_id", "event_type")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      sentinel(-1L, 315360000000L) // +10y: watermark passes every real horizon
      sentinel(-3L, 315360001000L) // batch AT that watermark: evicts all state
      q.stop()
    }
    s.read.schema(joinedOn(s).schema).parquet(outDir)
      .filter(col("user_id") >= 0)
      .orderBy(col("user_id"), col("l_event_id"), col("r_event_id"))
  }

  /** Watermarked tumbling-window aggregation driver-checked END TO END in
    * APPEND mode — the watermark-gated emission q23's batch twin and the
    * StreamingSpec complete-mode assertion never exercise: an append-mode
    * window row emits only once the watermark passes window.end and a
    * later batch finalizes it. q133's two-sentinel mechanism drains every
    * real window; counts only (BIGINT) and epoch-us window bounds, so no
    * float sum or timestamp dtype crosses the oracle boundary (the
    * streaming sum's addition order differs from batch — integer counts
    * are order-independent, a raw double sum is not). */
  val q157StreamTumbling: QueryDef = sql(
    "q157_stream_tumbling",
    """SELECT epoch_us(time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP))) AS ws_us,
      |       epoch_us(time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP))
      |                + INTERVAL 10 MINUTE) AS we_us,
      |       event_type, count(*) AS n
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY ws_us, event_type""".stripMargin) { (s, d) =>
    import graft.streaming.StreamOps
    val tmp = graft.core.Scratch.tempDir("q157stream")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(s, d)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        col("value"))
    ev.write.parquet(inDir)
    val mx = ev.agg(max(col("ts"))).head.getTimestamp(0)
    // schema of the files just written from `ev` — no inference job
    val schema = graft.streaming.StreamOps.stagedSchema(ev)
    def aggOn(sess: org.apache.spark.sql.SparkSession) = StreamOps.tumblingAgg(
        sess.readStream.schema(schema).parquet(inDir))
      .select(unix_micros(col("window_start")).as("ws_us"),
        unix_micros(col("window_end")).as("we_us"),
        col("event_type"), col("n"))
    StreamOps.withStatePartitions(s, 8) { ss =>
      val q = aggOn(ss).writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      def sentinel(plusMs: Long): Unit = {
        import s.implicits._
        Seq((new java.sql.Timestamp(mx.getTime + plusMs), "zz_sentinel", 0.0))
          .toDF("ts", "event_type", "value")
          .write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
      sentinel(315360000000L) // +10y: watermark passes every real window end
      sentinel(315360001000L) // batch AT that watermark: finalizes all windows
      q.stop()
    }
    s.read.schema(aggOn(s).schema).parquet(outDir)
      .filter(col("ws_us") <= lit(mx.getTime * 1000L))
      .orderBy(col("ws_us"), col("event_type"))
  }

  /** Streaming exact dedup with bounded state, driver-checked END TO END
    * (the q133/q151 mechanism on `dropDuplicatesWithinWatermark`): the
    * events table is doubled (every row written twice to the staging dir)
    * and replayed through a file-source stream into
    * `StreamOps.dedupWithinWatermark` keyed by (user_id, event_id) —
    * duplicates arriving within the watermark horizon collapse to one
    * occurrence, and Spark evicts each key's state once the watermark
    * passes it (a plain streaming dropDuplicates keeps every key forever
    * — the unbounded-state trap). Only the KEY columns are emitted, so
    * the result is the deterministic distinct key set regardless of
    * which physical duplicate row survived — and carries no assumption
    * that event_id is globally unique; DuckDB replays it as SELECT
    * DISTINCT. StreamingSpec separately pins stream ≡ batch. */
  val q152StreamDedup: QueryDef = sql(
    "q152_stream_dedup",
    """SELECT DISTINCT user_id, event_id FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import graft.streaming.StreamOps
    val tmp = graft.core.Scratch.tempDir("q152stream")
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("event_id"))
    ev.unionAll(ev).write.parquet(inDir)
    // schema of the files just written from `ev` — no inference job
    val schema = graft.streaming.StreamOps.stagedSchema(ev)
    def outOn(sess: org.apache.spark.sql.SparkSession) =
      StreamOps.dedupWithinWatermark(
        sess.readStream.schema(schema).parquet(inDir),
        keys = Seq("user_id", "event_id"))
      .select(col("user_id"), col("event_id"))
    StreamOps.withStatePartitions(s, 8) { ss =>
      val q = outOn(ss)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable()
      q.stop()
    }
    s.read.schema(outOn(s).schema).parquet(outDir)
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Ordered conversion funnel — view → click → purchase with strict
    * temporal order per user (the product-analytics sequence operator):
    * stage 1 = the user's first view; stage 2 = first click strictly AFTER
    * that view; stage 3 = first purchase strictly after that click.
    * Output: one row per active user with the stage reached and the three
    * stage timestamps (−1 when not reached — nulls deliberately avoided in
    * hash-compared output).
    *
    * Scale shape: each stage is a per-user aggregate of a pushed-down
    * event_type scan joined back on user_id — three partial-aggregated
    * equi-joins, no window over the full event stream and no per-event
    * state. The reference's per-user-partition discipline applies: at
    * 100 TB each join shuffles (user, ts) pairs only. */
  val q138FunnelSteps: QueryDef = sql(
    "q138_funnel_steps",
    """WITH t1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2
      |  FROM events e JOIN t1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > t1.t1
      |  GROUP BY e.user_id),
      |t3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3
      |  FROM events e JOIN t2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      |  GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |SELECT u.user_id,
      |       CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
      |                 WHEN t2.t2 IS NOT NULL THEN 2
      |                 WHEN t1.t1 IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS stage,
      |       COALESCE(epoch_us(t1.t1), -1) AS t1_us,
      |       COALESCE(epoch_us(t2.t2), -1) AS t2_us,
      |       COALESCE(epoch_us(t3.t3), -1) AS t3_us
      |FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
      |       LEFT JOIN t3 USING (user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click").join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase").join(t2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("stage"),
        coalesce(unix_micros(col("t1")), lit(-1L)).as("t1_us"),
        coalesce(unix_micros(col("t2")), lit(-1L)).as("t2_us"),
        coalesce(unix_micros(col("t3")), lit(-1L)).as("t3_us"))
      .orderBy(col("user_id"))
  }

  /** Retention cohort grid — users cohorted by first-activity DAY, counted
    * as retained in each later WEEK offset they appear in (the standard
    * product-retention triangle, integer-only output).
    *
    * Scale shape: the cohort anchor is one per-user min; activity rows
    * join to it on user_id (partial-agg both sides), the grid is a
    * (cohort_day, week) count-distinct — two shuffles total, the grid
    * itself is days × offsets regardless of event volume. */
  val q139RetentionCohorts: QueryDef = sql(
    "q139_retention_cohorts",
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT e.user_id, f.d0,
      |         date_diff('day', f.d0, CAST(e.ts AS DATE)) // 7 AS wk
      |  FROM events e JOIN f USING (user_id))
      |SELECT CAST(d0 AS VARCHAR) AS cohort_day, CAST(wk AS BIGINT) AS week_offset,
      |       CAST(count(*) AS BIGINT) AS n_active
      |FROM a
      |GROUP BY d0, wk
      |ORDER BY cohort_day, week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
    val f = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("d0"))
    ev.join(f, "user_id")
      .select(col("user_id"), col("d0"),
        expr("datediff(CAST(ts AS DATE), d0) div 7").as("wk"))
      .distinct()
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("wk").cast("long").as("week_offset"))
      .agg(count(lit(1)).cast("long").as("n_active"))
      .orderBy(col("cohort_day"), col("week_offset"))
  }

  /** Robust per-type outlier gating — `operators.RobustStats.madSummary`:
    * lower median + MAD on the 1e-6 ppm integer grid, Hampel rule at
    * 3·MAD, argmax-deviation member pinned. Median/MAD use the LOWER
    * median (rank (n+1) div 2), so both engines select the identical
    * element — no middle-pair interpolation to drift. */
  val q188MadOutliers: QueryDef = sql(
    "q188_mad_outliers",
    """WITH e AS (
      |  SELECT event_id, event_type,
      |         CAST(round(value * 1000000) AS BIGINT) AS v
      |  FROM events),
      |r AS (
      |  SELECT event_type, event_id, v,
      |         row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (SELECT event_type, v AS med FROM r WHERE rn = (n + 1) // 2),
      |dv AS (SELECT r.event_type, r.event_id, abs(r.v - med.med) AS dev, med.med
      |       FROM r JOIN med USING (event_type)),
      |r2 AS (
      |  SELECT event_type, event_id, dev, med,
      |         row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn2,
      |         count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dv),
      |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn2 = (n + 1) // 2),
      |top AS (
      |  SELECT event_type, event_id AS out_id, dev AS out_dev,
      |         row_number() OVER (PARTITION BY event_type
      |                            ORDER BY dev DESC, event_id) AS rt
      |  FROM dv)
      |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(d.med) AS BIGINT) AS med_i,
      |       CAST(min(mad.mad) AS BIGINT) AS mad_i,
      |       CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_out,
      |       CAST(min(top.out_id) AS BIGINT) AS out_id,
      |       CAST(min(top.out_dev) AS BIGINT) AS out_dev
      |FROM dv d
      |JOIN mad USING (event_type)
      |JOIN (SELECT event_type, out_id, out_dev FROM top WHERE rt = 1) top
      |  USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_id"), col("event_type"),
      graft.functions.fixed_point(col("value"), 1e6).as("v"))
    graft.operators.RobustStats.madSummary(e, "event_type", "event_id", "v")
      .orderBy(col("event_type"))
  }

  /** Distribution-drift monitor — exact Pearson chi-square per category
    * between a reference window (early half of event time) and the
    * current window (late half), with a DETERMINISTIC injected drift in
    * the current stream (late clicks with event_id % 4 = 0 dropped) so
    * the monitor has a real signal to flag. Integer-exact:
    * `(o−e)²/e` with `e = ec·nl/ne` clears denominators to
    * `(o·ne − ec·nl)² / (ne·ec·nl)`, the square computed in
    * DECIMAL(38,0) ≡ HUGEINT (the q193 discipline) and reported in ppm
    * of a count unit.
    *
    * The drifted flag is the PRODUCTION two-condition rule: statistical
    * significance (contrib > χ²₁'s 3.84 critical) AND practical effect
    * (|category-share shift| > 25000 ppm, compared exactly via
    * cross-multiplication — no division). Neither alone is coherent
    * across scale: raw χ² over-fires at large N (at sf0.1 two
    * un-injected cells exceed 39 on ~1%-share wobbles) and under-fires
    * at small N; effect size alone over-fires at small N (an un-injected
    * cell wobbles to 34k ppm at sf0.001). The AND flags exactly the
    * injected cell at every sf. One groupBy onto |event_types| cells +
    * broadcast 1-row totals — the monitor never shuffles rows. */
  val q195DriftChiSq: QueryDef = sql(
    "q195_drift_chisq",
    """WITH e AS (SELECT event_type, event_id, epoch_ms(ts) AS ms FROM events),
      |b AS (SELECT (min(ms) + max(ms)) // 2 AS cut FROM e),
      |ref AS (SELECT event_type FROM e, b WHERE ms < cut),
      |cur AS (SELECT event_type FROM e, b
      |        WHERE ms >= cut AND NOT (event_type = 'click' AND event_id % 4 = 0)),
      |rc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ec FROM ref GROUP BY 1),
      |cc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS o FROM cur GROUP BY 1),
      |tt AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ref) AS ne,
      |              (SELECT CAST(count(*) AS BIGINT) FROM cur) AS nl),
      |s AS (
      |  SELECT rc.event_type, rc.ec, COALESCE(cc.o, 0) AS o, tt.ne, tt.nl,
      |         COALESCE(cc.o, 0) * tt.ne - rc.ec * tt.nl AS diff
      |  FROM rc LEFT JOIN cc USING (event_type), tt),
      |s2 AS (
      |  SELECT event_type, ec, o, ne, nl, diff,
      |         CAST((CAST(diff AS HUGEINT) * diff * 1000000)
      |              // (CAST(ne AS HUGEINT) * ec * nl) AS BIGINT) AS contrib_ppm
      |  FROM s)
      |SELECT event_type, ec AS early_n, o AS late_n,
      |       (ec * nl) // ne AS expected_late,
      |       (abs(diff) * 1000000) // (ne * nl) AS shift_abs_ppm,
      |       contrib_ppm,
      |       CAST(CASE WHEN contrib_ppm > 3840000
      |                  AND abs(diff) * 1000000 > 25000 * ne * nl
      |            THEN 1 ELSE 0 END AS INT) AS drifted
      |FROM s2
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_type"), col("event_id"),
      epochMs(col("ts")).as("ms"))
    val b = e.agg(expr("(min(ms) + max(ms)) div 2").as("cut"))
    val withCut = e.crossJoin(broadcast(b))
    val ref = withCut.filter(col("ms") < col("cut"))
    val cur = withCut.filter(col("ms") >= col("cut") &&
      !(col("event_type") === "click" && col("event_id") % 4 === 0))
    val rc = ref.groupBy(col("event_type")).agg(count(lit(1)).as("ec"))
    val cc = cur.groupBy(col("event_type")).agg(count(lit(1)).as("o"))
    val tt = rc.agg(sum(col("ec")).as("ne"))
      .crossJoin(cc.agg(sum(col("o")).as("nl")))
    rc.join(cc, Seq("event_type"), "left")
      .crossJoin(broadcast(tt))
      .select(col("event_type"), col("ec"), coalesce(col("o"), lit(0L)).as("o"),
        col("ne"), col("nl"))
      .withColumn("diff", col("o") * col("ne") - col("ec") * col("nl"))
      .withColumn("contrib_ppm", expr(
        "CAST((CAST(diff AS DECIMAL(38,0)) * diff * 1000000) div (ne * ec * nl) AS BIGINT)"))
      .select(col("event_type"), col("ec").as("early_n"), col("o").as("late_n"),
        expr("(ec * nl) div ne").as("expected_late"),
        expr("(abs(diff) * 1000000) div (ne * nl)").as("shift_abs_ppm"),
        col("contrib_ppm"),
        (col("contrib_ppm") > 3840000L &&
          abs(col("diff")) * 1000000L > lit(25000L) * col("ne") * col("nl"))
          .cast("int").as("drifted"))
      .orderBy(col("event_type"))
  }

  /** Per-user contribution bounding — the user-level-privacy
    * prerequisite (Wilson et al. 2020 "Differentially private SQL",
    * and the k-anonymity companion to q179): before any released
    * aggregate, each user's contribution is capped at K = 8 events,
    * selected by content-addressed md5 order (growth-stable: a user's
    * kept set never changes when OTHER users' events arrive). Released
    * per-type counts carry the audit columns: uncapped count, capped
    * count, contributing users, and the structural theorem
    * max-per-user-contribution ≤ K pinned at 1. One per-user rank
    * window + one aggregate; the cap bounds any single user's influence
    * on every downstream released number. */
  val q198ContribBound: QueryDef = sql(
    "q198_contrib_bound",
    """WITH e AS (
      |  SELECT event_type, user_id, event_id,
      |         row_number() OVER (PARTITION BY user_id
      |            ORDER BY md5(CAST(user_id AS STRING) || '|cb-v1|' || CAST(event_id AS STRING)), event_id) AS rk
      |  FROM events),
      |kept AS (SELECT * FROM e WHERE rk <= 8),
      |mx AS (
      |  SELECT CAST(max(c) AS BIGINT) AS max_contrib
      |  FROM (SELECT user_id, count(*) AS c FROM kept GROUP BY user_id)),
      |unc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_uncapped
      |        FROM e GROUP BY event_type),
      |cap AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_capped,
      |               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |        FROM kept GROUP BY event_type)
      |SELECT unc.event_type, unc.n_uncapped,
      |       CAST(COALESCE(cap.n_capped, 0) AS BIGINT) AS n_capped,
      |       CAST(COALESCE(cap.n_users, 0) AS BIGINT) AS n_users,
      |       mx.max_contrib,
      |       CAST(CASE WHEN mx.max_contrib <= 8 THEN 1 ELSE 0 END AS INT)
      |         AS cap_ok
      |FROM unc LEFT JOIN cap USING (event_type), mx
      |ORDER BY unc.event_type""".stripMargin) { (s, d) =>
    val e = Tables.events(s, d).select(col("event_type"), col("user_id"),
        col("event_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(
          md5(concat(col("user_id").cast("string"), lit("|cb-v1|"),
            col("event_id").cast("string"))), col("event_id"))))
    // ONE conditional aggregation replaces the old uncapped-agg ⋈
    // capped-agg join (two shuffles + a join), and mx's per-user
    // grouping rides the window's hash(user_id) exchange (no new
    // shuffle; ReusedExchange shares the windowed frame with the
    // per-type agg). The old kept.cache() was the 2× move the r14
    // profile found: the InMemoryRelation materialization is its own
    // job chain AND blocks exchange reuse — the q203 lesson repeated.
    // 12 jobs / ~3.2s warm → 7 jobs / ~1.1s at sf0.1.
    val keptFlag = col("rk") <= 8
    val mx = e.filter(keptFlag).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("max_contrib"))
    val perType = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n_uncapped"),
      count(when(keptFlag, 1)).as("n_capped"),
      countDistinct(when(keptFlag, col("user_id"))).as("n_users"))
    perType.crossJoin(broadcast(mx))
      .select(col("event_type"), col("n_uncapped"), col("n_capped"),
        col("n_users"), col("max_contrib"),
        (col("max_contrib") <= 8).cast("int").as("cap_ok"))
      .orderBy(col("event_type"))
  }
}

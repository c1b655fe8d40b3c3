package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: the operational queries a pipeline team
  * runs over the raw event log — volume anomaly detection for alerting,
  * and funnel conversion for product analytics. Batch complements of the
  * streaming jobs in [[graft.streaming.StreamingJobs]].
  */
object Events {

  /** Per-(type, day) event counts with a trailing-window baseline and an
    * anomaly status — "did any event type's daily volume jump or crater
    * vs its own recent history".
    *
    * Semantics: for each event type and calendar day, `baseline` is the
    * mean daily count over the previous `trailingDays` OBSERVED days
    * (days with zero events contribute no row and therefore no baseline
    * mass — documented, and the right bias for alerting: a silent day
    * should not drag the baseline toward zero). Days with fewer than
    * `minDays` observed predecessors report `warmup` and a null
    * baseline; otherwise `high` when n > factor·baseline, `low` when
    * n·factor < baseline, else `normal`.
    *
    * Scale shape: ONE shuffle — the (type, day) count with map-side
    * partials reduces the raw log to |types|·|days| rows; the trailing
    * window is partitioned by type over that tiny frame (parallel across
    * types, never a global sort of events). Arithmetic is engine-stable:
    * integer sums, one division, one multiply — no float accumulation.
    */
  def dailyAnomaly(events: DataFrame, tsCol: String = "ts",
                   typeCol: String = "event_type", trailingDays: Int = 7,
                   minDays: Int = 3, factor: Double = 2.0): DataFrame = {
    require(trailingDays >= 1 && minDays >= 1 && minDays <= trailingDays,
      s"need 1 <= minDays <= trailingDays, got $minDays/$trailingDays")
    require(factor > 1.0, s"factor must exceed 1, got $factor")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-trailingDays, -1)
    val trailingN = count(col("n")).over(win)
    val baseline = (sum(col("n")).over(win).cast("double") /
      trailingN.cast("double"))
    daily.select(col("event_type"), col("day"), col("n"),
        trailingN.as("trailing_days"),
        when(trailingN >= minDays, baseline).as("baseline"))
      .withColumn("status",
        when(col("trailing_days") < minDays, "warmup")
          .when(col("n").cast("double") > lit(factor) * col("baseline"), "high")
          .when(col("n").cast("double") * lit(factor) < col("baseline"), "low")
          .otherwise("normal"))
  }

  /** Cohort retention matrix: users grouped by the calendar day of
    * their FIRST event (their cohort), then counted per
    * (cohort_day, offset bucket) where the bucket is
    * `floor(days_since_first / bucketDays)` — the classic
    * "day-0 / week-1 / week-2 retention" table, generalized.
    *
    * Output: `(cohort_day, bucket, n_active, cohort_size, retention)`
    * with retention = n_active / cohort_size (bucket 0 is 1.0 by
    * construction — the first event itself). Buckets ≥ `maxBuckets`
    * are dropped.
    *
    * Scale shape: three user-keyed hash operations — min-day per user,
    * distinct (user, day) activity, and a user-keyed join between them
    * (co-partitioned, AQE folds the exchanges) — then a final count
    * aggregation over |cohorts|·|buckets| groups. The distinct
    * pre-collapse means the count is over (user, cohort, bucket) rows,
    * never raw events; nothing holds per-user history. Retention is
    * integer counts + ONE IEEE division — engine-stable.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketDays: Int = 7, maxBuckets: Int = 5): DataFrame = {
    require(bucketDays >= 1 && maxBuckets >= 1,
      s"need bucketDays >= 1 and maxBuckets >= 1, got $bucketDays/$maxBuckets")
    val act = events
      .select(col(userCol).as("__user"), col(tsCol).cast("date").as("__day"))
      .distinct()
    val cohorts = act.groupBy(col("__user"))
      .agg(min(col("__day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    act.join(cohorts, Seq("__user"))
      .select(col("cohort_day"),
        floor(datediff(col("__day"), col("cohort_day")) / bucketDays)
          .cast("int").as("bucket"),
        col("__user"))
      .filter(col("bucket") < maxBuckets)
      .distinct()
      .groupBy(col("cohort_day"), col("bucket"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("bucket"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }

  /** Ordered funnel conversion: of the users who performed `steps.head`,
    * how many went on to perform each subsequent step STRICTLY AFTER the
    * previous one, all within `withinHours` of their FIRST first-step
    * event. Output: one row per step — `(step_idx, step, n_users,
    * conversion)` with conversion relative to step 1.
    *
    * Shape: the classic iterative-semi-join funnel, not a per-user
    * event-list collect — the event log is filtered to one step at a
    * time and joined (on the user key) against the shrinking "reached
    * step i" frame, keeping `min(ts)` per user each round. k−1 joins of
    * an events subset against a ≤|users| frame; nothing ever holds a
    * user's full history in memory, so a power user with 10⁹ events
    * costs the same as anyone else. The final per-step counts are
    * 1-row aggregates equi-joined (hash, on a constant key) against the
    * step-1 count — no window, no cartesian.
    */
  /** Per-user trailing-window activity: for each user's active day, the
    * event count that day plus the count of events and of active days
    * over the trailing `windowDays` calendar days (RANGE frame on the
    * epoch-day number, so calendar gaps are respected — a ROWS frame
    * would silently span them).
    *
    * Scale shape: ONE shuffle — the (user, day) count with map-side
    * partials collapses the raw log to active-user-days — then a window
    * PARTITIONED BY user over each user's own day rows. Integer sums
    * only; engine-stable at any partitioning.
    */
  def rollingActivity(events: DataFrame, userCol: String, tsCol: String,
                      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive, got $windowDays")
    val daily = events
      .select(col(userCol).as("user_id"), col(tsCol).cast("date").as("day"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("__di", datediff(col("day"), lit("1970-01-01").cast("date")))
    val win = Window.partitionBy(col("user_id")).orderBy(col("__di"))
      .rangeBetween(-(windowDays - 1), 0)
    daily.select(col("user_id"), col("day"), col("n_events"),
      sum(col("n_events")).over(win).as("window_events"),
      count(lit(1)).over(win).as("window_days"))
  }

  /** Daily and trailing-window active users (DAU / WAU-style) for every
    * calendar day between the first and last observed activity:
    * `(day, dau, wau)` where `dau` is the count of users active that day
    * and `wau` the count of DISTINCT users active in the trailing
    * `windowDays` days.
    *
    * The naive form re-scans the activity set once per day (a range join
    * + COUNT DISTINCT — what the oracle does); this is the sweep form:
    * each user's activity days become non-overlapping coverage intervals
    * `[start, day + W)` via a lag window (a user covered by the previous
    * interval starts contributing where it ended), intervals become
    * ±1 deltas, and one running sum over the per-day delta frame yields
    * the distinct-user count for every day — the activity set is
    * touched exactly twice, never per-day.
    *
    * Scale shape: the distinct and the lag window are user-keyed (one
    * hash shuffle each); a single narrow explode then emits each row's
    * coverage deltas AND its DAU tick together, so the activity set is
    * read ONCE — the per-day aggregation collapses it to a
    * CALENDAR-BOUNDED frame (one row per touched day — thousands of
    * rows no matter how many events), which is `localCheckpoint`ed so
    * the spine/cumsum tail never re-runs the big upstream (the same
    * cut-the-lineage pattern as `Selection.byTokenBudget`; calling this
    * operator therefore eagerly runs the upstream job). The frame's
    * running-sum window is unpartitioned BY DESIGN — its input is
    * day-count-bounded — and is allowlisted in the plan guard. All
    * counts are integers — engine-stable.
    */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String,
                  windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be positive, got $windowDays")
    val epoch = lit("1970-01-01").cast("date")
    val ud = events
      .select(col(userCol).as("__user"),
        datediff(col(tsCol).cast("date"), epoch).as("__di"))
      .distinct()
    val byUser = Window.partitionBy(col("__user")).orderBy(col("__di"))
    val prev = lag(col("__di"), 1).over(byUser)
    // marginal new coverage [start, day + W): a day already covered by
    // the previous activity day's interval starts contributing where
    // that interval ends, so per-user intervals never overlap
    val withStart = ud.select(col("__di"),
      when(prev.isNull, col("__di"))
        .otherwise(greatest(col("__di"), prev + windowDays)).as("__start"))
    val marks = withStart.select(explode(array(
        struct(col("__start").as("__di"), lit(1L).as("__d"), lit(0L).as("__a")),
        struct((col("__di") + windowDays).as("__di"), lit(-1L).as("__d"),
          lit(0L).as("__a")),
        struct(col("__di").as("__di"), lit(0L).as("__d"), lit(1L).as("__a"))))
        .as("__m"))
      .select(col("__m.__di").as("__di"), col("__m.__d").as("__d"),
        col("__m.__a").as("__a"))
    val perDay = marks.groupBy(col("__di"))
      .agg(sum(col("__d")).as("__d"), sum(col("__a")).as("dau"))
      .localCheckpoint() // calendar-bounded: one row per touched day
    val bounds = perDay.filter(col("dau") > 0)
      .agg(min(col("__di")).as("__lo"), max(col("__di")).as("__hi"))
    val spine = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__di"))
    val cum = spine.join(perDay, Seq("__di"), "left")
      .withColumn("wau",
        sum(coalesce(col("__d"), lit(0L))).over(Window.orderBy(col("__di"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.select(date_add(epoch, col("__di")).as("day"),
      coalesce(col("dau"), lit(0L)).as("dau"), col("wau"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each ordered pair of event types, how often does `to_type`
    * immediately follow `from_type` in some user's stream, and what
    * fraction of `from_type`'s outgoing transitions does that represent
    * — the "what do users do next" table behind flow diagrams and
    * next-action baselines. A user's LAST event has no successor and
    * contributes no transition.
    *
    * `tieCols` must make (ts, tieCols) a total order within a user —
    * with equal timestamps and no tiebreak, `lead` would pick a
    * partition-order-dependent successor (same contract as
    * [[graft.operators.AsOf]]'s uniqueness requirement).
    *
    * Scale shape: ONE user-keyed shuffle for the lead window (each
    * user's stream sorts within its own partition), then a partial-agg'd
    * count down to |types|² rows; the share division runs on that tiny
    * frame, partitioned by from_type. Integer counts + one IEEE
    * division — engine-stable.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
    val counts = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
  }

  /** Time-decayed popularity: per key, `Σ 2^(−halvings(age))` over its
    * events — the "trending now" score where yesterday counts double
    * tomorrow's view of today. Ages are bucketed to whole half-lives
    * (`age_days div halfLifeDays`, clamped to `maxHalvings`), so every
    * weight is a power of two and the score accumulates as an EXACT
    * integer `Σ 2^(maxHalvings − halvings)` — no floating-point sum, no
    * partitioning sensitivity; the published `score` divides that
    * integer by `2^maxHalvings` once (cast + one IEEE division, both
    * deterministic).
    *
    * Scale shape: one tiny max(ts) aggregate (broadcast back), a narrow
    * weight projection, one partial-agg'd sum shuffle to |keys| rows.
    * Overflow headroom: `count_per_key · 2^maxHalvings < 2^63`, so the
    * default 30 halvings supports ~8.5e9 events per key; raise
    * resolution only with known key cardinalities. Events newer than
    * `asOf` clamp to age 0 (full weight).
    */
  def decayedCounts(events: DataFrame, keyCols: Seq[String], tsCol: String,
                    halfLifeDays: Int, maxHalvings: Int = 30): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    require(maxHalvings >= 1 && maxHalvings <= 62,
      s"maxHalvings must be in 1..62, got $maxHalvings")
    val asOf = events.agg(max(to_date(col(tsCol))).as("__asof"))
    // a null timestamp has no age: greatest(null, 0) skips the null and
    // would hand the row FULL weight — the opposite of what a decay
    // score means. Malformed feed → fail loudly (hashSplit convention).
    val aged = events.crossJoin(broadcast(asOf))
      .withColumn("__age",
        when(col(tsCol).isNull, raise_error(lit(
          s"decayedCounts: null $tsCol — age undefined")).cast("int"))
          .otherwise(greatest(
            datediff(col("__asof"), to_date(col(tsCol))), lit(0))))
      .withColumn("__halv", least(
        expr(s"CAST(__age AS BIGINT) div $halfLifeDays"),
        lit(maxHalvings.toLong)))
      .withColumn("__w", expr(s"shiftleft(1L, CAST($maxHalvings - __halv AS INT))"))
    aged.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("score_scaled"))
      .withColumn("score", col("score_scaled").cast("double") /
        lit((1L << maxHalvings).toDouble))
  }

  /** Stationary distribution of a Markov transition matrix by power
    * iteration — where does the event flow settle; the PageRank-shaped
    * fixed point over [[transitions]] output (or any edge frame whose
    * `pCol` rows sum to 1 per source).
    *
    * Distributed iterate: each step is one hash join (edges × current
    * vector on the source state) and one partial-agg'd sum per target
    * state — the state space never gathers on the driver, so the same
    * code runs the 5-type event chain and a million-page click graph.
    * Per-term products quantize to `decimal(28,15)` before summing
    * (LmScore's exact-accumulation convention: magnitude ≤ 1 keeps two
    * guard digits over the double's 17, so both engines round
    * identically and the grouped sum is partition-order-free).
    *
    * Semantics: plain power iteration, no teleport damping — a state
    * with no outgoing edges loses its mass (callers wanting PageRank
    * semantics add the damping row upstream); a state with no incoming
    * edges leaves the support after one step. Lineage is checkpointed
    * every 10 iterations so deep iterates don't stack plans.
    */
  def stationaryDistribution(edges: DataFrame, fromCol: String,
                             toCol: String, pCol: String,
                             iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val states = edges.select(col(fromCol).as("state"))
      .union(edges.select(col(toCol).as("state"))).distinct()
    val n = states.count()
    require(n > 0, "no states in the edge frame")
    // the vector's column is kept under an internal name so an edge
    // frame whose pCol is literally "p" (Events.transitions output)
    // never collides with it
    var v = states.withColumn("__vp", lit(1.0 / n.toDouble))
    for (i <- 1 to iterations) {
      v = edges.join(v, edges(fromCol) === v("state"))
        .select(col(toCol).as("state"),
          (col(pCol) * col("__vp")).cast("decimal(28,15)").as("__term"))
        .groupBy(col("state"))
        .agg(sum(col("__term")).as("__mass"))
        .select(col("state"), col("__mass").cast("double").as("__vp"))
      if (i % 10 == 0 && i < iterations) v = v.localCheckpoint()
    }
    v.select(col("state"), col("__vp").as("p"))
  }

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinHours: Int): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    require(withinHours >= 1, s"withinHours must be positive, got $withinHours")
    val base = events.select(col(userCol).as("__user"), col(tsCol).as("__ts"),
      col(typeCol).as("__et"))
    val deadline = expr(s"INTERVAL $withinHours HOURS")
    val first = base.filter(col("__et") === steps.head)
      .groupBy(col("__user")).agg(min(col("__ts")).as("__t1"))
      .withColumn("__t", col("__t1"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      base.filter(col("__et") === step)
        .join(prev.select(col("__user"), col("__t1"), col("__t")), Seq("__user"))
        .filter(col("__ts") > col("__t") && col("__ts") <= col("__t1") + deadline)
        .groupBy(col("__user"), col("__t1")).agg(min(col("__ts")).as("__t"))
    }
    val counts = frames.zip(steps).zipWithIndex.map { case ((f, step), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
          col("n_users"), lit(1).as("__k"))
    }.reduce(_ unionByName _)
    val firstCount = frames.head.agg(count(lit(1)).as("__n1"))
      .select(col("__n1"), lit(1).as("__k"))
    counts.join(broadcast(firstCount), Seq("__k"))
      .select(col("step_idx"), col("step"), col("n_users"),
        (col("n_users").cast("double") / col("__n1").cast("double"))
          .as("conversion"))
      .orderBy("step_idx")
  }

  /** Per-entity ordered event SEQUENCES — the behavioral-model training
    * export ("user 7 did view→click→buy at these times") rendered as a
    * portable string `type:epoch_micros|type:epoch_micros|…` so any
    * engine (and any downstream tokenizer) reads the same bytes; order
    * is total via `(ts, tieCol)`.
    *
    * Scale shape: ONE groupBy shuffle; the in-buffer list is the
    * entity's own event history (the per-entity-bounded assumption
    * every sequence model already makes — a feed where one entity has
    * unbounded history needs session-chunking upstream, see
    * sessionize). Sorting happens per group AFTER collection
    * (`array_sort` on the collected structs), so no window pass.
    */
  def userSequences(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String): DataFrame = {
    // a null ts or type would make its element's concat null and
    // array_join would drop it SILENTLY — n_events says 5, the
    // sequence shows 4, and the training export is quietly short.
    // Malformed feed → fail loudly (decayedCounts convention).
    // resolve the ts type through column resolution (case-insensitive,
    // like every other col(tsCol) here) rather than StructType.apply
    val tsType = events.select(col(tsCol)).schema.head.dataType
    val item = struct(
      when(col(tsCol).isNull || col(typeCol).isNull, raise_error(lit(
          s"userSequences: null $tsCol/$typeCol — element would be " +
            "silently dropped from the sequence")).cast(tsType))
        .otherwise(col(tsCol)).as("t"),
      col(tieCol).as("k"),
      col(typeCol).as("e"))
    events.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(array_sort(collect_list(item)),
            // NTZ → TZ cast under the UTC session zone: same micros an
            // engine reading the parquet epoch directly sees
            x => concat(x.getField("e"), lit(":"),
              unix_micros(x.getField("t").cast("timestamp")).cast("string"))),
          "|").as("sequence"))
  }
}

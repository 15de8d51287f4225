package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream — the product-side
  * companions to the fraud/anomaly features (reference features.py works
  * the same (user, ts)-ordered stream): ordered-step funnels and cohort
  * retention. Both reduce the fact table to per-user milestones first,
  * so every downstream join is over a one-row-per-user (or smaller)
  * table — the shape that survives a 100 TB event log.
  */
object EventAnalytics {

  /** Rolling active users: per calendar day, DAU plus trailing
    * `wauDays`-day and `mauDays`-day distinct-user counts and the
    * DAU/WAU stickiness ratio — the growth dashboard's headline row,
    * exact (no sketch) and engine-portable (integer counts, one ratio
    * division).
    *
    * Shape: ONE full-fact pass reduces to the distinct (user, day)
    * activity table A; each A row then map-side EXPLODES into the
    * ≤ `mauDays` grid days it is visible from (g = day + offset) —
    * no join against a day grid at all, just one shuffle to the
    * (g_day) aggregation, where three conditional distinct counts
    * read dau (offset = 0), wau (offset < wauDays) and mau off the
    * same exploded rows. Cost is |A|·mauDays rows through one
    * exchange — linear, skew-free (day keys), and the trailing
    * windows are correct on sparse days too (days with no activity
    * emit no row, but a day with ANY activity sees every user active
    * in its trailing windows). Grid days past the observed maximum
    * are clipped against a broadcast one-row max — partial trailing
    * windows at the corpus edge would undercount silently.
    */
  def activeUsers(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      wauDays: Int = 7,
      mauDays: Int = 28): DataFrame =
    activeUsersFromActivity(
      events
        .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
        .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
        .distinct(),
      wauDays, mauDays)

  /** [[activeUsers]] from an already-built distinct (u, day) activity
    * table — the incremental entry, exactly like
    * `rollingCorrelationFromDaily`: the activity set is a KEYED
    * distinct (mergeable by union + distinct, idempotent under replay),
    * so a streaming fold can accrete it per batch and this recomputes
    * every window from the bounded store without rescanning events
    * (streamed == batch is golden-pinned in StreamingFeaturesSpec).
    */
  def activeUsersFromActivity(
      activity: DataFrame,
      wauDays: Int = 7,
      mauDays: Int = 28): DataFrame = {
    require(wauDays >= 1 && mauDays >= wauDays,
      s"need 1 <= wauDays <= mauDays, got $wauDays/$mauDays")
    // Eagerly checkpointed: the bounded (u, day) table feeds BOTH the
    // broadcast max-day aggregate and the fan-out path — without the
    // barrier each consumer re-derives the full distinct from the raw
    // facts (the r13 plan-audit recompute class, caught by .explain).
    val a = activity.select(col("u"), col("day")).localCheckpoint(true)
    val maxDay = a.agg(max(col("day")).as("__max_day"))
    a.crossJoin(broadcast(maxDay))
      .select(col("u"), col("day"), col("__max_day"),
        explode(sequence(lit(0), lit(mauDays - 1))).as("off"))
      .select(col("u"), col("off"),
        date_add(col("day"), col("off")).as("g_day"), col("__max_day"))
      .filter(col("g_day") <= col("__max_day"))
      .groupBy(col("g_day").as("day"))
      .agg(
        countDistinct(when(col("off") === 0, col("u"))).as("dau"),
        countDistinct(when(col("off") < wauDays, col("u"))).as("wau"),
        countDistinct(col("u")).as("mau"))
      .filter(col("dau") > 0)
      .withColumn("stickiness",
        round(col("dau").cast("double") / col("wau"), 6))
  }

  /** N-day return rate per day: of the users active on day d, the
    * share who come back within `horizonDays` — the sibling of
    * [[cohortRetention]] at daily grain (retention asks "does week k
    * hold the cohort", return rate asks "did TODAY's users come
    * back"). Exact and integer-portable: per (user, day) the next
    * active day comes from ONE lead window over the distinct activity
    * table; returned = gap ≤ horizon; the rate is one integer-ratio
    * division.
    *
    * Horizon honesty: days within `horizonDays` of the corpus max
    * cannot observe a full horizon — their rate would silently bias
    * low as "not returned YET" — so those rows keep their counts but
    * null the rate (the [[activeUsers]] clip lesson, inverted).
    */
  def returnRate(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 1, s"horizonDays must be >= 1, got $horizonDays")
    import org.apache.spark.sql.expressions.Window
    // Same two-consumer shape as activeUsersFromActivity (max-day agg
    // + the window path): checkpoint the bounded distinct once.
    val a = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
      .localCheckpoint(true)
    val wU = Window.partitionBy("u").orderBy("day")
    val maxDay = a.agg(max(col("day")).as("__max_day"))
    a.withColumn("__next", lead(col("day"), 1).over(wU))
      .withColumn("__ret",
        when(col("__next").isNotNull &&
          datediff(col("__next"), col("day")) <= horizonDays, 1L).otherwise(0L))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"), sum(col("__ret")).as("n_returned"))
      .crossJoin(broadcast(maxDay))
      .select(col("day"), col("n_active"), col("n_returned"),
        when(datediff(col("__max_day"), col("day")) >= horizonDays,
          round(col("n_returned").cast("double") / col("n_active"), 6))
          .as("return_rate"))
  }

  /** Classic day-N retention per daily cohort: users are cohorted by
    * their FIRST active day; dN = how many were active EXACTLY N days
    * later (the D1/D7/D30 board metric — "exactly day N", not "within
    * N", which is [[returnRate]]'s question; [[cohortRetention]] is
    * the weekly-grain sibling). Integer counts + one ratio division
    * per offset; offsets past the corpus max null their rate (the
    * unobservable-horizon honesty rule).
    *
    * Shape: one min-day window over the distinct activity table, then
    * one aggregation keyed by (cohort, offset) — per-cohort rows are
    * conditional counts over the SAME pass, no join per offset.
    */
  def retentionDays(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      offsets: Seq[Int] = Seq(1, 7, 14, 28)): DataFrame = {
    require(offsets.nonEmpty && offsets.forall(_ >= 1) &&
      offsets == offsets.sorted && offsets.distinct == offsets,
      s"offsets must be sorted distinct positives, got $offsets")
    import org.apache.spark.sql.expressions.Window
    val a = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
      .localCheckpoint(true) // feeds max-day, cohorts AND the offset agg
    val maxDay = a.agg(max(col("day")).as("__max_day"))
    val withFirst = a
      .withColumn("cohort", min(col("day")).over(Window.partitionBy("u")))
      .withColumn("off", datediff(col("day"), col("cohort")))
    val aggs = countDistinct(when(col("off") === 0, col("u"))).as("n_users") +:
      offsets.map(n =>
        countDistinct(when(col("off") === n, col("u"))).as(s"d$n"))
    val agg = withFirst.groupBy(col("cohort")).agg(aggs.head, aggs.tail: _*)
    offsets.foldLeft(agg.crossJoin(broadcast(maxDay))) { (df, n) =>
      df.withColumn(s"r$n",
        when(datediff(col("__max_day"), col("cohort")) >= n,
          round(col(s"d$n").cast("double") / col("n_users"), 6)))
    }.select(col("cohort") +: col("n_users") +:
      offsets.flatMap(n => Seq(col(s"d$n"), col(s"r$n"))): _*)
  }

  /** Per-day event-type diversity: Shannon entropy (bits) and the
    * Herfindahl concentration index of the day's type distribution —
    * the pair that flags "traffic composition changed" before any
    * per-type monitor fires (entropy drops when one type takes over;
    * HHI is its concentration mirror, Σ share²).
    *
    * Portability: each share is ONE integer-ratio division; each
    * entropy/HHI term is a fixed scalar chain rounded onto the 12dp
    * grid, and the per-day SUM over terms folds as exact decimals
    * (the unordered-float-sum discipline; log2's last ulp sits 3
    * orders below the grid). Output bounded by days × types.
    */
  def typeDiversity(
      events: DataFrame,
      tsCol: String,
      typeCol: String): DataFrame = {
    val wDay = org.apache.spark.sql.expressions.Window.partitionBy("day")
    val counts = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"), col(typeCol).as("t"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(wDay))
    val share = col("c").cast("double") / col("n")
    counts
      .withColumn("__h",
        round(share * log2(share), 12).cast("decimal(28,12)"))
      .withColumn("__hhi",
        round(share * share, 12).cast("decimal(28,12)"))
      .groupBy(col("day"))
      .agg(
        max(col("n")).as("n_events"),
        count(lit(1)).as("n_types"),
        round(lit(0.0) - sum(col("__h")).cast("double"), 6).as("entropy"),
        round(sum(col("__hhi")).cast("double"), 6).as("herfindahl"))
  }

  /** Inter-arrival gap statistics per group: exact mean / p50 / p90 of
    * the gaps between consecutive events, in seconds — the burstiness
    * profile that sizes session timeouts, rate limits and watermark
    * horizons from data instead of folklore. Gaps are integer
    * MICROSECONDS from one lead window (ties at the same instant give
    * honest zero gaps); the mean is an exact integer sum with one
    * division chain; the quantiles are order statistics at integer
    * ranks selected as max-of-the-first-k in the same aggregation.
    */
  def interArrival(
      events: DataFrame,
      groupCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLead = Window.partitionBy(groupCol).orderBy("__tsu")
    val gaps = events
      .filter(col(tsCol).isNotNull)
      .select(col(groupCol), unix_micros(col(tsCol)).as("__tsu"))
      .withColumn("__gap", lead(col("__tsu"), 1).over(wLead) - col("__tsu"))
      .filter(col("__gap").isNotNull)
    val wOrd = Window.partitionBy(groupCol).orderBy("__gap")
    val wAll = Window.partitionBy(groupCol)
    gaps
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .groupBy(col(groupCol))
      .agg(
        max(col("__n")).as("n_gaps"),
        round(sum(col("__gap")).cast("double") / max(col("__n")) / 1000000.0, 6)
          .as("mean_gap_sec"),
        round(max(when(col("__rn") <= (col("__n") + 1) / lit(2), col("__gap")))
          .cast("double") / 1000000.0, 6).as("p50_gap_sec"),
        round(max(when(col("__rn") <= (lit(9) * col("__n") + 9) / lit(10),
          col("__gap"))).cast("double") / 1000000.0, 6).as("p90_gap_sec"))
  }

  /** Ordered-step funnel: for each user, the FIRST time they completed
    * step i strictly after their first completion of step i-1 (the
    * classic "min-ts chain" semantics — re-orderings don't count, and a
    * user's step-2 before their first step-1 is ignored). Emits one row
    * per user who reached step 1, with one timestamp column per step
    * (`step1_ts`, `step2_ts`, ...) and `steps_completed`.
    *
    * Each step is one conditional-min aggregation over the events
    * filtered to that step's type, equi-joined to the previous
    * milestone table on the user key. The milestone tables are one row
    * per qualifying user — strictly shrinking — so at scale this is
    * k filtered scans (or one scan if the source is pre-filtered to the
    * step types) plus k joins of ever-smaller user tables; nothing is
    * ever collected and no window over the raw stream is needed.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("step1_ts"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val prevTs = s"step${i}_ts"
        val thisTs = s"step${i + 1}_ts"
        val next = events.filter(col(typeCol) === step)
          .join(prev.select(col(userCol), col(prevTs).as("__pt")), Seq(userCol))
          .filter(col(tsCol) > col("__pt"))
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as(thisTs))
        prev.join(next, Seq(userCol), "left")
    }
    val stepCols = steps.indices.map(i => col(s"step${i + 1}_ts"))
    chained.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** [[funnel]] with a per-transition deadline: step i counts only if
    * its first qualifying completion lands within `maxGapSeconds` of
    * the step-(i−1) milestone — the product form of the question ("did
    * they check out within an hour of carting", not "ever"). Same
    * min-ts chain over strictly-shrinking per-user milestone tables;
    * the deadline is one integer-microsecond comparison in each step's
    * filter, so the chain stays engine-portable. Note the deadline
    * binds to the MILESTONE (the first step-(i−1) completion), not to
    * any later re-occurrence — consistent with the min-ts chain's
    * first-path semantics.
    */
  def funnelWindowed(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxGapSeconds >= 1, s"maxGapSeconds must be >= 1, got $maxGapSeconds")
    val gapUs = maxGapSeconds * 1000000L
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("step1_ts"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (step, i)) =>
        val prevTs = s"step${i}_ts"
        val thisTs = s"step${i + 1}_ts"
        val next = events.filter(col(typeCol) === step)
          .join(prev.select(col(userCol), col(prevTs).as("__pt")), Seq(userCol))
          .filter(col(tsCol) > col("__pt") &&
            unix_micros(col(tsCol)) - unix_micros(col("__pt")) <= gapUs)
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as(thisTs))
        prev.join(next, Seq(userCol), "left")
    }
    val stepCols = steps.indices.map(i => col(s"step${i + 1}_ts"))
    chained.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** Funnel × experiment: per funnel step, users reaching it in each
    * md5 arm, the step-over-step conversion rate per arm, and the
    * two-proportion pooled z on that conversion — "WHICH step did the
    * experiment move", the readout a single end-to-end conversion z
    * ([[abTest]]) averages away. One [[funnel]] lineage, ONE
    * aggregation row (2·k conditional counts), melted to k step rows
    * by metadata-sized selects; step 1 has no prior step, so its rate
    * and z are null.
    */
  def funnelAbTest(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      salt: String = "ab"): DataFrame = {
    require(steps.size >= 2, "funnel A/B needs at least two steps")
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val f = funnel(events, userCol, tsCol, typeCol, steps).withColumn("arm", arm)
    val aggs = steps.indices.flatMap { i =>
      Seq(
        sum(when(col("arm") === 0 && col(s"step${i + 1}_ts").isNotNull, 1L)
          .otherwise(0L)).as(s"a${i + 1}"),
        sum(when(col("arm") === 1 && col(s"step${i + 1}_ts").isNotNull, 1L)
          .otherwise(0L)).as(s"b${i + 1}"))
    }
    // One-row aggregate with k consumers (one select per melted step):
    // checkpoint so the funnel lineage runs ONCE (the r14 plan-audit
    // broadcast-scalar rule).
    val one = f.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    val rows = steps.indices.map { i =>
      val j = i + 1
      if (i == 0)
        one.select(
          lit(j).as("step_idx"), lit(steps(i)).as("step"),
          col(s"a$j").as("reach_a"), col(s"b$j").as("reach_b"),
          lit(null).cast("double").as("rate_a"),
          lit(null).cast("double").as("rate_b"),
          lit(null).cast("double").as("z"),
          lit(false).as("significant"))
      else {
        val na = col(s"a$i").cast("double"); val nb = col(s"b$i").cast("double")
        val ra = col(s"a$j").cast("double") / na
        val rb = col(s"b$j").cast("double") / nb
        val pp = (col(s"a$j") + col(s"b$j")).cast("double") / (na + nb)
        val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
        one.select(
          lit(j).as("step_idx"), lit(steps(i)).as("step"),
          col(s"a$j").as("reach_a"), col(s"b$j").as("reach_b"),
          when(col(s"a$i") > 0, round(ra, 6)).as("rate_a"),
          when(col(s"b$i") > 0, round(rb, 6)).as("rate_b"),
          when(col(s"a$i") > 0 && col(s"b$i") > 0 && se > 0,
            round((ra - rb) / se, 6)).as("z"),
          coalesce(when(col(s"a$i") > 0 && col(s"b$i") > 0 && se > 0,
            abs((ra - rb) / se) > 1.96), lit(false)).as("significant"))
      }
    }
    rows.reduce(_ unionByName _)
  }

  /** Funnel conversion summary: one row per step with the number of
    * users who reached it and the conversion rate vs step 1 — the
    * report-facing roll-up of [[funnel]] (metadata-sized output).
    */
  def funnelSummary(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, steps)
    // ONE aggregation over the funnel (k conditional counts in a single
    // row), melted to per-step rows — the funnel lineage runs once, and
    // everything after the agg is literally one row wide.
    val oneRow = f.agg(
      steps.indices.map(i =>
        count(when(col(s"step${i + 1}_ts").isNotNull, 1)).as(s"u${i + 1}")).head,
      steps.indices.map(i =>
        count(when(col(s"step${i + 1}_ts").isNotNull, 1)).as(s"u${i + 1}")).tail: _*)
    oneRow.select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1).as("step"), lit(steps(i)).as("step_type"),
          col(s"u${i + 1}").as("users"), col("u1").as("__u1"))): _*)).as("x"))
      .select(col("x.step").as("step"), col("x.step_type").as("step_type"),
        col("x.users").as("users"),
        round(col("x.users") / col("x.__u1"), 6).as("conversion"))
  }

  /** Gap-based sessionization: a user's events are split into sessions
    * wherever the gap to the previous event exceeds `gapSeconds` (the
    * classic 30-minute web-analytics rule). Emits every event with its
    * `session_idx` (1-based per user, in time order) — the
    * event-grained view that [[sessionStats]] rolls up.
    *
    * The batch twin of [[graft.streaming.StreamingFeatures.sessionize]]
    * (same gap rule; the streaming form holds open sessions in the
    * state store and closes them by event-time timeout).
    *
    * Shape: ONE shuffle (the per-user window partition) and two window
    * passes over it — lag for the boundary flag, running sum for the
    * session index; both run in the same Exchange. Ties on ts break by
    * a caller-supplied tiebreak column so the boundary flag is
    * deterministic under duplicate timestamps. Per-user event counts
    * are bounded in practice (a user's history, not the corpus), so
    * the window never sees a pathological partition; a synthetic bot
    * user with millions of events is a data-quality problem upstream,
    * not a plan hazard — the window is streaming-evaluated, never
    * buffered whole.
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Column): DataFrame =
    // The boundary kernel is BehavioralFeatures.sessionIndex (the r3
    // q_sessionize operator); this view adds the timestamp->unix-second
    // bridge, the tie determinism, and 1-based numbering.
    BehavioralFeatures.sessionIndex(
        events.withColumn("__tsu", unix_timestamp(col(tsCol))),
        userCol, "__tsu", gapSeconds,
        tieBreak = Seq(tieBreak), oneBased = true)
      .drop("__tsu")

  /** Session roll-up over [[sessionize]]: one row per (user, session)
    * with start/end, duration, and event count — the table every
    * engagement metric reads. One extra aggregation over the already
    * user-partitioned stream (AQE coalesces the two exchanges when the
    * session key subsumes the user key).
    */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieBreak: Column): DataFrame =
    sessionize(events, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"),
        count(lit(1)).as("n_events"))

  /** First-order event-type transition matrix WITHIN sessions: counts
    * and row-normalized probabilities of (from -> to) over consecutive
    * event pairs that share a session — the Markov-chain view of user
    * behavior (cross-session pairs are not transitions; dropping them
    * is what the sessionize pass is for). Output is at most
    * |types|^2 rows — metadata at any corpus scale; the heavy part is
    * the same single user-partitioned window as [[sessionize]].
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      gapSeconds: Long,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), tieBreak)
    val sessioned = sessionize(events, userCol, tsCol, gapSeconds, tieBreak)
      .withColumn("__next_type", lead(col(typeCol), 1).over(w))
      .withColumn("__next_sess", lead(col("session_idx"), 1).over(w))
      .filter(col("__next_type").isNotNull &&
        col("__next_sess") === col("session_idx"))
    val counts = sessioned
      .groupBy(col(typeCol).as("from_type"), col("__next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("p", round(col("n") / sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("from_type")), 6))
  }

  /** Two-step transition probabilities: P²(a,c) = Σ_b P(a,b)·P(b,c)
    * over the [[transitionMatrix]] — "where do users land two clicks
    * from here". The mid-state sum runs over 12dp-rounded decimal terms
    * (exact, order-free) because a float sum over an arbitrary
    * mid-state order would not replay; the matrix is |types|² rows, so
    * the self-join is metadata-sized at any corpus scale (the heavy
    * pass is the ONE sessionize window inside transitionMatrix).
    */
  def transitionMatrix2(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      gapSeconds: Long,
      tieBreak: Column): DataFrame = {
    // Eager checkpoint: the matrix is ≤ |types|² rows, and the self-join
    // below would otherwise run the sessionize window pass twice.
    val t = transitionMatrix(events, userCol, tsCol, typeCol, gapSeconds, tieBreak)
      .select("from_type", "to_type", "p")
      .localCheckpoint(true)
    val t1 = t.select(col("from_type").as("a"), col("to_type").as("b"),
      col("p").as("p1"))
    val t2 = t.select(col("from_type").as("b"), col("to_type").as("c"),
      col("p").as("p2"))
    t1.join(t2, "b")
      .groupBy(col("a").as("from_type"), col("c").as("to_type"))
      .agg(round(sum(round(col("p1") * col("p2"), 12).cast("decimal(30,12)"))
        .cast("double"), 6).as("p2step"))
  }

  /** Top session paths: the first `depth` event types of every session,
    * ">"-joined into a path string, counted across all sessions with
    * each path's share — the "what do users actually do" complement to
    * [[funnel]] (a funnel tests ONE hypothesized order; paths surface
    * the orders that exist). Within-session order is (ts, tieBreak),
    * the same determinism rule as [[sessionize]]/[[transitionMatrix]].
    *
    * Scale shape: truncating at `depth` BEFORE the per-session fold
    * (row_number filter) bounds the collected list at `depth` structs
    * per session regardless of session length, and bounds the path
    * vocabulary at |types|^depth — so the counting shuffle and the
    * global-share window both run over a metadata-sized table. The
    * single-partition share window is safe for exactly that reason
    * (never put one on an unbounded table).
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      gapSeconds: Long,
      tieBreak: Column,
      depth: Int = 3): DataFrame = {
    require(depth >= 1, s"path depth must be >= 1, got $depth")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol), col("session_idx"))
      .orderBy(col(tsCol), tieBreak)
    val first = sessionize(events, userCol, tsCol, gapSeconds, tieBreak)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= depth)
    val paths = first
      .groupBy(col(userCol), col("session_idx"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__rn").as("rn"),
            col(typeCol).as("t")))),
          s => s.getField("t")), ">").as("path"))
    val counts = paths.groupBy("path").agg(count(lit(1)).as("n"))
    counts.withColumn("share",
      round(col("n") / sum(col("n")).over(Window.partitionBy()), 6))
  }

  /** Funnel step-to-step latency: for every adjacent step pair, the
    * count of users who completed the transition plus the EXACT lower
    * median and p90 of the transition time in seconds — the "where do
    * users stall" companion to [[funnelSummary]]. Quantiles are exact
    * order statistics (value at rank ceil(q·n), integer ranks computed
    * without float-fraction hazards: ceil(9n/10) = floor((9n+9)/10)),
    * so both engines pick the identical row — no interpolation
    * semantics to reconcile. One window sort per step pair; pairs are
    * few, users many — for a pathological single-pair corpus at 100 TB
    * swap the rank window for the Selection descent.
    */
  def funnelLatency(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "latency needs at least two funnel steps")
    import org.apache.spark.sql.expressions.Window
    // Persisted: each step pair reads the per-user funnel table once,
    // and the funnel chain itself walks the event table per step —
    // without the cache the union re-runs that whole chain per pair
    // (plan-audited). Lazy persist is enough: both union arms execute
    // inside the caller's one action.
    val f = funnel(events, userCol, tsCol, typeCol, steps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = (1 until steps.size).map { i =>
      f.filter(col(s"step${i + 1}_ts").isNotNull)
        .select(lit(steps(i - 1)).as("step_from"), lit(steps(i)).as("step_to"),
          lit(i).as("step_idx"),
          (unix_timestamp(col(s"step${i + 1}_ts"))
            - unix_timestamp(col(s"step${i}_ts"))).as("delta_sec"))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy("step_idx").orderBy("delta_sec")
    val wn = Window.partitionBy("step_idx")
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("med_rn",
        floor((col("n").cast("double") + 1.0) / 2.0).cast("long"))
      .withColumn("p90_rn",
        floor((lit(9.0) * col("n").cast("double") + 9.0) / 10.0).cast("long"))
      .groupBy(col("step_from"), col("step_to"), col("step_idx"))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === col("med_rn"), col("delta_sec"))).as("median_sec"),
        max(when(col("rn") === col("p90_rn"), col("delta_sec"))).as("p90_sec"))
      .select(col("step_from"), col("step_to"), col("step_idx"), col("n"),
        col("median_sec"), col("p90_sec"))
  }

  /** Two-proportion z-test over a deterministic 50/50 user split: the
    * A/B experiment readout. Assignment is the house md5 coin on
    * (user, salt) — replayable, append-stable, and exactly what a real
    * experiment assignment service does — and the z statistic uses the
    * pooled-variance form z = (pA−pB)/√(p̂(1−p̂)(1/nA+1/nB)). One row
    * out: arm sizes, conversion counts/rates, z, and the |z| > 1.96
    * verdict (the p-value needs erf, which neither engine ships —
    * the threshold form is the portable contract). Fixed expression
    * order end to end, mirrored in SQL.
    */
  def abTest(
      events: DataFrame,
      userCol: String,
      successPred: Column,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val users = events
      .groupBy(col(userCol))
      .agg(max(when(successPred, 1).otherwise(0)).as("converted"))
      .withColumn("arm", arm)
    val agg = users.agg(
      count(when(col("arm") === 0, 1)).as("n_a"),
      count(when(col("arm") === 1, 1)).as("n_b"),
      sum(when(col("arm") === 0, col("converted")).otherwise(0)).as("k_a"),
      sum(when(col("arm") === 1, col("converted")).otherwise(0)).as("k_b"))
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val pA = col("k_a").cast("double") / nA
    val pB = col("k_b").cast("double") / nB
    val pPool = (col("k_a") + col("k_b")).cast("double") / (nA + nB)
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nA + lit(1.0) / nB))
    agg.select(col("n_a"), col("k_a"), round(pA, 6).as("rate_a"),
      col("n_b"), col("k_b"), round(pB, 6).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        round((pA - pB) / se, 6)).as("z"),
      coalesce(when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        abs((pA - pB) / se) > 1.96), lit(false)).as("significant"))
  }

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    * WSDM 2013): the experiment z-test on a CONTINUOUS metric with the
    * pre-period covariate regressed out — adj_u = y_u − θ(x_u − x̄),
    * θ = cov(x, y)/var(x) pooled over users. Same treatment effect
    * (E[adj_B − adj_A] = E[y_B − y_A]; assignment is independent of
    * pre-period behavior), but var(adj) = var(y)(1 − ρ²) — the
    * industry-standard sensitivity win, often 30-50% variance off a
    * sticky per-user metric, surfaced here as `var_reduction`.
    *
    * Deterministic and oracle-replayable end to end: the md5 coin arm
    * (the [[abTest]] assignment), per-user pre/post metric sums staged
    * through decimal(18,6) on the 6dp grid, θ from the n·Σxy − Σx·Σy
    * moment form (6dp grid products are EXACT at decimal scale 12),
    * adj re-gridded at 6dp per user, per-arm means/variances from
    * decimal moments over that grid, Welch z assembled in fixed IEEE
    * order. Scale shape: one user-grain aggregation (the full-fact
    * pass), then two metadata-sized scalar aggregates riding the plan
    * as broadcast one-row frames — no driver collect, no window over
    * the user table.
    */
  def cupedTest(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      prePred: Column,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    val dec12 = "decimal(38,12)"
    // Per-user pre (covariate x) and post (metric y) sums on the 6dp
    // grid. Persisted: the moment aggregate AND the adjustment pass
    // both read it (r15 plan audit: unpersisted, the full-fact
    // aggregation ran twice).
    val users = events
      .groupBy(col(userCol))
      .agg(
        round(coalesce(sum(when(prePred,
          round(col(valueCol), 6).cast(dec6))).cast("double"), lit(0.0)), 6).as("x"),
        round(coalesce(sum(when(!prePred,
          round(col(valueCol), 6).cast(dec6))).cast("double"), lit(0.0)), 6).as("y"))
      .withColumn("arm", arm)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Pooled moments for theta and the raw-metric variance: grid values,
    // exact decimal folds, one double cast each.
    val mom = users.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec6)).cast("double").as("sx"),
      sum(col("y").cast(dec6)).cast("double").as("sy"),
      sum(col("x").cast(dec6) * col("y").cast(dec6)).cast("double").as("sxy"),
      sum(col("x").cast(dec6) * col("x").cast(dec6)).cast("double").as("sxx"),
      sum(col("y").cast(dec6) * col("y").cast(dec6)).cast("double").as("syy"))
    val nD = col("n").cast("double")
    val withTheta = mom.select(col("n"), col("sx"), col("sy"),
      (nD * col("sxy") - col("sx") * col("sy")).as("covn"),
      (nD * col("sxx") - col("sx") * col("sx")).as("varxn"),
      (nD * col("syy") - col("sy") * col("sy")).as("varyn"))
      .select(col("n"), col("sx"), col("varyn"),
        when(col("varxn") > 0, round(col("covn") / col("varxn"), 6))
          .otherwise(lit(0.0)).as("theta"))
    // adj_u on the 6dp grid; theta and mean_x ride the plan broadcast.
    val adj = users.crossJoin(broadcast(withTheta))
      .withColumn("__mx", col("sx") / col("n").cast("double"))
      .withColumn("adj",
        round(col("y") - col("theta") * (col("x") - col("__mx")), 6))
    val byArm = adj.groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n_arm"),
        sum(col("adj").cast(dec6)).cast("double").as("sa"),
        sum(col("adj").cast(dec6) * col("adj").cast(dec6)).cast("double").as("saa"),
        max(col("theta")).as("theta"),
        max(col("varyn")).as("varyn"),
        max(col("n")).as("n_all"))
    // One output row: arm moments pivoted, Welch z, variance reduction.
    val p = byArm.agg(
      max(when(col("arm") === 0, col("n_arm"))).as("n_a"),
      max(when(col("arm") === 1, col("n_arm"))).as("n_b"),
      max(when(col("arm") === 0, col("sa"))).as("sa_a"),
      max(when(col("arm") === 1, col("sa"))).as("sa_b"),
      max(when(col("arm") === 0, col("saa"))).as("saa_a"),
      max(when(col("arm") === 1, col("saa"))).as("saa_b"),
      max(col("theta")).as("theta"),
      max(col("varyn")).as("varyn"),
      max(col("n_all")).as("n_all"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sa_a") / na; val mb = col("sa_b") / nb
    // Sample variances of adj per arm (n-1 denominator).
    val va = (na * col("saa_a") - col("sa_a") * col("sa_a")) / (na * (na - lit(1.0)))
    val vb = (nb * col("saa_b") - col("sa_b") * col("sa_b")) / (nb * (nb - lit(1.0)))
    val se = sqrt(va / na + vb / nb)
    val nAll = col("n_all").cast("double")
    val varY = col("varyn") / (nAll * (nAll - lit(1.0)))
    // Combined-sample variance of adj (same normalization as varY, so
    // the ratio reads as the fraction of metric variance CUPED removed).
    val varAdjPooled =
      ((nAll * (col("saa_a") + col("saa_b"))
        - (col("sa_a") + col("sa_b")) * (col("sa_a") + col("sa_b")))
        / (nAll * (nAll - lit(1.0))))
    p.select(
      col("n_a"), col("n_b"),
      round(ma, 6).as("mean_adj_a"),
      round(mb, 6).as("mean_adj_b"),
      col("theta"),
      when(col("varyn") > 0,
        round(lit(1.0) - varAdjPooled / varY, 6)).as("var_reduction"),
      when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
        round((ma - mb) / se, 6)).as("z"),
      coalesce(when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
        abs((ma - mb) / se) > 1.96), lit(false)).as("significant"))
  }

  /** Mann-Whitney U test over the per-user metric between the two md5
    * arms (Mann & Whitney 1947) — the DISTRIBUTION-FREE A/B readout:
    * [[abTest]] needs a binary outcome and [[cupedTest]]'s Welch z
    * trusts means a heavy-tailed revenue metric wrecks; the rank test
    * asks only "does arm B stochastically dominate arm A". Emits U,
    * the tie-corrected normal z, and the rank-biserial effect size
    * r = 2U/(n_a·n_b) − 1 (= P(b > a) − P(a > b), the probability the
    * experiment moved a random user pair).
    *
    * Exact and portable by the [[MlEval.rocAuc]] integer discipline:
    * midranks via the count identity over the DISTINCT metric values
    * (doubled to absorb tie half-credits, so every rank sum is a
    * BIGINT), tie correction Σ(t³−t) an integer fold, ONE double
    * assembly at the end. Scale shape: one user-grain aggregation,
    * then rank windows over the distinct-6dp-grid-value table (bounded
    * by distinct metric values, not users). Tie cubes stay in the long
    * lane for tie groups below ~2M users — the [[Anomaly.mannKendall]]
    * bounded-input posture.
    */
  def mannWhitneyTest(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      salt: String = "ab"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val users = events
      .groupBy(col(userCol))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast("decimal(18,6)"))
        .cast("double"), lit(0.0)), 6).as("m"))
      .withColumn("arm", arm)
    // Distinct-value counts per arm: the whole test runs off this table.
    val byVal = users.groupBy(col("m"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val wOrd = Window.orderBy("m")
    val ranked = byVal
      // r = 1-based start position of this value block; doubled midrank
      // 2r + c - 1 keeps tie half-credits integral.
      .withColumn("__r",
        coalesce(sum(col("c")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + lit(1L))
      .withColumn("__mid2", lit(2L) * col("__r") + col("c") - lit(1L))
    val agg = ranked.agg(
      sum(col("ca")).as("n_a"),
      sum(col("cb")).as("n_b"),
      sum(col("ca") * col("__mid2")).as("r2_a"),
      sum(col("c") * col("c") * col("c") - col("c")).as("tie_sum"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = col("n_a") + col("n_b")
    val nD = n.cast("double")
    // 2U_a = doubled rank sum minus n_a(n_a+1); u2 stays integral.
    val u2 = col("r2_a") - col("n_a") * (col("n_a") + lit(1L))
    val sigma2 = na * nb / lit(12.0) * ((nD + lit(1.0))
      - col("tie_sum").cast("double") / (nD * (nD - lit(1.0))))
    val zExpr = (u2.cast("double") - na * nb) / (lit(2.0) * sqrt(sigma2))
    agg.select(
      col("n_a"), col("n_b"),
      (u2.cast("double") / lit(2.0)).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0,
        round(zExpr, 6)).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(u2.cast("double") / (na * nb) - lit(1.0), 6)).as("effect"),
      coalesce(when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0,
        abs(zExpr) > 1.96), lit(false)).as("significant"))
  }

  /** Per-arm quantile treatment effects: exact median and p90 of the
    * per-user metric in each md5 arm, plus the B−A differences — where
    * the experiment moved the DISTRIBUTION, which a mean-based readout
    * ([[cupedTest]]) averages away (a p90 regression with a flat median
    * is the classic tail-latency/whale-spend story). Exact order
    * statistics at integer ranks (the [[funnelLatency]] convention:
    * lower median floor((n+1)/2), p90 floor((9n+9)/10)) — no
    * interpolation semantics to reconcile between engines. One
    * user-grain aggregation, then rank windows per arm.
    */
  def quantileTest(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      salt: String = "ab"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val users = events
      .groupBy(col(userCol))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast("decimal(18,6)"))
        .cast("double"), lit(0.0)), 6).as("m"))
      .withColumn("arm", arm)
    val w = Window.partitionBy("arm").orderBy("m")
    val wn = Window.partitionBy("arm")
    val q = users
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("med_rn",
        floor((col("n").cast("double") + 1.0) / 2.0).cast("long"))
      .withColumn("p90_rn",
        floor((lit(9.0) * col("n").cast("double") + 9.0) / 10.0).cast("long"))
      .groupBy(col("arm"))
      .agg(max(col("n")).as("n_arm"),
        max(when(col("rn") === col("med_rn"), col("m"))).as("med"),
        max(when(col("rn") === col("p90_rn"), col("m"))).as("p90"))
    q.agg(
      max(when(col("arm") === 0, col("n_arm"))).as("n_a"),
      max(when(col("arm") === 1, col("n_arm"))).as("n_b"),
      max(when(col("arm") === 0, col("med"))).as("median_a"),
      max(when(col("arm") === 1, col("med"))).as("median_b"),
      max(when(col("arm") === 0, col("p90"))).as("p90_a"),
      max(when(col("arm") === 1, col("p90"))).as("p90_b"))
      .select(col("n_a"), col("n_b"),
        col("median_a"), col("median_b"), col("p90_a"), col("p90_b"),
        round(col("median_b") - col("median_a"), 6).as("median_diff"),
        round(col("p90_b") - col("p90_a"), 6).as("p90_diff"))
  }

  /** Sample-ratio-mismatch check (the experimentation-quality gate every
    * A/B readout should run FIRST): chi-square goodness of fit of the
    * observed arm sizes against the designed 50/50 split. For two arms
    * the statistic collapses to (n_a − n_b)²/(n_a + n_b) — integer
    * numerator, one division — flagged at the 1-df 5% critical value
    * 3.841. An SRM flag means the assignment or logging pipeline is
    * biased and every downstream significance claim is void (Fabijan et
    * al., "Diagnosing Sample Ratio Mismatch", KDD 2019). Same md5 coin
    * as [[abTest]], so this audits exactly the assignment the other
    * readouts use.
    */
  def srmCheck(
      events: DataFrame,
      userCol: String,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val users = events.select(col(userCol)).distinct().withColumn("arm", arm)
    val agg = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val d = col("n_a") - col("n_b")
    val chi2 = (d * d).cast("double") / (col("n_a") + col("n_b")).cast("double")
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") + col("n_b") > 0, round(chi2, 6)).as("chi2"),
      coalesce(when(col("n_a") + col("n_b") > 0, chi2 > 3.841), lit(false))
        .as("srm"))
  }

  /** Per-day sample-ratio-mismatch: [[srmCheck]] at day grain over the
    * users FIRST SEEN each day (new entrants — counting cumulative
    * actives would double-count returning users and mask a recent
    * breakage under a healthy history). Localizes WHEN an assignment
    * or logging bias started, which the overall gate can only flag.
    * One fact aggregation to (user, first day), then day-grain counts.
    */
  def srmDaily(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      salt: String = "ab"): DataFrame =
    srmDailyFromFirstSeen(
      events.groupBy(col(userCol)).agg(min(to_date(col(tsCol))).as("day")),
      userCol, salt)

  /** [[srmDaily]] readout from an existing (user, first-seen day) table
    * — the LIVE-guardrail half (r16): a streaming foreachBatch
    * maintains the first-exposure store as a keyed min fold
    * ([[IncrementalAgg]] with a `mins` column — min is the first-seen
    * monoid, so replays and out-of-order batches land the same store),
    * and this readout turns the store into the day-grain SRM table
    * without touching event history. streamed == batch pinned in
    * StreamingFeaturesSpec.
    */
  def srmDailyFromFirstSeen(
      firstSeen: DataFrame, /* userCol, day */
      userCol: String,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val byDay = firstSeen.withColumn("arm", arm)
      .groupBy(col("day"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val d = col("n_a") - col("n_b")
    val chi2 = (d * d).cast("double") / (col("n_a") + col("n_b")).cast("double")
    byDay.select(col("day"), col("n_a"), col("n_b"),
      when(col("n_a") + col("n_b") > 0, round(chi2, 6)).as("chi2"),
      coalesce(when(col("n_a") + col("n_b") > 0, chi2 > 3.841), lit(false))
        .as("srm"))
  }

  /** Covariate balance between the md5 arms (Austin 2009): per
    * pre-period covariate, the standardized mean difference
    * SMD = (mean_B − mean_A)/√((var_A + var_B)/2), flagged at the
    * conventional |SMD| > 0.1. Randomization should balance every
    * covariate; an imbalanced one signals assignment trouble (pairs
    * with [[srmCheck]]) or, in observational reads, the confounder
    * [[didTest]]/[[cupedTest]] must address. Covariates here are the
    * standard behavioral trio: pre-period value sum, event count,
    * active-day count.
    *
    * One fact aggregation to user grain (three aggregates in one
    * pass), decimal moments per arm per covariate, one fixed-order
    * IEEE assembly per row; output is covariate-count-sized.
    */
  def balanceCheck(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      prePred: Column,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    val users = events
      .groupBy(col(userCol))
      .agg(
        round(coalesce(sum(when(prePred,
          round(col(valueCol), 6).cast(dec6))).cast("double"), lit(0.0)), 6)
          .as("pre_value"),
        sum(when(prePred, 1L).otherwise(0L)).cast("double").as("pre_events"),
        countDistinct(when(prePred, to_date(col(tsCol))))
          .cast("double").as("pre_days"))
      .withColumn("arm", arm)
    val covs = Seq("pre_value", "pre_events", "pre_days")
    val melted = covs.map { c =>
      users.select(lit(c).as("covariate"), col("arm"), col(c).as("x"))
    }.reduce(_ unionByName _)
    val byArm = melted.groupBy(col("covariate"), col("arm"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec6)).cast("double").as("s"),
        sum(col("x").cast(dec6) * col("x").cast(dec6)).cast("double").as("ss"))
    val p = byArm.groupBy(col("covariate"))
      .agg(
        max(when(col("arm") === 0, col("n"))).as("n_a"),
        max(when(col("arm") === 1, col("n"))).as("n_b"),
        max(when(col("arm") === 0, col("s"))).as("s_a"),
        max(when(col("arm") === 1, col("s"))).as("s_b"),
        max(when(col("arm") === 0, col("ss"))).as("ss_a"),
        max(when(col("arm") === 1, col("ss"))).as("ss_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("s_a") / na; val mb = col("s_b") / nb
    val va = (na * col("ss_a") - col("s_a") * col("s_a")) / (na * (na - lit(1.0)))
    val vb = (nb * col("ss_b") - col("s_b") * col("s_b")) / (nb * (nb - lit(1.0)))
    val pooled = sqrt((va + vb) / lit(2.0))
    p.select(col("covariate"),
      round(ma, 6).as("mean_a"),
      round(mb, 6).as("mean_b"),
      when(col("n_a") > 1 && col("n_b") > 1 && pooled > 0,
        round((mb - ma) / pooled, 6)).as("smd"),
      coalesce(when(col("n_a") > 1 && col("n_b") > 1 && pooled > 0,
        abs((mb - ma) / pooled) > 0.1), lit(false)).as("imbalanced"))
  }

  /** Difference-in-differences on the per-user panel: the causal rung
    * for settings where the "pre" period is observed for everyone and
    * the treatment lands only in "post" (Card & Krueger 1994 is the
    * canonical design). With both periods observed per user this is a
    * Welch z on the per-user CHANGE score d_u = post_u − pre_u between
    * the md5 arms: effect = mean(d_B) − mean(d_A) = the DiD estimand,
    * and differencing removes every time-invariant user effect the
    * plain post-only comparison confounds.
    *
    * Portability: per-user pre/post sums on the 6dp grid (the
    * [[cupedTest]] staging), change scores re-gridded at 6dp, per-arm
    * decimal moments, one fixed-order IEEE assembly. Scale shape: one
    * user-grain aggregation, then an 2-row arm aggregate — no window
    * over users, no driver state.
    */
  def didTest(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      prePred: Column,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    val users = events
      .groupBy(col(userCol))
      .agg(
        round(coalesce(sum(when(prePred,
          round(col(valueCol), 6).cast(dec6))).cast("double"), lit(0.0)), 6).as("x"),
        round(coalesce(sum(when(!prePred,
          round(col(valueCol), 6).cast(dec6))).cast("double"), lit(0.0)), 6).as("y"))
      .withColumn("arm", arm)
      .withColumn("dd", round(col("y") - col("x"), 6))
    val byArm = users.groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n_arm"),
        sum(col("x").cast(dec6)).cast("double").as("sx"),
        sum(col("y").cast(dec6)).cast("double").as("sy"),
        sum(col("dd").cast(dec6)).cast("double").as("sd"),
        // (18,6)x(18,6) -> exact decimal(37,12); the 19-width INT128
        // forcing is the DuckDB-side trick only (Spark at p=39 would
        // take the precision-loss path and trim the scale).
        sum(col("dd").cast(dec6) * col("dd").cast(dec6))
          .cast("double").as("sdd"))
    val p = byArm.agg(
      max(when(col("arm") === 0, col("n_arm"))).as("n_a"),
      max(when(col("arm") === 1, col("n_arm"))).as("n_b"),
      max(when(col("arm") === 0, col("sx"))).as("sx_a"),
      max(when(col("arm") === 1, col("sx"))).as("sx_b"),
      max(when(col("arm") === 0, col("sy"))).as("sy_a"),
      max(when(col("arm") === 1, col("sy"))).as("sy_b"),
      max(when(col("arm") === 0, col("sd"))).as("sd_a"),
      max(when(col("arm") === 1, col("sd"))).as("sd_b"),
      max(when(col("arm") === 0, col("sdd"))).as("sdd_a"),
      max(when(col("arm") === 1, col("sdd"))).as("sdd_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sd_a") / na; val mb = col("sd_b") / nb
    val va = (na * col("sdd_a") - col("sd_a") * col("sd_a")) / (na * (na - lit(1.0)))
    val vb = (nb * col("sdd_b") - col("sd_b") * col("sd_b")) / (nb * (nb - lit(1.0)))
    val se = sqrt(va / na + vb / nb)
    val eff = mb - ma
    p.select(
      col("n_a"), col("n_b"),
      round(col("sx_a") / na, 6).as("pre_a"),
      round(col("sy_a") / na, 6).as("post_a"),
      round(col("sx_b") / nb, 6).as("pre_b"),
      round(col("sy_b") / nb, 6).as("post_b"),
      when(col("n_a") > 0 && col("n_b") > 0, round(eff, 6)).as("did"),
      when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
        round(eff / se, 6)).as("z"),
      coalesce(when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
        abs(eff / se) > 1.96), lit(false)).as("significant"))
  }

  /** Abramowitz & Stegun 26.2.17 upper-tail normal probability — the
    * polynomial-in-1/(1+0.2316419z) approximation (|ε| < 7.5e-8), built
    * from arithmetic plus exp only, so BOTH engines replay the
    * identical formula (neither ships erf; the fixed literal
    * 0.3989422804014327 is 1/√(2π), avoiding a cross-engine sqrt).
    * Input must be the 6dp-gridded |z| so the two engines exp the SAME
    * double; the caller rounds the result back to a grid.
    */
  private def normUpperTail(zAbs: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * zAbs)
    val poly = t * (lit(0.319381530)
      + t * (lit(-0.356563782)
      + t * (lit(1.781477937)
      + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    lit(0.3989422804014327) * exp(lit(-0.5) * zAbs * zAbs) * poly
  }

  /** Benjamini-Hochberg FDR over the per-metric A/B family (Benjamini &
    * Hochberg 1995): ONE experiment read on MANY metrics — here each
    * event type's user-conversion rate — inflates false positives
    * linearly in the metric count; BH adjusts the per-metric p-values
    * so the expected false-discovery fraction stays at q. Per metric:
    * the [[abTest]] pooled two-proportion z (users who did ≥1 event of
    * that type), two-sided p via [[normUpperTail]] on the 6dp-gridded
    * |z|, then the step-up adjustment p̃_(i) = min_{j≥i}(p_(j)·m/j)
    * capped at 1 — a running min over the (p, metric)-ordered family,
    * replayed by a window frame in both engines. `rejected` applies the
    * conventional q = 0.05.
    *
    * Scale shape: one distinct-(user, type) pass, one user-grain arm
    * table, per-metric counts joined to a broadcast one-row arm total;
    * the BH window runs over the metric-count-sized family table.
    */
  def fdrAdjust(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      salt: String = "ab",
      q: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    // ONE fact scan: the (user, metric) census is the only events read;
    // the user universe (every user has >= 1 event) derives from it.
    val uc = events.select(col(userCol), col(typeCol).as("metric")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val users = uc.select(col(userCol)).distinct().withColumn("arm", arm)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val conv0 = uc
      .join(users, Seq(userCol))
      .groupBy(col("metric"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("k_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("k_b"))
      .crossJoin(broadcast(totals))
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val pA = col("k_a").cast("double") / nA
    val pB = col("k_b").cast("double") / nB
    val pPool = (col("k_a") + col("k_b")).cast("double") / (nA + nB)
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nA + lit(1.0) / nB))
    val zed = conv0.withColumn("z",
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        round((pA - pB) / se, 6)).otherwise(lit(0.0)))
    val withP = zed.withColumn("p",
      round(least(lit(2.0) * normUpperTail(abs(col("z"))), lit(1.0)), 6))
    val wOrd = Window.orderBy(col("p"), col("metric"))
    val wAll = Window.orderBy(col("p"), col("metric"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val m = Window.partitionBy()
    val adj = withP
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__m", count(lit(1)).over(m))
      .withColumn("__raw",
        col("p") * col("__m").cast("double") / col("__i").cast("double"))
      .withColumn("p_adj",
        round(least(min(col("__raw")).over(wAll), lit(1.0)), 6))
    adj.select(col("metric"), col("k_a"), col("k_b"), col("z"), col("p"),
        col("p_adj"), (col("p_adj") <= q).as("rejected"))
  }

  /** Portable Bayesian-bootstrap A/B confidence interval (Rubin 1981):
    * each replicate draws per-user exponential(1) weights and reads the
    * weighted mean per arm — the smooth bootstrap that needs no
    * resampling counts, so the whole procedure is ONE deterministic
    * hash formula both engines replay: u = (h52(md5(user || '#' || r))
    * + 0.5)/2^52 ∈ (0,1), w = −ln(u) rounded to the 6dp grid (ln is in
    * both engines; products stage through decimal, so every replicate
    * mean is an exact-fold ratio). The B−A difference is paired by
    * replicate; its CI is the 2.5%/97.5% order statistics at integer
    * ranks over the `reps` replicate diffs (trim⌈0.025·reps⌉ from each
    * side — ceil, so even the smallest allowed reps trims at least one
    * order statistic per tail instead of degenerating to min/max), and
    * `significant`
    * reads "the CI excludes 0". Distribution-free on the sampling side
    * (no normality assumed), unlike the Welch readouts above.
    *
    * Scale shape: the user table fans out ×reps with map-side partial
    * aggregation into (arm, r) — 2·reps groups — then order statistics
    * over a reps-row table. No collect, no RNG state.
    */
  def bootstrapTest(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      reps: Int = 40,
      salt: String = "ab"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(reps >= 20 && reps <= 1000, s"reps in [20,1000], got $reps")
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    // Persisted: the replicate fan-out AND the point-estimate pass both
    // read the user-grain table (the r15 plan-audit rule: a full-fact
    // aggregate with two consumers materializes once).
    val users = events
      .groupBy(col(userCol))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast(dec6))
        .cast("double"), lit(0.0)), 6).as("m"))
      .withColumn("arm", arm)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val h52 = conv(substring(md5(concat(col(userCol).cast("string"),
      lit("#"), col("r").cast("string"))), 1, 13), 16, 10).cast("long")
    val weighted = users
      .select(col(userCol), col("m"), col("arm"),
        explode(sequence(lit(0), lit(reps - 1))).as("r"))
      .withColumn("u",
        (h52.cast("double") + lit(0.5)) / lit(4503599627370496.0))
      .withColumn("w", round(-log(col("u")), 6))
    val repMeans = weighted.groupBy(col("arm"), col("r"))
      .agg(
        // (18,6)x(18,6) -> exact decimal(37,12) on the Spark side; the
        // oracle forces DuckDB's INT128 lane with width-19 casts.
        sum(col("w").cast(dec6) * col("m").cast(dec6)).cast("double").as("swm"),
        sum(col("w").cast(dec6)).cast("double").as("sw"))
      .withColumn("mean_r", round(col("swm") / col("sw"), 6))
    val diffs = repMeans.groupBy(col("r"))
      .agg(
        max(when(col("arm") === 0, col("mean_r"))).as("ma"),
        max(when(col("arm") === 1, col("mean_r"))).as("mb"))
      .withColumn("d", round(col("mb") - col("ma"), 6))
    val trim = math.ceil(0.025 * reps).toInt
    val loRn = trim + 1
    val hiRn = reps - trim
    val wOrd = Window.orderBy(col("d"), col("r"))
    val ci = diffs
      .withColumn("rn", row_number().over(wOrd))
      .agg(
        max(when(col("rn") === loRn, col("d"))).as("diff_lo"),
        max(when(col("rn") === hiRn, col("d"))).as("diff_hi"))
    val point = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_arm"),
        sum(col("m").cast(dec6)).cast("double").as("sm"))
      .agg(
        max(when(col("arm") === 0, col("n_arm"))).as("n_a"),
        max(when(col("arm") === 1, col("n_arm"))).as("n_b"),
        max(when(col("arm") === 0, col("sm"))).as("sm_a"),
        max(when(col("arm") === 1, col("sm"))).as("sm_b"))
    point.crossJoin(ci).select(
      col("n_a"), col("n_b"),
      round(col("sm_a") / col("n_a").cast("double"), 6).as("mean_a"),
      round(col("sm_b") / col("n_b").cast("double"), 6).as("mean_b"),
      round(col("sm_b") / col("n_b").cast("double")
        - col("sm_a") / col("n_a").cast("double"), 6).as("diff"),
      col("diff_lo"), col("diff_hi"),
      (col("diff_lo") > 0 || col("diff_hi") < 0).as("significant"))
  }

  /** Always-valid sequential A/B readout (mSPRT, Johari, Koomen,
    * Pekelis & Walsh, KDD 2017 "Peeking at A/B tests"): the fixed-n z
    * readouts above are invalid the moment anyone PEEKS mid-experiment;
    * the mixture sequential probability ratio test gives a p-value
    * that is valid at EVERY day simultaneously, so the experiment can
    * stop the first day p falls under α. Unit is the user-day metric
    * (per-user daily value sum — the independence caveat standard
    * practice accepts); per (arm, day) sufficient statistics cumsum
    * over the bounded day table, and at each day the Gaussian mixture
    * likelihood ratio with prior N(0, τ²) has the closed form
    *   ln Λ_t = ½·ln(V_t/(V_t+τ²)) + θ_t²·τ² / (2·V_t·(V_t+τ²)),
    * θ_t the cumulative mean difference, V_t its Welch variance; the
    * always-valid p is the running min of 1/Λ capped at 1.
    *
    * Portability: moments on the 6dp grid through exact decimal folds;
    * ln/exp are the established cross-engine surface; the running min
    * is a prefix window over days. Scale shape: ONE fact aggregation
    * to (arm, day), then everything is days-bounded.
    */
  def sequentialTest(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      tau: Double = 1.0,
      alpha: Double = 0.05,
      salt: String = "ab"): DataFrame =
    sequentialFromUserDays(
      userDayMetric(events, userCol, tsCol, valueCol), userCol, tau, alpha, salt)

  /** The (user, day, m) grain [[sequentialTest]] folds over — exposed
    * so a STREAMING store can maintain it incrementally: per-(user,
    * day) decimal value sums are pure mergeable state
    * ([[IncrementalAgg]] semantics), and the monitor re-reads the
    * bounded store each trigger instead of rescanning events. m is the
    * 6dp-gridded day sum.
    */
  def userDayMetric(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame =
    events
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast("decimal(18,6)"))
        .cast("double"), lit(0.0)), 6).as("m"))

  /** [[sequentialTest]] readout from an existing (user, day, m) table —
    * the live-monitor form: feed it the standing store and get the
    * always-valid p series without touching the fact stream.
    */
  def sequentialFromUserDays(
      userDays: DataFrame,
      userCol: String,
      tau: Double = 1.0,
      alpha: Double = 0.05,
      salt: String = "ab"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tau > 0 && alpha > 0 && alpha < 1, s"bad tau/alpha: $tau/$alpha")
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    val ud = userDays.withColumn("arm", arm)
    val byDay = ud.groupBy(col("arm"), col("day"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("m").cast(dec6)).as("s"),
        sum(col("m").cast(dec6) * col("m").cast(dec6)).as("ss"))
    val piv = byDay.groupBy(col("day"))
      .agg(
        coalesce(max(when(col("arm") === 0, col("n"))), lit(0L)).as("dn_a"),
        coalesce(max(when(col("arm") === 1, col("n"))), lit(0L)).as("dn_b"),
        coalesce(max(when(col("arm") === 0, col("s"))), lit(0L).cast("decimal(28,6)")).as("ds_a"),
        coalesce(max(when(col("arm") === 1, col("s"))), lit(0L).cast("decimal(28,6)")).as("ds_b"),
        coalesce(max(when(col("arm") === 0, col("ss"))), lit(0L).cast("decimal(38,12)")).as("dss_a"),
        coalesce(max(when(col("arm") === 1, col("ss"))), lit(0L).cast("decimal(38,12)")).as("dss_b"))
    val wc = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = piv
      .withColumn("n_a", sum(col("dn_a")).over(wc))
      .withColumn("n_b", sum(col("dn_b")).over(wc))
      .withColumn("s_a", sum(col("ds_a")).over(wc).cast("double"))
      .withColumn("s_b", sum(col("ds_b")).over(wc).cast("double"))
      .withColumn("ss_a", sum(col("dss_a")).over(wc).cast("double"))
      .withColumn("ss_b", sum(col("dss_b")).over(wc).cast("double"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("s_a") / na; val mb = col("s_b") / nb
    val va = (na * col("ss_a") - col("s_a") * col("s_a")) / (na * (na - lit(1.0)))
    val vb = (nb * col("ss_b") - col("s_b") * col("s_b")) / (nb * (nb - lit(1.0)))
    val vt = va / na + vb / nb
    val theta = mb - ma
    val tau2 = lit(tau * tau)
    val logLambda = lit(0.5) * log(vt / (vt + tau2)) +
      theta * theta * tau2 / (lit(2.0) * vt * (vt + tau2))
    val scored = cum.withColumn("log_lambda",
      when(col("n_a") > 1 && col("n_b") > 1 && vt > 0,
        round(logLambda, 6)))
    // p_t = min(1, 1/Lambda) as exp(-lnL) for lnL > 0; running min.
    val pDay = when(col("log_lambda").isNull, lit(1.0))
      .when(col("log_lambda") > 0, exp(-col("log_lambda")))
      .otherwise(lit(1.0))
    scored
      .withColumn("p_always",
        round(min(pDay).over(wc), 6))
      .select(col("day"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, round(theta, 6)).as("diff"),
        col("log_lambda"), col("p_always"),
        (col("p_always") <= alpha).as("significant"))
  }

  /** Power / minimum-detectable-effect readout for the experiment AS
    * CURRENTLY SIZED (the "is this test even capable of seeing what we
    * care about" check that should precede any verdict): with the
    * pooled per-user metric variance and the current arm sizes, the
    * two-sided MDE at 80% power is (z_{α/2} + z_{0.8})·SE =
    * 2.8016·√(s²(1/n_a+1/n_b)) — literals, no inverse normal needed.
    * One row: sizes, means, pooled sd, absolute and relative MDE.
    */
  def powerCheck(
      events: DataFrame,
      userCol: String,
      valueCol: String,
      salt: String = "ab"): DataFrame = {
    val arm = pmod(conv(substring(md5(concat(col(userCol).cast("string"),
      lit(salt))), 1, 2), 16, 10).cast("long"), lit(2L))
    val dec6 = "decimal(18,6)"
    val users = events
      .groupBy(col(userCol))
      .agg(round(coalesce(sum(round(col(valueCol), 6).cast(dec6))
        .cast("double"), lit(0.0)), 6).as("m"))
      .withColumn("arm", arm)
    val agg = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      count(lit(1)).as("n"),
      sum(col("m").cast(dec6)).cast("double").as("s"),
      sum(col("m").cast(dec6) * col("m").cast(dec6)).cast("double").as("ss"))
    val nD = col("n").cast("double")
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val varP = (nD * col("ss") - col("s") * col("s")) / (nD * (nD - lit(1.0)))
    val mean = col("s") / nD
    // z_{0.025} + z_{0.20} = 1.959964 + 0.841621 (two-sided 5%, 80%).
    val mde = lit(2.801585) * sqrt(varP * (lit(1.0) / na + lit(1.0) / nb))
    agg.select(col("n_a"), col("n_b"),
      round(mean, 6).as("mean_metric"),
      when(varP > 0, round(sqrt(varP), 6)).as("sd"),
      when(col("n_a") > 0 && col("n_b") > 0 && varP > 0,
        round(mde, 6)).as("mde_abs"),
      when(col("n_a") > 0 && col("n_b") > 0 && varP > 0 && abs(mean) > 0,
        round(mde / abs(mean), 6)).as("mde_rel"))
  }

  /** Daily success rate with a Wilson 95% score interval — the
    * uncertainty-honest way to chart a conversion/failure rate: the
    * interval stays inside [0,1] and behaves at small n where the
    * normal approximation lies. Pure per-day arithmetic over one
    * aggregation; the expression tree is mirrored literally by the SQL
    * replay (same literals, same parenthesization), so the 6dp bounds
    * hash-match.
    */
  def rateWilson(
      events: DataFrame,
      tsCol: String,
      successPred: Column,
      z: Double = 1.96): DataFrame = {
    val d = events.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"), count(when(successPred, 1)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2n = (lit(z) * lit(z)) / nD
    val denom = lit(1.0) + z2n
    val center = (p + z2n / lit(2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD + z2n / (lit(4.0) * nD))) / denom
    d.select(col("day"), col("n"), col("k"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** Last-touch attribution: for every conversion event, the most
    * recent touch event (same user, at or before the conversion, within
    * `windowSeconds`) — the marketing-attribution staple, composed
    * directly from [[AsOfJoin.join]] (backward direction + tolerance):
    * attribution IS an as-of join, so the skew/scale story is the
    * as-of operator's, not a new one. Unattributed conversions stay
    * (null touch — the honest "direct/organic" bucket). Ties at the
    * same touch timestamp resolve to the HIGHEST touch id (the as-of
    * traversal's last-seen rule), replayed identically by the oracle.
    */
  def lastTouchAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(windowSeconds > 0, s"attribution window must be positive, got $windowSeconds")
    val conversions = events.filter(col(typeCol) === conversionType)
      .select(col(idCol).as("conversion_id"), col(userCol), col(tsCol))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol),
        col(idCol).as("touch_id"), col(typeCol).as("touch_type"))
    AsOfJoin.join(
        left = conversions, right = touches,
        leftKey = userCol, rightKey = userCol,
        leftTs = tsCol, rightTs = tsCol,
        rightPayload = Seq("touch_id", "touch_type"),
        rightOrderCol = "touch_id",
        keepUnmatched = true,
        direction = "backward",
        toleranceSeconds = Some(windowSeconds))
      .select(col("conversion_id"), col(userCol),
        unix_micros(col(tsCol)).as("conv_ts_us"),
        col("touch_id"), col("touch_type"))
  }

  /** Kaplan-Meier survival curve over user lifetimes (time from first
    * to last event, in days) with honest right-censoring: a user whose
    * last event is within `churnGapDays` of the corpus end may still be
    * alive — they enter the at-risk counts up to their observed
    * lifetime but never count as a churn "death". S(t) steps down at
    * each observed churn lifetime by (1 - d_t/n_t); the curve every
    * retention dashboard plots, and the correction naive "% retained at
    * day t" gets wrong near the observation edge.
    *
    * One full-fact pass to user grain; everything after is windows over
    * the distinct-lifetime table (bounded by days). The cumulative
    * product runs as exp(sum(ln ...)) — the same libm-parity class as
    * the PSI/surprisal oracles, rounded 6dp.
    */
  def survivalCurve(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      churnGapDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(churnGapDays >= 1, s"churnGapDays must be >= 1, got $churnGapDays")
    // Persisted: the anchor broadcast and the lifetimes join both read
    // the user-grain aggregate (r15 plan audit: two full-fact passes).
    val users = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_day"),
        max(to_date(col(tsCol))).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchor = users.agg(max(col("last_day")).as("corpus_end"))
    val lifetimes = users.join(broadcast(anchor))
      .withColumn("lifetime", datediff(col("last_day"), col("first_day")))
      .withColumn("churned",
        datediff(col("corpus_end"), col("last_day")) > churnGapDays)
    val byT = lifetimes.groupBy(col("lifetime").as("t"))
      .agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("exits"))
    val wOrd = Window.partitionBy().orderBy("t")
    val wAll = Window.partitionBy()
    // n_t = users whose observed lifetime is >= t = total - exits before t.
    // The windows run over the distinct-lifetime table (days-bounded) —
    // the single-partition window is metadata-sized by construction.
    byT
      .withColumn("__exited_before",
        coalesce(sum(col("exits")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", sum(col("exits")).over(wAll) - col("__exited_before"))
      .withColumn("__factor", lit(1.0) - col("d") / col("n_risk"))
      // A zero factor (everyone at risk churns — the curve hits 0) must
      // short-circuit: log(0) is engine-divergent (-inf vs null), so the
      // zero is carried as a flag instead of through the log sum.
      .withColumn("__zero", max(when(col("__factor") <= 0.0, 1).otherwise(0)).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("survival",
        when(col("__zero") === 1, lit(0.0))
          .otherwise(round(exp(sum(log(col("__factor"))).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))), 6)))
      .select(col("t"), col("n_risk"), col("d").as("n_churn"),
        col("exits"), col("survival"))
  }

  /** Nelson-Aalen cumulative hazard over the same right-censored user
    * lifetimes as [[survivalCurve]] (Nelson 1972; Aalen 1978):
    * H(t) = Σ_{s ≤ t} d_s / n_s — the additive twin of Kaplan-Meier's
    * product, preferred when the HAZARD (instantaneous churn pressure)
    * is the question rather than the survival probability; also emits
    * the Fleming-Harrington survival estimate exp(−H), which dominates
    * KM in small-risk-set tails (no factor ever hits zero, so no
    * zero-carry flag is needed — the structural advantage over
    * [[survivalCurve]]'s log-product).
    *
    * Portability: each increment d/n is one double division rounded to
    * 12dp, the cumulative sum folds those grid values through an EXACT
    * decimal window sum in t-order (deterministic fold order by
    * construction), and H re-grids at 6dp. Scale shape: identical to
    * [[survivalCurve]] — one user-grain aggregate, then windows over
    * the days-bounded distinct-lifetime table.
    */
  def cumulativeHazard(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      churnGapDays: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(churnGapDays >= 1, s"churnGapDays must be >= 1, got $churnGapDays")
    // Persisted: the anchor broadcast and the lifetimes join both read
    // the user-grain aggregate (r15 plan audit: two full-fact passes).
    val users = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("first_day"),
        max(to_date(col(tsCol))).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val anchor = users.agg(max(col("last_day")).as("corpus_end"))
    val lifetimes = users.join(broadcast(anchor))
      .withColumn("lifetime", datediff(col("last_day"), col("first_day")))
      .withColumn("churned",
        datediff(col("corpus_end"), col("last_day")) > churnGapDays)
    val byT = lifetimes.groupBy(col("lifetime").as("t"))
      .agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("exits"))
    val wOrd = Window.partitionBy().orderBy("t")
    val wAll = Window.partitionBy()
    byT
      .withColumn("__exited_before",
        coalesce(sum(col("exits")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", sum(col("exits")).over(wAll) - col("__exited_before"))
      .withColumn("__inc",
        round(col("d").cast("double") / col("n_risk"), 12))
      .withColumn("hazard",
        round(sum(col("__inc").cast("decimal(38,12)")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"), 6))
      .withColumn("survival_fh", round(exp(lit(0.0) - col("hazard")), 6))
      .select(col("t"), col("n_risk"), col("d").as("n_churn"),
        col("exits"), col("hazard"), col("survival_fh"))
  }

  /** Gini concentration of `valueCol` per group — how concentrated the
    * value mass is across rows (0 = perfectly even, →1 = one row owns
    * everything): the inequality screen behind "does one merchant/user
    * carry this event type" fraud questions. Uses the exact rank
    * formula over ascending values, G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n.
    *
    * Tie-safe by construction: equal values swap ranks freely but
    * Σ(i·x_i) is invariant under permutations within a tie block, so
    * the result is deterministic without a tiebreak column. One
    * (group)-partitioned sort window plus a metadata-sized aggregate;
    * values go through decimal(38,12) sums so the rank-weighted sum is
    * order-exact in both engines.
    */
  def giniConcentration(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    df.filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__sum"),
        // rank x value as DECIMAL x DECIMAL — exact in both engines
        // (a double product would round before the sum).
        sum(col("__i").cast("decimal(18,0)")
          * col(valueCol).cast("decimal(18,2)")).as("__isum"))
      .filter(col("__sum") > 0)
      .withColumn("gini",
        round(lit(2) * col("__isum").cast("double")
            / (col("n") * col("__sum").cast("double"))
          - (col("n") + lit(1)) / col("n"), 6))
      .select(col(groupCol), col("n"),
        col("__sum").cast("double").as("total_value"), col("gini"))
  }

  /** RFM (recency / frequency / monetary) user scoring — the classic
    * customer-value segmentation, and a standard fraud-features input:
    * per user, days since last event (vs the corpus max day so the
    * anchor is data-deterministic), event count, and exact-decimal
    * value sum; each dimension bucketed 1..`buckets` against
    * quantile edges fitted over the USER-grained table (recency scored
    * reversed: most recent = highest score).
    *
    * Shape: one full-fact aggregation to user grain, then quantile
    * edges over the user table (one metadata row), broadcast back as a
    * row-local array fold — the frozen-edge bucketing discipline shared
    * with [[Anomaly.psiDrift]], edges rounded 6dp in both engines so
    * interpolation ulps never flip a bucket. Monetary sums go through
    * decimal(18,2) (exact, order-independent) before the double cast.
    */
  def rfmScores(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val grained = events.groupBy(col(userCol))
      .agg(
        max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("monetary"))
    // The anchor is a 1-row scalar broadcast, NOT a global window (a
    // partitionBy() window would single-task the whole user table).
    val anchor = grained.agg(max(col("last_day")).as("anchor"))
    val users = grained.join(broadcast(anchor))
      .withColumn("recency_days", datediff(col("anchor"), col("last_day")))
      .drop("anchor", "last_day")
    val probs = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val edges = users.agg(
      transform(percentile(col("recency_days"), probs), e => round(e, 6)).as("r_e"),
      transform(percentile(col("frequency"), probs), e => round(e, 6)).as("f_e"),
      transform(percentile(col("monetary"), probs), e => round(e, 6)).as("m_e"))
    def bucket(v: Column, e: Column): Column =
      aggregate(e, lit(1), (acc, edge) => acc + when(v > edge, 1).otherwise(0))
    users.join(broadcast(edges))
      .withColumn("r_score", lit(buckets + 1) - bucket(col("recency_days"), col("r_e")))
      .withColumn("f_score", bucket(col("frequency"), col("f_e")))
      .withColumn("m_score", bucket(col("monetary"), col("m_e")))
      .select(col(userCol), col("recency_days"), col("frequency"),
        round(col("monetary"), 2).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")).as("rfm"))
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * FIRST event (week index = floor(days-since-anchor / 7), anchor
    * fixed so the bucketing is data-independent), and each cohort's
    * activity is counted per week offset. Emits (cohort_week,
    * week_offset, active_users, cohort_size, retention) — offset 0 is
    * the cohort itself, so its retention is 1.0 by construction.
    *
    * Shape: one aggregation to (user, week) distinct activity, one
    * min-window for the cohort week (a per-user min over that already
    * user-grained table, NOT the raw facts), then metadata-sized
    * counts. The only full-fact pass is the first distinct.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      anchor: String = "2024-01-01"): DataFrame = {
    val weekly = events
      .select(col(userCol),
        floor(datediff(to_date(col(tsCol)), to_date(lit(anchor))) / 7)
          .cast("int").as("week"))
      .distinct()
    val cohorts = weekly.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    weekly.join(cohorts, Seq(userCol))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
      .join(sizes, Seq("cohort_week"))
      .withColumn("retention",
        round(col("active_users") / col("cohort_size"), 6))
      .select("cohort_week", "week_offset", "active_users", "cohort_size",
        "retention")
  }
}

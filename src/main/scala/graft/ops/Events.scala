package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-table operators: sessionization, skew-safe aggregation, and the
  * set-intersection eval counters (J2/A1 analog) — each with a DuckDB
  * oracle twin.
  */
object Events {

  /** Gap-based sessionization (batch form of the streaming session
    * window): a session breaks after `gapSec` of inactivity. Output:
    * per-user session count + largest session. One shuffle
    * (partitionBy user), then pure window arithmetic.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val byUser = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val withBreaks = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "brk",
        when(
          col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
          1L
        ).otherwise(0L)
      )
      .withColumn("session_id", sum(col("brk")).over(byUser))
    withBreaks
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events")
      )
  }

  /** Salted two-phase sum — identical result to a direct groupBy (the
    * property tests prove it), but a hot key's rows spread across
    * `salts` reducers in phase 1 (SURVEY §4 skew handling).
    */
  def saltedSum(events: DataFrame, salts: Int = 16): DataFrame =
    events
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value")).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg(
        round(sum(col("partial")), 2).as("total_value"),
        sum(col("pn")).as("n_events")
      )

  /** Set-intersection counters (the evaluator's J2/A1 shape on a generic
    * pair of instance sets): gold = users who purchased, predicted =
    * users who clicked; tp/fp/fn + zero-guarded P/R/F1.
    */
  def evalCounters(events: DataFrame): DataFrame = {
    val gold = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("g", lit(1))
    val pred = events
      .filter(col("event_type") === "click")
      .select(col("user_id")).distinct()
      .withColumn("p", lit(1))
    val j = gold.join(pred, Seq("user_id"), "full_outer")
    val agg = j.agg(
      sum(when(col("g").isNotNull && col("p").isNotNull, 1L).otherwise(0L)).as("tp"),
      sum(when(col("g").isNull && col("p").isNotNull, 1L).otherwise(0L)).as("fp"),
      sum(when(col("g").isNotNull && col("p").isNull, 1L).otherwise(0L)).as("fn"),
      sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("npred"),
      sum(when(col("g").isNotNull, 1L).otherwise(0L)).as("nexp")
    )
    agg.select(
      col("tp"), col("fp"), col("fn"), col("npred"), col("nexp"),
      round(when(col("npred") =!= 0, col("tp").cast("double") / col("npred")).otherwise(0.0), 4).as("p"),
      round(when(col("nexp") =!= 0, col("tp").cast("double") / col("nexp")).otherwise(0.0), 4).as("r")
    )
  }

  /** A deterministic small graph derived from events (src = user_id,
    * dst = event_id % 50, zero-padded string node ids so min-label
    * ordering matches across engines), resolved to connected components
    * with the same iterative min-label propagation the KG
    * canonicalization uses (J4).
    */
  def eventComponents(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = events
      .select(
        // width 19 = max positive long (lpad truncates longer strings —
        // a 4-char pad would corrupt user_ids >= 10^4 at bigger SFs)
        lpad(col("user_id").cast("string"), 19, "0").as("src"),
        lpad(pmod(col("event_id"), lit(50)).cast("string"), 19, "0").as("dst")
      )
      .distinct()
      .as[(String, String)]
    graft.kg.Canonicalize
      .connectedComponents(spark, edges)
      .select(col("node"), col("comp"))
  }

  /** Range self-join: ordered pairs of events by the same user within
    * `windowSec` of each other (a → later b). Plans as an equi-join on
    * the user key with the range as a residual filter — the correct
    * physical shape when the equi key is selective (per-user event
    * counts are small); a pure range join without an equi key would
    * need a broadcast-nested-loop or bucketed-interval scheme instead.
    */
  def rangeJoin(events: DataFrame, windowSec: Long = 300L): DataFrame = {
    val a = events.select(col("event_id").as("id_a"), col("user_id"), col("ts").as("ts_a"))
    val b = events.select(col("event_id").as("id_b"), col("user_id"), col("ts").as("ts_b"))
    a.join(b, Seq("user_id"))
      .filter(col("id_a") =!= col("id_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $windowSec SECONDS") &&
        (col("ts_b") > col("ts_a") || col("id_a") < col("id_b"))) // dedupe exact ties
      .select(col("user_id"), col("id_a"), col("id_b"))
  }

  /** Approximate distinct users per event type (HyperLogLog++). The
    * sketch differs across engines, so the driver check is rows-only;
    * OpsSpec gates the estimate against the exact count (<= 5% rsd
    * configured, assert within 10%).
    */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** As-of join: for each `click` event, the most recent `purchase`
    * value at-or-before it for the same user (the standard time-series
    * enrichment operator Spark has no native form of). Formulated as
    * the union + running-last_value window — ONE shuffle on
    * (user_id), no range self-join blow-up: right rows sort before
    * left rows at equal timestamps (`src` tiebreak) so ties resolve to
    * ">= semantics" exactly like DuckDB's ASOF JOIN oracle. Right side
    * is pre-aggregated to one row per (user, ts) so the pick is
    * well-defined in both engines.
    */
  def asofJoin(events: DataFrame): DataFrame = {
    // the window picks the last purchase ROW (a non-null struct), not
    // the last non-null VALUE — so a most-recent purchase whose value
    // is NULL yields NULL, exactly like ASOF JOIN, instead of falling
    // back to an older purchase's value
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("src"),
        lit(null).cast("struct<pv:double>").as("p_row"))
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("pv"))
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        lit(0).as("src"), struct(col("pv")).as("p_row"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_purchase",
        last(col("p_row"), ignoreNulls = true).over(w).getField("pv"))
      .filter(col("src") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("asof_purchase"))
  }
}

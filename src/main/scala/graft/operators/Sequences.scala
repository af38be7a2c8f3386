package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over event streams — the batch form of
  * the reference's per-run ordered processing loop
  * (publish_to_catalog.py:304, 530 iterates agencies in source order;
  * generalized here to per-key event-time order).
  *
  * Scale design: sequences are built with ONE `collect_list(struct)`
  * hash aggregation per key — the struct sort happens per-row on the
  * aggregated array (map-side partial collect, no window shuffle), so
  * the exchange carries one row per key, not one per event. The
  * within-key sort is `array_sort` on (ts, tie, type) structs, which
  * orders field-wise — identical to `ORDER BY ts, tie`. Keys with
  * pathological cardinality (one user with 10⁹ events) would need a
  * per-key day/session sub-split first; the `dayCol` grouping in
  * [[funnel]] is exactly that bound.
  */
object Sequences {

  /** Per-key event-type sequence, ordered by (`tsCol`, `tieCol`): one
    * row per key with the comma-joined type string. `tieCol` makes the
    * order total when timestamps collide (event ids are unique). */
  def orderedTypeSequence(events: DataFrame, keyCols: Seq[Column],
      tsCol: Column, tieCol: Column, typeCol: Column): DataFrame =
    events
      .groupBy(keyCols: _*)
      .agg(array_sort(collect_list(struct(
        tsCol.as("ts"), tieCol.as("tie"), typeCol.as("et")))).as("ev"))
      .withColumn("seq",
        array_join(transform(col("ev"), e => e.getField("et")), ","))
      .drop("ev")

  /** Conversion funnel: for each (user, day), the deepest prefix of
    * `stages` that occurs as an ordered subsequence of the day's
    * events; output is the user-day count per funnel depth (0 = never
    * entered). Subsequence containment is a single regex over the
    * joined type sequence — valid because stage names contain no
    * separator and none is a substring of another event type. */
  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val seqs = orderedTypeSequence(events,
      Seq(col(userCol), to_date(col(tsCol)).as("day")),
      col(tsCol), col(tieCol), col(typeCol))
    // deepest matching prefix, checked deepest-first:
    // when(stage_n)...when(stage_1).otherwise(0)
    val depth = stages.indices.foldLeft(lit(0): Column) { (inner, i) =>
      when(col("seq").rlike(stages.take(i + 1).mkString(".*")), lit(i + 1))
        .otherwise(inner)
    }
    seqs.select(depth.as("funnel_stage"))
      .groupBy(col("funnel_stage"))
      .agg(count(lit(1)).as("user_days"))
  }
}

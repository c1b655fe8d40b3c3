package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT / chat-example preparation: turn an entity-keyed event stream
  * into rendered conversation transcripts with per-turn character
  * offsets and a loss mask — the assembly step between a raw
  * interaction log and a supervised fine-tuning corpus. The trainer
  * contract every chat pipeline shares: a single flat string per
  * example, plus the span list telling the loss which characters are
  * model turns (assistant spans train, user spans are context-only).
  *
  * Semantics (pinned):
  *   - a conversation = all events of one entity, ordered by
  *     (ts, event_id) — compose with `sessionize` upstream for
  *     gap-bounded conversations;
  *   - role = "user" when the event type is in `userTypes`, else
  *     "assistant"; content = `type ⧺ " " ⧺ props` (null props render
  *     as the empty string, no trailing space trim — byte-stable);
  *   - a rendered turn line = `role ⧺ ": " ⧺ content`; the transcript
  *     joins lines with a single `\n`;
  *   - offsets are [start, end) character positions of each line in
  *     the final transcript (start = sum of prior line lengths + one
  *     separator each); the loss mask = the assistant turns' spans;
  *   - truncation keeps the LATEST whole turns whose rendered length
  *     (plus separators) fits the budget — the standard
  *     drop-oldest-context policy — then renumbers and re-offsets.
  *
  * Scale shape: everything is per-conversation windows — bounded by
  * the same per-entity assumption every sequence exporter makes
  * ([[graft.analytics.Events.userSequences]]'s documented contract;
  * unbounded entities get sessionized first). One shuffle on the
  * conversation key; transcripts are one sorted-struct aggregation,
  * never a cross-turn join.
  */
object Sft {

  private def lineOf(role: Column, content: Column): Column =
    concat(role, lit(": "), content)

  /** Per-turn table: `(conv_id, turn_idx, role, content, line_len,
    * start_off, end_off, masked)` — turn_idx is 1-based, offsets are
    * [start, end) into the would-be transcript of ALL turns.
    */
  def turns(events: DataFrame, userCol: String, tsCol: String,
            typeCol: String, propsCol: String,
            userTypes: Seq[String] = Seq("click", "view"),
            orderCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("conv_id"))
      .orderBy(col("__ts"), col("__ord"))
    val base = events.select(
      col(userCol).cast("long").as("conv_id"),
      col(tsCol).as("__ts"), col(orderCol).as("__ord"),
      when(col(typeCol).isin(userTypes: _*), lit("user"))
        .otherwise(lit("assistant")).as("role"),
      concat(col(typeCol), lit(" "),
        coalesce(col(propsCol), lit(""))).as("content"))
    base.select(col("conv_id"), col("role"), col("content"),
        row_number().over(w).as("turn_idx"),
        length(lineOf(col("role"), col("content"))).as("line_len"),
        sum(length(lineOf(col("role"), col("content"))) + lit(1))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)).as("__pfx"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("content"),
        col("line_len"),
        coalesce(col("__pfx"), lit(0L)).as("start_off"),
        (coalesce(col("__pfx"), lit(0L)) + col("line_len")).as("end_off"),
        (col("role") === "assistant").as("masked"))
  }

  /** Keep the latest whole turns fitting `maxChars` (rendered length
    * + one separator per joint), then renumber/re-offset — the output
    * is a valid [[turns]] table of the truncated conversation.
    */
  def truncateLatest(turnsDf: DataFrame, maxChars: Int): DataFrame = {
    val wDesc = Window.partitionBy(col("conv_id"))
      .orderBy(col("turn_idx").desc)
    val kept = turnsDf.withColumn("__sfx",
        sum(col("line_len") + lit(1)).over(
          wDesc.rowsBetween(Window.unboundedPreceding, 0)) - lit(1))
      .filter(col("__sfx") <= maxChars)
    val wAsc = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    kept.select(col("conv_id"), col("role"), col("content"),
        col("line_len"), col("masked"),
        row_number().over(wAsc).as("turn_idx"),
        sum(col("line_len") + lit(1))
          .over(wAsc.rowsBetween(Window.unboundedPreceding, -1)).as("__pfx"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("content"),
        col("line_len"),
        coalesce(col("__pfx"), lit(0L)).as("start_off"),
        (coalesce(col("__pfx"), lit(0L)) + col("line_len")).as("end_off"),
        col("masked"))
  }

  /** Conversation-level rollup of a [[turns]] table: the transcript
    * string, the loss-mask span list rendered `start:end|start:end`
    * (assistant turns, turn order), and the counted summary the
    * packing/budgeting operators consume.
    */
  def transcripts(turnsDf: DataFrame): DataFrame =
    turnsDf
      .groupBy(col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked_turns"),
        sum(when(col("masked"), col("line_len")).otherwise(0L))
          .as("n_masked_chars"),
        // sorted-struct aggregation: deterministic turn order without
        // relying on shuffle arrival order
        array_join(transform(
          sort_array(collect_list(struct(col("turn_idx"),
            lineOf(col("role"), col("content")).as("line")))),
          s => s.getField("line")), "\n").as("transcript"),
        array_join(transform(
          sort_array(collect_list(when(col("masked"),
            struct(col("turn_idx"), col("start_off"), col("end_off"))))),
          s => concat(s.getField("start_off"), lit(":"),
            s.getField("end_off"))), "|").as("mask_spans"))
      .select(col("conv_id"), col("n_turns"), col("n_masked_turns"),
        col("n_masked_chars"),
        length(col("transcript")).as("n_chars"),
        col("transcript"), col("mask_spans"))
}

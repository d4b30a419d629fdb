package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel conversion — the product-analytics staple
  * (signup → activate → purchase): per entity, how deep into a declared
  * step sequence did its event stream get, with each step required to
  * occur STRICTLY AFTER the event that satisfied the previous one (the
  * same-order-matters semantics as [[Sequences]]' transition analysis,
  * but against a fixed pattern instead of a learned chain).
  *
  * Scale shape: ONE hash exchange keyed by the entity; each group
  * collapses to its (ts, type)-sorted event list and a single in-order
  * fold over it (the [[Forecast.holtSummary]] fold discipline — state is
  * one small struct, the lambda is pure, and another engine replays the
  * identical recurrence over the identically-ordered list). The census
  * output is bounded by the step count. Per-entity event lists are
  * assumed group-sized (the usual sessionized-clickstream contract);
  * a pathological hot entity is a pre-existing skew concern upstream,
  * not a fold concern here. */
object Funnel {

  /** Per-entity funnel depth. Output: (entity, stages_completed) with
    * stages_completed in [0, steps.length]. Tie-broken deterministically:
    * events sort by (ts, type), and a step matches the EARLIEST
    * qualifying event after the previous match in that order. */
  def depthPerEntity(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(steps.forall(s => !s.contains("'")),
      "step names must not contain quotes (they ride in a SQL literal)")
    val stepArr = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    df.select(col(entityCol).as("entity"), col(tsCol).as("__ts"),
        col(typeCol).as("__t"))
      .groupBy(col("entity"))
      .agg(array_sort(collect_list(struct(col("__ts"), col("__t")))).as("__l"))
      .select(col("entity"), expr(
        s"""aggregate(__l, CAST(0 AS INT), (st, e) ->
           |  CASE WHEN st < ${steps.length}
           |            AND e.__t = element_at($stepArr, st + 1)
           |       THEN st + 1 ELSE st END)
           |""".stripMargin).as("stages_completed"))
  }

  /** Funnel census: one row per step with how many entities reached at
    * least that depth, plus a stage-0 row counting every entity that
    * entered. The census aggregates the bounded per-entity depths —
    * output rows = steps + 1. */
  def census(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val depth = depthPerEntity(df, entityCol, tsCol, typeCol, steps)
    val aggs = (0 to steps.length).map(s =>
      sum(when(col("stages_completed") >= s, 1L).otherwise(0L)).as(s"__n$s"))
    val one = depth.agg(aggs.head, aggs.tail: _*)
    val rows = (0 to steps.length).map { s =>
      val nm = if (s == 0) "entered" else steps(s - 1)
      struct(lit(s).as("stage"), lit(nm).as("step_name"),
        col(s"__n$s").as("n_reached"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage").cast("int").as("stage"), col("r.step_name"),
        col("r.n_reached").cast("long").as("n_reached"))
  }
}

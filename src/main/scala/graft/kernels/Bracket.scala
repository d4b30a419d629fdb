package graft.kernels

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X1/X2 bracket-order execution scan (SURVEY.md §2.9).
  *
  * Reference semantics (forward-paper-trader/main.py:265-318):
  * from the entry bar, iterate bars in timestamp order;
  *   1. if ts >= timeout_ts -> exit `timeout` at that bar's close
  *   2. else if low <= stop  -> exit `stop` at stop price  (checked FIRST:
  *      the intrabar tie rule is stop-before-target)
  *   3. else if high >= target -> exit `target` at target price
  *   4. bars exhausted -> `timeout_eod` at the last bar's close.
  * Entry = first bar with ts >= entry_ts (exact match or first later bar);
  * entry price = entry bar close * slippage.
  *
  * Stress-scenario adverse fills (X2, simulate_live_execution.py:205-302):
  * per-row fill-adjustment params model worse-than-modeled execution —
  *   - `stop_adverse`: stop exits fill at min(stop price, bar close)
  *     ("adverse fill realism: worse of stop price or minute close")
  *   - `timeout_mult`: timeout / timeout_eod exits fill at close *
  *     timeout_mult (reference Stress penalizes timeouts with 0.95).
  * Optimistic/Base scenarios pass (false, 1.0) and reproduce the plain
  * semantics exactly.
  *
  * Implemented as a typed state machine over `flatMapSortedGroups` — each
  * group is one (trade) key, bars arrive sorted by ts, early-exit is a
  * stateful scan. This is the one operator that is genuinely procedural;
  * grouping shuffles once on the trade key and the kernel is O(bars) per
  * trade with O(1) state.
  */
object Bracket {

  case class BarIn(
      trade_id: Long, t: Long, o: Double, h: Double, l: Double, c: Double,
      entry_ts: Long, timeout_ts: Long,
      slippage: Double, target_mult: Double, stop_mult: Double,
      stop_adverse: Boolean, timeout_mult: Double)

  case class Fill(
      trade_id: Long, entry_ts: Long, entry_price: Double,
      exit_ts: Long, exit_price: Double, exit_reason: String,
      bars_held: Int, return_pct: Double)

  /** Run the kernel. `bars` must contain the BarIn columns; one output row
    * per trade that has at least one bar at/after entry_ts.
    */
  def execute(spark: SparkSession, bars: DataFrame): Dataset[Fill] = {
    import spark.implicits._
    bars.as[BarIn]
      .groupByKey(_.trade_id)
      .flatMapSortedGroups($"t")(scanGroup)
  }

  private[graft] def scanGroup(tradeId: Long, bars: Iterator[BarIn]): Iterator[Fill] = {
    var entryPrice = Double.NaN
    var entryTs = 0L
    var barsHeld = 0
    var lastBar: BarIn = null
    var fill: Option[Fill] = None
    while (bars.hasNext && fill.isEmpty) {
      val b = bars.next()
      if (java.lang.Double.isNaN(entryPrice)) {
        if (b.t >= b.entry_ts) { // first bar at/after entry (J5 fallback)
          entryPrice = b.c * b.slippage
          entryTs = b.t
          lastBar = b
          barsHeld = 1
        }
      } else {
        barsHeld += 1
        lastBar = b
        val stop = entryPrice * b.stop_mult
        val target = entryPrice * b.target_mult
        if (b.t >= b.timeout_ts)
          fill = Some(mk(tradeId, entryTs, entryPrice, b.t, b.c * b.timeout_mult,
            "timeout", barsHeld))
        else if (b.l <= stop) { // stop-before-target intrabar tie rule
          val px = if (b.stop_adverse) math.min(stop, b.c) else stop
          fill = Some(mk(tradeId, entryTs, entryPrice, b.t, px, "stop", barsHeld))
        } else if (b.h >= target)
          fill = Some(mk(tradeId, entryTs, entryPrice, b.t, target, "target", barsHeld))
      }
    }
    fill match {
      case Some(f) => Iterator.single(f)
      case None if lastBar != null => // data exhausted -> timeout at last close
        Iterator.single(mk(tradeId, entryTs, entryPrice, lastBar.t,
          lastBar.c * lastBar.timeout_mult, "timeout_eod", barsHeld))
      case None => Iterator.empty // no bar at/after entry
    }
  }

  private def mk(id: Long, entryTs: Long, entry: Double, exitTs: Long,
      exitPx: Double, reason: String, held: Int): Fill =
    Fill(id, entryTs, entry, exitTs, exitPx, reason, held,
      (exitPx - entry) / entry * 100.0)

  // ---- grid variant (X3 sweep at scale) -----------------------------------

  /** One (config x scenario) cell of a sweep grid. */
  case class GridCfg(gid: Int, slippage: Double, target_mult: Double,
      stop_mult: Double, stop_adverse: Boolean, timeout_mult: Double)

  case class GridBarIn(trade_id: Long, t: Long, o: Double, h: Double,
      l: Double, c: Double, entry_ts: Long, timeout_ts: Long)

  case class GridFill(trade_id: Long, gid: Int, entry_ts: Long,
      entry_price: Double, exit_ts: Long, exit_price: Double,
      exit_reason: String, bars_held: Int, return_pct: Double)

  /** Sweep the whole parameter grid in ONE pass over the bars.
    *
    * The naive sweep crossJoins bars with the grid before the kernel —
    * shuffling every bar |grid| times. Here bars shuffle ONCE on the trade
    * key and each sorted group is scanned with |grid| concurrent bracket
    * states (per-cell early exit), so shuffle volume is O(bars) and only
    * compute is O(bars x grid) — the shape that survives a 255-config
    * sweep (run_sweep.py:149-252) over 100 TB of minute bars.
    */
  def executeGrid(spark: SparkSession, bars: DataFrame,
      grid: Seq[GridCfg]): Dataset[GridFill] = {
    import spark.implicits._
    val gridB = spark.sparkContext.broadcast(grid.toArray)
    bars.as[GridBarIn]
      .groupByKey(_.trade_id)
      .flatMapSortedGroups($"t")((id: Long, it: Iterator[GridBarIn]) =>
        scanGroupGrid(id, it, gridB.value))
  }

  /** Per-cell state machine identical to [[scanGroup]], run simultaneously
    * for every grid cell over one pass of the sorted bars. */
  private[graft] def scanGroupGrid(tradeId: Long, bars: Iterator[GridBarIn],
      grid: Array[GridCfg]): Iterator[GridFill] = {
    val n = grid.length
    val fills = new Array[GridFill](n)
    var open = 0 // cells still scanning once entered
    var entered = false
    var entryTs = 0L
    val entryPrice = new Array[Double](n)
    var barsHeld = 0
    var lastBar: GridBarIn = null
    while (bars.hasNext && (!entered || open > 0)) {
      val b = bars.next()
      if (!entered) {
        if (b.t >= b.entry_ts) { // first bar at/after entry (J5 fallback)
          entered = true
          entryTs = b.t
          lastBar = b
          barsHeld = 1
          var g = 0
          while (g < n) { entryPrice(g) = b.c * grid(g).slippage; g += 1 }
          open = n
        }
      } else {
        barsHeld += 1
        lastBar = b
        var g = 0
        while (g < n) {
          if (fills(g) == null) {
            val cfg = grid(g)
            val ep = entryPrice(g)
            val stop = ep * cfg.stop_mult
            val target = ep * cfg.target_mult
            if (b.t >= b.timeout_ts) {
              fills(g) = mkGrid(tradeId, cfg.gid, entryTs, ep, b.t,
                b.c * cfg.timeout_mult, "timeout", barsHeld)
              open -= 1
            } else if (b.l <= stop) { // stop-before-target intrabar tie rule
              val px = if (cfg.stop_adverse) math.min(stop, b.c) else stop
              fills(g) = mkGrid(tradeId, cfg.gid, entryTs, ep, b.t, px,
                "stop", barsHeld)
              open -= 1
            } else if (b.h >= target) {
              fills(g) = mkGrid(tradeId, cfg.gid, entryTs, ep, b.t, target,
                "target", barsHeld)
              open -= 1
            }
          }
          g += 1
        }
      }
    }
    if (!entered) Iterator.empty // no bar at/after entry
    else {
      var g = 0
      while (g < n) { // data exhausted -> timeout_eod at last close
        if (fills(g) == null)
          fills(g) = mkGrid(tradeId, grid(g).gid, entryTs, entryPrice(g),
            lastBar.t, lastBar.c * grid(g).timeout_mult, "timeout_eod", barsHeld)
        g += 1
      }
      fills.iterator
    }
  }

  private def mkGrid(id: Long, gid: Int, entryTs: Long, entry: Double,
      exitTs: Long, exitPx: Double, reason: String, held: Int): GridFill =
    GridFill(id, gid, entryTs, entry, exitTs, exitPx, reason, held,
      (exitPx - entry) / entry * 100.0)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares via sufficient statistics — the
  * distributed-analytics workhorse for per-key trend fitting (price vs
  * quantity, score vs time, ...) that needs exactly ONE aggregation
  * pass: slope/intercept/r² are closed forms over (n, Σx, Σy, Σxx,
  * Σxy, Σyy), each a mergeable sum, so the shuffle carries six numbers
  * per group regardless of group size — the same scale shape as any
  * grouped count.
  *
  * Determinism contract: the inputs are summed as DECIMALs (exact,
  * order-insensitive — a double sum would drift with partitioning), and
  * the closed forms are evaluated in one fixed expression shape over
  * the exact sums, so results are bit-identical at any parallelism and
  * replayable in another engine. Callers must pick `scale` so x, y,
  * x², xy and y² are exactly representable at that many decimal digits
  * (e.g. money at 2 needs scale 4 for y²).
  */
object Regression {

  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, scale: Int = 4): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(scale >= 0 && scale <= 10, s"scale=$scale")
    val dec = s"decimal(34,$scale)"
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def d(c: Column): Column = c.cast(dec)
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(d(x)).as("sx"), sum(d(y)).as("sy"),
        sum(d(x * x)).as("sxx"), sum(d(x * y)).as("sxy"),
        sum(d(y * y)).as("syy"))
    // fixed expression shape over exact sums: every op below is a
    // correctly-rounded IEEE double op, so any engine reproduces it
    val nD  = col("n").cast("double")
    val sxD = col("sx").cast("double");  val syD  = col("sy").cast("double")
    val sxxD = col("sxx").cast("double"); val sxyD = col("sxy").cast("double")
    val syyD = col("syy").cast("double")
    val covN = nD * sxyD - sxD * syD   // n·cov·n
    val varXN = nD * sxxD - sxD * sxD  // n·var(x)·n
    val varYN = nD * syyD - syD * syD
    sums.select(groupCols.map(col) ++ Seq(
      col("n"),
      (covN / varXN).as("slope"),
      ((syD - (covN / varXN) * sxD) / nD).as("intercept"),
      ((covN * covN) / (varXN * varYN)).as("r2")): _*)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Public session factory carrying the engine's doctrine in one place, so
  * a user migrating from the reference gets correct semantics without
  * rediscovering each conf:
  *
  *  - non-ANSI casts (failed casts -> null), matching the reference's
  *    pandas `errors='coerce'` handling and the DuckDB TRY_CAST oracles;
  *  - nanosecond-parquet tolerance (the reference's feeds carry
  *    TIMESTAMP(NANOS); also set defensively in [[Tables]] for sessions
  *    not built here);
  *  - UTC session timezone (all reference timestamps are epoch-derived);
  *  - AQE with skew-join splitting on (the first line of defense for hot
  *    keys; [[graft.operators.Skew]] covers what AQE cannot reach);
  *  - the engine's codegen'd kernels + optimizer rule injected via
  *    [[graft.plans.GraftExtensions]] so `spark.sql("... graft_minhash
  *    (...)")` works out of the box.
  *
  * `spark.sql.shuffle.partitions` defaults to 32 for local development;
  * on a real cluster pass ~2-3x total executor cores (or rely on AQE
  * coalescing from a higher initial value).
  */
object GraftSession {

  def builder(shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive parquet timestamps (isAdjustedToUTC=false) read as session-TZ
      // TimestampType, not TIMESTAMP_NTZ — the engine's time-series surface
      // (unix_millis, range windows, watermarks) is defined on instants
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  /** Local session sized for this machine (tests, notebooks, bench). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Int = 32): SparkSession =
    builder(shufflePartitions)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}

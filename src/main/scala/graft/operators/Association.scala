package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pair-level association rules (the level-2 Apriori cut, Agrawal &
  * Srikant 1994) — market-basket mining over (basket, item) rows:
  * which items co-occur more than their popularity predicts, with the
  * directional confidences a recommender or bundling decision actually
  * reads. The relational sibling of [[Ranking.collocationLift]]
  * (adjacency there, set co-membership here). Reference analog: the
  * co-occurrence scans in profitscout-engine's enrichment pipelines
  * (`enrichment-trigger/main.py` joins movers against peer cohorts);
  * re-expressed as a general basket operator.
  *
  * Cost contract: the pair census is Σ_b |basket_b|² — quadratic in
  * BASKET SIZE, not corpus size. Baskets larger than `maxBasketSize`
  * are dropped BEFORE pairing (part of the semantics, replayed by the
  * oracle; a degenerate "everything in one basket" input would
  * otherwise go corpus-quadratic — the [[Containment]] dfCap
  * discipline). Dropped baskets still count toward nothing: they
  * vanish from n_baskets too, keeping support internally consistent.
  *
  * Exactness: all counts are exact (distinct basket-item pairs);
  * support, both confidences, and lift are each ONE correctly-rounded
  * division of exact decimal products; the top-k order (lift desc,
  * item_a, item_b) is bit-deterministic cross-engine and the sort is
  * TakeOrdered-bounded at k rows.
  *
  * Scale shape: one distinct over (basket, item), a basket-size
  * census + semi-join for the cap, the basket-keyed self-join for
  * pairs (co-partitioned on basket), item and pair censuses, two
  * item-keyed joins at pair-census grain, one broadcast scalar, and a
  * k-bounded sort. Output: (rank, item_a, item_b, n_baskets, c_a,
  * c_b, c_ab, support, conf_ab, conf_ba, lift). */
object Association {

  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int,
      maxBasketSize: Long = 1000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxBasketSize >= 2L,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val dec = "decimal(38,0)"
    val bi = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .where(col("bk").isNotNull && col("it").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val okBaskets = bi.groupBy(col("bk")).agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketSize)
      .select(col("bk"))
    val kept = bi.join(okBaskets, "bk").localCheckpoint(true)
    val nB = broadcast(kept.select(col("bk")).distinct()
      .agg(count(lit(1)).as("n_baskets")))
    val items = kept.groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = kept.select(col("bk"), col("it").as("a"))
      .join(kept.select(col("bk"), col("it").as("b")), "bk")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minSupport)
    val scored = pairs
      .join(items.select(col("it").as("a"), col("c").as("c_a")), "a")
      .join(items.select(col("it").as("b"), col("c").as("c_b")), "b")
      .crossJoin(nB)
    val nD = col("n_baskets").cast(dec)
    val lift = (col("c_ab").cast(dec) * nD).cast(dec).cast("double") /
      (col("c_a").cast(dec) * col("c_b").cast(dec)).cast(dec).cast("double")
    val top = scored
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("n_baskets"), col("c_a"), col("c_b"), col("c_ab"),
        (col("c_ab").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        (col("c_ab").cast("double") / col("c_a").cast("double"))
          .as("conf_ab"),
        (col("c_ab").cast("double") / col("c_b").cast("double"))
          .as("conf_ba"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(k)
    // the rank window orders the k-bounded result only
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("item_a"), col("item_b")))
        .cast("long"))
      .select(col("rank"), col("item_a"), col("item_b"), col("n_baskets"),
        col("c_a"), col("c_b"), col("c_ab"), col("support"),
        col("conf_ab"), col("conf_ba"), col("lift"))
  }

  /** Sequential rules A→B (the length-2 cut of sequential-pattern
    * mining, Agrawal & Srikant 1995/GSP) — DIRECTED in time where
    * [[pairRules]] is symmetric in a basket: over (actor, item, time)
    * rows, count actors that do A and then B within `window` time
    * units, against the actors that did A at all. The "what does a
    * user do next" census a funnel or curriculum decision reads;
    * [[graft.operators.Funnel]] fixes one ordered path, this mines
    * every pair.
    *
    * Semantics: events dedup to distinct (actor, item, t) first;
    * A→B counts an actor once iff SOME A occurrence precedes SOME B
    * occurrence with 0 < t_B − t_A ≤ window (strict: simultaneous
    * events are not "then"); A→A repeats are excluded (self-rules
    * measure retention, not sequence — [[graft.operators.Freshness]]
    * territory). c_a / c_b are actors with ≥1 occurrence; support =
    * c_ab/n_actors, conf = c_ab/c_a, and lift = c_ab·n/(c_a·c_b)
    * reads "seeing A multiplies the odds of B-soon by ×L".
    *
    * Cost contract: the within-actor pair join is Σ_u |events_u|² —
    * quadratic in ACTOR HISTORY, not corpus size. Actors with more
    * than `maxActorEvents` distinct events are dropped BEFORE pairing
    * (the [[pairRules]] maxBasketSize discipline: they vanish from
    * n_actors too, keeping support consistent; a bot account would
    * otherwise go corpus-quadratic).
    *
    * Exactness: all counts are exact distinct-actor counts; the three
    * ratios are single correctly-rounded divisions of exact decimal
    * products; top-k order (lift desc, item_a, item_b) is
    * bit-deterministic and TakeOrdered-bounded.
    *
    * Scale shape: one distinct, an actor-size census + semi-join for
    * the cap, the actor-keyed time self-join (co-partitioned on
    * actor), a distinct to (actor, a, b) before the pair census (an
    * actor pairs once however many times it repeats), item censuses
    * on distinct (actor, item), one broadcast scalar, k-bounded sort.
    * Output: (rank, item_a, item_b, n_actors, c_a, c_b, c_ab,
    * support, conf, lift). */
  def sequenceRules(df: DataFrame, actorCol: String, itemCol: String,
      timeCol: String, window: Long, minSupport: Long, k: Int,
      maxActorEvents: Long = 1000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(window > 0L, s"window must be positive, got $window")
    require(maxActorEvents >= 2L,
      s"maxActorEvents must be >= 2, got $maxActorEvents")
    val dec = "decimal(38,0)"
    val ev = df.select(col(actorCol).as("u"), col(itemCol).as("it"),
        col(timeCol).cast("long").as("t"))
      .where(col("u").isNotNull && col("it").isNotNull && col("t").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val okActors = ev.groupBy(col("u")).agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxActorEvents)
      .select(col("u"))
    val kept = ev.join(okActors, "u").localCheckpoint(true)
    val nU = broadcast(kept.select(col("u")).distinct()
      .agg(count(lit(1)).as("n_actors")))
    val items = kept.select(col("u"), col("it")).distinct()
      .groupBy(col("it")).agg(count(lit(1)).as("c"))
    val follows = kept.select(col("u"), col("it").as("a"), col("t").as("ta"))
      .join(kept.select(col("u"), col("it").as("b"), col("t").as("tb")), "u")
      .where(col("a") =!= col("b") && col("tb") > col("ta") &&
        col("tb") - col("ta") <= window)
      .select(col("u"), col("a"), col("b")).distinct()
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minSupport)
    val scored = follows
      .join(items.select(col("it").as("a"), col("c").as("c_a")), "a")
      .join(items.select(col("it").as("b"), col("c").as("c_b")), "b")
      .crossJoin(nU)
    val nD = col("n_actors").cast(dec)
    val lift = (col("c_ab").cast(dec) * nD).cast(dec).cast("double") /
      (col("c_a").cast(dec) * col("c_b").cast(dec)).cast(dec).cast("double")
    val top = scored
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("n_actors"), col("c_a"), col("c_b"), col("c_ab"),
        (col("c_ab").cast("double") / col("n_actors").cast("double"))
          .as("support"),
        (col("c_ab").cast("double") / col("c_a").cast("double"))
          .as("conf"),
        lift.as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("item_a"), col("item_b")))
        .cast("long"))
      .select(col("rank"), col("item_a"), col("item_b"), col("n_actors"),
        col("c_a"), col("c_b"), col("c_ab"), col("support"),
        col("conf"), col("lift"))
  }
}

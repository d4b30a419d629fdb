package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the PPJoin family)
  * — the deterministic complement to MinHash-LSH ([[Dedup]]): finds
  * every pair of sets with Jaccard >= t, no probabilistic recall
  * argument needed. The filter theorem: order all elements by one
  * global total order (document frequency ascending, rarest first);
  * if |x ∩ y| / |x ∪ y| >= t, the two sets MUST share an element
  * among each one's first n - ceil(t·n) + 1 elements — so an
  * equi-join on prefix elements generates a candidate superset, and
  * exact verification trims it. Recall 1 by construction.
  *
  * Scale shape: the rare-first order is the skew defense — stopword-
  * grade elements (huge df) sort LAST and rarely enter any prefix, so
  * no hot-key join blowup; the length filter t·max(|x|,|y|) <=
  * min(|x|,|y|) prunes cross-size candidates before verification.
  * Per-set windows partition by set id (bounded by set size); the df
  * census is vocabulary-sized. The threshold is a RATIONAL num/den and
  * every gate is integer cross-multiplication — no float compare
  * anywhere until the reported jaccard (one division). */
object SetJoin {

  /** All pairs with Jaccard(setCol_a, setCol_b) >= num/den. `setCol`
    * is an array column (duplicates tolerated — deduped internally).
    * Output: (id_a, id_b, inter, union_size, jaccard), id_a < id_b. */
  def prefixFilterJoin(df: DataFrame, idCol: String, setCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"threshold $num/$den must be in (0,1]")
    val d = df.select(col(idCol).as("id"), explode(col(setCol)).as("tok"))
      .distinct()
    val sizes = d.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val tokDf = d.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // prefix = first n - ceil(t*n) + 1 elements, rarest first; the
    // (df, tok) sort key IS the global total order — no global rank
    val wDoc = Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val pref = d.join(tokDf, "tok").join(sizes, "id")
      .withColumn("r", row_number().over(wDoc))
      .where(col("r") <= col("n") - expr(s"(($num * n) + $den - 1) div $den") + 1)
      .select(col("tok"), col("id"), col("n"))
    val cand = pref.select(col("tok"), col("id").as("id_a"), col("n").as("na"))
      .join(pref.select(col("tok"), col("id").as("id_b"), col("n").as("nb")), "tok")
      .where(col("id_a") < col("id_b") &&
        lit(num) * greatest(col("na"), col("nb")) <=
          lit(den) * least(col("na"), col("nb")))
      .select(col("id_a"), col("id_b"), col("na"), col("nb"))
      .distinct()
    val inter = cand
      .join(d.select(col("id").as("id_a"), col("tok")), "id_a")
      .join(d.select(col("id").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .where(lit(den) * col("inter") >=
        lit(num) * (col("na") + col("nb") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_size"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
  }
}

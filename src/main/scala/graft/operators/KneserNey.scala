package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model (Kneser & Ney 1995;
  * Chen & Goodman 1998) scored over the corpus that trained it — the
  * properly smoothed step past a raw-backoff bigram score (the q139
  * shape): absolute discounting plus the CONTINUATION distribution,
  *   P(b|a) = [max(c(ab) − d, 0) + d · N₁₊(a·) · P_cont(b)] / c(a),
  * where P_cont(b) weighs b by how many distinct contexts it follows,
  * not how often it occurs — the fix for "Francisco is frequent but
  * only ever follows San". Scoring the training corpus itself means
  * every token has c(a) ≥ 1 — no OOV branch; the continuation
  * probability is Laplace-floored, P_cont(b) = (N₁₊(·b) + 1) /
  * (N₁₊(··) + |V| + 1), so a word seen only at document starts (zero
  * left contexts) still scores finitely (pinned engineering
  * convention, replayed by the oracle).
  *
  * The readout: per-document mean negative log-likelihood — the
  * CCNet-style "how surprising is this document under the corpus LM"
  * quality axis, with principled smoothing.
  *
  * Exactness: all model quantities (c(ab), c(a), N₁₊(a·), N₁₊(·b),
  * N₁₊(··), |V|) are exact integer censuses; each per-pair probability
  * is ONE pinned double shape of those integers and the per-document
  * NLL folds ln-terms in position order over the doc-bounded pair
  * list (cross-engine ln parity, the established contract).
  *
  * Scale shape: the per-bigram NLL is assembled at bigram-TYPE grain
  * (censuses joining censuses — nothing broadcasts a vocabulary-sized
  * model, so web-scale vocabularies survive where a q139-style
  * broadcast model must cap), and the corpus-grain work is ONE
  * (doc, bigram)-census join against that type table; the per-doc sum
  * is a count-weighted fold in (a, b) order over the doc-bounded
  * distinct-bigram list. Output: (id, n_pairs, mean_nll);
  * single-token docs keep a null score. */
object KneserNey {

  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = docs.select(col(idCol).as("id"),
      split(lower(trim(col(textCol))), "\\s+").as("toks"))
      .select(col("id"), filter(col("toks"), t => length(t) > 0).as("toks"))
    val docPairs = toks.where(size(col("toks")) > 1)
      .select(col("id"), explode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |          slice(toks, 2, size(toks) - 1),
          |  (a, b) -> named_struct('a', a, 'b', b))""".stripMargin)).as("p"))
      .groupBy(col("id"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bi = docPairs.groupBy(col("a"), col("b"))
      .agg(sum(col("c")).as("c12")).localCheckpoint(true)
    val uni = bi.groupBy(col("a").as("w"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nf"))
    val nprec = bi.groupBy(col("b")).agg(count(lit(1)).as("np"))
    val scalars = broadcast(
      bi.agg(count(lit(1)).as("ntypes"))
        .crossJoin(toks.select(explode(col("toks")).as("w")).distinct()
          .agg(count(lit(1)).as("vtot"))))
    // the whole model collapses to ONE row per bigram type
    val bgm = bi
      .join(uni.withColumnRenamed("w", "a"), Seq("a"))
      .join(nprec, Seq("b"))
      .crossJoin(scalars)
      .select(col("a"), col("b"), (-log(
        (greatest(col("c12").cast("double") - lit(discount), lit(0.0)) +
          lit(discount) * col("nf").cast("double") *
            ((col("np") + 1L).cast("double") /
              (col("ntypes") + col("vtot") + 1L).cast("double"))) /
          col("c1").cast("double"))).as("nll"))
    val perDoc = docPairs.join(bgm, Seq("a", "b"))
      .select(col("id"), col("a"), col("b"),
        (col("c").cast("double") * col("nll")).as("t"), col("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_pairs"),
        sort_array(collect_list(struct(col("a"), col("b"), col("t"))))
          .as("__ts"))
      .select(col("id"), col("n_pairs"),
        (aggregate(col("__ts"), lit(0.0d), (s, t) => s + t.getField("t")) /
          col("n_pairs").cast("double")).as("mean_nll"))
    toks.select(col("id"), size(col("toks")).cast("long").as("n_tok"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tok"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("mean_nll"))
  }
}

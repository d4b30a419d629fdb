package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Falcon/RefinedWeb-style boilerplate removal: a LINE is boilerplate iff
  * it appears in more than `minDocFrac` of documents (nav bars, cookie
  * notices, footers — content that n-gram span dedup [[Spans]] also sees
  * but that pipelines drop by line frequency, not pairwise duplication).
  *
  * Scale shape: the census shuffles (line, doc_id) once; the hot-line SET
  * is bounded by avgLinesPerDoc / minDocFrac (each member occupies a
  * > minDocFrac share of the doc-line incidence, whose total is
  * nDocs * avgLinesPerDoc) and crosses back as ONE broadcast array row —
  * document reassembly is a pure higher-order projection over the scan,
  * order-preserving, no corpus shuffle (the q109 stop-strip pattern at
  * line granularity). The broadcast assumes that hot set stays small
  * relative to driver/executor memory — true for boilerplate thresholds
  * (25%+) over web corpora; a pathological corpus of long documents
  * sharing most lines would need the threshold raised.
  */
object Boilerplate {

  /** Per doc: lines kept (as re-joined text md5-able by the caller),
    * count dropped. Output: (doc_id, n_lines, n_dropped, kept_text). */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
      minDocFrac: Double): DataFrame = {
    require(minDocFrac > 0 && minDocFrac < 1, s"minDocFrac=$minDocFrac")
    val lines = df.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), "\n")).as("line"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val hot = lines.distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("ldf"))
      .crossJoin(broadcast(nDocs))
      .where(col("ldf").cast("double") > col("n_docs").cast("double") * lit(minDocFrac))
      .agg(sort_array(collect_list(col("line"))).as("hot"))
    df.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("ls"))
      .crossJoin(broadcast(hot))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        size(filter(col("ls"), l => array_contains(col("hot"), l)))
          .cast("long").as("n_dropped"),
        concat_ws("\n", filter(col("ls"), l => !array_contains(col("hot"), l)))
          .as("kept_text"))
  }
}

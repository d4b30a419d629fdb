package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit across a star/snowflake schema — the
  * constraint sweep a warehouse runs after every load: foreign keys
  * that reference no parent (orphans — silently dropped by inner
  * joins downstream) and parent keys no child references (dead
  * dimension rows — often a partial-load symptom).
  *
  * Scale shape: each relation costs two anti-joins on the key —
  * hash-partitioned, dimension sides broadcast when small, counts
  * integer. The report is one row per declared relation. */
object Integrity {

  /** One declared FK relation: display name, child table + FK column,
    * parent table + PK column. */
  final case class Relation(name: String, child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String)

  /** Output per relation: (relation, n_child, n_orphans, n_parents,
    * n_unused_parents). Null FKs are not orphans (SQL FK semantics —
    * they are visible in [[Profile]]'s null census instead). */
  def orphanAudit(relations: Seq[Relation]): DataFrame =
    relations.map { r =>
      val fk = r.child.select(col(r.fkCol).as("fk")).where(col("fk").isNotNull)
      val pk = r.parent.select(col(r.pkCol).as("pk"))
      val fkd = fk.distinct()
      val orphans = fk.join(pk, fk("fk") === pk("pk"), "left_anti")
      val unused = pk.join(fkd, pk("pk") === fkd("fk"), "left_anti")
      fk.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .crossJoin(pk.agg(count(lit(1)).as("n_parents")))
        .crossJoin(unused.agg(count(lit(1)).as("n_unused_parents")))
        .select(lit(r.name).as("relation"), col("n_child"),
          col("n_orphans"), col("n_parents"), col("n_unused_parents"))
    }.reduce(_ unionByName _)
}

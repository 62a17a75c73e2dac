package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert + delete) semantics as a relational operator.
  *
  * The reference refreshes by full replacement (server.js:100-137
  * rewrites the JSON/CSV artifacts on every cron run). At warehouse
  * scale the same "refresh" is key-wise: apply a changes batch onto
  * the previous snapshot — update matched keys, insert new keys,
  * drop keys the batch tombstones. This is the batch-algebra twin of
  * `graft.streaming.Refresh.upsertByKey` (the streaming sink form).
  *
  * Scale shape: ONE full-outer shuffle-hash join on the merge key.
  * No window, no collect; if both sides are bucketed/partitioned by
  * the key the exchange disappears entirely. AQE handles a skewed
  * key distribution (tombstone-heavy batches stay balanced because
  * the join key is the primary key — unique on both sides).
  */
object Merge {

  /** Apply `changes` onto `snapshot`, both keyed by `keys` (non-null,
    * unique per side). `changes` must carry every snapshot column;
    * its values win on key match. Rows where `deleteCol` (if present
    * in `changes`) is true are tombstones: the key is dropped from
    * the result and the tombstone itself emits nothing.
    */
  def upsert(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    val valueCols = snapshot.columns.filterNot(keys.contains).toSeq
    // Prefix change-side payload so the full-outer USING join keeps
    // exactly one (coalesced) key column and unambiguous values. A
    // presence marker (not coalesce on payload) decides which side
    // wins, so an update may legitimately set a column to NULL.
    val del = deleteCol.map(c => col(c)).getOrElse(lit(false)).as("__c_del")
    val ch = changes.select(
      keys.map(col) ++ valueCols.map(v => col(v).as(s"__c_$v"))
        :+ del :+ lit(true).as("__c_present"): _*)
    snapshot.join(ch, keys, "full_outer")
      .filter(!coalesce(col("__c_del"), lit(false)))
      .select(keys.map(col) ++ valueCols.map(v =>
        when(col("__c_present").isNotNull, col(s"__c_$v"))
          .otherwise(col(v)).as(v)): _*)
  }

  /** Key-wise diff of two snapshots — the inverse of [[upsert]]: what
    * changes batch would turn `old` into `nu`? One full-outer join on
    * the key; unchanged rows drop out, the rest carry `change_type` ∈
    * added / removed / changed with the NEW values (old values for
    * removals). Change detection is per-column null-safe inequality
    * (`<=>`-negation), so a column moving to/from NULL counts as a
    * change and there is no hash-collision false-negative.
    */
  def diff(old: DataFrame, nu: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = old.columns.filterNot(keys.contains).toSeq
    val o = old.select(keys.map(col) ++ valueCols.map(v => col(v).as(s"__o_$v"))
      :+ lit(true).as("__o_present"): _*)
    val n = nu.select(keys.map(col) ++ valueCols.map(v => col(v).as(s"__n_$v"))
      :+ lit(true).as("__n_present"): _*)
    val anyChanged = valueCols.map(v => !(col(s"__o_$v") <=> col(s"__n_$v")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__o_present").isNull, lit("added"))
          .when(col("__n_present").isNull, lit("removed"))
          .when(anyChanged, lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ valueCols.map(v =>
        when(col("__n_present").isNotNull, col(s"__n_$v"))
          .otherwise(col(s"__o_$v")).as(v)) :+ col("change_type"): _*)
  }

  // -----------------------------------------------------------------
  // multi-clause MERGE (ANSI MERGE INTO / Delta-merge shape)
  // -----------------------------------------------------------------

  /** One WHEN clause of a multi-clause [[merge]]. Conditions and SET /
    * VALUES expressions reference the two sides through [[tgt]] and
    * [[src]]; a `condition` of None means unconditional (plain
    * `WHEN MATCHED THEN ...`).
    */
  sealed trait MergeClause
  /** WHEN MATCHED [AND cond] THEN UPDATE SET col -> expr, ... (columns
    * absent from `set` keep their target values). */
  final case class MatchedUpdate(condition: Option[Column],
      set: Map[String, Column]) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs) —
    * target columns absent from `values` insert NULL. */
  final case class NotMatchedInsert(condition: Option[Column],
      values: Map[String, Column]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT * — every target column
    * takes the same-named source column (NULL when the source lacks it). */
  final case class NotMatchedInsertAll(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... */
  final case class NotMatchedBySourceUpdate(condition: Option[Column],
      set: Map[String, Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class NotMatchedBySourceDelete(condition: Option[Column]) extends MergeClause

  /** The TARGET side's `name` column inside a clause condition or SET
    * expression. NULL on a not-matched-by-target row (a plain key
    * column reads the coalesced join key instead — reference keys
    * directly with `col(key)`).
    */
  def tgt(name: String): Column = col(s"__t_$name")

  /** The SOURCE side's `name` column inside a clause expression. */
  def src(name: String): Column = col(s"__s_$name")

  /** Multi-clause MERGE of `source` into `target` on equi-`keys` (each
    * key unique per side, the MERGE cardinality contract): the full
    * ANSI/Delta clause surface — conditional UPDATE / DELETE on match,
    * conditional INSERT on no target match, conditional UPDATE /
    * DELETE on no source match — generalizing [[upsert]] (which is the
    * one-clause update+insert+tombstone special case).
    *
    * Semantics: within each group (matched / not-matched /
    * not-matched-by-source) clauses fire FIRST-MATCH in the order
    * given; a row no clause claims passes through unchanged (or, for a
    * source-only row, is not inserted). A NULL clause condition is
    * false (SQL WHEN semantics). Output columns are the target's;
    * every written value is cast to the target column's type.
    *
    * Scale shape: ONE full-outer shuffle join on the key — identical
    * to [[upsert]]; the whole clause cascade folds into per-column
    * CASE expressions inside the join's project, so clause count never
    * adds passes. By-source clauses cost nothing extra HERE, but see
    * `Snapshot.mergeInto` for why they break file-granular pruning at
    * the table layer.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      clauses: Seq[MergeClause]): DataFrame = {
    require(clauses.nonEmpty, "merge needs at least one WHEN clause")
    val tCols = target.columns.filterNot(keys.contains).toSeq
    val sCols = source.columns.filterNot(keys.contains).toSeq
    // keys are duplicated into the per-side namespaces so clause
    // conditions can test side presence through them too; the plain
    // key column survives the USING join coalesced (insert rows get
    // the source key, target-only rows the target key)
    val t = target.select(keys.map(col) ++
      (keys ++ tCols).map(c => col(c).as(s"__t_$c")) :+
      lit(true).as("__t_present"): _*)
    val s = source.select(keys.map(col) ++
      (keys ++ sCols).map(c => col(c).as(s"__s_$c")) :+
      lit(true).as("__s_present"): _*)
    val j = t.join(s, keys, "full_outer")

    // ---- fate resolution: which clause (if any) claims each row ----
    def firstMatch(group: Seq[(MergeClause, Int)], keep: String): Column =
      group.foldRight(lit(keep): Column) { case ((c, i), els) =>
        val cond = c match {
          case MatchedUpdate(cd, _) => cd
          case MatchedDelete(cd) => cd
          case NotMatchedInsert(cd, _) => cd
          case NotMatchedInsertAll(cd) => cd
          case NotMatchedBySourceUpdate(cd, _) => cd
          case NotMatchedBySourceDelete(cd) => cd
        }
        when(cond.getOrElse(lit(true)), lit(s"c$i")).otherwise(els)
      }
    val indexed = clauses.zipWithIndex
    val matchedG = indexed.filter { case (c, _) =>
      c.isInstanceOf[MatchedUpdate] || c.isInstanceOf[MatchedDelete] }
    val insertG = indexed.filter { case (c, _) =>
      c.isInstanceOf[NotMatchedInsert] || c.isInstanceOf[NotMatchedInsertAll] }
    val bySourceG = indexed.filter { case (c, _) =>
      c.isInstanceOf[NotMatchedBySourceUpdate] ||
        c.isInstanceOf[NotMatchedBySourceDelete] }
    val fate =
      when(col("__t_present").isNotNull && col("__s_present").isNotNull,
        firstMatch(matchedG, "keep"))
      .when(col("__t_present").isNull, firstMatch(insertG, "drop"))
      .otherwise(firstMatch(bySourceG, "keep"))
    val dead = indexed.collect {
      case (_: MatchedDelete, i) => s"c$i"
      case (_: NotMatchedBySourceDelete, i) => s"c$i"
    } :+ "drop"

    // ---- per-column value under each surviving fate ----
    def valueOf(c: String): Column = {
      val keep = col(s"__t_$c")
      indexed.foldRight(keep) { case ((cl, i), els) =>
        val v: Option[Column] = cl match {
          case MatchedUpdate(_, set) => Some(set.getOrElse(c, keep))
          case NotMatchedBySourceUpdate(_, set) => Some(set.getOrElse(c, keep))
          case NotMatchedInsert(_, values) =>
            Some(values.getOrElse(c, lit(null)))
          case NotMatchedInsertAll(_) =>
            Some(if (sCols.contains(c)) col(s"__s_$c") else lit(null))
          case _ => None // delete fates are filtered out before this projects
        }
        v.fold(els)(x => when(col("__fate") === s"c$i", x).otherwise(els))
      }.cast(target.schema(c).dataType).as(c)
    }
    j.withColumn("__fate", fate)
      .filter(!col("__fate").isin(dead: _*))
      .select(keys.map(col) ++ tCols.map(valueOf): _*)
  }
}

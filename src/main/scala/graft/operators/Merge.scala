package graft.operators

import org.apache.spark.sql.DataFrame
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
}

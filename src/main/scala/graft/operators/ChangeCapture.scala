package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two table snapshots — the diff step that
  * feeds incremental downstream refresh (SCD2 merges, incremental dedup,
  * changed-partition recompute). The reference's SCD2 merge classifies
  * changes for ONE entity table with hand-written column compares
  * (reference: src/jobs/silver/drivers_scd2.py); this is the generic
  * engine-level operator: any key set, any compare set.
  *
  * 100 TB design:
  *  - Wide-row comparison is collapsed to ONE md5 fingerprint per side
  *    before the join, so the shuffle carries (key, 32-hex fp) instead of
  *    every compared column — the join payload is fixed-width no matter
  *    how wide the table is.
  *  - One shuffle on the key columns for the full outer join; if both
  *    snapshots are bucketed on the key (io.ParquetSink.writeBucketed) the
  *    exchange disappears entirely.
  *  - Output is (keys, change_type), the minimal driving table for an
  *    incremental refresh; callers re-join to either snapshot for payloads
  *    (keeps this operator's shuffle narrow instead of carrying both
  *    row images through the join).
  */
object ChangeCapture {

  val InsertType = "insert"
  val DeleteType = "delete"
  val UpdateType = "update"
  val UnchangedType = "unchanged"

  /** Classify every key in `oldDf` ∪ `newDf` as insert / delete / update /
    * unchanged. `compareCols` are the value columns whose change means
    * "update"; nulls compare null-safely (each value is length-prefixed
    * and null encoded as a reserved marker, so no value concatenation can
    * alias another or a null).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(compareCols.nonEmpty, "at least one compare column")
    // length-prefixed encoding: "<len>:<value>" per column, "~" for null —
    // unambiguous under concatenation (":" cannot appear in a length and
    // "~" cannot be a length), so distinct tuples give distinct strings.
    def enc(c: String) = {
      val s = col(c).cast("string")
      coalesce(concat(length(s).cast("string"), lit(":"), s), lit("~"))
    }
    def fp(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+ md5(concat(compareCols.map(enc): _*)).as(as): _*)
    val o = fp(oldDf, "fp_old")
    val n = fp(newDf, "fp_new")
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("fp_old").isNull, lit(InsertType))
          .when(col("fp_new").isNull, lit(DeleteType))
          .when(col("fp_old") =!= col("fp_new"), lit(UpdateType))
          .otherwise(lit(UnchangedType)).as("change_type"): _*)
  }

  /** Apply a classified changeset to a snapshot — MERGE INTO semantics
    * without a table format: delete/update keys leave the old image,
    * insert/update payloads come from `newRows`. `merge(old,
    * snapshotDiff(old, new), new) == new` exactly (the cdc2 oracle
    * asserts this round trip).
    *
    * 100 TB shape: one anti join and one semi join, both keyed — the
    * changeset is usually tiny relative to the snapshot, so AQE
    * broadcasts the change-key side and the snapshot is never shuffled;
    * with bucketed snapshots even the fallback shuffle co-locates. The
    * incoming payload rides from `newRows`, not through the diff, so the
    * diff's shuffle stays fixed-width (ChangeCapture contract). */
  def applyChangeset(oldDf: DataFrame, changes: DataFrame,
                     newRows: DataFrame, keyCols: Seq[String]): DataFrame = {
    val gone = changes
      .filter(col("change_type").isin(DeleteType, UpdateType))
      .select(keyCols.map(col): _*)
    val incomingKeys = changes
      .filter(col("change_type").isin(InsertType, UpdateType))
      .select(keyCols.map(col): _*)
    oldDf.join(gone, keyCols, "left_anti")
      .unionByName(newRows.join(incomingKeys, keyCols, "left_semi"))
  }

  /** The non-`unchanged` rows only — the incremental work list. */
  def changedKeys(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                  compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, keyCols, compareCols)
      .filter(col("change_type") =!= UnchangedType)
}

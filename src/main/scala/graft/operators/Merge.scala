package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC application — the MERGE INTO / "apply this changelog to that
  * snapshot" operator. [[Scd2]] keeps full history (validity intervals);
  * this produces the NEW CURRENT SNAPSHOT: last change per key wins, deletes
  * drop the row, inserts/updates upsert it, untouched base rows pass
  * through. The batch twin of the streaming upsert sink's compacted-topic
  * semantics.
  */
object Merge {

  /** Apply `changes` (base's columns + `opCol` ∈ I/U/D + `seqCol`) to
    * `base`. The highest-`seqCol` change per key decides the key's fate —
    * (key, seq) must be unique per key or the winner is ambiguous (the
    * changelog's offset/LSN naturally is). I and U are both upserts: a
    * changelog replayed from before the base snapshot must converge, not
    * error on "insert of existing key".
    *
    * Scale shape: one window + one anti-join + one union, every stage keyed
    * on the SAME key columns, so the whole plan is one shuffle of the
    * changelog plus one of the base; at real scale changes ≪ base and AQE
    * broadcasts the touched-key side of the anti-join — the base is never
    * shuffled at all.
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                     opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val dataCols = changes.columns.filterNot(c => c == opCol || c == seqCol)
    require(dataCols.sorted.sameElements(base.columns.sorted),
      s"changes must carry exactly base's columns plus $opCol/$seqCol: " +
        s"base=${base.columns.mkString(",")} changes=${changes.columns.mkString(",")}")
    // NULL keys in the changelog fail loudly: a NULL-key change would win
    // its own window group and union in as an upsert, while the null-UNSAFE
    // anti-join below never removes the old NULL-key base row — the output
    // would carry BOTH rows instead of replacing/deleting (r5 advisor
    // finding). Row-local check riding the changelog scan, same discipline
    // as the op validation.
    val keyOk = keyCols.map(col(_).isNotNull).reduce(_ && _)
    val checked = changes.filter(when(keyOk, lit(true)).otherwise(
      raise_error(lit(s"applyChangelog: change rows must have non-null keys " +
        s"(${keyCols.mkString(", ")})")).cast("boolean")))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val latest = checked.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val untouched = base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    // a null/unknown op would otherwise become a SILENT DELETE (the key is
    // anti-joined away, and `op =!= 'D'` evaluates null → never re-inserted);
    // validate inside the filter so every winning change is checked at run
    // time, malformed changelogs fail loudly
    val opOk = col(opCol).isin("I", "U", "D")
    val upserts = latest
      .filter(when(opOk, col(opCol) =!= "D").otherwise(raise_error(concat(
        lit(s"applyChangelog: $opCol must be I/U/D, got "),
        coalesce(col(opCol), lit("NULL")))).cast("boolean")))
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }
}

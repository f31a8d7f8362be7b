package graft.sources

import org.apache.spark.sql.types.StructType

/** The append-compatibility check both open-format interops share
  * ([[DeltaInterop.write]], [[IcebergInterop.write]]): a name-only
  * comparison lets a same-name different-type append write data files
  * that disagree with the table's recorded schema — later reads under
  * the declared schema fail or silently null the column — so appends
  * compare the full field set by NAME + TYPE, plus the one-directional
  * nullability rule (non-nullable data into a nullable column is fine;
  * nullable data into a required column is a refusal, it could plant
  * nulls the declared schema forbids). */
private[sources] object InteropSchema {

  /** Refuse-by-name unless `incoming` can append under `table`'s
    * recorded schema. */
  def requireAppendCompatible(incoming: StructType, recorded: StructType,
                              table: String): Unit = {
    val in = incoming.fields.map(f => f.name -> f).toMap
    val rec = recorded.fields.map(f => f.name -> f).toMap
    val missing = rec.keySet -- in.keySet
    val extra = in.keySet -- rec.keySet
    require(missing.isEmpty && extra.isEmpty,
      s"append schema does not match table $table by name — " +
        s"missing [${missing.toSeq.sorted.mkString(", ")}], " +
        s"unexpected [${extra.toSeq.sorted.mkString(", ")}]")
    val retyped = rec.collect {
      case (name, rf) if in(name).dataType != rf.dataType =>
        s"$name: ${in(name).dataType.sql} vs recorded ${rf.dataType.sql}"
    }
    require(retyped.isEmpty,
      s"append schema re-types column(s) of table $table — " +
        s"${retyped.mkString("; ")}; data files written under a " +
        "different type than the recorded schema read back as nulls " +
        "or errors")
    val nullsIntoRequired = rec.collect {
      case (name, rf) if in(name).nullable && !rf.nullable => name
    }
    require(nullsIntoRequired.isEmpty,
      s"append schema makes required column(s) " +
        s"[${nullsIntoRequired.toSeq.sorted.mkString(", ")}] of table " +
        s"$table nullable — the recorded schema forbids nulls there")
  }

  /** True when two schemas are the same table shape (the overwrite
    * schema-change test: column order and metadata are not identity). */
  def sameShape(a: StructType, b: StructType): Boolean = {
    def shape(s: StructType): Set[(String, org.apache.spark.sql.types.DataType, Boolean)] =
      s.fields.map(f => (f.name, f.dataType, f.nullable)).toSet
    shape(a) == shape(b)
  }
}

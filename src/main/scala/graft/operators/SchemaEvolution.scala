package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additive schema evolution for snapshot pipelines.
  *
  * Real snapshot feeds gain columns over time (a new CRM field, a new
  * tag). The reference's positional union breaks the moment schemas
  * drift; silently dropping the new column loses data. This aligns
  * frames to the union of their columns instead: missing columns are
  * null-filled, integral/fractional types widen (int→long,
  * float→double), and anything irreconcilable (same name, conflicting
  * types) fails loudly — schema CONFLICTS are bugs, schema GROWTH is
  * normal.
  *
  * Interlock with SCD change detection: the row hash builds on
  * `concat_ws`, which SKIPS nulls — so back-filling old rows with a
  * null new column leaves their hashes (and thus their change status)
  * untouched. A column addition does not stampede the whole dimension
  * into `Changed` on its first day. That null-skip quirk is preserved
  * from the reference for hash compatibility (SURVEY §2.8); here it is
  * load-bearing, and [[graft.SchemaEvolutionSpec]] pins it.
  */
object SchemaEvolution {

  /** Widened common type for two column types, if any. */
  private def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
    case (ShortType, IntegerType) | (IntegerType, ShortType) => Some(IntegerType)
    case (ShortType, LongType) | (LongType, ShortType) => Some(LongType)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case _ => None
  }

  /** The evolved target schema for a set of frames: union of columns
    * in first-seen order, types widened; conflicting types throw.
    */
  def evolvedSchema(dfs: Seq[DataFrame]): StructType = {
    require(dfs.nonEmpty, "no frames")
    val fields = collection.mutable.LinkedHashMap.empty[String, StructField]
    dfs.foreach(_.schema.fields.foreach { f =>
      fields.get(f.name) match {
        case None => fields(f.name) = f.copy(nullable = true)
        case Some(prev) =>
          val t = widen(prev.dataType, f.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"column ${f.name} has irreconcilable types " +
                s"${prev.dataType.simpleString} vs ${f.dataType.simpleString}"))
          fields(f.name) = prev.copy(dataType = t)
      }
    })
    StructType(fields.values.toSeq)
  }

  /** Project a frame onto the target schema: present columns cast to
    * the (possibly widened) target type, absent columns null.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** Union frames under the evolved schema (by NAME, not position). */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    val target = evolvedSchema(dfs)
    dfs.map(alignTo(_, target)).reduce(_ union _)
  }
}

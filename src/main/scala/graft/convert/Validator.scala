package graft.convert

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative record validation/conversion — the engine's replacement for
  * the reference's per-record converter family
  * (common/converters/data/AbstractDataConverter.java:102-171,
  * SparkSourceDataConverter.java:94-158, CassandraSinkDataConverter.java:136-215).
  *
  * Instead of a JVM object per record with try/catch, validation is a set of
  * (rule-name, failure-condition) pairs compiled to ONE codegen'd projection
  * adding an `error_message` column (null == valid). Splitting/writing the two
  * streams is the caller's choice (Fork.validErrorSplit or two filters).
  * Fully pushdown/codegen-friendly; nothing leaves Tungsten rows.
  */
object Validator {
  val ErrorCol = "error_message"

  final case class Rule(name: String, failWhen: Column)

  /** Required non-null keys — reference SparkSourceDataConverter.java:138-155
    * ("required field is missing" semantics). */
  def requiredKeys(cols: Seq[String]): Seq[Rule] =
    cols.map(c => Rule(s"missing_required_field:$c", col(c).isNull))

  /** Apply rules; first failing rule wins (stable order), null when valid. */
  def withErrors(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val err = rules.foldRight(lit(null).cast(StringType): Column) {
      case (r, acc) => when(r.failWhen, lit(r.name)).otherwise(acc)
    }
    df.withColumn(ErrorCol, err)
  }

  def valid(df: DataFrame): DataFrame =
    df.filter(col(ErrorCol).isNull).drop(ErrorCol)
  def errors(df: DataFrame): DataFrame =
    df.filter(col(ErrorCol).isNotNull)

  /** Drop `_`-prefixed (internal/metadata) fields — reference
    * SparkSourceDataConverter.java:77-78. */
  def dropInternalFields(df: DataFrame): DataFrame = {
    val internal = df.columns.filter(_.startsWith("_"))
    if (internal.isEmpty) df else df.drop(internal.toIndexedSeq: _*)
  }

  /** Coerce columns to a target schema; unknown columns dropped, missing
    * columns added as null. Recurses through structs, arrays, and maps —
    * the reference normalizer's full coverage
    * (utilities/GenericRecordUtil.java:152-278 fixes enums/numbers through
    * RECORD/ARRAY/MAP), expressed as nested column rebuilds (codegen'd,
    * no UDF). */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      have.get(f.name) match {
        case Some(dt) => conformColumn(col(f.name), dt, f.dataType).as(f.name)
        case None     => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def conformColumn(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if f == t => c
      case (fs: StructType, ts: StructType) =>
        val haveF = fs.fields.map(f => f.name -> f.dataType).toMap
        val rebuilt = struct(ts.fields.toIndexedSeq.map { tf =>
          haveF.get(tf.name) match {
            case Some(fdt) => conformColumn(c.getField(tf.name), fdt, tf.dataType).as(tf.name)
            case None      => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        // a null struct must stay null, not become a struct of nulls
        when(c.isNull, lit(null).cast(ts)).otherwise(rebuilt)
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        transform(c, x => conformColumn(x, fe, te))
      case (MapType(_, fv, _), MapType(_, tv, _)) =>
        transform_values(c, (_, v) => conformColumn(v, fv, tv))
      case _ => c.cast(to)
    }
}

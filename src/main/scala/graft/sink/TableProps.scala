package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Build-time knobs persisted as TABLE PROPERTIES on the index's own
  * catalog entries — the discipline that keeps an index SELF-DESCRIBING:
  * a knob baked into persisted bytes (the Jaccard threshold behind a
  * prefix index, the partition modulus behind a layout, the k behind a
  * stored graph) must travel WITH those bytes, not be re-supplied by every
  * caller. A maintenance verb that re-took such a knob as a parameter
  * defaulting to the common value would silently maintain an index built
  * with any OTHER value at the wrong setting (round-11 ADVICE: a clustered
  * index built at threshold ≠ 0.6 was extended/repaired at 0.6 with no
  * error, breaking the incremental-≡-from-scratch invariant).
  *
  * Properties are catalog metadata: zero file I/O to read, they ride
  * `ALTER TABLE RENAME` (so generation swaps carry them), and appends
  * never touch them. The one seam is a full-table REPLACE
  * ([[Bucketed.replaceTable]] writes a fresh staging table with no
  * properties) — callers that compact a property-carrying table re-stamp
  * the value after the replace, reading it before.
  */
object TableProps {

  def set(spark: SparkSession, table: String, kv: (String, String)*): Unit = {
    val props = kv.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ($props)")
  }

  def get(spark: SparkSession, table: String, key: String): Option[String] =
    spark.sessionState.catalog.getTableMetadata(TableIdentifier(table))
      .properties.get(key)

  /** Read a required knob — a property-carrying table that lost its
    * property is corruption worth failing loudly on, never defaulting. */
  def required(spark: SparkSession, table: String, key: String): String =
    get(spark, table, key).getOrElse(
      sys.error(s"$table is missing required table property $key"))
}

package graft.jobs

import graft.functions.StringFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** E3 — the OBIS SQL generator (`notebooks/export_in_obis.R:1-13`) as a
  * pure function over the E1 output (the reference reads `df_combined`
  * from cross-notebook session state; here it's an explicit argument).
  *
  * Output: one `update layers_layer …` statement string per dataset
  * (K7), with the C7 recode and C21 SQL-literal quoting.
  */
object ExportInObis {

  /** C7 (export_in_obis.R:3-9): the verbatim recode — one answer maps
    * explicitly to null, four to enums, everything else passes through.
    */
  def recodeInObis(c: Column): Column =
    when(c.isin(Recodes.inObisToNull.toSeq: _*), lit(null))
      .otherwise(StringFunctions.recode(c, Recodes.inObis))

  /** The statement column (export_in_obis.R:10-12): null → the SQL
    * keyword null, else single-quoted; the WHERE key is the layer
    * identifier.
    */
  def statements(combined: DataFrame): DataFrame =
    combined.select(
      concat(
        lit("update layers_layer set data_in_obis = "),
        StringFunctions.sqlLiteral(recodeInObis(col("in_obis"))),
        lit(" where name = '"), col("identifier"), lit("';")).as("stmt"))
}

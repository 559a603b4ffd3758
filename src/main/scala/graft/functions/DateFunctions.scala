package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date scalar functions from the reference's temporal cleaning.
  * All pure built-in compositions (codegen'd, no UDFs).
  */
object DateFunctions {

  /** Year-string → Jan 1 of that year; non-year junk ("current", "") →
    * null (reference `parse_date_time(orders="y")` → `as.Date`,
    * notebooks/index.Rmd:103,182).
    */
  def yearStart(c: Column): Column = {
    val y = regexp_extract(c, "(\\d{4})", 1)
    when(y === "", lit(null).cast("date"))
      .otherwise(to_date(concat(y, lit("-01-01"))))
  }

  /** Year-string → Dec 31 of that year (reference
    * `ceiling_date(date, "year") - days(1)`, notebooks/index.Rmd:104,183).
    */
  def yearEnd(c: Column): Column = {
    val y = regexp_extract(c, "(\\d{4})", 1)
    when(y === "", lit(null).cast("date"))
      .otherwise(to_date(concat(y, lit("-12-31"))))
  }

  /** Split a "1979-current" style range on the first non-alphanumeric run
    * (reference `tidyr::separate`, notebooks/index.Rmd:177-178). Returns
    * (start, end); a single token yields (token, null).
    */
  def splitRange(c: Column): (Column, Column) = {
    val parts = split(c, "[^A-Za-z0-9]+")
    val start = element_at(parts, 1)
    val end = when(size(parts) >= 2, element_at(parts, 2))
    (start, end)
  }

  /** Mutually null-out a coordinate pair: if either is null, both are
    * (reference notebooks/index.Rmd:281-284). Returns (lat, lon).
    */
  def mutualNull(lat: Column, lon: Column): (Column, Column) = {
    val anyNull = lat.isNull || lon.isNull
    (when(anyNull, lit(null)).otherwise(lat),
     when(anyNull, lit(null)).otherwise(lon))
  }
}

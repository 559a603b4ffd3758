package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Custom aggregations from the reference's group-merge stage
  * (notebooks/index.Rmd:290-341), as composable Column expressions where
  * built-ins suffice and `Aggregator`s where exact ordering semantics
  * require custom state.
  */
object Aggregators {

  /** The reference's `concat()` helper (notebooks/index.Rmd:291-295):
    * distinct, null-dropped, whitespace-squashed values joined by "; ".
    *
    * Built-in composition — `collect_list` drops nulls natively; sorting
    * makes the result deterministic under any partitioning (the reference
    * preserves input order, which is only meaningful single-threaded; we
    * pin sorted order and document the difference).
    */
  def concatDistinctSorted(c: Column, sep: String = "; "): Column =
    array_join(
      array_sort(array_distinct(collect_list(trim(regexp_replace(c, "\\s+", " "))))),
      sep)

  /** Boolean OR aggregate over a nullable flag column (reference
    * `as.logical(max(eov_*))`, notebooks/index.Rmd:317-328): true if any
    * true, false if any non-null false, null if all null.
    */
  def boolOr(c: Column): Column = max(c)

  /** Order-preserving distinct string concat as a typed Aggregator —
    * exact reference semantics (first-seen order) for single-partition /
    * sorted-input use, and the merge is associative on ordered buffers.
    * IN = (sortKey, value); buffer = ordered distinct values.
    */
  class OrderedConcatAgg(sep: String)
      extends Aggregator[(Long, String), List[(Long, String)], String] {
    def zero: List[(Long, String)] = Nil
    def reduce(b: List[(Long, String)], a: (Long, String)): List[(Long, String)] =
      if (a._2 == null) b else a :: b
    def merge(b1: List[(Long, String)], b2: List[(Long, String)]): List[(Long, String)] =
      b1 ++ b2
    def finish(b: List[(Long, String)]): String = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      b.sortBy(_._1).foreach { case (_, v) =>
        seen += v.trim.replaceAll("\\s+", " ")
      }
      seen.mkString(sep)
    }
    def bufferEncoder: Encoder[List[(Long, String)]] = Encoders.kryo
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Geometry union of POINT rows into a MULTIPOINT WKT (reference
    * `st_union` on point geometries, notebooks/index.Rmd:332). Points
    * are (lon, lat) structs; output is deterministic (sorted). Empty
    * group → "GEOMETRYCOLLECTION EMPTY" (matching sf's empty union).
    */
  def multipointWkt(lon: Column, lat: Column): Column = {
    val pts = array_sort(array_distinct(collect_list(
      when(lon.isNotNull && lat.isNotNull, struct(lon.as("x"), lat.as("y"))))))
    when(size(pts) === 0, lit("GEOMETRYCOLLECTION EMPTY"))
      .when(size(pts) === 1,
        concat(lit("POINT ("),
          element_at(pts, 1).getField("x").cast("string"), lit(" "),
          element_at(pts, 1).getField("y").cast("string"), lit(")")))
      .otherwise(concat(lit("MULTIPOINT ("),
        array_join(transform(pts, p =>
          concat(lit("("), p.getField("x").cast("string"), lit(" "),
            p.getField("y").cast("string"), lit(")"))), ", "),
        lit(")")))
  }

  /** LINESTRING WKT from ordered points (reference
    * `st_linestring(st_coordinates(...))`, notebooks/index.Rmd:549-553):
    * aggregate (order, lon, lat) and join in order.
    */
  def linestringWkt(order: Column, lon: Column, lat: Column): Column =
    concat(lit("LINESTRING ("),
      array_join(transform(
        array_sort(collect_list(struct(order, lon.as("x"), lat.as("y")))),
        p => concat(p.getField("x").cast("string"), lit(" "),
          p.getField("y").cast("string"))), ", "),
      lit(")"))
}

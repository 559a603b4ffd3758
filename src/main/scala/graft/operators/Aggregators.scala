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
      array_sort(array_distinct(collect_list(trim(regexp_replace(c, graft.plans.Kernels.WsRun, " "))))),
      sep)

  /** Boolean OR aggregate over a nullable flag column (reference
    * `as.logical(max(eov_*))`, notebooks/index.Rmd:317-328): true if any
    * true, false if any non-null false, null if all null.
    */
  def boolOr(c: Column): Column = max(c)

  /** One (sortKey, value) entry of the ordered-concat buffer. */
  case class KeyedVal(k: Long, v: String)

  /** Buffer wrapper so the Aggregator state gets a product (Tungsten)
    * encoder instead of Kryo blobs. Entries are kept k-sorted at all
    * times, so `merge` is a linear merge of two sorted runs.
    */
  case class OrderedBuf(items: Seq[KeyedVal])

  /** Order-preserving distinct string concat as a typed Aggregator —
    * exact reference semantics (`concat` helper, first-seen order,
    * notebooks/index.Rmd:291-295): values are whitespace-squashed, nulls
    * dropped, deduplicated keeping the occurrence with the LOWEST sort
    * key, and joined in sort-key order. IN = (sortKey, value); the sort
    * key pins the reference's physical row order explicitly, which makes
    * the result deterministic under any partitioning.
    */
  class OrderedConcatAgg(sep: String)
      extends Aggregator[(Long, String), OrderedBuf, String] {
    private def insert(items: Seq[KeyedVal], a: KeyedVal): Seq[KeyedVal] = {
      val i = items.indexWhere(_.k > a.k)
      if (i < 0) items :+ a else (items.take(i) :+ a) ++ items.drop(i)
    }
    def zero: OrderedBuf = OrderedBuf(Vector.empty)
    def reduce(b: OrderedBuf, a: (Long, String)): OrderedBuf =
      if (a._2 == null) b
      else OrderedBuf(insert(b.items, KeyedVal(a._1, a._2.trim.replaceAll(graft.plans.Kernels.WsRun, " "))))
    def merge(x: OrderedBuf, y: OrderedBuf): OrderedBuf = {
      // linear merge of two k-sorted runs
      val out = Vector.newBuilder[KeyedVal]
      var (i, j) = (0, 0)
      val (a, b) = (x.items, y.items)
      while (i < a.length && j < b.length) {
        if (a(i).k <= b(j).k) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      }
      out ++= a.drop(i); out ++= b.drop(j)
      OrderedBuf(out.result())
    }
    def finish(b: OrderedBuf): String = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      b.items.foreach(seen += _.v)
      seen.mkString(sep)
    }
    def bufferEncoder: Encoder[OrderedBuf] = Encoders.product[OrderedBuf]
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

package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E1 golden-count tests against the rendered-notebook evidence
  * (/root/reference/docs/index.html: "A tibble: N × M" shapes
  * 371×25, 367×21, 256×21, 627×29, 218×6; our frames carry
  * `in_obis`/`interest_obis`, which the rendered run predates —
  * see the LoadPortal scaladoc).
  */
class LoadPortalSpec extends SparkSpec {

  private val dataDir = "/root/reference/data"
  private lazy val job = new LoadPortal(spark, dataDir)

  test("df_initial has 371 rows (golden: docs/index.html)") {
    assert(job.initial.count() === 371L)
  }

  test("df_initial schema: 27 columns = rendered 25 + in_obis/interest_obis") {
    val cols = job.initial.drop("_row").columns
    assert(cols.length === 27)
    val expected = Seq("name", "abstract", "abbreviation", "url", "start_date",
      "end_date", "temporal_resolution", "geometry_geojson", "contact_firstname",
      "contact_lastname", "contact_email", "source", "in_obis", "interest_obis")
    expected.foreach(c => assert(cols.contains(c), s"missing column $c"))
    assert(cols.count(_.startsWith("eov_")) === 13)
  }

  test("eov flags are non-null booleans; Aleutian point fix applied (index.Rmd:127)") {
    val row = job.initial
      .filter(col("name") === "Aleutian Islands Benthic Habitat Survey")
      .select(col("eov_benthicinvertebrates")).collect()
    assert(row.length === 1 && row.head.getBoolean(0))
    val nulls = job.initial.filter(col("eov_birds").isNull).count()
    assert(nulls === 0L)
  }

  test("temporal_resolution recoded onto the 10-value ladder or passthrough") {
    val vals = job.initial.select(col("temporal_resolution")).distinct()
      .collect().map(_.getString(0)).filter(_ != null)
    val ladder = Recodes.frequencies.toSet
    // every recoded value must be on the ladder ("NA"-ish raw values are null)
    assert(vals.forall(v => ladder.contains(v)), s"off-ladder: ${vals.filterNot(ladder.contains).mkString(",")}")
  }

  test("df_eurosea raw has 367 rows × 21 columns (golden)") {
    val df = job.euroseaRaw.drop("_row")
    assert(df.count() === 367L)
    assert(df.columns.length === 21)
  }

  test("df_eurosea merged has 256 rows × 21 columns (golden)") {
    val df = job.eurosea.drop("_row")
    assert(df.count() === 256L)
    assert(df.columns.length === 21)
  }

  test("eurosea merge: dates null-skip, urls ordered-distinct-joined") {
    val df = job.eurosea
    // spot invariants: start <= end where both present
    val bad = df.filter(col("start_date").isNotNull && col("end_date").isNotNull &&
      col("start_date") > col("end_date")).count()
    assert(bad === 0L)
    // url concat separator
    val multi = df.filter(col("url").contains("; ")).count()
    assert(multi >= 1L, "expected at least one merged multi-url group")
  }

  test("df_combined has 627 rows (golden)") {
    assert(job.combined.count() === 627L)
  }

  test("combined ids are 1..627 in bind order: initial first, then eurosea") {
    val ids = job.combined.select(col("id"), col("source")).collect()
    assert(ids.map(_.getInt(0)).sorted.toSeq === (1 to 627))
    val initialIds = ids.filter(_.getString(1) == "initial").map(_.getInt(0))
    assert(initialIds.max === 371 && initialIds.min === 1)
  }

  test("identifiers: duplicates get _1 suffixes, result unique (index.Rmd:392-393)") {
    val df = job.withIdentifiers
    assert(df.select(col("identifier")).distinct().count() === 627L)
    val suffixed = df.filter(col("identifier") =!= col("original_identifier"))
    assert(suffixed.count() > 0L)
    // first occurrence keeps the unsuffixed name
    val otn = df.filter(col("original_identifier") === "ocean_tracking_network")
      .orderBy(col("id")).select(col("identifier")).collect().map(_.getString(0))
    assert(otn.head === "ocean_tracking_network")
    assert(otn.tail.forall(_.matches("ocean_tracking_network_\\d+")))
  }

  test("duplicate-identifier report matches the rendered duplicates table shape") {
    val dups = job.duplicates.collect()
    // rendered kable (docs/index.html) lists ~101 duplicate rows; exact
    // membership checks for identifiers visible in the rendered table
    val idents = dups.map(_.getAs[String]("identifier")).toSet
    Seq("ocean_tracking_network", "reef_life_survey", "cascais_watch",
      "ionian_dolphin_project").foreach(i => assert(idents.contains(i), s"missing $i"))
    assert(dups.length >= 90 && dups.length <= 110,
      s"duplicate report row count ${dups.length} out of expected band")
  }

  test("users: 218 rows × 6 cols, pks 2001.. (golden)") {
    val u = job.users
    assert(u.count() === 218L)
    assert(u.columns.toSeq === Seq("first_name", "last_name", "email", "username", "is_superuser", "pk"))
    val pks = u.select(col("pk")).collect().map(_.getInt(0)).sorted
    assert(pks.head === 2001 && pks.last === 2218)
  }

  test("user_pk backfill joins users onto combined by email (J2)") {
    val wu = job.withUserPks(job.withIdentifiers)
    val withPk = wu.filter(col("user_pk").isNotNull).count()
    val withEmail = wu.filter(col("contact_email").isNotNull).count()
    assert(withPk === withEmail, "every row with an email must resolve a user_pk")
  }

  test("layer-pk join (J3) with an in-memory fake API frame") {
    import spark.implicits._
    val fake = Seq((101L, "ocean_tracking_network"), (102L, "no_such_layer"))
      .toDF("pk", "identifier")
    val joined = job.withLayerPks(job.withIdentifiers, fake)
    assert(joined.filter(col("pk") === 101L).count() === 1L)
    assert(joined.filter(col("pk").isNotNull).count() === 1L)
  }
}

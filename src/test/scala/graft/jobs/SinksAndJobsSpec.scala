package graft.jobs

import graft.SparkSpec
import graft.io.{GeoNodeApi, JdbcBoundary, MetadataUpsert}
import org.apache.spark.sql.functions._

/** K2/K3 fixtures, E2 (EovToKeywords) with in-memory fakes, E3
  * (ExportInObis), and the K5 statement generator.
  */
class SinksAndJobsSpec extends SparkSpec {

  private val dataDir = "/root/reference/data"
  private lazy val job = new LoadPortal(spark, dataDir)

  test("K2: eovs.json matches the reference fixture layout byte-for-byte on row 1") {
    val json = Fixtures.eovsJson(spark)
    val expectedFirst =
      """{"model":"goos.eov","pk":1,"fields":{"name":"Phytoplankton biomass and diversity","short_name":"Phytoplankton","description":"Phytoplankton biomass and diversity","url":"https://www.goosocean.org/index.php?option=com_oe&task=viewDocumentRecord&docID=17507"}}"""
    assert(json.startsWith("[" + expectedFirst + ","))
    // 12 entries, last two urls null (index.Rmd:642-643)
    assert(json.split("\\{\"model\"").length - 1 === 12)
    assert(json.contains("\"short_name\":\"Microbes\",\"description\":\"Microbe biomass and diversity\",\"url\":null"))
    assert(json.endsWith("}}]"))
  }

  test("K3: users.json is one array of 218 people.profile entries with pks 2001..2218") {
    val json = Fixtures.usersJson(job.users)
    assert(json.startsWith("[{\"model\":\"people.profile\",\"pk\":2001,"))
    assert(json.split("\\{\"model\"").length - 1 === 218)
    assert(json.contains("\"is_superuser\":false"))
    assert(json.contains("\"pk\":2218"))
  }

  private def golden(name: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource(s"/goldens/$name").toURI)), "UTF-8")

  test("K2: eovs.json equals the committed golden byte-for-byte") {
    assert(Fixtures.eovsJson(spark) === golden("eovs.json"))
  }

  test("K3: users.json over the reference data equals the committed golden byte-for-byte") {
    assert(Fixtures.usersJson(job.users) === golden("users.json"))
  }

  test("E2: 1,440 backup links map to keyword rows; unmatched short_names → null") {
    import spark.implicits._
    val links = EovToKeywords.readBackup(spark, s"$dataDir/layers_layer_eovs.csv")
    assert(links.count() === 1440L)
    // fake tkeywords: API payload shape, goosocean filter applied upstream
    val tk = Seq(
      (501L, "Phytoplankton", "https://x/goosocean/phyto"),
      (502L, "Zooplankton", "https://x/goosocean/zoo"),
      (503L, "Fish", "https://x/goosocean/fish"))
      .toDF("id", "alt_label", "about")
    val out = EovToKeywords.mapToKeywords(links, tk)
    assert(out.columns.toSeq === Seq("resourcebase_id", "thesauruskeyword_id"))
    assert(out.count() === 1440L)
    val mapped = out.filter(col("thesauruskeyword_id").isNotNull).count()
    val phyto = links.filter(col("short_name").isin("Phytoplankton", "Zooplankton", "Fish")).count()
    assert(mapped === phyto)
  }

  test("S10: tkeywords API scan parses JSON and applies the goosocean filter (F4)") {
    val payload =
      """{"total":3,"tkeywords":[
        |{"id":1,"alt_label":"Fish","about":"https://geonode.goosocean.org/thesaurus/eov"},
        |{"id":2,"alt_label":"Other","about":"https://example.org/unrelated"},
        |{"id":3,"alt_label":"Birds","about":"http://goosocean.org/t"}]}""".stripMargin
    val fake = new GeoNodeApi.FakeHttpJson(Map("tkeywords" -> payload))
    val df = GeoNodeApi.tkeywords(spark, fake, "http://fake")
    assert(df.count() === 2L)
    assert(df.select(col("alt_label")).collect().map(_.getString(0)).toSet === Set("Fish", "Birds"))
  }

  test("S9: layers API scan yields (pk, identifier)") {
    val payload = """{"layers":[{"pk":"42","name":"ocean_tracking_network"},{"pk":"43","name":"x"}]}"""
    val fake = new GeoNodeApi.FakeHttpJson(Map("layers" -> payload))
    val df = GeoNodeApi.layers(spark, fake, "http://fake")
    assert(df.columns.toSeq === Seq("pk", "identifier"))
    assert(df.filter(col("identifier") === "ocean_tracking_network")
      .select(col("pk")).head().getDouble(0) === 42.0)
  }

  test("E3: statement strings carry the verbatim recode and literal quoting") {
    import spark.implicits._
    val combined = Seq(
      ("prog_a", "Yes; all of the biological data collected by the network is included in OBIS"),
      ("prog_b", "I don't know if the biological data collected by the network is included in OBIS"),
      ("prog_c", "Yes; less than half of the biological data collected by the network is included in OBIS"),
      ("prog_d", null),
      ("prog_e", "unexpected answer")).toDF("identifier", "in_obis")
    val stmts = ExportInObis.statements(combined).collect().map(_.getString(0))
    assert(stmts(0) === "update layers_layer set data_in_obis = 'all' where name = 'prog_a';")
    assert(stmts(1) === "update layers_layer set data_in_obis = null where name = 'prog_b';")
    assert(stmts(2) === "update layers_layer set data_in_obis = 'some' where name = 'prog_c';")
    assert(stmts(3) === "update layers_layer set data_in_obis = null where name = 'prog_d';")
    assert(stmts(4) === "update layers_layer set data_in_obis = 'unexpected answer' where name = 'prog_e';")
  }

  test("E3 over the real pipeline emits 627 statements") {
    assert(ExportInObis.statements(job.withIdentifiers).count() === 627L)
  }

  test("K5: the per-layer upsert emits the reference's six-statement shape") {
    import spark.implicits._
    val df = Seq(
      ("Prog A", "abs", "monthly", java.sql.Date.valueOf("2001-01-01"),
        java.sql.Date.valueOf("2010-12-31"), "http://a", 7L, 2001L,
        true, false, true)) // phyto, zoo, fish
      .toDF("name", "abstract", "temporal_resolution", "start_date",
        "end_date", "url", "pk", "user_pk",
        "eov_phytoplankton", "eov_zooplankton", "eov_fish")
    val stmts = MetadataUpsert.statementsFor(df.head())
    val sqls = stmts.map(_.sql)
    assert(sqls.head.startsWith("update base_resourcebase set title"))
    assert(sqls(1).startsWith("update layers_layer set title_en"))
    assert(sqls(2).startsWith("delete from layers_layer_eovs"))
    // eov inserts: phyto (1) and fish (3), not zoo
    val eovIns = stmts.filter(_.sql.startsWith("insert into layers_layer_eovs"))
    assert(eovIns.map(_.params(1)) === Seq(1, 3))
    assert(sqls.count(_.startsWith("delete from base_contactrole")) === 1)
    assert(stmts.last.sql.startsWith("insert into base_contactrole"))
    assert(stmts.last.params === Seq(7L, 2001L))
  }

  test("K5: rows without a layer pk are skipped; executor sees batched statements") {
    import spark.implicits._
    val df = Seq(
      ("A", "a", "monthly", "u", 7L, 2001L, true),
      ("B", "b", "daily", "u", -1L, -1L, false))
      .toDF("name", "abstract", "temporal_resolution", "url", "pk", "user_pk", "eov_fish")
      .withColumn("pk", when(col("pk") === -1L, lit(null)).otherwise(col("pk")))
      .withColumn("user_pk", when(col("user_pk") === -1L, lit(null)).otherwise(col("user_pk")))
      .withColumn("start_date", lit(null).cast("date"))
      .withColumn("end_date", lit(null).cast("date"))
    val rec = new JdbcBoundary.RecordingExecutor
    rec.clear()
    JdbcBoundary.upsertMetadata(df, () => new JdbcBoundary.RecordingExecutor)
    val stmts = rec.statements
    // only row A (pk 7): 2 updates + 1 delete + 1 eov insert + 1 delete + 1 contact insert
    assert(stmts.length === 6)
    assert(stmts.forall(_.params.contains(7L)))
  }
}

package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REST API sources (SURVEY §2.1 S9/S10): the GeoNode layers and
  * thesaurus-keyword endpoints (`notebooks/index.Rmd:695-697`,
  * `eov_to_keywords.Rmd:53-55`). Driver-side HTTP (config-scale
  * payloads) behind an injectable client so jobs and tests never need a
  * live server; the JSON → DataFrame hop uses Spark's own JSON reader,
  * keeping parsing consistent with the rest of the engine.
  */
object GeoNodeApi {

  trait HttpJson {
    def get(url: String): String
  }

  /** Production client (java.net.http, JDK built-in). */
  class JdkHttpJson extends HttpJson {
    private lazy val client = HttpClient.newHttpClient()
    def get(url: String): String = {
      val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  /** Test fake: canned payloads by URL substring. */
  class FakeHttpJson(payloads: Map[String, String]) extends HttpJson {
    def get(url: String): String =
      payloads.collectFirst { case (k, v) if url.contains(k) => v }
        .getOrElse(throw new IllegalArgumentException(s"no fake payload for $url"))
  }

  private def jsonField(spark: SparkSession, json: String, field: String): DataFrame = {
    import spark.implicits._
    val items = spark.read.json(Seq(json).toDS)
      .select(explode(col(field)).as("item"))
    items.select(col("item.*"))
  }

  /** S9 — layer pk ↔ identifier map (index.Rmd:695-697). */
  def layers(spark: SparkSession, client: HttpJson, baseUrl: String): DataFrame =
    jsonField(spark, client.get(s"$baseUrl/api/v2/layers?page_size=10000"), "layers")
      .select(col("pk").cast("double").as("pk"), col("name").as("identifier"))

  /** S10 — thesaurus keywords with the goosocean filter (F4,
    * eov_to_keywords.Rmd:53-55).
    */
  def tkeywords(spark: SparkSession, client: HttpJson, baseUrl: String): DataFrame =
    jsonField(spark, client.get(s"$baseUrl/api/v2/tkeywords?page_size=1000"), "tkeywords")
      .filter(col("about").contains("goosocean"))
}

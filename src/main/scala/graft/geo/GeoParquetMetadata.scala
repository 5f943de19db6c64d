package graft.geo

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** The GeoParquet `geo` footer metadata (SURVEY.md §2 A3).
  *
  * Schema follows the published OGC GeoParquet 1.0 spec (the reference's
  * 2019-era custom keys are unverifiable — SURVEY §1.1): a JSON document
  * under the parquet footer key-value key "geo" naming the primary geometry
  * column and, per geometry column, its encoding ("WKB"), observed geometry
  * types, CRS (default OGC:CRS84) and bbox [xmin, ymin, xmax, ymax].
  */
final case class GeoColumnMeta(
    encoding: String = "WKB",
    geometryTypes: Seq[String] = Nil,
    crs: String = GeoParquetMetadata.DefaultCrs,
    bbox: Option[(Double, Double, Double, Double)] = None)

final case class GeoParquetMetadata(
    version: String = GeoParquetMetadata.Version,
    primaryColumn: String,
    columns: Map[String, GeoColumnMeta]) {

  def toJson: String = {
    val m = GeoParquetMetadata.mapper
    val root = m.createObjectNode()
    root.put("version", version)
    root.put("primary_column", primaryColumn)
    val cols = root.putObject("columns")
    // stable key order => byte-stable metadata fixtures
    columns.toSeq.sortBy(_._1).foreach { case (name, c) =>
      val n = cols.putObject(name)
      n.put("encoding", c.encoding)
      val gt = n.putArray("geometry_types")
      c.geometryTypes.sorted.foreach(gt.add)
      n.put("crs", c.crs)
      c.bbox.foreach { case (xmin, ymin, xmax, ymax) =>
        val b = n.putArray("bbox")
        Seq(xmin, ymin, xmax, ymax).foreach(b.add)
      }
    }
    m.writeValueAsString(root)
  }
}

object GeoParquetMetadata {
  val Version = "1.0.0"
  val DefaultCrs = "OGC:CRS84"
  val FooterKey = "geo"

  private[geo] val mapper = new ObjectMapper()

  def fromJson(json: String): GeoParquetMetadata = {
    val root = mapper.readTree(json)
    val cols = Option(root.get("columns")).map { cn =>
      cn.properties().asScala.map { e =>
        val v = e.getValue
        val gts = Option(v.get("geometry_types"))
          .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
        val bbox = Option(v.get("bbox")).filter(_.isArray).map { b =>
          val a = b.elements().asScala.map(_.asDouble()).toSeq
          (a(0), a(1), a(2), a(3))
        }
        e.getKey -> GeoColumnMeta(
          encoding = Option(v.get("encoding")).map(_.asText()).getOrElse("WKB"),
          geometryTypes = gts,
          crs = Option(v.get("crs")).filterNot(_.isNull).map(_.asText()).getOrElse(DefaultCrs),
          bbox = bbox)
      }.toMap
    }.getOrElse(Map.empty)
    GeoParquetMetadata(
      version = Option(root.get("version")).map(_.asText()).getOrElse(Version),
      primaryColumn = Option(root.get("primary_column")).map(_.asText())
        .getOrElse(cols.keys.headOption.getOrElse("geometry")),
      columns = cols)
  }
}

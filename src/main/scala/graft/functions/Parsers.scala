package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metadata-parsing scalar functions (SURVEY §2.8), all columnar — they
  * run inside whole-stage codegen, no UDFs.
  */
object Parsers {

  /** M4: GRD tag-key normalization (grd_datacube.py:29-57,
    * analytics_IO.py:343-371): lowercase everything except the
    * orbit-state special keys which keep camelCase. */
  private val SpecialKeys = Map(
    "POSX" -> "posX", "POSY" -> "posY", "POSZ" -> "posZ",
    "VELX" -> "velX", "VELY" -> "velY", "VELZ" -> "velZ")

  def correctGrdMetadataKey(key: String): String =
    SpecialKeys.getOrElse(key, key.toLowerCase)

  /** Columnar variant for a map column's keys. */
  def normalizeGrdKeys(m: Column): Column =
    map_from_arrays(
      transform(map_keys(m), k =>
        SpecialKeys.foldLeft(when(lit(false), k)) { case (acc, (from, to)) =>
          acc.when(k === from, lit(to))
        }.otherwise(lower(k))),
      map_values(m))

  /** M8: `"[1.0 2.0, 3.0]"` → array<double> (analytics_IO.py:741-779).
    * Commas removed, whitespace-split, empties dropped. Malformed
    * (no brackets / nested) ⇒ null, mirroring the reference's abort. */
  def parseFloatVector(c: Column): Column = {
    val wellFormed = c.startsWith("[") && c.endsWith("]") &&
      (length(c) - length(regexp_replace(c, "\\[", ""))) === 1
    val inner = regexp_replace(c.substr(lit(2), length(c) - 2), ",", " ")
    when(wellFormed,
      transform(
        filter(split(trim(inner), "\\s+"), t => t =!= ""),
        t => t.cast("double")))
  }

  /** M9: `"['2021-01-01','2021-01-02']"` → array<string>
    * (analytics_IO.py:787-822). */
  def parseDatetimeVector(c: Column): Column = {
    val wellFormed = c.startsWith("[") && c.endsWith("]")
    val inner = c.substr(lit(2), length(c) - 2)
    when(wellFormed,
      transform(split(inner, ","), t => regexp_replace(trim(t), "^'|'$", "")))
  }

  /** S10: KML `<coordinates>` parse (analytics_IO.py:242-265) —
    * "lon,lat[,height] lon,lat[,height] …" → (lon, lat, height) structs.
    * Driver-side (KML files are tiny control inputs, never data-plane). */
  def parseKmlCoordinates(kml: String): Seq[(Double, Double, Double)] = {
    val block = "(?s)<coordinates>(.*?)</coordinates>".r
      .findFirstMatchIn(kml)
      .map(_.group(1))
      .getOrElse(throw new IllegalArgumentException("no <coordinates> element found"))
    block.trim.split("\\s+").filter(_.nonEmpty).toSeq.map { triple =>
      val parts = triple.split(",")
      (parts(0).toDouble, parts(1).toDouble,
        if (parts.length > 2) parts(2).toDouble else 0.0)
    }
  }
}

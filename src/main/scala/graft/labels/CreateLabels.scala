package graft.labels

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

/** Programmatic labels-JSON builder (W3), porting the reference
  * `CreateLabels` semantics (icecube/bin/labels_cube/create_json_labels.py):
  *   - vector: repeated `populate` for one product appends to its objects
  *   - raster: one mask per product; a second populate raises
  *   - instance constructors for bbox / polygon / point / classification
  *
  * Pickle is replaced by plain JSON throughout (SURVEY §7.3 deviation).
  */
final class CreateLabels(labelsType: String) {
  require(Seq("vector", "raster").contains(labelsType),
    s"Labels type must be one of the following: List(vector, raster)")

  private val mapper = new ObjectMapper()
  private case class Entry(productFile: String, var objects: mutable.Buffer[Any], var mask: String)
  private val collection = mutable.Buffer.empty[Entry]

  private def find(productFile: String): Option[Entry] =
    collection.find(_.productFile == productFile)

  def populateLabels(productFile: String, labels: Any): Unit = labelsType match {
    case "vector" =>
      find(productFile) match {
        case Some(e) => e.objects += labels
        case None =>
          val objs = labels match {
            case l: Seq[_] => mutable.Buffer[Any](l: _*)
            case other     => mutable.Buffer[Any](other)
          }
          collection += Entry(productFile, objs, null)
      }
    case "raster" =>
      require(find(productFile).isEmpty, "Cannot append multiple masks against the same raster")
      collection += Entry(productFile, null, String.valueOf(labels))
  }

  def instanceBbox(objClass: String, xmin: Int, ymin: Int, xmax: Int, ymax: Int): Map[String, Any] =
    Map("class" -> objClass, "bbox" -> Map("xmin" -> xmin, "ymin" -> ymin, "xmax" -> xmax, "ymax" -> ymax))
  def instancePolygon(objClass: String, points: Seq[Seq[Int]]): Map[String, Any] =
    Map("class" -> objClass, "polygon" -> points)
  def instancePoint(objClass: String, x: Int, y: Int): Map[String, Any] =
    Map("class" -> objClass, "point" -> Map("x" -> x, "y" -> y))
  def instanceClassification(tags: Seq[String]): Map[String, Any] =
    Map("classification" -> tags)

  /** Deep-convert Scala collections to Jackson-friendly Java ones. */
  private def toJava(v: Any): Object = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, x) => jm.put(String.valueOf(k), toJava(x)) }
      jm
    case s: Seq[_] =>
      val jl = new java.util.ArrayList[Object]()
      s.foreach(x => jl.add(toJava(x)))
      jl
    case other => other.asInstanceOf[Object]
  }

  def toJson: String = {
    val out = new java.util.ArrayList[Object]()
    collection.foreach { e =>
      val labels =
        if (labelsType == "vector") Map("objects" -> e.objects.toSeq)
        else Map("segmentation" -> e.mask)
      out.add(toJava(Map("product_file" -> e.productFile, "labels" -> labels)))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(out)
  }

  def writeLabelsToJson(outFpath: String): Unit =
    Files.write(Paths.get(outFpath), toJson.getBytes(StandardCharsets.UTF_8))
}

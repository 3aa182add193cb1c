package graft.pipeline

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}
import scala.collection.mutable

/**
 * XML pipeline definitions -> the same Map tree the YAML/JSON builder
 * consumes (reference: pipeline/builder/XmlPipelineBuilder.scala:18 — the
 * reference likewise normalizes XML into the shared Map representation).
 *
 * Schema:
 * {{{
 * <pipeline name="p">
 *   <variables><variable name="k">v</variable></variables>
 *   <settings singleSparkSession="true"/>
 *   <aliases><alias name="short" type="fqcn"/></aliases>
 *   <jobs>
 *     <job name="j">
 *       <action name="a" actor="file-reader">
 *         <properties><format>csv</format><options><header>true</header></options></properties>
 *         <output-view name="v" global="false"/>
 *         <input-views><view>x</view></input-views>
 *       </action>
 *     </job>
 *     <job include="other.yaml"/>
 *   </jobs>
 * </pipeline>
 * }}}
 */
object XmlPipelineSupport {

  def parse(text: String): Map[String, Any] = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true) // no XXE
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
    val root = doc.getDocumentElement
    val out = mutable.Map[String, Any]()
    attr(root, "name").foreach(out("name") = _)
    children(root).foreach { e =>
      e.getTagName match {
        case "variables" =>
          out("variables") = children(e).map(v => attr(v, "name").getOrElse("") -> v.getTextContent).toMap
        case "settings" =>
          out("settings") = attrsOf(e)
        case "aliases" =>
          out("aliases") = children(e).map(a =>
            Map("name" -> attr(a, "name").getOrElse(""), "type" -> attr(a, "type").getOrElse(""))).toList
        case "jobs" =>
          out("jobs") = children(e).map(parseJob).toList
        case "udf-registration" =>
          out("udf-registration") = children(e).map(_.getTextContent.trim).toList
        case _ => ()
      }
    }
    out.toMap
  }

  private def parseJob(job: Element): Map[String, Any] =
    attr(job, "include") match {
      case Some(inc) => Map("include" -> inc)
      case None =>
        Map(
          "name" -> attr(job, "name").getOrElse("job"),
          "actions" -> children(job).filter(_.getTagName == "action").map { a =>
            val m = mutable.Map[String, Any](
              "name" -> attr(a, "name").getOrElse(""),
              "actor" -> attr(a, "actor").getOrElse(""))
            children(a).foreach { c =>
              c.getTagName match {
                case "properties" => m("properties") = elementTree(c)
                case "output-view" =>
                  m("output-view") = Map("name" -> attr(c, "name").getOrElse(""),
                    "global" -> attr(c, "global").getOrElse("false"))
                case "input-views" =>
                  m("input-views") = children(c).map(_.getTextContent.trim).toList
                case _ => ()
              }
            }
            m.toMap
          }.toList)
    }

  /** Element -> nested Map (children) or text (leaf). */
  private def elementTree(e: Element): Any = {
    val kids = children(e)
    if (kids.isEmpty) e.getTextContent.trim
    else kids.map(k => k.getTagName -> elementTree(k)).toMap
  }

  private def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect {
      case el: Element if el.getNodeType == Node.ELEMENT_NODE => el
    }
  }

  private def attr(e: Element, name: String): Option[String] =
    Option(e.getAttribute(name)).filter(_.nonEmpty)

  private def attrsOf(e: Element): Map[String, Any] = {
    val m = e.getAttributes
    (0 until m.getLength).map(m.item).map(n => n.getNodeName -> (n.getNodeValue: Any)).toMap
  }
}

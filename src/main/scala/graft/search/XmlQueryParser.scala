package graft.search

import graft.analysis.Analyzer
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Element, Node}

/** XML query syntax — the CoreParser analog
  * (/root/reference/src/Lucene.Net.QueryParser/Xml/CoreParser.cs builder
  * registry; element semantics from Xml/Builders/ *Builder.cs): a query
  * tree expressed as XML elements, used by systems that assemble queries
  * programmatically or from templates (QueryTemplateManager).
  *
  * Supported elements (each citing its reference builder):
  *  - TermQuery (TermQueryBuilder: raw text, fieldName + boost attrs)
  *  - TermsQuery (TermsQueryBuilder: ANALYZED text, one SHOULD per token)
  *  - MatchAllDocsQuery, UserQuery (UserInputQueryBuilder: classic parse)
  *  - BooleanQuery (BooleanQueryBuilder: Clause children with occurs=
  *    must|mustNot|should, minimumNumberShouldMatch attr)
  *  - DisjunctionMaxQuery (tieBreaker attr)
  *  - ConstantScoreQuery (ConstantScoreQueryBuilder: wraps a filter)
  *  - RangeQuery / RangeFilter (RangeFilterBuilder: lowerTerm/upperTerm/
  *    includeLower/includeUpper)
  *  - FilteredQuery (FilteredQueryBuilder: Query child scored, Filter child
  *    restricting — the filter joins as a scoreless MUST)
  *  - SpanTerm, SpanNear (slop + inOrder attrs), SpanOr, SpanOrTerms
  *    (analyzed), SpanNot (Include/Exclude children), SpanFirst (end attr)
  *  - BoostingTermQuery (BoostingTermBuilder → PayloadTermQuery with
  *    AveragePayloadFunction → PayloadScoreQ("avg"))
  *
  * `fieldName` inherits from ancestor elements
  * (DOMUtils.GetAttributeWithInheritance); a non-default field wraps in
  * FieldQ. Unknown elements throw (ParserException analog).
  */
object XmlQueryParser {

  final case class XmlParseException(msg: String) extends IllegalArgumentException(msg)

  def parse(xml: String, analyzer: Analyzer, defaultField: String = "text"): Query = {
    val dbf = DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // query XML is data, never markup with external references
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    query(doc.getDocumentElement, analyzer, defaultField)
  }

  // ------------------------------------------------------------ helpers

  private def childElements(e: Element): List[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).flatMap { i =>
      nl.item(i) match {
        case el: Element => Some(el)
        case _ => None
      }
    }.toList
  }

  private def firstChildOrFail(e: Element): Element =
    childElements(e).headOption.getOrElse(
      throw XmlParseException(s"<${e.getTagName}> needs a child element"))

  private def text(e: Element): String = e.getTextContent.trim

  private def attr(e: Element, name: String, dflt: String): String = {
    val v = e.getAttribute(name)
    if (v == null || v.isEmpty) dflt else v
  }

  private def floatAttr(e: Element, name: String, dflt: Float): Float =
    attr(e, name, dflt.toString).toFloat

  private def intAttr(e: Element, name: String, dflt: Int): Int =
    attr(e, name, dflt.toString).toInt

  private def boolAttr(e: Element, name: String, dflt: Boolean): Boolean =
    attr(e, name, dflt.toString).toBoolean

  /** DOMUtils.GetAttributeWithInheritance: walk ancestors for fieldName. */
  private def inheritedField(e: Element, defaultField: String): String = {
    var n: Node = e
    while (n != null && n.isInstanceOf[Element]) {
      val v = n.asInstanceOf[Element].getAttribute("fieldName")
      if (v != null && v.nonEmpty) return v
      n = n.getParentNode
    }
    defaultField
  }

  private def scoped(q: Query, field: String, defaultField: String): Query =
    if (field == defaultField) q else FieldQ(field, q)

  // ------------------------------------------------------------ builders

  private def query(e: Element, analyzer: Analyzer, defaultField: String): Query = {
    val field = inheritedField(e, defaultField)
    val boost = floatAttr(e, "boost", 1f)
    def boosted(q: Query): Query = if (boost == 1f) q else Query.withBoost(q, boost)
    e.getTagName match {
      case "TermQuery" =>
        // raw text, NOT analyzed (TermQueryBuilder.cs)
        boosted(scoped(TermQ(text(e)), field, defaultField))
      case "TermsQuery" =>
        // analyzed, one SHOULD clause per token (TermsQueryBuilder.cs)
        val ts = analyzer.tokenize(text(e)).map(_.term).toList
        boosted(scoped(BoolQ(ts.map(t => Occur.Should -> (TermQ(t): Query))), field, defaultField))
      case "MatchAllDocsQuery" => MatchAllQ
      case "UserQuery" =>
        boosted(QueryParser.parse(text(e), analyzer))
      case "BooleanQuery" =>
        val clauses = childElements(e).filter(_.getTagName == "Clause").map { c =>
          val occ = attr(c, "occurs", "should").toLowerCase match {
            case "must" => Occur.Must
            case "mustnot" => Occur.MustNot
            case "should" => Occur.Should
            case other => throw XmlParseException(s"invalid occurs: $other")
          }
          occ -> query(firstChildOrFail(c), analyzer, defaultField)
        }
        boosted(BoolQ(clauses, intAttr(e, "minimumNumberShouldMatch", 0)))
      case "DisjunctionMaxQuery" =>
        boosted(DisMaxQ(childElements(e).map(query(_, analyzer, defaultField)),
          floatAttr(e, "tieBreaker", 0f)))
      case "ConstantScoreQuery" =>
        ConstantScoreQ(query(firstChildOrFail(e), analyzer, defaultField), boost)
      case "RangeQuery" | "RangeFilter" =>
        val lo = attr(e, "lowerTerm", null)
        val hi = attr(e, "upperTerm", null)
        boosted(scoped(RangeQ(lo, hi,
          boolAttr(e, "includeLower", dflt = true),
          boolAttr(e, "includeUpper", dflt = true)), field, defaultField))
      case "FilteredQuery" =>
        // Query child keeps its score; Filter child restricts scorelessly
        // (FilteredQueryBuilder.cs — FilteredQuery score = inner score)
        val q = childElements(e).find(_.getTagName == "Query")
          .map(c => query(firstChildOrFail(c), analyzer, defaultField))
          .getOrElse(throw XmlParseException("<FilteredQuery> needs <Query>"))
        val f = childElements(e).find(_.getTagName == "Filter")
          .map(c => query(firstChildOrFail(c), analyzer, defaultField))
          .getOrElse(throw XmlParseException("<FilteredQuery> needs <Filter>"))
        boosted(BoolQ(List(Occur.Must -> q, Occur.Must -> ConstantScoreQ(f, 0f))))
      case "BoostingTermQuery" =>
        // PayloadTermQuery + AveragePayloadFunction (BoostingTermBuilder.cs)
        boosted(scoped(PayloadScoreQ(text(e), "avg"), field, defaultField))
      case "SpanTerm" | "SpanNear" | "SpanOr" | "SpanOrTerms" | "SpanNot" | "SpanFirst" =>
        boosted(scoped(SpanScoreQ(span(e, analyzer)), field, defaultField))
      case other => throw XmlParseException(s"unknown query element <$other>")
    }
  }

  private def span(e: Element, analyzer: Analyzer): SpanQ = e.getTagName match {
    case "SpanTerm" => SpanTermS(text(e))
    case "SpanNear" =>
      val slop = attr(e, "slop", null)
      if (slop == null) throw XmlParseException("<SpanNear> needs slop attribute")
      SpanNearS(childElements(e).map(span(_, analyzer)), slop.toInt,
        boolAttr(e, "inOrder", dflt = false))
    case "SpanOr" => SpanOrS(childElements(e).map(span(_, analyzer)))
    case "SpanOrTerms" =>
      SpanOrS(analyzer.tokenize(text(e)).map(t => SpanTermS(t.term): SpanQ).toList)
    case "SpanNot" =>
      def part(name: String): SpanQ = childElements(e).find(_.getTagName == name)
        .map(c => span(firstChildOrFail(c), analyzer))
        .getOrElse(throw XmlParseException(s"<SpanNot> needs <$name>"))
      SpanNotS(part("Include"), part("Exclude"))
    case "SpanFirst" =>
      SpanFirstS(span(firstChildOrFail(e), analyzer), intAttr(e, "end", 1))
    case other => throw XmlParseException(s"unknown span element <$other>")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzers
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** The three non-classic parser dialects: SimpleQueryParser (never-throws
  * end-user syntax), ComplexPhraseQueryParser (wildcards inside phrases),
  * and the surround span language (W/N distance operators). Tree shapes are
  * pinned against hand-built ADTs; end-to-end results against equivalent
  * hand-built queries on a real index.
  */
class DialectParsersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val simple = Analyzers.byName("simple")

  private lazy val (idx, se) = {
    val base = Files.createTempDirectory("graftdialect").toString
    val df = spark.createDataFrame(PagesGen.local(300)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(3, "simple", groupSize = 3))
    (base, new Searcher(spark, base))
  }

  private def sp(q: String): Query = SimpleQueryParser.parse(q, simple)

  // ----------------------------------------------------------- simple

  test("simple: whitespace joins with the default operator (OR)") {
    assert(sp("quick fox") ==
      BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("fox"))))
  }

  test("simple: + is AND, | is OR, operator change wraps the left fold") {
    assert(sp("quick + fox") ==
      BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))))
    // (quick AND fox) OR dog — BuildQueryTree wraps on operator change
    assert(sp("quick + fox | dog") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))),
        Occur.Should -> TermQ("dog"))))
  }

  test("simple: - negates via (NOT x) OR MatchAll; -- cancels") {
    assert(sp("-quick") ==
      BoolQ(List(Occur.MustNot -> TermQ("quick"), Occur.Should -> MatchAllQ)))
    assert(sp("--quick") == TermQ("quick"))
  }

  test("simple: phrase, slop, prefix, fuzzy") {
    assert(sp("\"quick fox\"") == PhraseQ(List("quick" -> 0, "fox" -> 1)))
    assert(sp("\"quick fox\"~2") == PhraseQ(List("quick" -> 0, "fox" -> 1), slop = 2))
    assert(sp("qui*") == PrefixQ("qui"))
    // fuzzy caps at edit distance 2 (LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE)
    assert(sp("quikc~1") == FuzzyTopQ("quikc", 1))
    assert(sp("quikc~9") == FuzzyTopQ("quikc", 2))
    assert(sp("quikc~0") == TermQ("quikc")) // fuzziness 0 falls back to a term
  }

  test("simple: parentheses set precedence") {
    assert(sp("quick + (fox | dog)") ==
      BoolQ(List(Occur.Must -> TermQ("quick"),
        Occur.Must -> BoolQ(List(Occur.Should -> TermQ("fox"), Occur.Should -> TermQ("dog"))))))
  }

  test("simple: never throws on random operator soup (property)") {
    // the reference's contract: ANY input produces a query, never an error
    val rnd = new scala.util.Random(20260817)
    val alphabet = "ab c()\"+|-~*\\12 ()\"~"
    (0 until 500).foreach { i =>
      val len = rnd.nextInt(24)
      val s = new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
      val q = SimpleQueryParser.parse(s, simple) // must not throw
      assert(q != null, s"fuzz #$i: $s")
    }
  }

  test("simple: malformed input never throws") {
    assert(sp("(unclosed quick") ==
      BoolQ(List(Occur.Should -> TermQ("unclosed"), Occur.Should -> TermQ("quick"))))
    assert(sp("\"unclosed quick") ==
      BoolQ(List(Occur.Should -> TermQ("unclosed"), Occur.Should -> TermQ("quick"))))
    // "()" resets the pending operator: the + before it is dropped
    assert(sp("quick + () fox") ==
      BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("fox"))))
    // operator soup: "~2" survives as a token (fuzzy needs a preceding term)
    assert(sp("~2 + | - ") == TermQ("2"))
    assert(sp(" + | - ") == BoolQ(Nil)) // nothing but operators
  }

  test("simple: escaped operators are literal") {
    // whitespace analyzer keeps the '+' inside the escaped token
    assert(SimpleQueryParser.parse("""qui\+ck""", Analyzers.byName("whitespace")) ==
      TermQ("qui+ck"))
  }

  test("simple: multi-field weights build a per-field SHOULD with leaf boosts") {
    assert(SimpleQueryParser.parse("quick", simple, Seq("title" -> 2f, "body" -> 1f)) ==
      BoolQ(List(
        Occur.Should -> FieldQ("title", TermQ("quick", 2f)),
        Occur.Should -> FieldQ("body", TermQ("quick")))))
  }

  test("simple: disabled flags degrade operators to literals") {
    import SimpleQueryParser._
    val noOps = AllOperators & ~AndOperator & ~PrefixOperator
    // '+' separates nothing (not whitespace) so it glues into the token
    assert(SimpleQueryParser.parse("a+b", Analyzers.byName("whitespace"),
      Seq.empty, Occur.Should, noOps) == TermQ("a+b"))
  }

  test("simple: end-to-end equals the hand-built query") {
    val parsed = se.search(sp("quick + fox | lazy"), 50).collect().toSeq
    val manual = se.search(BoolQ(List(
      Occur.Should -> BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))),
      Occur.Should -> TermQ("lazy"))), 50).collect().toSeq
    assert(parsed == manual && parsed.nonEmpty)
  }

  // ----------------------------------------------------------- complex phrase

  private def cp(q: String): Query = ComplexPhraseParser.parse(q, simple, se)

  test("complex phrase: plain phrases and single terms pass through") {
    assert(cp("\"quick\"") == TermQ("quick"))
    assert(cp("alpha beta") ==
      BoolQ(List(Occur.Should -> TermQ("alpha"), Occur.Should -> TermQ("beta"))))
  }

  test("complex phrase: embedded prefix expands to span-or at the position") {
    cp("\"quick fo*\"") match {
      case SpanScoreQ(SpanNearS(List(SpanTermS("quick"), alt), 0, true), _) =>
        alt match {
          case SpanTermS(t) => assert(t.startsWith("fo"))
          case SpanOrS(cs) => assert(cs.nonEmpty && cs.forall {
            case SpanTermS(t) => t.startsWith("fo"); case _ => false
          })
          case other => fail(s"unexpected alternative $other")
        }
      case other => fail(s"unexpected parse $other")
    }
  }

  test("complex phrase: (a b) group becomes span-or; results match hand-built spans") {
    val q = cp("\"(quick lazy) dog\"~1")
    val manual = SpanScoreQ(SpanNearS(
      List(SpanOrS(List(SpanTermS("quick"), SpanTermS("lazy"))), SpanTermS("dog")), 1, inOrder = true))
    assert(q == manual)
    val got = se.compile(q).collect().toSeq.sortBy(h => (h.segmentId, h.docId))
    val want = se.compile(manual).collect().toSeq.sortBy(h => (h.segmentId, h.docId))
    assert(got == want)
  }

  test("complex phrase: MUST_NOT inside the phrase produces the SpanNot shape") {
    cp("\"quick -brown fox\"") match {
      case SpanScoreQ(SpanNotS(SpanNearS(incl, slopI, true), SpanNearS(all, 0, true)), _) =>
        assert(incl == List(SpanTermS("quick"), SpanTermS("fox")))
        assert(slopI == 1) // slop 0 + numNegatives 1 (Rewrite:350)
        assert(all == List(SpanTermS("quick"), SpanTermS("brown"), SpanTermS("fox")))
      case other => fail(s"unexpected parse $other")
    }
  }

  test("complex phrase: outer boolean context survives substitution") {
    cp("lazy +\"quick fo*\"") match {
      case BoolQ(List((Occur.Should, TermQ("lazy", _)), (Occur.Must, SpanScoreQ(_, _))), _) =>
      case other => fail(s"unexpected parse $other")
    }
  }

  // ----------------------------------------------------------- surround

  test("surround: infix W is adjacency, distance prefixes widen the window") {
    assert(SurroundParser.parse("quick w fox") ==
      SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 0, inOrder = true)))
    assert(SurroundParser.parse("3w(quick, fox)") ==
      SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 2, inOrder = true)))
    assert(SurroundParser.parse("4n(quick, dog)") ==
      SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("dog")), 3, inOrder = false)))
  }

  test("surround: and/or/not and parens") {
    assert(SurroundParser.parse("quick and fox or dog") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))),
        Occur.Should -> TermQ("dog"))))
    assert(SurroundParser.parse("quick not fox") ==
      BoolQ(List(Occur.Must -> TermQ("quick"), Occur.MustNot -> TermQ("fox"))))
    assert(SurroundParser.parse("or(quick, fox)") ==
      BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("fox"))))
  }

  test("surround: W binds tighter than N, which binds tighter than not/and/or") {
    assert(SurroundParser.parse("a w b n c and d") ==
      BoolQ(List(
        Occur.Must -> SpanScoreQ(SpanNearS(List(
          SpanNearS(List(SpanTermS("a"), SpanTermS("b")), 0, inOrder = true),
          SpanTermS("c")), 0, inOrder = false)),
        Occur.Must -> TermQ("d"))))
  }

  test("surround: field scope and weight") {
    assert(SurroundParser.parse("text: quick w fox") ==
      FieldQ("text", SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 0, inOrder = true))))
    assert(SurroundParser.parse("quick^2") == TermQ("quick", 2f))
  }

  test("surround: truncation inside a distance op expands via the dictionary") {
    val q = SurroundParser.parse("quick w fox*", se)
    q match {
      case SpanScoreQ(SpanNearS(List(SpanTermS("quick"), alt), 0, true), _) =>
        alt match {
          case SpanTermS(t) => assert(t.startsWith("fox"))
          case SpanOrS(cs) => assert(cs.nonEmpty)
          case other => fail(s"unexpected $other")
        }
      case other => fail(s"unexpected parse $other")
    }
    // truncation inside a span context needs the dictionary
    intercept[IllegalArgumentException](SurroundParser.parse("quick w fox*"))
    // too-unrestrictive truncation rejected (minimumPrefixLength = 3)
    intercept[SurroundParser.SurroundParseException](SurroundParser.parse("quick w f*", se))
  }

  // ----------------------------------------------------------- xml

  private def xq(xml: String): Query = XmlQueryParser.parse(xml, simple)

  test("xml: TermQuery is raw text with fieldName and boost attributes") {
    assert(xq("<TermQuery>Quick</TermQuery>") == TermQ("Quick")) // NOT analyzed
    assert(xq("""<TermQuery boost="2" fieldName="title">fox</TermQuery>""") ==
      FieldQ("title", TermQ("fox", 2f)))
  }

  test("xml: TermsQuery analyzes; BooleanQuery reads occurs + minimumNumberShouldMatch") {
    assert(xq("<TermsQuery>Quick FOX</TermsQuery>") ==
      BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("fox"))))
    val b = xq(
      """<BooleanQuery minimumNumberShouldMatch="1">
        |  <Clause occurs="must"><TermQuery>quick</TermQuery></Clause>
        |  <Clause occurs="mustNot"><TermQuery>lazy</TermQuery></Clause>
        |  <Clause occurs="should"><TermQuery>fox</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin)
    assert(b == BoolQ(List(
      Occur.Must -> TermQ("quick"),
      Occur.MustNot -> TermQ("lazy"),
      Occur.Should -> TermQ("fox")), 1))
  }

  test("xml: span elements, DisMax, Range, FilteredQuery, UserQuery") {
    assert(xq(
      """<SpanNear slop="2" inOrder="true">
        |  <SpanTerm>quick</SpanTerm><SpanOrTerms>fox dog</SpanOrTerms>
        |</SpanNear>""".stripMargin) ==
      SpanScoreQ(SpanNearS(List(SpanTermS("quick"),
        SpanOrS(List(SpanTermS("fox"), SpanTermS("dog")))), 2, inOrder = true)))
    assert(xq(
      """<SpanNot><Include><SpanTerm>quick</SpanTerm></Include>
        |<Exclude><SpanTerm>lazy</SpanTerm></Exclude></SpanNot>""".stripMargin) ==
      SpanScoreQ(SpanNotS(SpanTermS("quick"), SpanTermS("lazy"))))
    assert(xq("""<SpanFirst end="3"><SpanTerm>the</SpanTerm></SpanFirst>""") ==
      SpanScoreQ(SpanFirstS(SpanTermS("the"), 3)))
    assert(xq(
      """<DisjunctionMaxQuery tieBreaker="0.1">
        |  <TermQuery>quick</TermQuery><TermQuery>fox</TermQuery>
        |</DisjunctionMaxQuery>""".stripMargin) ==
      DisMaxQ(List(TermQ("quick"), TermQ("fox")), 0.1f))
    assert(xq("""<RangeQuery lowerTerm="apple" upperTerm="fig" includeUpper="false"/>""") ==
      RangeQ("apple", "fig", includeLo = true, includeHi = false))
    assert(xq(
      """<FilteredQuery>
        |  <Query><TermQuery>quick</TermQuery></Query>
        |  <Filter><RangeFilter lowerTerm="a" upperTerm="z"/></Filter>
        |</FilteredQuery>""".stripMargin) ==
      BoolQ(List(Occur.Must -> TermQ("quick"),
        Occur.Must -> ConstantScoreQ(RangeQ("a", "z", includeLo = true, includeHi = true), 0f))))
    assert(xq("<UserQuery>+quick fox</UserQuery>") ==
      QueryParser.parse("+quick fox", simple))
    intercept[XmlQueryParser.XmlParseException](xq("<NoSuchQuery>x</NoSuchQuery>"))
  }

  test("xml: end-to-end equals the hand-built query") {
    val q = xq(
      """<BooleanQuery>
        |  <Clause occurs="must"><TermQuery>quick</TermQuery></Clause>
        |  <Clause occurs="should"><TermQuery>lazy</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin)
    val parsed = se.search(q, 50).collect().toSeq
    val manual = se.search(BoolQ(List(
      Occur.Must -> TermQ("quick"), Occur.Should -> TermQ("lazy"))), 50).collect().toSeq
    assert(parsed == manual && parsed.nonEmpty)
  }

  test("auto stopwords derive from the index df and drop with position gaps") {
    // QueryAutoStopWordAnalyzer.cs: stop terms = df > maxPercentDocs * n
    val stops = AutoStopAnalyzer.stopTermsByPercent(se, 0.1f)
    assert(stops.nonEmpty, "fox-corpus has terms above 10% df")
    val a = AutoStopAnalyzer.fromIndex(simple, se, 0.1f)
    val sample = "the quick brown fox " + stops.head
    val toks = a.tokenize(sample).toList
    assert(!toks.exists(t => stops.contains(t.term)), "derived stop leaked through")
    // survivors keep their ABSOLUTE delegate positions (StopFilter gaps)
    val deleg = simple.tokenize(sample).toList.map(t => t.term -> t.position).toMap
    toks.foreach(t => assert(deleg(t.term) == t.position))
  }

  test("analyzing parser: multi-term operands run through the analyzer") {
    val german = Analyzers.byName("german")
    // classic keeps the raw (lowercased) text; analyzing normalizes + stems
    assert(QueryParser.parse("Gärt*", german) == PrefixQ("gärt"))
    assert(AnalyzingQueryParser.parse("Gärt*", german) == PrefixQ("gart"))
    assert(AnalyzingQueryParser.parse("Häuser~1", german) == FuzzyTopQ("haus", 1))
    // wildcard chunks analyze independently, wildcards survive in place
    assert(AnalyzingQueryParser.parse("Gärt?n*", german) == WildcardQ("gart?n*"))
    // identity under a non-normalizing analyzer
    assert(AnalyzingQueryParser.parse("qui*", simple) == PrefixQ("qui"))
    // a chunk the analyzer swallows (German stopword) is an error
    // (AnalyzeSingleChunk: "analyzer returned no output")
    intercept[IllegalArgumentException](AnalyzingQueryParser.parse("und*", german))
  }

  test("expressions: catalyst-compiled sort and bounded rescorer") {
    import org.apache.spark.sql.functions._
    val bindings = se.docs.select(col("url"), col("fieldLen").cast("double").as("flen"))
    val sorted = Expressions.sortBy(se, TermQ("quick"), "_score * sqrt(flen)", bindings, 10)
      .collect()
    assert(sorted.nonEmpty)
    val manual = se.compile(TermQ("quick"))
      .join(se.docs.select("segmentId", "docId", "url", "fieldLen"), Seq("segmentId", "docId"))
      .withColumn("e", col("score") * sqrt(col("fieldLen").cast("double")))
      .orderBy(col("e").desc, col("url").asc).limit(10)
      .select("url").collect().map(_.getString(0)).toSeq
    assert(sorted.map(_.getString(0)).toSeq == manual)
    // the rescorer is second-pass only: its results stay inside the window
    val window = se.search(TermQ("quick"), 5).collect().map(_.getString(0)).toSet
    val rescored = Expressions.rescoreTopK(se, TermQ("quick"), 5, "_score * sqrt(flen)",
      bindings, 5).collect()
    assert(rescored.nonEmpty && rescored.map(_.getString(0)).toSet.subsetOf(window))
  }

  test("surround: distance results equal the hand-built span query") {
    val got = se.compile(SurroundParser.parse("5n(fox, quick)", se)).collect().toSeq
      .sortBy(h => (h.segmentId, h.docId))
    val want = se.compile(SpanScoreQ(SpanNearS(
      List(SpanTermS("fox"), SpanTermS("quick")), 4, inOrder = false)))
      .collect().toSeq.sortBy(h => (h.segmentId, h.docId))
    assert(got == want && got.nonEmpty)
  }
}

package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** UAX29URLEmailTokenizer analog (/root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/Standard/UAX29URLEmailTokenizer.cs): like the standard chain but
  * full URLs and email addresses stay SINGLE tokens typed <URL> / <EMAIL>
  * ("URLs and email addresses are also tokenized according to the relevant
  * RFCs", UAX29URLEmailTokenizer.cs:36).
  *
  * The reference scanner is a generated JFlex DFA
  * (UAX29URLEmailTokenizerImpl*.cs — thousands of packed table rows); this is
  * a from-scratch DOCUMENTED-SCOPE re-expression: URL and email SPANS are
  * located first (scheme://… and www.… per RFC 3986 shape; addr-spec per
  * RFC 5321 dot-atom), then the gaps run through the classic word grammar
  * (ClassicScanner). URL takes precedence over email (userinfo@host inside a
  * URL stays part of the URL, as in the reference grammar).
  */
object UaxUrlEmailTokenizer {

  /** Wiki-style private type ids (outside the classic 0-8 range). The
    * reference uses URL=7/EMAIL=8 in its OWN type table
    * (UAX29URLEmailTokenizer.cs:73-74); here the classic ids keep their
    * slots and URL/EMAIL extend the space. */
  val Url = 20
  val Email = 21

  private val UrlRe =
    """(?i)\b(?:(?:https?|ftp)://|www\.)[^\s<>"\[\]{}|\\^]+""".r
  private val EmailRe =
    ("""[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@""" +
     """[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?""" +
     """(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)+""").r

  private final case class Span(start: Int, end: Int, tpe: Int)

  /** Trailing punctuation never terminates a URL token (the DFA's longest
    * match stops before it). */
  private def trimUrlEnd(s: String, start: Int, end0: Int): Int = {
    var end = end0
    while (end > start && ")].,;:!?'\"".indexOf(s.charAt(end - 1)) >= 0) end -= 1
    end
  }

  def scan(s: String): Iterator[RawToken] = {
    val spans = ArrayBuffer.empty[Span]
    UrlRe.findAllMatchIn(s).foreach { m =>
      val e = trimUrlEnd(s, m.start, m.end)
      if (e > m.start) spans += Span(m.start, e, Url)
    }
    EmailRe.findAllMatchIn(s).foreach { m =>
      // URL precedence: drop an email overlapping any URL span
      if (!spans.exists(sp => m.start < sp.end && sp.start < m.end))
        spans += Span(m.start, m.end, Email)
    }
    val sorted = spans.sortBy(_.start)
    val out = ArrayBuffer.empty[RawToken]
    var prev = 0
    def gap(from: Int, until: Int): Unit =
      if (until > from) {
        val slice = s.substring(from, until)
        ClassicScanner.scan(slice).foreach(t =>
          out += RawToken(t.text, from + t.start, from + t.end, t.tokenType))
      }
    sorted.foreach { sp =>
      gap(prev, sp.start)
      out += RawToken(s.substring(sp.start, sp.end), sp.start, sp.end, sp.tpe)
      prev = sp.end
    }
    gap(prev, s.length)
    out.iterator
  }
}

/** UAX29URLEmailAnalyzer chain (UAX29URLEmailAnalyzer.cs: tokenizer ->
  * StandardFilter -> LowerCase -> English stops). URL/EMAIL tokens pass the
  * standard filter untouched (they are neither apostrophe nor acronym typed). */
object UaxUrlEmailAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = new Iterator[Token] {
    private val raw = UaxUrlEmailTokenizer.scan(text)
    private var pos = -1
    private var pendingIncr = 0 // StopFilter.cs skippedPositions accumulation
    private var nextTok: Token = null
    advance()

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && raw.hasNext) {
        val r0 = raw.next()
        val r = if (r0.tokenType == UaxUrlEmailTokenizer.Url ||
                    r0.tokenType == UaxUrlEmailTokenizer.Email) r0
                else StandardAnalyzer.standardFilter(r0)
        val term = r.text.toLowerCase
        if (StandardAnalyzer.EnglishStopWords.contains(term)) pendingIncr += 1
        else {
          pos += 1 + pendingIncr
          pendingIncr = 0
          nextTok = Token(term, pos, r.start, r.end, r.tokenType)
        }
      }
    }

    override def hasNext: Boolean = nextTok != null
    override def next(): Token = { val t = nextTok; advance(); t }
  }
}

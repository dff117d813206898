package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** TextOps HTML main-text extraction: handcrafted pages covering
  * script/style/comment drop, entity decoding, the integer
  * link-density boilerplate rule at its exact boundary, and malformed
  * nesting (unclosed tags) — the input class a WARC pipeline actually
  * sees.
  */
class HtmlExtractSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextOps.htmlMainText(col("h")).as("m"))
      .collect().head.getString(0)

  test("scripts, styles, and comments drop wholesale — even with markup inside them") {
    val html = "<html><head><style>p {color: red}</style>" +
      "<script>var s = 1; // <p>not content</p></script></head>" +
      "<body><!-- a comment with <div>tags</div> inside -->" +
      "<p>real content here</p></body></html>"
    extract(html) shouldBe "real content here"
  }

  test("entities decode once, after tag stripping — escaped markup survives as content") {
    // &amp;lt; must become the TEXT "&lt;", never resurrect into a
    // strippable <b> tag; &lt;b&gt; must surface as literal "<b>"
    extract("<p>use &lt;b&gt; for bold &amp;lt;never twice&amp;gt;</p>") shouldBe
      "use <b> for bold &lt;never twice&gt;"
    extract("<p>a&nbsp;&nbsp;b &quot;c&quot; it&#39;s</p>") shouldBe "a b \"c\" it's"
  }

  test("vertical tab collapses like any whitespace — the explicit class, not \\s") {
    // \x0B is inside Java's \s but OUTSIDE RE2's: with a bare \s+ the
    // two engines would disagree on this page's collapsed text (and so
    // on main_fp). WsClassRe names VT explicitly, so both collapse it.
    extract("<p>a\u000B\u000Bb\u000B c</p>") shouldBe "a b c"
  }

  test("link-density rule sits on the exact integer boundary") {
    // linked 4 chars, total 9 ("ab cd efg": link "cd"=2... construct
    // exactly half: text "aaaa bbbb" with "bbbb" linked -> lc=4, n=9,
    // 8 <= 9 -> kept
    extract("<p>aaaa <a href=\"/x\">bbbb</a></p>") shouldBe "aaaa bbbb"
    // "aaa bbbb": lc=4, n=8, 8 <= 8 -> still kept (<=, not <)
    extract("<p>aaa <a href=\"/x\">bbbb</a></p>") shouldBe "aaa bbbb"
    // "aa bbbb": lc=4, n=7, 8 > 7 -> dropped
    extract("<p>aa <a href=\"/x\">bbbb</a></p>") shouldBe ""
  }

  test("malformed nesting degrades to a block merge, never corrupts") {
    // unclosed <p> and <b>: the text merges into the next block's
    // boundary and every visible word survives exactly once
    extract("<p>first unclosed <b>bold run<p>second</p><div>third</div>") shouldBe
      "first unclosed bold run second third"
    // an unclosed anchor never swallows the document: the non-greedy
    // link regex simply finds no closing tag, so no chars count as
    // linked and the block stays
    extract("<p>text with <a href=\"/x\">a dangling link</p>") shouldBe
      "text with a dangling link"
    // stray closers and empty blocks produce nothing
    extract("</p></div><p>  </p><p>kept</p>") shouldBe "kept"
  }

  test("blocks keep document order; nav and footer boilerplate drop") {
    val html = "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      "<h2>Heading</h2><p>body one</p><p>body two</p>" +
      "<div><a href=\"/t\">Terms of Service</a> <a href=\"/p\">Privacy Policy</a> (c)</div>"
    extract(html) shouldBe "Heading body one body two"
  }

  test("block stats expose the kept/dropped split the x72 query reports") {
    val html = "<div><a href=\"/\">HomeNav</a></div><p>content</p><p></p>"
    val r = Seq(html).toDF("h")
      .select(TextOps.htmlBlocks(col("h")).as("b"))
      .selectExpr(
        "size(filter(b, s -> length(s.t) > 0)) AS ne",
        "size(filter(b, s -> length(s.t) > 0 AND s.lc * 2 <= length(s.t))) AS kept")
      .collect().head
    r.getInt(0) shouldBe 2 // nav + content; the empty <p> is not a block
    r.getInt(1) shouldBe 1 // content only
  }
}

package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class HtmlTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(HtmlText.htmlToText(col("h")).as("t"))
      .head().getString(0)

  private def title(html: String): String =
    Seq(html).toDF("h")
      .select(HtmlText.htmlTitle(col("h")).as("t"))
      .head().getString(0)

  test("basic page: head dropped, blocks become lines, inline tags vanish") {
    val t = extract("<html><head><title>T</title></head>" +
      "<body><h1>Head</h1><p>One <b>bold</b> word.</p>" +
      "<p>Two</p></body></html>")
    assert(t == "Head\nOne bold word.\nTwo")
  }

  test("script bodies with raw '<' and fake tags are stripped whole") {
    val t = extract("<body><p>keep</p><script>if (1 < 2) { x(\"<div>no</div>\") }" +
      "</script><p>also</p></body>")
    assert(t == "keep\nalso")
  }

  test("style and comments are stripped") {
    val t = extract("<style>p { color: red }</style><!-- note --><p>hi</p>")
    assert(t == "hi")
  }

  test("uppercase and attributed tags are recognized") {
    val t = extract("<P CLASS=\"x\">a</P><DIV id='y'>b</DIV><BR>c")
    assert(t == "a\nb\nc")
  }

  test("entity set decodes, ampersand last (single-pass semantics)") {
    assert(extract("<p>x &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;&amp; done</p>")
      == "x <tag> \"q\" 'a' & done")
    // &amp;lt; decodes to the literal text "&lt;", never to '<'
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
  }

  test("decoded entities cannot resurrect strippable tags") {
    // &lt;script&gt; decodes AFTER tag stripping, so it stays text
    assert(extract("<p>&lt;script&gt;x&lt;/script&gt;</p>")
      == "<script>x</script>")
  }

  test("whitespace: horizontal runs collapse, newline runs collapse, trim") {
    val t = extract("<p>  a \t b  </p>\n\n<p>c</p>  ")
    assert(t == "a b\nc")
  }

  test("list/table structure becomes line structure") {
    val t = extract("<ul><li>x</li><li>y</li></ul><table><tr><td>z</td></tr></table>")
    assert(t == "x\ny\nz")
  }

  test("title: extracted, entity-decoded; empty when absent") {
    assert(title("<head><title>A &amp; B</title></head>") == "A & B")
    assert(title("<p>no title</p>") == "")
  }

  test("documented limit: raw '>' in an attribute truncates that tag") {
    // single-pass regex contract — the tag closes at the first '>'
    val t = extract("<p><a title=\"a>b\">link</a></p>")
    assert(t == "b\">link")
  }

  test("no markup passes through unchanged (modulo whitespace rules)") {
    assert(extract("plain text only") == "plain text only")
  }
}

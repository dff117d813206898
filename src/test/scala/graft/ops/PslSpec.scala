package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Public-Suffix-List parsing + resolution, pinned to the
  * publicsuffix.org algorithm's documented behaviors (test vectors
  * adapted from the list project's published checkPublicSuffix cases
  * to the embedded snapshot's rule subset).
  */
class PslSpec extends AnyFunSuite with Matchers with SparkTest {

  private val rules = Psl.default

  private def reg(host: String): String = {
    val r = PslCode.registrable(
      org.apache.spark.unsafe.types.UTF8String.fromString(host), rules)
    if (r == null) null else r.toString
  }

  test("parser classifies rule shapes and reports maxLabels") {
    val r = Psl.parse(
      """// comment
        |com
        |co.uk
        |*.ck
        |!www.ck
        |*.kawasaki.jp
        |!city.kawasaki.jp
        |
        |s3.amazonaws.com  // trailing junk is ignored per spec
        |""".stripMargin)
    r.normal.contains("com") shouldBe true
    r.normal.contains("co.uk") shouldBe true
    r.normal.contains("s3.amazonaws.com") shouldBe true
    r.wildcard.contains("ck") shouldBe true
    r.wildcard.contains("kawasaki.jp") shouldBe true
    r.exception.contains("www.ck") shouldBe true
    r.exception.contains("city.kawasaki.jp") shouldBe true
    r.maxLabels shouldBe 3
  }

  test("normal rules: simple and multi-label suffixes") {
    reg("example.com") shouldBe "example.com"
    reg("b.example.com") shouldBe "example.com"
    reg("a.b.example.com") shouldBe "example.com"
    reg("example.co.uk") shouldBe "example.co.uk"
    reg("b.example.co.uk") shouldBe "example.co.uk"
    reg("example.com.au") shouldBe "example.com.au"
    // a public suffix itself has NO registrable domain
    reg("com") shouldBe null
    reg("co.uk") shouldBe null
    reg("uk") shouldBe null
  }

  test("host canonicalization: case, FQDN trailing dot, empty labels") {
    // publicsuffix.org's checkPublicSuffix vectors include mixed-case
    // forms; rules are stored lowercase, so an uncanonicalized
    // 'EXAMPLE.CO.UK' would miss every rule and fall through to the
    // implicit * default ('CO.UK' — wrong). The resolver lowercases.
    reg("EXAMPLE.CO.UK") shouldBe "example.co.uk"
    reg("Example.COM") shouldBe "example.com"
    reg("COM") shouldBe null
    // one trailing dot is the FQDN root marker and strips
    reg("example.com.") shouldBe "example.com"
    reg("b.example.co.uk.") shouldBe "example.co.uk"
    reg("com.") shouldBe null
    // empty labels are malformed, never a mangled 'com.'-style answer
    reg(".com") shouldBe null
    reg("a..b.com") shouldBe null
    reg(".") shouldBe null
    reg("..") shouldBe null
    reg("") shouldBe null
  }

  test("longest matching rule prevails (uk vs co.uk)") {
    // host under uk but not under any 2-label uk suffix: uk (1 label)
    // is the longest match -> registrable = 2 labels
    reg("example.uk") shouldBe "example.uk"
    reg("b.example.uk") shouldBe "example.uk"
    // but co.uk (2 labels) beats uk when both match
    reg("b.example.co.uk") shouldBe "example.co.uk"
  }

  test("wildcard rules: *.ck makes {label}.ck a public suffix") {
    reg("example.ck") shouldBe null // example.ck IS a public suffix
    reg("b.example.ck") shouldBe "b.example.ck"
    reg("a.b.example.ck") shouldBe "b.example.ck"
    reg("ck") shouldBe null
  }

  test("exception rules: !www.ck escapes the wildcard") {
    reg("www.ck") shouldBe "www.ck"
    reg("sub.www.ck") shouldBe "www.ck"
  }

  test("japanese city wildcard+exception pair") {
    reg("city.kawasaki.jp") shouldBe "city.kawasaki.jp"
    reg("news.city.kawasaki.jp") shouldBe "city.kawasaki.jp"
    // a non-city label under *.kawasaki.jp is itself a public suffix
    reg("other.kawasaki.jp") shouldBe null
    reg("b.other.kawasaki.jp") shouldBe "b.other.kawasaki.jp"
    // plain co.jp still resolves as a 2-label suffix
    reg("example.co.jp") shouldBe "example.co.jp"
  }

  test("unknown TLD falls back to the implicit * default rule") {
    reg("example.zzyzx") shouldBe "example.zzyzx"
    reg("b.example.zzyzx") shouldBe "example.zzyzx"
    reg("zzyzx") shouldBe null
    reg("") shouldBe null
  }

  test("private-section platform suffixes") {
    reg("project.github.io") shouldBe "project.github.io"
    reg("deep.project.github.io") shouldBe "project.github.io"
    reg("bucket.s3.amazonaws.com") shouldBe "bucket.s3.amazonaws.com"
    // amazonaws.com itself is NOT a rule: com prevails
    reg("x.amazonaws.com") shouldBe "amazonaws.com"
  }

  test("column expression matches PslCode and keeps codegen nullability") {
    val s = spark
    import s.implicits._
    val hosts = Seq("b.example.co.uk", "example.com", "m.src1.ck",
      "city.kawasaki.jp", "src2.github.io", "other.kawasaki.jp", "com")
    val out = hosts.toDF("host")
      .select(col("host"), UrlOps.registrableDomain(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    hosts.foreach { h => out(h) shouldBe reg(h) }
  }

  test("fuzz: resolver never throws, is deterministic, and returns whole-label suffixes") {
    // Hand-rolled seeded fuzz (scalacheck-free): adversarial hosts with
    // empty labels, leading/trailing dots, digits, long label chains —
    // the resolver must never throw, must be a pure function, and any
    // non-null result must be a whole-label suffix of the input.
    val rnd = new scala.util.Random(961)
    val atoms = Vector("com", "uk", "co", "ck", "jp", "kawasaki", "city",
      "www", "m", "x", "zz9", "a-b", "xn--p1ai", "", "verylonglabel" * 3)
    (0 until 10000).foreach { _ =>
      val nLabs = rnd.nextInt(7)
      val host0 = Seq.fill(nLabs)(atoms(rnd.nextInt(atoms.size))).mkString(".")
      val host = (if (rnd.nextInt(10) == 0) "." else "") + host0 +
        (if (rnd.nextInt(10) == 0) "." else "")
      val r1 = reg(host); val r2 = reg(host)
      // the resolver canonicalizes (lowercase, one trailing dot strips),
      // so the whole-label-suffix invariant holds against the CANONICAL
      // host, not the raw input
      val canon = (if (host.nonEmpty && host.last == '.') host.dropRight(1)
        else host).toLowerCase(java.util.Locale.ROOT)
      withClue(s"host '$host': ") {
        r2 shouldBe r1 // deterministic
        if (r1 != null) {
          canon should endWith(r1)
          // whole-label: the char before the suffix (if any) is a dot
          val cut = canon.length - r1.length
          if (cut > 0) canon.charAt(cut - 1) shouldBe '.'
        }
      }
    }
  }

  test("fuzz: parser never throws on arbitrary rule text") {
    val rnd = new scala.util.Random(962)
    val pieces = Vector("com", "*.", "!", "//", " ", ".", "co.uk", "\t",
      "*.*", "!!x", "*.ck extra", "")
    (0 until 2000).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(12))(
        Seq.fill(rnd.nextInt(4))(pieces(rnd.nextInt(pieces.size))).mkString).mkString("\n")
      noException should be thrownBy Psl.parse(text)
    }
  }

  test("snapshot scale shape: rule rows are catalog-sized and loadable") {
    val n = rules.rows.size
    n should be >= 200
    // the full ~9k-entry production list is the same order of driver
    // memory (< 1 MB of strings) — a reference-object broadcast, never
    // a shuffle side
    rules.maxLabels shouldBe 3
  }
}

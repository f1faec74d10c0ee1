package graft.html

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class JsonLdSpec extends AnyFunSuite {

  private def blocks(h: String): Seq[String] =
    JsonLd.blocks(h.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq

  test("type attribute variants: case, quoting, MIME parameters; decoys skipped") {
    val h =
      """<html><head>
        |<script>var decoy = {"@type":"Decoy"};</script>
        |<script type="application/ld+json">{"a":1}</script>
        |<script type='APPLICATION/LD+JSON; charset=utf-8'>{"b":2}</script>
        |<script type=application/ld+json>{"c":3}</script>
        |<script type="text/javascript">{"d":4}</script>
        |</head><body></body></html>""".stripMargin
    assert(blocks(h) == Seq("""{"a":1}""", """{"b":2}""", """{"c":3}"""))
  }

  test("script raw-text stance: body is NOT entity-decoded, inner markup-ish text kept") {
    val h = """<script type="application/ld+json">{"t":"a &amp; b <not-a-tag>"}</script>"""
    assert(blocks(h) == Seq("""{"t":"a &amp; b <not-a-tag>"}"""))
  }

  test("commented-out blocks skipped; unclosed block keeps what arrived; empty dropped") {
    assert(blocks("""<!-- <script type="application/ld+json">{"x":1}</script> -->""").isEmpty)
    assert(blocks("""<script type="application/ld+json">{"y":2}""") == Seq("""{"y":2}"""))
    assert(blocks("""<script type="application/ld+json">   </script>""").isEmpty)
  }

  test("caps: block count and block length bounded on hostile input") {
    val many = """<script type="application/ld+json">{"z":1}</script>""" * (JsonLd.MaxBlocks + 10)
    assert(blocks(many).length == JsonLd.MaxBlocks)
    val big = s"""<script type="application/ld+json">${"x" * (JsonLd.MaxBlockLen + 100)}</script>"""
    assert(blocks(big).head.length == JsonLd.MaxBlockLen)
  }

  test("totality fuzz") {
    val p = Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      JsonLd.blocks(bs); true
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$r")
  }
}

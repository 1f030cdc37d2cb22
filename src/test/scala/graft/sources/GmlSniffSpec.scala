package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** The srsName prefix sniff's boundary behavior (ADVICE r8: a short
  * read there silently defaults the CRS to 4326 — a wrong answer, not a
  * crash — so the read must be exact and the bound's two sides pinned).
  */
class GmlSniffSpec extends AnyFunSuite {

  private def gmlWithPadding(pad: Int, srs: String): String = {
    val p = Files.createTempFile("graft-gml-sniff", ".gml")
    p.toFile.deleteOnExit()
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml">
         |<!-- ${"x" * pad} -->
         |  <gml:featureMember><f>
         |    <geom><gml:Point srsName="$srs"><gml:pos>1 2</gml:pos></gml:Point></geom>
         |  </f></gml:featureMember>
         |</gml:FeatureCollection>
         |""".stripMargin
    Files.write(p, doc.getBytes(UTF_8))
    p.toString
  }

  test("srsName landing deep in the 4 KB prefix is still found") {
    // padding puts srsName around byte ~3400 — well past any plausible
    // short first read, still inside the declared 4096-byte window
    val path = gmlWithPadding(3300, "urn:ogc:def:crs:EPSG::27700")
    assert(GmlReader.sniffSrs(path) == (("27700", true)))
  }

  test("srsName just inside vs just beyond the 4 KB bound") {
    def srsSpanEnd(path: String): Int = {
      val s = new String(Files.readAllBytes(java.nio.file.Paths.get(path)), UTF_8)
      val i = s.indexOf("srsName=\"")
      s.indexOf('"', i + 9) + 1 // end of the closing quote
    }
    // attribute span ends INSIDE the 4096-byte window → parsed
    val in = gmlWithPadding(3800, "EPSG:27700")
    assert(srsSpanEnd(in) <= 4096, s"fixture drifted: span ends ${srsSpanEnd(in)}")
    assert(GmlReader.sniffSrs(in)._1 == "27700")
    // span starts beyond the window → the documented 4326 lon/lat default
    val out = gmlWithPadding(4200, "EPSG:27700")
    assert(srsSpanEnd(out) > 4096, s"fixture drifted: span ends ${srsSpanEnd(out)}")
    assert(GmlReader.sniffSrs(out) == (("4326", false)))
  }

  test("legacy EPSG:n form keeps lon/lat order; urn/http forms swap") {
    val legacy = gmlWithPadding(10, "EPSG:3857")
    assert(GmlReader.sniffSrs(legacy) == (("3857", false)))
    val http = gmlWithPadding(10, "http://www.opengis.net/def/crs/EPSG/0/4258")
    assert(GmlReader.sniffSrs(http) == (("4258", true)))
  }
}

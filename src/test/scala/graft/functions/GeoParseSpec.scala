package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantics of GeoParse's per-thread identity memo (the
  * single-entry cache that collapses Catalyst's 4-6 duplicated
  * filter+projection evaluations per row into one parse). The hazard
  * class a memo introduces is staleness, so every test here alternates
  * references in the orders whole-stage codegen can produce.
  */
class GeoParseSpec extends AnyFunSuite {
  private def u(s: String) = UTF8String.fromString(s)

  test("alternating references never serve stale values") {
    val a = u("x geo:1.5,2.5 tail")
    val b = u("x geo:3.5,4.5 tail")
    assert(GeoParse.lat(a) === 1.5)
    assert(GeoParse.lat(b) === 3.5)
    // the memo now holds b; lng(a) must re-parse a, not return b's lng
    assert(GeoParse.lng(a) === 2.5)
    assert(GeoParse.lng(b) === 4.5)
    assert(GeoParse.lat(a) === 1.5)
  }

  test("distinct objects with identical bytes both parse (fresh-object miss)") {
    val a = u("geo:-12.25,99.75 ")
    val b = u("geo:-12.25,99.75 ")
    assert(a ne b)
    assert(GeoParse.lat(a) === -12.25 && GeoParse.lng(a) === 99.75)
    assert(GeoParse.lat(b) === -12.25 && GeoParse.lng(b) === 99.75)
  }

  test("identity hit returns the same values as the first parse") {
    val a = u("p geo:48.8566,2.3522 q")
    val lat1 = GeoParse.lat(a); val lng1 = GeoParse.lng(a)
    assert(java.lang.Double.doubleToRawLongBits(GeoParse.lat(a)) ===
      java.lang.Double.doubleToRawLongBits(lat1))
    assert(java.lang.Double.doubleToRawLongBits(GeoParse.lng(a)) ===
      java.lang.Double.doubleToRawLongBits(lng1))
  }

  test("fuzz: memoized parse matches an independent regex reference on 20k random strings") {
    // Reference implementation with the same spec, written differently:
    // first "geo:", lat = chars to the first ',' after it (any chars),
    // lng = chars to the next ' ' or end; unparseable field -> NaN.
    val re = java.util.regex.Pattern.compile("(?s)geo:([^,]*),([^ ]*)")
    def refParse(str: String): (Double, Double) = {
      val m = re.matcher(str)
      if (!m.find()) (Double.NaN, Double.NaN)
      else {
        def num(g: String) =
          try java.lang.Double.parseDouble(g)
          catch { case _: NumberFormatException => Double.NaN }
        (num(m.group(1)), num(m.group(2)))
      }
    }
    val rnd = new scala.util.Random(20260818L)
    val frags = Array("geo:", ",", " ", "-", "+", ".", "e", "E3", "x", "12",
      "7.5", "geo", ":", "", "0123456789", "12345678901234567",
      "000000", "Infinity", "NaN")
    def randomString(): String = {
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(12)) sb.append(frags(rnd.nextInt(frags.length)))
      sb.toString
    }
    var i = 0
    while (i < 20000) {
      val str =
        if (i % 3 == 0) f"page $i geo:${rnd.nextDouble() * 180 - 90}%.6f,${rnd.nextDouble() * 360 - 180}%.6f tail"
        else randomString()
      val (wantLat, wantLng) = refParse(str)
      val s = u(str)
      // alternate the call order to stress the memo both ways
      val (gotLat, gotLng) =
        if (i % 2 == 0) { val a = GeoParse.lat(s); (a, GeoParse.lng(s)) }
        else { val b = GeoParse.lng(s); (GeoParse.lat(s), b) }
      assert(java.lang.Double.doubleToRawLongBits(gotLat) ===
        java.lang.Double.doubleToRawLongBits(wantLat), s"lat('$str')")
      assert(java.lang.Double.doubleToRawLongBits(gotLng) ===
        java.lang.Double.doubleToRawLongBits(wantLng), s"lng('$str')")
      i += 1
    }
  }

  test("malformed fields fail independently, and a bad row does not poison the next") {
    val badLat = u("geo:abc,4.5 ")
    assert(GeoParse.lat(badLat).isNaN && GeoParse.lng(badLat) === 4.5)
    val badLng = u("geo:1.5,xyz ")
    assert(GeoParse.lat(badLng) === 1.5 && GeoParse.lng(badLng).isNaN)
    val emptyLng = u("x geo:3,")
    assert(GeoParse.lat(emptyLng) === 3.0 && GeoParse.lng(emptyLng).isNaN)
    for (bad <- Seq("no tag", "geo:", "geo:1.5")) {
      val s = u(bad)
      assert(GeoParse.lat(s).isNaN, s"lat('$bad')")
      assert(GeoParse.lng(s).isNaN, s"lng('$bad')")
      val good = u("geo:7.125,-8.5 ")
      assert(GeoParse.lat(good) === 7.125 && GeoParse.lng(good) === -8.5)
    }
  }
}

package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class SchemaResolverSpec extends AnyFunSuite {
  import SchemaResolver._

  test("normalize: lower, strip, spaces to underscores") {
    assert(normalize("  Electric Range ") == "electric_range")
    assert(normalize("VIN") == "vin")
  }

  test("exact normalized match wins over fuzzy") {
    val m = resolve(Seq("city"), Seq("City", "cities"))
    assert(m("city").contains("City"))
  }

  test("fuzzy match resolves the SQL-dump drift names") {
    // the reference's own drift: eligibility vs eligibility_reason etc.
    val actual = Seq("eligibility_reason", "odometer", "geom_wkt", "make")
    val m = resolve(Seq("eligibility", "make"), actual)
    assert(m("eligibility").contains("eligibility_reason"))
    assert(m("make").contains("make"))
  }

  test("below-cutoff names resolve to None") {
    val m = resolve(Seq("latitude"), Seq("zzz", "qqq"))
    assert(m("latitude").isEmpty)
  }

  test("resolveRequired hard-fails on missing required columns") {
    val e = intercept[IllegalArgumentException] {
      resolveRequired(Seq("city", "make"), Seq("make"), required = Set("city"))
    }
    assert(e.getMessage.contains("city"))
  }

  test("scoreHeader: +2 exact, +1 fuzzy >= 0.7") {
    val expected = Seq("vin", "city", "model")
    assert(scoreHeader(Seq("VIN", "City", "Model"), expected) == 6)
    assert(scoreHeader(Seq("vin", "cty", "nothing"), expected) >= 3)
    assert(scoreHeader(Seq("a", "b", "c"), expected) == 0)
  }

  test("similarity is symmetric and bounded") {
    assert(similarity("abc", "abc") == 1.0)
    assert(similarity("abc", "") == 0.0)
    assert(similarity("kitten", "sitting") == similarity("sitting", "kitten"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's regression self-check (VERDICT r14 #8): the
  * pure comparison that flags keys reading >2× their prior committed
  * LOAD-NORMALIZED median, exercised with a forced example — so the
  * guard's behavior is pinned without running a sweep.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("parseNumberMap scopes to the named field and ignores its neighbors") {
    val json = """{"value":1.0,"queries_normalized":{"q_a":0.5,"q_b":-1},""" +
      """"extended_normalized":{"q_a":9.9,"q_c":2.25}}"""
    assert(Bench.parseNumberMap(json, "queries_normalized") ==
      Map("q_a" -> 0.5, "q_b" -> -1.0))
    assert(Bench.parseNumberMap(json, "extended_normalized") ==
      Map("q_a" -> 9.9, "q_c" -> 2.25))
    assert(Bench.parseNumberMap(json, "missing_field") == Map.empty)
  }

  test("regressionFlags: forced 3x regression flagged; noise floor, failures, and new keys are not") {
    val prior = Map("q_big" -> 2.0, "q_tiny" -> 0.05, "q_ok" -> 1.0,
      "q_gone" -> 0.8)
    val cur = Map(
      "q_big" -> 6.0,   // 3x a 2 s prior -> FLAG (the forced example)
      "q_tiny" -> 0.4,  // 8x but prior under the 0.3 s noise floor -> no
      "q_ok" -> 1.9,    // 1.9x, under the 2x factor -> no
      "q_new" -> 5.0,   // no prior -> no
      "q_fail" -> -1.0) // failed run reports -1, not a regression
    val flags = Bench.regressionFlags(cur, prior)
    assert(flags == Seq(("q_big", 6.0, 2.0)))
  }

  test("regressionFlags orders worst ratio first") {
    val prior = Map("q_a" -> 1.0, "q_b" -> 1.0)
    val cur = Map("q_a" -> 2.5, "q_b" -> 4.0)
    assert(Bench.regressionFlags(cur, prior).map(_._1) == Seq("q_b", "q_a"))
  }

  test("parseNumberMap accepts scientific notation (formatter drift parses, not aborts)") {
    val json = """{"queries_normalized":{"q_a":1.5e-3,"q_b":2E+1,"q_c":7}}"""
    assert(Bench.parseNumberMap(json, "queries_normalized") ==
      Map("q_a" -> 0.0015, "q_b" -> 20.0, "q_c" -> 7.0))
  }

  test("parseNumberMap fails loud on a truncated/non-flat field (guard cannot be silently disabled)") {
    // a nested object inside the field cuts the [^}]* capture short,
    // leaving an unfinished entry — must throw, not return a partial map
    val nested = """{"queries_normalized":{"q_a":1.0,"q_b":{"cur":2.0}}}"""
    val e1 = intercept[IllegalStateException] {
      Bench.parseNumberMap(nested, "queries_normalized")
    }
    assert(e1.getMessage.contains("queries_normalized"))
    // a non-numeric value is equally a shape drift
    val text = """{"queries_normalized":{"q_a":1.0,"q_b":"fast"}}"""
    intercept[IllegalStateException] {
      Bench.parseNumberMap(text, "queries_normalized")
    }
    // the empty map stays valid
    assert(Bench.parseNumberMap("""{"queries_normalized":{}}""",
      "queries_normalized") == Map.empty)
  }
}

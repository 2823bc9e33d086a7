package graft

import org.scalatest.funsuite.AnyFunSuite

/** The RunSpec CLI contract, unit-tested through the pure `parseArgs`
  * (no Spark, no JVM exit): flag grammar, defaults, and every
  * malformed-input message the runner prints before touching Spark.
  */
class RunSpecArgsSpec extends AnyFunSuite {
  private def ok(args: String*): RunSpec.Config =
    RunSpec.parseArgs(args.toArray).fold(e => fail(s"unexpected error: $e"), identity)
  private def err(args: String*): String =
    RunSpec.parseArgs(args.toArray).fold(identity, c => fail(s"unexpected success: $c"))

  test("defaults: bare spec path") {
    assert(ok("p.json") == RunSpec.Config("p.json"))
  }

  test("full flag set parses, repeated --param accumulates") {
    val c = ok("p.json", "--param", "a=1", "--param", "b=x=y", "--out", "/o",
      "--show", "5", "--explain", "--stages", "--dag", "--rounds", "3",
      "--sleep", "0", "--report", "lang")
    // --param splits on the FIRST '=' only: values may contain '='
    assert(c == RunSpec.Config("p.json", Map("a" -> "1", "b" -> "x=y"),
      Some("/o"), Some(5), explain = true, stages = true, dag = true,
      rounds = 3, sleepSec = 0L, report = Some("lang")))
  }

  test("malformed inputs fail with the message main prints") {
    assert(err() == "missing <spec.json>")
    assert(err("p.json", "--param", "novalue").contains("k=v"))
    // an empty key ('--param =v') must not silently no-op
    assert(err("p.json", "--param", "=v").contains("non-empty key"))
    assert(err("p.json", "--param") == "--param needs a value")
    assert(err("p.json", "--show", "-1").contains("non-negative"))
    assert(err("p.json", "--rounds", "0").contains("positive"))
    assert(err("p.json", "--rounds", "many").contains("positive"))
    assert(err("p.json", "--sleep", "-5").contains("non-negative"))
    assert(err("p.json", "--frobnicate").contains("unknown argument"))
    assert(err("p.json", "--report") == "--report needs a value")
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Field-by-field comparison of the native pcap parser against the
  * committed SELF-golden artifact (r13 verdict #8): the fixtures are
  * byte-deterministic ([[CaptureBytes.goldenFixtures]] — all three
  * link layers, both container formats, every decoded protocol), so
  * any decode drift — a changed field value, a dropped layer, a new
  * packet — fails here with the exact JSON path that moved, instead
  * of surfacing only through the property specs' invariants. The
  * golden freezes THIS parser's output (self-golden, not an
  * independent opinion — see TESTDATA.md); regen after an intentional
  * parser change: `sbt "runMain graft.tools.GoldenDecodeGen"`. */
class GoldenDecodeSpec extends AnyFunSuite {

  private def diffPaths(path: String, a: JValue, b: JValue,
                        out: scala.collection.mutable.ArrayBuffer[String]): Unit =
    (a, b) match {
      case (JObject(fa), JObject(fb)) =>
        val ma = fa.toMap; val mb = fb.toMap
        (ma.keySet ++ mb.keySet).toSeq.sorted.foreach { k =>
          (ma.get(k), mb.get(k)) match {
            case (Some(va), Some(vb)) => diffPaths(s"$path.$k", va, vb, out)
            case (Some(_), None) => out += s"$path.$k: golden-only"
            case (None, Some(_)) => out += s"$path.$k: current-only"
            case _ => ()
          }
        }
      case (JArray(ea), JArray(eb)) =>
        if (ea.length != eb.length)
          out += s"$path: array length ${ea.length} -> ${eb.length}"
        else ea.zip(eb).zipWithIndex.foreach { case ((va, vb), i) =>
          diffPaths(s"$path[$i]", va, vb, out) }
      case (va, vb) if va != vb =>
        out += s"$path: golden=${JsonMethods.compact(JsonMethods.render(va))}" +
          s" current=${JsonMethods.compact(JsonMethods.render(vb))}"
      case _ => ()
    }

  test("native decoder output matches the committed golden field-by-field") {
    val regen = """regen: sbt -batch "runMain graft.tools.GoldenDecodeGen""""
    val stream = getClass.getResourceAsStream("/golden/native_decode.golden.tsv")
    assert(stream != null, s"golden artifact missing ($regen)")
    val golden = scala.io.Source.fromInputStream(stream, "UTF-8")
      .getLines().filter(_.nonEmpty).map { line =>
        val Array(fixture, idx, json) = line.split("\t", 3)
        (fixture, idx.toInt) -> json
      }.toMap
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[(String, Int)]
    CaptureBytes.goldenFixtures.foreach { case (name, bytes) =>
      PcapParser.decodeFile(bytes, s"$name.pcap").zipWithIndex.foreach {
        case (json, i) =>
          seen += (name -> i)
          golden.get((name, i)) match {
            case None => failures += s"$name[$i]: not in golden ($regen)"
            case Some(g) if g != json =>
              // byte-inequality: report the exact field paths that moved
              val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
              diffPaths("$", JsonMethods.parse(g), JsonMethods.parse(json), diffs)
              val detail = if (diffs.isEmpty) "whitespace/ordering only" +
                s"\n    golden:  $g\n    current: $json"
              else diffs.map("    " + _).mkString("\n")
              failures += s"$name[$i]: decode drifted ($regen)\n$detail"
            case _ => ()
          }
      }
    }
    (golden.keySet -- seen).toSeq.sorted.foreach { case (n, i) =>
      failures += s"$n[$i]: golden packet no longer decoded ($regen)"
    }
    assert(failures.isEmpty,
      s"golden decode failures:\n${failures.mkString("\n")}")
  }
}

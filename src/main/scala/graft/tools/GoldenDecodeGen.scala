package graft.tools

import graft.sources.{CaptureBytes, PcapParser}

/** Regenerates the committed self-golden decode artifact that
  * GoldenDecodeSpec pins the native pcap parser against:
  *
  * {{{
  * sbt -batch "runMain graft.tools.GoldenDecodeGen"
  * }}}
  *
  * One TSV line per decoded packet: `fixture \t index \t json` (the
  * decoder emits compact single-line JSON — no tabs or newlines to
  * escape). Run ONLY after an intentional parser change, review the
  * golden diff (it IS the decode review: a changed field is a changed
  * decode), and commit it with the change. The artifact is SELF-golden
  * — it freezes this parser's output, it does not independently
  * validate it (the tshark differential remains the independent check
  * where a tshark binary exists). */
object GoldenDecodeGen {
  final val GoldenPath =
    "src/test/resources/golden/native_decode.golden.tsv"

  def render(): String =
    CaptureBytes.goldenFixtures.flatMap { case (name, bytes) =>
      PcapParser.decodeFile(bytes, s"$name.pcap").zipWithIndex.map {
        case (json, i) =>
          require(!json.contains('\t') && !json.contains('\n'),
            s"decoder emitted a tab/newline in $name[$i] — TSV framing broken")
          s"$name\t$i\t$json"
      }
    }.mkString("", "\n", "\n")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else GoldenPath
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    val content = render()
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    println(s"[golden-decode] wrote ${content.linesIterator.size} packets to $out")
  }
}

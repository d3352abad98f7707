// Capture .explain("formatted") for registry queries into files.
//   PLAN_QUERIES=name1,name2 [PLAN_SF=...] [PLAN_OUT=...] [PLAN_SUFFIX=_before]
//   /opt/spark/bin/spark-shell --master local[8] \
//     --conf spark.ui.enabled=false --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/plan_capture.scala
// ASCII-only on purpose (spark-shell -i under the C locale).
try {
  val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
  val sf = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
  val out = sys.env.getOrElse("PLAN_OUT", "plans/r18")
  val suffix = sys.env.getOrElse("PLAN_SUFFIX", "_before")
  new java.io.File(out).mkdirs()
  spark.conf.set("spark.sql.shuffle.partitions", "32")
  names.foreach { n =>
    val df = graft.queries.Registry.queries(n)(spark, sf)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/$n$suffix.txt"), txt)
    println(s"[plan] $n -> $out/$n$suffix.txt (" + txt.linesIterator.length + " lines)")
  }
} catch { case e: Throwable => e.printStackTrace(); sys.exit(1) }
sys.exit(0)

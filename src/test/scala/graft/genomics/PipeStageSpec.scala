package graft.genomics

import graft.SparkSpec

class PipeStageSpec extends SparkSpec {

  private def fastaDf = {
    import spark.implicits._
    Seq(("s1", "ACGT"), ("s2", "TTAA"), ("s3", "GGCC")).toDF("header", "seq")
  }

  test("D11 identity tool (cat) round-trips all rows") {
    val out = PipeStage.pipeFasta(fastaDf.repartition(2), "header", "seq", Seq("cat", "{in}"))
      .collect().map(r => r.header -> (r.seq, r.error)).toMap
    assert(out == Map("s1" -> (("ACGT", null)), "s2" -> (("TTAA", null)), "s3" -> (("GGCC", null))))
  }

  test("D11 transforming tool (sed) rewrites sequences") {
    val out = PipeStage.pipeFasta(fastaDf, "header", "seq",
      Seq("sed", "-e", "/^>/!s/A/N/g", "{in}"))
      .collect().map(r => r.header -> r.seq).toMap
    assert(out("s1") == "NCGT" && out("s2") == "TTNN")
  }

  test("D11 a stderr-chatty tool does not deadlock (pipe buffer drained)") {
    // ~1 MB of stderr noise would fill the OS pipe buffer (~64 KB) and
    // block the tool forever if stderr weren't drained on its own thread
    val out = PipeStage.pipeFasta(fastaDf.coalesce(1), "header", "seq",
      Seq("bash", "-c",
        "for i in $(seq 1 16000); do echo progress line $i >&2; done; cat \"$0\"", "{in}"))
      .collect().map(r => r.header -> (r.seq, r.error)).toMap
    assert(out == Map("s1" -> (("ACGT", null)), "s2" -> (("TTAA", null)), "s3" -> (("GGCC", null))))
  }

  test("D11 failing tool poisons only its rows with an error; threshold applies") {
    val results = PipeStage.pipeFasta(fastaDf, "header", "seq", Seq("false"))
    val rs = results.collect()
    assert(rs.length == 3 && rs.forall(_.error != null))
    val (total, failed, ok) = PipeStage.successReport(results)
    assert(total == 3 && failed == 3 && !ok)
    val (_, _, ok2) = PipeStage.successReport(
      PipeStage.pipeFasta(fastaDf, "header", "seq", Seq("cat", "{in}")))
    assert(ok2)
  }

  test("D11 missing tool is an error row, not a job failure") {
    val rs = PipeStage.pipeFasta(fastaDf, "header", "seq", Seq("definitely_not_a_tool_xyz"))
      .collect()
    assert(rs.forall(_.error != null))
  }
}

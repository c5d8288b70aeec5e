package graft.genomics

import graft.SparkSpec
import java.nio.file.Files

class FastaSpec extends SparkSpec {

  test("parseString: multi-record, blank-line tolerant, multi-line seqs") {
    val content = ">seq1 desc\nACGT\nACGT\n\n>seq2\nTTTT\n"
    assert(Fasta.parseString(content) ==
      Seq(("seq1 desc", "ACGTACGT"), ("seq2", "TTTT")))
  }

  test("roundtrip through files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fasta").toString
    val df = Seq(("s1", "A" * 130), ("s2", "CGTA")).toDF("header", "seq")
    Fasta.write(df.coalesce(1), "header", "seq", s"$dir/out")
    val back = Fasta.read(spark, s"$dir/out/part-*")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(back == Map("s1" -> "A" * 130, "s2" -> "CGTA"))
  }

  test("format wraps sequences at width") {
    import spark.implicits._
    val line = Fasta.format(Seq(("h", "A" * 125)).toDF("header", "seq"), "header", "seq", 60)
      .as[String].head()
    val seqLines = line.split("\n").drop(1)
    assert(seqLines.map(_.length).toSeq == Seq(60, 60, 5))
  }
}

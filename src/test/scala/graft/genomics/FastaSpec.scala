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

  test("splittable read agrees with the whole-file parser and actually splits") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fasta_split").toString
    // ~200 KB across many records, one file — wholeTextFiles would pin
    // this to a single task; the lineSep reader must both agree on
    // content and fan out under a small partition-size cap
    val records = (0 until 500).map(i => (s"rec$i some desc $i", ("ACGT" * ((i % 7) + 25))))
    val text = records.map { case (h, s) =>
      s">$h\n${s.grouped(60).mkString("\n")}" }.mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/big.fasta"), text)

    val viaWhole = Fasta.read(spark, s"$dir/big.fasta")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val conf = spark.conf
    val prev = conf.get("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val split = Fasta.readSplittable(spark, s"$dir/big.fasta")
      assert(split.rdd.getNumPartitions > 1, "read must split a single large file")
      val viaSplit = split.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(viaSplit == viaWhole && viaSplit.size == 500)
    } finally conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("format wraps sequences at width") {
    import spark.implicits._
    val line = Fasta.format(Seq(("h", "A" * 125)).toDF("header", "seq"), "header", "seq", 60)
      .as[String].head()
    val seqLines = line.split("\n").drop(1)
    assert(seqLines.map(_.length).toSeq == Seq(60, 60, 5))
  }
}

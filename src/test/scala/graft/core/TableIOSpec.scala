package graft.core

import graft.SparkSpec
import java.nio.file.Files

class TableIOSpec extends SparkSpec {

  test("M6 atomic swap: readers see old or new, rollback restores") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tableio").toString
    val path = s"$dir/t"
    TableIO.writeAtomicSwap(Seq((1, "v1")).toDF("k", "v"), path)
    assert(TableIO.read(spark, path).collect()(0).getString(1) == "v1")
    TableIO.writeAtomicSwap(Seq((1, "v2")).toDF("k", "v"), path)
    assert(TableIO.read(spark, path).collect()(0).getString(1) == "v2")
    assert(TableIO.rollback(path))
    assert(TableIO.read(spark, path).collect()(0).getString(1) == "v1")
    assert(!TableIO.rollback(path)) // only one level of rollback
  }
}

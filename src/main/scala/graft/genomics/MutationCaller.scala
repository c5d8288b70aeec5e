package graft.genomics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D1 — nucleotide mutation caller.
  *
  * Same semantics as the reference
  * (`database/java/.../general/NucleotideMutationFinder.java:71-117`):
  *  - sequence must be aligned (same length as reference genome)
  *  - leading and trailing `-` runs are re-masked to `N` (alignment
  *    artifacts, actually unknowns)
  *  - masked sites (1-indexed) are skipped
  *  - bases outside {A,C,G,T,-} are skipped (unknown/ambiguous)
  *  - every remaining position whose base differs from the reference
  *    emits (position, base)
  *
  * The per-sequence call is a pure Scala function; Spark application is
  * a UDF over the broadcast reference + mask set, exploded into the
  * long mutation table. The 30 kb seq column is dropped immediately
  * after the call so it never enters a shuffle (SURVEY §7.4.3).
  */
object MutationCaller {

  final case class Mutation(position: Int, mutation: String)

  def callMutations(reference: String, maskedSites: Set[Int])(sequence: String): Seq[Mutation] = {
    val ref = reference.toUpperCase
    require(sequence.length == ref.length,
      s"sequence length ${sequence.length} != reference length ${ref.length}; align first")
    val seq = sequence.toUpperCase.toCharArray
    var i = 0
    while (i < seq.length && seq(i) == '-') { seq(i) = 'N'; i += 1 }
    i = seq.length - 1
    while (i >= 0 && seq(i) == '-') { seq(i) = 'N'; i -= 1 }
    val out = Seq.newBuilder[Mutation]
    i = 0
    while (i < ref.length) {
      val pos = i + 1
      val b = seq(i)
      if (!maskedSites.contains(pos) &&
          (b == 'A' || b == 'C' || b == 'G' || b == 'T' || b == '-') &&
          b != ref(i)) {
        out += Mutation(pos, b.toString)
      }
      i += 1
    }
    out.result()
  }

  /** Column of array<struct<position int, mutation string>>. */
  def mutationsUdf(spark: SparkSession, reference: String, maskedSites: Set[Int]): Column => Column = {
    val bc = spark.sparkContext.broadcast((reference, maskedSites))
    val f = udf { (s: String) =>
      if (s == null) null else callMutations(bc.value._1, bc.value._2)(s)
    }
    (c: Column) => f(c)
  }

  /** (idCol, position, mutation) long table from a sequence frame. */
  def callTable(spark: SparkSession, df: DataFrame, idCol: String, seqCol: String,
      reference: String, maskedSites: Set[Int]): DataFrame = {
    val call = mutationsUdf(spark, reference, maskedSites)
    df.select(col(idCol), explode(call(col(seqCol))).as("m"))
      .select(col(idCol), col("m.position").as("position"), col("m.mutation").as("mutation"))
  }
}

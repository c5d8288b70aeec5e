package graft.jobs

import graft.SparkSpec
import graft.sources.StateStore
import org.apache.spark.sql.functions._

/** The scheduler shell (JobRunner) and the import→refresh chain it
  * exists for: the reference's importer ends by refreshing the serving
  * matviews (`GisaidApiImporter.java:384-387`); here that ordering,
  * the M9 skip-if-unchanged state, and failure blocking are all
  * pinned. */
class ImportAndRefreshSpec extends SparkSpec {

  private def outcomes(dir: String): Seq[(String, String)] =
    ImportAndRefresh.chain(spark, dir).map { case (n, o) => n -> o.tag }

  test("import → refresh chain: runs in order, refresh reads the imported table, reruns skip") {
    val dir = java.nio.file.Files.createTempDirectory("chain-spec-").toString

    // first invocation: both run, in order
    assert(outcomes(dir) == Seq("gisaid_import" -> "ran", "spectrum_refresh" -> "ran"))

    // the refresh consumed the IMPORTED gisaid table (not a fixture):
    // the public view's foreign branch must carry exactly the non-ETHZ
    // strains the import wrote
    val imported = spark.read.parquet(s"$dir/tables/gisaid_api_sequence")
    val expectedForeign = imported.filter(!col("strain").like("%-ETHZ-%")).count()
    val meta = spark.read.parquet(s"$dir/views/spectrum_sequence_public_meta")
    assert(meta.filter(col("source_branch") === "gisaid").count() == expectedForeign)
    assert(expectedForeign > 0)

    // the import also merged the identifier table the views join
    // (null-guarded: staged gisaid_ids survive, new ethids appended)
    val ids = spark.read.parquet(s"$dir/tables/sequence_identifier")
    assert(ids.filter(col("sample_name").isNotNull).count() > 0, "staged rows survive")
    assert(ids.filter(col("sample_name").isNull).count() > 0, "imported ethids appended")

    // second invocation: nothing changed → both skip
    assert(outcomes(dir) == Seq("gisaid_import" -> "skipped", "spectrum_refresh" -> "skipped"))

    // feed changes → the import runs, and because it rewrites the
    // tables dir the refresh's (lazily evaluated) fingerprint changes
    // too: the whole chain reruns
    val feed = java.nio.file.Paths.get(dir, "feed", "provision.json")
    java.nio.file.Files.writeString(feed,
      java.nio.file.Files.readString(feed) + "\n")
    assert(outcomes(dir) == Seq("gisaid_import" -> "ran", "spectrum_refresh" -> "ran"))
  }

  test("JobRunner: a failed job records nothing, blocks downstream, and retries next run") {
    val state = new StateStore(
      java.nio.file.Files.createTempDirectory("jobrunner-spec-").toString)
    var aRuns = 0; var bRuns = 0; var cRuns = 0; var bFails = true
    def jobs = Seq(
      JobSpec("a", () => "fp-a", () => aRuns += 1),
      JobSpec("b", () => "fp-b", () => {
        bRuns += 1; if (bFails) sys.error("boom")
      }),
      JobSpec("c", () => "fp-c", () => cRuns += 1))

    val first = JobRunner.runOrdered(state, jobs).map { case (n, o) => n -> o.tag }
    assert(first == Seq("a" -> "ran", "b" -> "failed", "c" -> "blocked"))
    assert(aRuns == 1 && bRuns == 1 && cRuns == 0)

    // next invocation: a skips (state recorded), b retries (nothing
    // recorded for a failure), c finally runs
    bFails = false
    val second = JobRunner.runOrdered(state, jobs).map { case (n, o) => n -> o.tag }
    assert(second == Seq("a" -> "skipped", "b" -> "ran", "c" -> "ran"))
    assert(aRuns == 1 && bRuns == 2 && cRuns == 1)

    // invalidate forces a single job
    JobRunner.invalidate(state, "b")
    val third = JobRunner.runOrdered(state, jobs).map { case (n, o) => n -> o.tag }
    assert(third == Seq("a" -> "skipped", "b" -> "ran", "c" -> "skipped"))
  }
}

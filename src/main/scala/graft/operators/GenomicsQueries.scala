package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.genomics._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.expressions.Window

/** Domain operators (SURVEY §2.10 D1–D16) exercised through their real
  * library implementations against testdata-derived columns, each with
  * a DuckDB oracle replicating the semantics. The documents.text column
  * stands in for aligned sequences (padded to 60 chars over a literal
  * reference), exactly the fixture shape FIXTURES.md prescribes.
  */
object GenomicsQueries extends QueryModule {

  private val REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT" // 60

  // D1: nucleotide mutation caller (NucleotideMutationFinder.java:71-117)
  // over padded document texts vs the literal reference; site 7 masked.
  private val d1 = Q(
    "q_d1_mutation_caller",
    "D1 mutation caller: aligned char-diff vs broadcast reference, masked site skipped",
    (s, d) => {
      val seqs = Tables.documents(s, d)
        .select(col("doc_id"), rpad(substring(lower(col("text")), 1, 60), 60, "n").as("seq"))
      MutationCaller.callTable(s, seqs, "doc_id", "seq", REF, Set(7))
        .select(col("doc_id"), col("position").cast(LongType).as("position"), col("mutation"))
        .orderBy(col("doc_id"), col("position"))
    },
    Some(s"""
      WITH seqs AS (
        SELECT doc_id, upper(rpad(substring(lower(text), 1, 60), 60, 'n')) AS seq
        FROM documents),
      pos AS (SELECT doc_id, seq, unnest(range(1, 61)) AS p FROM seqs)
      SELECT doc_id, p AS position, substring(seq, p, 1) AS mutation
      FROM pos
      WHERE p <> 7
        AND substring(seq, p, 1) IN ('A','C','G','T','-')
        AND substring(seq, p, 1) <> substring('$REF', p, 1)
      ORDER BY doc_id, position"""))

  // D2: 80% variant caller (consensus_sequence.sql:78-137) — real
  // VariantCaller.call over the same padded texts, 5 defining mutations.
  private val d2 = Q(
    "q_d2_variant_caller",
    "D2 80%-rule variant caller: crossJoin defs, state ladder, threshold flags",
    (s, d) => {
      import s.implicits._
      val seqs = Tables.documents(s, d)
        .select(col("doc_id"), rpad(substring(lower(col("text")), 1, 60), 60, "n").as("seq"))
      val defs = Seq("A1T", "C2A", "G3T", "T4G", "A5C").toDF("nucleotide_mutation")
      VariantCaller.call(seqs, defs, "doc_id", "seq", "nucleotide_mutation")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH seqs AS (
        SELECT doc_id, upper(rpad(substring(lower(text), 1, 60), 60, 'n')) AS seq
        FROM documents),
      defs AS (
        SELECT * FROM (VALUES ('A',1,'T'), ('C',2,'A'), ('G',3,'T'), ('T',4,'G'), ('A',5,'C'))
          AS t(original, position, mutated)),
      states AS (
        SELECT doc_id,
          CASE WHEN substring(seq, position, 1) = original THEN '-'
               WHEN substring(seq, position, 1) = mutated THEN '+'
               WHEN substring(seq, position, 1) = 'N' THEN '?'
               ELSE '!' END AS mutation_state
        FROM seqs CROSS JOIN defs)
      SELECT doc_id,
        CAST(sum(CASE WHEN mutation_state = '+' THEN 1 ELSE 0 END) AS BIGINT) AS confirmed,
        CAST(sum(CASE WHEN mutation_state = '-' THEN 1 ELSE 0 END) AS BIGINT) AS original,
        CAST(sum(CASE WHEN mutation_state = '?' THEN 1 ELSE 0 END) AS BIGINT) AS unknown,
        CAST(sum(CASE WHEN mutation_state = '!' THEN 1 ELSE 0 END) AS BIGINT) AS weird,
        (sum(CASE WHEN mutation_state = '+' THEN 1 ELSE 0 END) >= 4.0) AS is_variant,
        (sum(CASE WHEN mutation_state = '+' THEN 1 ELSE 0 END)
         + sum(CASE WHEN mutation_state = '-' THEN 1 ELSE 0 END)
         + sum(CASE WHEN mutation_state = '!' THEN 1 ELSE 0 END) >= 4.0) AS callable
      FROM states GROUP BY doc_id ORDER BY doc_id"""))

  // D5: geo rule rewriter (GeoLocationMapper.java) with a non-chaining
  // rule set so the oracle is a CASE ladder; chaining/fixpoint is
  // covered by GeoRulesSpec.
  private val d5 = Q(
    "q_d5_geo_rules",
    "D5 geo-location rule rewrite: wildcard rules applied via broadcast trie",
    (s, d) => {
      val rules = GeoRules.parseRules(Seq(
        "europe/germany/*/*\tEurope/Germany/*/*",
        "*/france/*/*\t*/La France/*/*"))
      val f = GeoRules.resolveUdf(s, rules)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"),
          f(lower(col("r_name")), lower(col("n_name")), lit(""), lit("")).as("g"))
        .select(col("n_nationkey"), col("g.region").as("geo_region"), col("g.country").as("geo_country"))
        .orderBy(col("n_nationkey"))
    },
    Some("""
      SELECT n_nationkey,
        CASE WHEN lower(r_name) = 'europe' AND lower(n_name) = 'germany' THEN 'Europe'
             ELSE lower(r_name) END AS geo_region,
        CASE WHEN lower(r_name) = 'europe' AND lower(n_name) = 'germany' THEN 'Germany'
             WHEN lower(n_name) = 'france' THEN 'La France'
             ELSE lower(n_name) END AS geo_country
      FROM nation JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey"""))

  // D6: strain ownership + ethid parse (EthzParser.java:9-31).
  private val d6 = Q(
    "q_d6_strain_parse",
    "D6 ETHZ strain parser: ownership substring + ethid regex extract",
    (s, d) => {
      val c = Tables.customer(s, d)
      val strain = when(pmod(col("c_custkey"), lit(3)) =!= 0,
          concat(lit("Switzerland/ZH-ETHZ-"), col("c_custkey").cast("string"), lit("/2021")))
        .otherwise(concat(lit("Switzerland/GE-HUG-"), col("c_custkey").cast("string"), lit("/2021")))
      c.select(col("c_custkey"), strain.as("strain"))
        .select(col("c_custkey"), col("strain"),
          Annotations.isOurs(col("strain")).as("is_ours"),
          Annotations.parseEthid(col("strain")).cast(LongType).as("ethid"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      WITH s AS (
        SELECT c_custkey,
          CASE WHEN c_custkey % 3 <> 0
               THEN 'Switzerland/ZH-ETHZ-' || CAST(c_custkey AS VARCHAR) || '/2021'
               ELSE 'Switzerland/GE-HUG-' || CAST(c_custkey AS VARCHAR) || '/2021' END AS strain
        FROM customer)
      SELECT c_custkey, strain,
             contains(strain, '-ETHZ-') AS is_ours,
             CASE WHEN regexp_extract(strain, '.*ETHZ-([0-9]+)/.*', 1) = '' THEN NULL
                  ELSE CAST(regexp_extract(strain, '.*ETHZ-([0-9]+)/.*', 1) AS BIGINT) END AS ethid
      FROM s ORDER BY c_custkey"""))

  // D7: frameshift detection (utility.R:264-300) on synthesized gap strings.
  private val d7 = Q(
    "q_d7_frameshift",
    "D7 frameshift: gap-length %3 rule via higher-order exists, null-tolerant",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val start = (col("l_linenumber") * 100).cast(LongType)
      val gapEnd = start + col("l_quantity").cast(LongType)
      val gaps = when(pmod(col("l_orderkey"), lit(50)) === 0, lit(null).cast("string"))
        .otherwise(concat(start.cast("string"), lit("-"), gapEnd.cast("string")))
      li.select(col("l_orderkey"), col("l_linenumber"), gaps.as("gaps"))
        .select(col("l_orderkey"), col("l_linenumber"),
          Annotations.hasFrameshift(col("gaps")).as("has_frameshift"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      WITH g AS (
        SELECT l_orderkey, l_linenumber,
          CASE WHEN l_orderkey % 50 = 0 THEN NULL
               ELSE CAST(l_linenumber * 100 AS VARCHAR) || '-' ||
                    CAST(l_linenumber * 100 + CAST(l_quantity AS BIGINT) AS VARCHAR) END AS gaps
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
        CASE WHEN gaps IS NULL OR gaps = '' THEN NULL
             ELSE len(list_filter(string_split(gaps, ','),
                    x -> (CAST(list_extract(string_split(x, '-'), 2) AS BIGINT)
                        - CAST(list_extract(string_split(x, '-'), 1) AS BIGINT)) % 3 <> 0)) > 0
        END AS has_frameshift
      FROM g ORDER BY l_orderkey, l_linenumber"""))

  // D9: sample-condition classifier (extract_sample_conditions.py:37-103)
  // incl. a deliberate multi-match name. Oracle generated from the same
  // class table to stay in sync.
  private val d9 = {
    val matchSum = Annotations.conditionClasses
      .map { case (_, re, _) => s"(CASE WHEN regexp_matches(sample, '$re') THEN 1 ELSE 0 END)" }
      .mkString(" + ")
    val ecLadder = Annotations.conditionClasses.reverse
      .foldLeft("'unassigned'") { case (acc, (name, re, _)) =>
        s"CASE WHEN regexp_matches(sample, '$re') THEN '$name' ELSE $acc END"
      }
    val grpArms = Annotations.conditionClasses
      .map { case (name, _, grp) => s"WHEN ec = '$name' THEN '$grp'" }.mkString(" ")
    Q(
      "q_d9_condition_classify",
      "D9 sample-condition regex classifier with no-match/multi-match sentinels",
      (s, d) => {
        val doc = Tables.documents(s, d)
        val k = pmod(col("doc_id"), lit(7))
        val sample = when(k === 0, lit("H2O_CP002_A7"))
          .when(k === 1, concat((lit(160000) + col("doc_id")).cast("string"), lit("_434_D02")))
          .when(k === 2, lit("pos_CoV_ctrl_1_1")) // multi-match → no_unique_assignment
          .when(k === 3, lit("neg_109_B2"))
          .when(k === 4, lit("USZ_5_Tier"))
          .when(k === 5, lit("completely_weird"))
          .otherwise(lit("A2_722"))
        doc.select(col("doc_id"), sample.as("sample"))
          .select(col("doc_id"), col("sample"),
            Annotations.sampleCondition(col("sample")).as("c"))
          .select(col("doc_id"), col("sample"),
            col("c.condition").as("condition"),
            col("c.extended_condition").as("extended_condition"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH s AS (
          SELECT doc_id,
            CASE doc_id % 7
              WHEN 0 THEN 'H2O_CP002_A7'
              WHEN 1 THEN CAST(160000 + doc_id AS VARCHAR) || '_434_D02'
              WHEN 2 THEN 'pos_CoV_ctrl_1_1'
              WHEN 3 THEN 'neg_109_B2'
              WHEN 4 THEN 'USZ_5_Tier'
              WHEN 5 THEN 'completely_weird'
              ELSE 'A2_722' END AS sample
          FROM documents),
        m AS (SELECT doc_id, sample, ($matchSum) AS n_matches, ($ecLadder) AS ec0 FROM s),
        e AS (SELECT doc_id, sample,
                CASE WHEN n_matches = 0 THEN 'unassigned'
                     WHEN n_matches > 1 THEN 'no_unique_assignment'
                     ELSE ec0 END AS ec
              FROM m)
        SELECT doc_id, sample,
          CASE WHEN ec = 'unassigned' THEN 'unassigned'
               WHEN ec = 'no_unique_assignment' THEN 'no_unique_assignment'
               $grpArms END AS condition,
          ec AS extended_condition
        FROM e ORDER BY doc_id"""))
  }

  // D10: imprecise-date normalization (auto_import_gisaid.R:106-118).
  private val d10 = Q(
    "q_d10_imprecise_dates",
    "D10 imprecise GISAID date normalization (yyyy / yyyy-mm / yyyy-mm-XX)",
    (s, d) => {
      val o = Tables.orders(s, d)
      val full = date_format(col("o_orderdate"), "yyyy-MM-dd")
      val k = pmod(col("o_orderkey"), lit(4))
      val dstr = when(k === 0, substring(full, 1, 4))
        .when(k === 1, substring(full, 1, 7))
        .when(k === 2, concat(substring(full, 1, 7), lit("-XX")))
        .otherwise(full)
      o.select(col("o_orderkey"), dstr.as("date_str"))
        .select(col("o_orderkey"), col("date_str"),
          Annotations.normalizeImpreciseDate(col("date_str")).cast("timestamp").as("norm_date"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH s AS (
        SELECT o_orderkey,
          CASE o_orderkey % 4
            WHEN 0 THEN strftime(o_orderdate, '%Y')
            WHEN 1 THEN strftime(o_orderdate, '%Y-%m')
            WHEN 2 THEN strftime(o_orderdate, '%Y-%m') || '-XX'
            ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str
        FROM orders)
      SELECT o_orderkey, date_str,
        CAST(try_strptime(
          CASE WHEN substring(date_str, 9, 2) = 'XX' THEN substring(date_str, 1, 7) || '-01'
               WHEN length(date_str) = 7 THEN date_str || '-01'
               WHEN length(date_str) = 4 THEN date_str || '-01-01'
               ELSE date_str END, '%Y-%m-%d') AS TIMESTAMP) AS norm_date
      FROM s ORDER BY o_orderkey"""))

  // D13: keyword filter (PubmedImporter.java:69-79 pattern).
  private val d13 = Q(
    "q_d13_keyword_filter",
    "D13 keyword rlike filter over concatenated text columns",
    (s, d) => {
      val doc = Tables.documents(s, d)
      doc.filter(Annotations.keywordMatch("spark|vector|window", col("text"), col("source")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast(LongType).as("n_matching"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS n_matching
      FROM documents
      WHERE regexp_matches(lower(text || ' ' || source), 'spark|vector|window')
      GROUP BY lang ORDER BY lang"""))

  // D14: keep-max-version pick (RxivDownloader.java:103-125).
  private val d14 = Q(
    "q_d14_version_pick",
    "D14 max-version-per-key pick via window rank",
    (s, d) => Annotations.keepMaxVersion(Tables.orders(s, d), "o_custkey", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"))
      .orderBy(col("o_custkey")),
    Some("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        FROM orders) WHERE rn = 1 ORDER BY o_custkey"""))

  // D15: alias diff/sync (PangolinLineageAliasImporter.java:45-196).
  private val d15 = Q(
    "q_d15_alias_diff",
    "D15 alias add/update/delete/keep diff with validity regex",
    (s, d) => {
      import s.implicits._
      val existing = Seq(("AY", "B.1.617.2"), ("BA", "B.1.1.529"), ("Q", "B.1.1.7"))
        .toDF("alias", "full_name")
      val remote = Seq(("AY", "B.1.617.2"), ("BA", "B.1.1.529.1"), ("XE", "recombinant"), ("bad!", "x"))
        .toDF("alias", "full_name")
      Annotations.aliasDiff(existing, remote).orderBy(col("alias"))
    },
    Some("""
      WITH existing AS (SELECT * FROM (VALUES ('AY','B.1.617.2'), ('BA','B.1.1.529'), ('Q','B.1.1.7'))
             AS t(alias, full_name)),
           remote AS (SELECT * FROM (VALUES ('AY','B.1.617.2'), ('BA','B.1.1.529.1'),
                                            ('XE','recombinant'), ('bad!','x')) AS t(alias, full_name)
                      WHERE regexp_matches(alias, '^[A-Z]{1,2}(\.[0-9]{1,3})*$'))
      SELECT coalesce(e.alias, r.alias) AS alias,
             coalesce(r.full_name, e.full_name) AS full_name,
             CASE WHEN e.alias IS NULL THEN 'add'
                  WHEN r.alias IS NULL THEN 'delete'
                  WHEN e.full_name IS DISTINCT FROM r.full_name THEN 'update'
                  ELSE 'keep' END AS action
      FROM existing e FULL OUTER JOIN remote r ON e.alias = r.alias
      ORDER BY alias"""))

  // D16: AA-mutation decomposition (spectrum :116-122).
  private val d16 = Q(
    "q_d16_aa_decompose",
    "D16 gene:RefPosAlt decomposition via split + regex extract",
    (s, d) => {
      import s.implicits._
      val aa = Seq("S:N501Y", "ORF1a:T265I", "N:R203K", "E:P71L", "S:D614G").toDF("aa_mutation")
      aa.select(col("aa_mutation"), Annotations.decomposeAaMutation(col("aa_mutation")).as("m"))
        .select(col("aa_mutation"), col("m.gene").as("gene"), col("m.ref_aa").as("ref_aa"),
          col("m.position").cast(LongType).as("position"), col("m.alt_aa").as("alt_aa"))
        .orderBy(col("aa_mutation"))
    },
    Some("""
      SELECT aa_mutation,
             list_extract(string_split(aa_mutation, ':'), 1) AS gene,
             regexp_extract(aa_mutation, ':([A-Z*])([0-9]+)([A-Z*])$', 1) AS ref_aa,
             CAST(regexp_extract(aa_mutation, ':([A-Z*])([0-9]+)([A-Z*])$', 2) AS BIGINT) AS position,
             regexp_extract(aa_mutation, ':([A-Z*])([0-9]+)([A-Z*])$', 3) AS alt_aa
      FROM (VALUES ('S:N501Y'), ('ORF1a:T265I'), ('N:R203K'), ('E:P71L'), ('S:D614G')) AS t(aa_mutation)
      ORDER BY aa_mutation"""))

  // J8: stratified per-group sampling (OriginCountryEstimator.java:126-167)
  // — per-nation cap least(ceil(0.1·N), 5), deterministic md5 order
  // standing in for order-by-random (seeded rand differs per engine).
  private val j8 = Q(
    "q_j8_stratified_sample",
    "J8 stratified per-group sample: proportional cap, deterministic hash order",
    (s, d) => {
      val c = Tables.customer(s, d)
      val wAll = Window.partitionBy(col("c_nationkey"))
      val wOrd = Window.partitionBy(col("c_nationkey"))
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      c.withColumn("n_in_nation", count(lit(1)).over(wAll))
        .withColumn("cap", least(ceil(col("n_in_nation") * 0.1), lit(5)))
        .withColumn("rn", row_number().over(wOrd))
        .filter(col("rn") <= col("cap"))
        .select(col("c_nationkey").cast(LongType).as("c_nationkey"), col("c_custkey"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""
      SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey FROM (
        SELECT c_nationkey, c_custkey,
               count(*) OVER (PARTITION BY c_nationkey) AS n_in_nation,
               row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
        FROM customer)
      WHERE rn <= least(ceil(n_in_nation * 0.1), 5)
      ORDER BY c_nationkey, c_custkey"""))

  override val all: Seq[Q] =
    Seq(d1, d2, d5, d6, d7, d9, d10, d13, d14, d15, d16, j8)
}

package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting (SURVEY.md §2b X20, X43) — the
  * selection ops every training-data pipeline runs before anything
  * else, built hash-deterministic so they are reproducible across
  * engines, runs, AND cluster sizes (unlike `df.sample`, whose output
  * depends on partition layout — fine for stats, wrong for a dataset
  * definition):
  *
  *   - [[all]]'s `stratified_sample`: cap each stratum (here: lang) at
  *     N rows, chosen by md5 order — a uniform pseudo-random draw that
  *     every engine with md5 reproduces bit-for-bit. The per-stratum
  *     `row_number` window partitions on the stratum key; stratum
  *     cardinality bounds the window width, and the md5 sort key is
  *     computed scan-side, so the shuffle carries (key, hash) only.
  *   - `dataset_split`: 90/5/5 train/valid/test by md5-prefix
  *     threshold — scan-local (no shuffle at all), stable under
  *     appends (a row's split never depends on other rows), and
  *     portable: hex strings compare lexicographically the same
  *     everywhere. A salt in the hash input decouples the split from
  *     every other hash-of-id use.
  */
object Sampling {

  /** Deterministic per-stratum cap: keep the `cap` smallest md5 values
    * per stratum (uniform over rows, reproducible everywhere). */
  def stratifiedCap(df: org.apache.spark.sql.DataFrame, stratum: String,
                    idCol: String, cap: Int): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains("__h") && !df.columns.contains("__rn"),
      "input already has a __h/__rn column — rename it before stratifiedCap")
    val h = md5(concat(col(idCol).cast("string"), lit(":sample")))
    df.withColumn("__h", h)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(stratum)).orderBy(col("__h"), col(idCol))))
      .filter(col("__rn") <= cap)
      .drop("__h", "__rn")
  }

  /** Deterministic 3-way split label from an md5-prefix threshold.
    * Fractions are 8-hex-digit prefixes of the unit interval: 'e6666666'
    * ≈ 0.9, 'f3333333' ≈ 0.95. */
  def splitLabel(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val p = substring(md5(concat(idCol.cast("string"), lit(":split"))), 1, 8)
    when(p < "e6666666", "train").when(p < "f3333333", "valid").otherwise("test")
  }

  def all: Seq[Q] = Seq(

    // X20a: stratified cap — 50 docs per lang, md5-ordered.
    Q("stratified_sample",
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sample'), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 50 ORDER BY doc_id""".stripMargin) { (s, d) =>
      stratifiedCap(Tables.documents(s, d), "lang", "doc_id", 50)
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // X43: deterministic WEIGHTED sampling without replacement
    // (Efraimidis–Spirakis A-ES): per stratum, keep the k rows with the
    // smallest exponential jitter key = −ln(u)/w — each row's selection
    // probability is proportional to its weight (here: text length, the
    // "sample long documents more" corpus-mixing knob). u comes from a
    // 52-bit md5 slice so u = (m+1)/2^52 is bit-identical across engines
    // (integer + power-of-two division, both exact in double); the only
    // engine-variant step is libm ln, which can flip ordering only for
    // keys within ~1 ulp — measure-zero under continuous weights, and
    // doc_id tiebreaks make even that deterministic. Same
    // scale shape as X20a: scan-side key, per-stratum window.
    Q("weighted_sample",
      """SELECT doc_id, lang, weight FROM (
        |  SELECT doc_id, lang, len(text) AS weight,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      -ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':wsample'), 1, 13) AS BIGINT) + 1.0)
        |          / 4503599627370496.0)
        |        / greatest(len(text), 1),
        |      doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val m = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":wsample"))), 1, 13),
        16, 10).cast("double")
      val u = (m + lit(1.0)) / lit(4503599627370496.0) // (m+1) / 2^52 ∈ (0,1]
      val key = -log(u) / greatest(length(col("text")), lit(1)).cast("double")
      Tables.documents(s, d)
        .withColumn("weight", length(col("text")).cast("long"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(key.asc, col("doc_id"))))
        .filter(col("__rn") <= 20)
        .select("doc_id", "lang", "weight").orderBy("doc_id")
    },

    // X20b: deterministic 90/5/5 split, scan-local.
    Q("dataset_split",
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) < 'e6666666' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8) < 'f3333333' THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), splitLabel(col("doc_id")).as("split"))
        .orderBy("doc_id")
    },

    // X88: leakage-safe GROUP-holdout split — assign every row of a
    // GROUP (here: a user's events) to the same 80/10/10 split by
    // hashing the group key, never the row key. Row-hash splits (the
    // dataset_split above) leak when rows within a group are
    // near-duplicates or temporally correlated — a user's history
    // straddling train and test lets the model memorize the holdout;
    // group-holdout is the standard fix (GroupKFold / user-level
    // splits). By construction a user CANNOT appear in two splits, so
    // Σ n_users over the output equals the corpus's distinct users —
    // the no-leak property is checkable from the output itself (and
    // pinned in SamplingSpec). Same md5-prefix-threshold mechanics as
    // dataset_split ('cccccccd' ≈ 0.8, 'e6666666' ≈ 0.9; a :gsplit
    // salt decouples it from every other hash-of-id), scan-local label,
    // then one hash aggregation with map-side partials; the exact
    // distinct-user count is Spark's standard two-phase partial
    // distinct, |users| keyed rows across the one exchange.
    Q("split_group_holdout",
      """SELECT
        |  CASE WHEN substring(md5(CAST(user_id AS VARCHAR) || ':gsplit'), 1, 8) < 'cccccccd' THEN 'train'
        |       WHEN substring(md5(CAST(user_id AS VARCHAR) || ':gsplit'), 1, 8) < 'e6666666' THEN 'valid'
        |       ELSE 'test' END AS split,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM events GROUP BY split ORDER BY split""".stripMargin) { (s, d) =>
      val p = substring(md5(concat(col("user_id").cast("string"), lit(":gsplit"))), 1, 8)
      val lbl = when(p < "cccccccd", "train").when(p < "e6666666", "valid").otherwise("test")
      Tables.events(s, d)
        .select(col("user_id"), lbl.as("split"))
        .groupBy("split")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_rows"))
        .orderBy("split")
    },

    // X71: corpus mixing to target proportions — draw a fixed-budget
    // training mix whose language shares match declared mixture weights
    // (the data-mixing step before LM training: upsample/downsample
    // sources to the recipe, deterministically). Per-language quota =
    // weight × budget (integers by construction); each language
    // contributes its quota smallest md5 keys — so the draw is uniform
    // within language, reproducible across engines/runs/cluster sizes,
    // and STABLE under corpus appends everywhere except at the quota
    // boundary. Languages with fewer docs than quota contribute all
    // they have (the mix degrades visibly rather than silently
    // re-weighting). Same window shape as X20a: stratum-keyed
    // row_number over a scan-side hash key.
    Q("corpus_mix",
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix'), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= CASE lang WHEN 'en' THEN 80 WHEN 'es' THEN 40
        |  WHEN 'fr' THEN 40 WHEN 'de' THEN 20 WHEN 'zh' THEN 20 ELSE 0 END
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val quota = when(col("lang") === "en", 80)
        .when(col("lang") === "es", 40)
        .when(col("lang") === "fr", 40)
        .when(col("lang") === "de", 20)
        .when(col("lang") === "zh", 20)
        .otherwise(0)
      Tables.documents(s, d)
        .withColumn("__h", md5(concat(col("doc_id").cast("string"), lit(":mix"))))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))))
        .filter(col("__rn") <= quota)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // X71b: TEMPERATURE-smoothed corpus mixing — quotas derived from
    // the corpus itself instead of a hand recipe: quota_i =
    // floor(budget × n_i^α / Σ n_j^α) with α = 0.5, the standard
    // multilingual-LM upsampling that lifts low-resource languages
    // without letting the head language swamp the mix. α = 0.5 means
    // sqrt, which (unlike pow/exp/log) is CORRECTLY ROUNDED under IEEE
    // 754, so both engines compute bit-identical weights from the exact
    // integer counts; the cross-language weight sum is a SORTED
    // SEQUENTIAL fold (the X32 discipline — aggregate HOF here,
    // list_sum over an ordered list in DuckDB) so double addition
    // order cannot flip a floor boundary. Draw within language is the
    // same deterministic smallest-md5 window as corpus_mix. Per-lang
    // count + one ~5-row broadcast + one window shuffle: scale-safe.
    Q("corpus_mix_temperature",
      """WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tw AS (SELECT lang, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
        |tot AS (SELECT list_sum(list(w ORDER BY lang)) AS wsum FROM tw),
        |q AS (SELECT lang, CAST(floor(w * 200.0 / wsum) AS BIGINT) AS quota FROM tw, tot),
        |r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mixT'), doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
        |WHERE r.rn <= q.quota ORDER BY r.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val weights = docs.groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("w", sqrt(col("n").cast("double")))
      val wsum = weights
        .agg(aggregate(
          array_sort(collect_list(struct(col("lang"), col("w")))),
          lit(0.0), (acc, x) => acc + x.getField("w")).as("wsum"))
      val quotas = weights.crossJoin(broadcast(wsum))
        .select(col("lang"),
          floor(col("w") * lit(200.0) / col("wsum")).cast("long").as("quota"))
      docs
        .withColumn("__h", md5(concat(col("doc_id").cast("string"), lit(":mixT"))))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("__h"), col("doc_id"))))
        .join(broadcast(quotas), "lang")
        .filter(col("__rn") <= col("quota"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }
  )
}

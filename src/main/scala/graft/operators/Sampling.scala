package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting (SURVEY.md §2b X20) — the two
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
    }
  )
}

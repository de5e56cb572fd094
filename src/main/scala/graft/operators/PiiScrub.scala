package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection + scrubbing (training-data mandate: corpora must be
  * scanned and masked before training). Patterns are deliberately
  * lookahead-free and class-simple so Java regex (Spark) and RE2-ish
  * (DuckDB) agree byte-for-byte — the same portability rule as the
  * BPE tokenizer regex (TextAnalysis).
  *
  * Scale posture: both ops are scan-local projections/filters — no
  * shuffle at all until the optional count aggregation; they pipeline
  * into whatever shuffle follows (dedup, quality filter).
  *
  * The pristine synthetic corpus contains no PII, so the registered
  * queries run over [[withPlantedPii]] — documents plus rows carrying
  * emails / phone numbers / IPv4s under doc_id + 200000 — making the
  * outputs deterministic AND non-empty.
  */
object PiiScrub {

  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+"
  val phoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"
  val ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Per-doc PII hit counts (detection / audit pass). */
  def detect(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).cast("long").as("n_phone"),
      size(regexp_extract_all(col("text"), lit(ipv4Re), lit(0))).cast("long").as("n_ip"))

  /** Masked text (scrub pass) — order matters: emails first so their
    * digit runs can't be half-eaten by the phone pattern. */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"),
          ipv4Re, "<IP>"),
        phoneRe, "<PHONE>").as("clean_text"))

  /** Documents plus planted PII rows (doc_id + 200000). */
  def withPlantedPii(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") < 25).select(
        (col("doc_id") + 200000).as("doc_id"),
        concat(col("text"),
          lit(" contact alice.smith@example.com or +1 (555) 123-4567 at 192.168.10.1 "),
          lit("cc bob@test.org")).as("text")))

  private val duckPlanted =
    """(SELECT doc_id, text FROM documents
      | UNION ALL
      | SELECT doc_id + 200000 AS doc_id,
      |   text || ' contact alice.smith@example.com or +1 (555) 123-4567 at 192.168.10.1 ' || 'cc bob@test.org' AS text
      | FROM documents WHERE doc_id < 25)""".stripMargin

  def all: Seq[Q] = Seq(

    Q("pii_detect",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '$ipv4Re')) AS BIGINT) AS n_ip
         |FROM $duckPlanted _
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      detect(withPlantedPii(Tables.spread(s, d, "documents"))).orderBy("doc_id")
    },

    Q("pii_scrub",
      s"""SELECT doc_id,
         |  regexp_replace(
         |    regexp_replace(
         |      regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |      '$ipv4Re', '<IP>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g') AS clean_text
         |FROM $duckPlanted _
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      scrub(withPlantedPii(Tables.spread(s, d, "documents"))).orderBy("doc_id")
    }
  )
}

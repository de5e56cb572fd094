package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2b is a [[Q]] in [[all]]:
  * a named Spark query over the driver tables plus (where SQL-expressible)
  * a DuckDB oracle. The driver's correctness gate (graft.Verify → DuckDB)
  * and bench (graft.Bench) both iterate this registry.
  */
object SparkEntry {

  /** The full operator registry, grouped by SURVEY.md §7 slice.
    *
    * Names must be unique: [[queries]] is name-keyed, so a duplicate
    * would silently shadow an earlier query (last wins) — exactly the
    * round-5 `window_distribution` bug where a registered operator was
    * dead code presented as coverage. The require makes any collision
    * fail every entry point (Verify, Bench, every spec) immediately.
    */
  lazy val all: Seq[Q] = {
    val qs = registry
    val dups = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names in registry: ${dups.mkString(", ")}")
    qs
  }

  /** Pre-uniqueness-check concatenation — package-visible so the
    * ReadmeIndexSpec collision test can inspect duplicates directly
    * (calling [[all]] would throw the require before any assert ran). */
  private[graft] def registry: Seq[Q] =
    operators.TextPipeline.all ++
      operators.Scalars.all ++
      operators.Aggregates.all ++
      operators.Joins.all ++
      operators.Windows.all ++
      operators.SetOps.all ++
      operators.Physical.all ++
      operators.TextAnalysis.all ++
      operators.Dedup.all ++
      operators.Clustering.all ++
      operators.QualityFilters.all ++
      operators.RobustStats.all ++
      operators.Funnel.all ++
      operators.RangeJoin.all ++
      operators.HeavyHitters.all ++
      operators.Similarity.all ++
      operators.NearDup.all ++
      operators.Multimodal.all ++
      operators.TimeWindows.all ++
      operators.Analytics.all ++
      operators.TpchMore.all ++
      operators.PiiScrub.all ++
      operators.Sampling.all ++
      operators.TrainingPrep.all ++
      operators.Profiling.all ++
      operators.Cohorts.all ++
      operators.BloomJoin.all ++
      operators.TimeSeries.all ++
      operators.Sequences.all ++
      operators.Audit.all ++
      operators.Graph.all ++
      operators.Ranking.all ++
      operators.Associations.all ++
      operators.Lexicon.all ++
      operators.Experiments.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ngram_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Queries Bench times (headline set). */
  def headlines: Seq[Q] = all.filter(_.headline)
}

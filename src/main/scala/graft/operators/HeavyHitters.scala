package graft.operators

import graft.Q
import graft.functions.{Sketches, TextFns}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min-sketch heavy hitters (X28): streaming-mergeable frequency
  * estimation — the sketch a 100 TB pipeline keeps per partition/window
  * when exact per-token counts are too much state. One aggregation
  * builds the d×w grid (map-side partial merge applies — counters are
  * commutative); estimates are pure column arithmetic over the
  * broadcast single-row sketch, no second pass over the data.
  *
  * Bucket hashing is the codegen'd `hash()` builtin over a
  * row-index-salted token (`hash("i:" || w)`), so the d hash rows are
  * independent AND the whole hot path stays in whole-stage codegen.
  */
object HeavyHitters {

  val Depth = 4
  val Width = 1024

  private def bucketIdx(w: Column, row: Int, width: Int): Column =
    pmod(hash(concat(lit(s"$row:"), w)), lit(width)).cast("int")

  /** Token frequencies estimated from the sketch. With w=1024 over this
    * corpus's ~31-word vocabulary, no two tokens collide in ALL d rows,
    * so estimates are EXACT — which is precisely what the count(*)
    * oracle verifies. The ε-error regime (w « distinct items) is pinned
    * separately in CmsSpec with a forced-collision w=8 sketch. */
  def tokenFrequencies(docs: DataFrame, d: Int = Depth, w: Int = Width): DataFrame = {
    val toks = docs.select(explode(TextFns.tokens(col("text"))).as("w"))
    val withIdx = toks.select(
      array((0 until d).map(i => bucketIdx(col("w"), i, w)): _*).as("idxs"))
    val sketch = withIdx.agg(Sketches.countMin(d, w)(col("idxs")).as("sk"))
    val est = (0 until d).map(i =>
      element_at(col("sk"), lit(i * w + 1) + bucketIdx(col("w"), i, w)))
      .reduce(least(_, _))
    toks.distinct()
      .crossJoin(broadcast(sketch))
      .select(col("w"), est.as("est"))
      .orderBy("w")
  }

  def all: Seq[Q] = Seq(
    Q("heavy_hitters_cms",
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), t -> len(t) > 0)) AS w
        |  FROM documents)
        |SELECT w, count(*) AS est FROM toks GROUP BY w ORDER BY w""".stripMargin) { (s, d) =>
      tokenFrequencies(Tables.documents(s, d))
    }
  )
}

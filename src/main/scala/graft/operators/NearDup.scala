package graft.operators

import graft.Q
import graft.functions.{Sketches, TextFns}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection (SURVEY.md §2b X2 + the training-data
  * mandate): MinHash + banded LSH, and SimHash + chunked LSH.
  *
  * Scale design: the ONLY join in either path is an equi-join on LSH
  * bucket keys — candidate generation never goes all-pairs. Buckets
  * above [[maxBucket]] are dropped before pairing (standard LSH
  * guard: a degenerate bucket of B docs would otherwise cost B²; the
  * docs it contains are near-identical boilerplate better handled by
  * exact dedup). Verification of candidates compares fixed-k
  * signatures — O(k) per pair, independent of document size.
  */
object NearDup {

  val K = 32            // minhash permutations
  val Bands = 8         // LSH bands…
  val R = 4             // …of R rows each (K = Bands * R)
  val maxBucket = 64    // candidate-bucket size cap

  /** Per-label representative cap for [[embeddingNearDupByLabel]].
    * ONE constant feeds both the Scala operator and the interpolated
    * DuckDB oracle SQL (r15 ADVICE: a hardcoded 256 on the oracle side
    * could silently drift from a changed Scala cap). */
  val ByLabelCap = 256

  /** Per-cell screen cap for [[semDedupKeep]]: every vector is screened
    * against at most this many smallest-vec_id representatives of its
    * cell. Shared by the operator and its oracle SQL, same rationale as
    * [[ByLabelCap]]. */
  val SemDedupCap = 256

  /** X53 `best_match_fuzzy` corpus-side per-bucket representative cap
    * (r17 VERDICT task 1 — the registry's last uncapped block volume):
    * each fingerprint bucket keeps at most this many smallest-doc_id
    * CORPUS (even-id) content representatives, so per-batch-doc
    * candidate work is ≤ 4 bands × cap regardless of how densely
    * boilerplate packs a bucket. Sized ABOVE every real-fixture bucket
    * (CALIB_r17 max_bucket, both parities together: 6 / 19 / 190 at
    * sf0.01 / sf0.1 / the 10× fixture), so at every oracle scale the
    * cap is a provable no-op and the UNCHANGED brute-bucket oracle
    * still matches hash-exactly; it engages only on degenerate
    * near-identical clusters (the densified CALIB ladder: max_bucket
    * 1899 at 500k docs, 3799 at 1M — where uncapped scored rows grew
    * quadratically under copy densification). Exactness consequence:
    * identical-content matches (Jaccard 1.0) are IMMUNE to the cap —
    * they ride the content-key equality channel, which never touches
    * buckets — and `best_match_fuzzy_bound` oracles that at every
    * scale; a capped bucket can only lose a LOWER-jaccard candidate
    * of a batch doc whose bucket holds > cap distinct corpus contents
    * (the minhash maxBucket trade, measured per fixture by
    * CalibProbe). */
  val BmfBucketCap = 256

  /** Key offset for `best_match_fuzzy_bound`'s planted even-id twins —
    * far above any fixture doc_id (the 100× replicated fixtures reach
    * ~10⁶), odd so odd originals get even twins. */
  val BmfTwinOffset = 10000000001L

  /** Broadcast-gate sizing per semdedup_best artifact (cells, dim):
    * the artifact is immutable per fixture (its name folds in the
    * input fingerprint), so the sizing probes run once per JVM, not
    * once per query rep. */
  private val semSizing =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** [[embeddingNearDupByLabel]]'s broadcast-gate label count, memoized
    * per fixture dir (registry path only — direct calls re-count). */
  private val labelCount =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Per-doc MinHash signature: explode distinct 3-token shingles,
    * hash each under K fixed seeds, element-wise min via the
    * [[Sketches.MinHashAgg]] UDAF. One shuffle (groupBy doc). */
  def minhashSignatures(docs: DataFrame, k: Int = K): DataFrame = {
    val hashes = array((0 until k).map(i => xxhash64(lit(i), col("shingle"))): _*)
    docs.select(col("doc_id"), explode(array_distinct(TextFns.ngrams(col("text"), 3))).as("shingle"))
      .select(col("doc_id"), hashes.as("hs"))
      .groupBy("doc_id")
      .agg(Sketches.minhash(k)(col("hs")).as("sig"))
  }

  /** Banded-LSH candidate pairs + signature-agreement similarity
    * estimate, thresholded. With `idx` set (plus a name for the doc
    * corpus variant), the signature table persists as an
    * [[graft.Indexes]] artifact shared across queries. */
  def minhashPairs(docs: DataFrame, threshold: Double,
                   idx: Option[(org.apache.spark.sql.SparkSession, String)] = None,
                   corpusName: String = "docs"): DataFrame = {
    // Materialize signatures once: they feed three plan branches (the
    // bucket-size guard plus both sides of the band self-join), which
    // would each re-run the shingle-explode × K-hash × UDAF pipeline —
    // the expensive part of the whole query. Persisted signature table
    // when indexed (minhash_near_dup_pairs and minhash_calibration
    // share the build); per-query checkpoint otherwise.
    val sigs = idx match {
      case Some((s, d)) =>
        graft.Indexes.table(s, d, s"minhash_sigs_$corpusName", Seq("doc_id")) {
          minhashSignatures(docs)
        }
      case None => minhashSignatures(docs).localCheckpoint()
    }
    val bands = bandExplode(sigs)
    // LSH guard: drop degenerate buckets before the self-join.
    val small = minhashBandStats(sigs)
      .filter(col("bucket_n") <= maxBucket)
    val inSmall = bands.join(small, Seq("band", "bsig"))
    val a = inSmall.select(col("band"), col("bsig"), col("doc_id").as("id1"), col("sig").as("s1"))
    val b = inSmall.select(col("band"), col("bsig"), col("doc_id").as("id2"), col("sig").as("s2"))
    // Verify BELOW the pair distinct (r16, the lshCandidatePairs
    // bucket-local-scoring convention): the estimate is a pure
    // function of the signatures, so it is computed map-side IN the
    // bucket join and the threshold filter runs before the distinct —
    // the dedup exchange then carries (id1, id2, est) ≈ 24 B/row for
    // surviving pairs only, instead of both K-element signature arrays
    // (~0.5 KB/row) for every collision. A pair colliding in several
    // bands scores identically each time, so the distinct result is
    // unchanged. Measured sf1 (TimeQ, 251k candidates): near_dup_pairs
    // 2.57 → 2.38 s, calibration 2.41 → 2.25 s — modest here because
    // candidate GENERATION dominates at this SF, but the dedup
    // exchange now scales with survivors × 24 B instead of collisions
    // × 0.5 KB, which is the term that grows at 100×.
    a.join(b, Seq("band", "bsig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (aggregate(zip_with(col("s1"), col("s2"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _).cast("double") / K).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .distinct() // a pair can collide in several bands
  }

  /** One row per (doc, band) with the 64-bit band-signature bucket key. */
  private def bandExplode(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(Bands - 1)),
        i => struct(i.as("band"), xxhash64(slice(col("sig"), i * R + 1, lit(R))).as("bsig")))).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bsig").as("bsig"))

  /** Per-(band, bucket) occupancy over a signature table — the
    * measurable candidate model behind [[minhashPairs]]: kept buckets
    * (bucket_n ≤ [[maxBucket]]) contribute ≤ C(bucket_n, 2) candidate
    * slots each, so total candidates ≤ N·Bands·(maxBucket−1)/2 — LINEAR
    * in corpus size by construction. CalibProbe prints these counts per
    * fixture (r14 VERDICT task 6: minhash_calibration's 10× growth must
    * be attributed by measurement, not assumed) and NearDupSpec asserts
    * the bound. */
  def minhashBandStats(sigs: DataFrame): DataFrame =
    bandExplode(sigs).groupBy("band", "bsig")
      .agg(count(lit(1)).as("bucket_n"))

  /** The [[simhashPairs]] adaptive bucket cap as a pure function of
    * corpus size (see the simhashPairs doc for the N/16 rationale and
    * the [64, 4096] clamp), exposed so CalibProbe and NearDupSpec
    * measure against the SAME model the operator enforces. */
  def simhashCapEff(n: Long): Long =
    math.max(maxBucket.toLong, math.min(4096L, n / 16))

  /** One row per (doc, chunk) with the 16-bit chunk bucket key. */
  private def chunkExplode(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk"),
          shiftright(col("sig"), j * 16).bitwiseAND(0xffffL).as("csig"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk").as("chunk"), col("c.csig").as("csig"))

  /** Per-(chunk, bucket) occupancy over a SimHash signature table —
    * the measurable candidate model behind [[simhashPairs]] (r15
    * VERDICT task 4): kept buckets (bucket_n ≤ [[simhashCapEff]])
    * contribute ≤ C(bucket_n, 2) candidate slots each, so candidates
    * ≤ n·4·(capEff−1)/2 — linear in n once the 4096 ceiling binds.
    * CalibProbe prints these counts per fixture; NearDupSpec asserts
    * the bound. */
  def simhashChunkStats(sigs: DataFrame): DataFrame =
    chunkExplode(sigs).groupBy("chunk", "csig")
      .agg(count(lit(1)).as("bucket_n"))

  /** Per-doc 64-bit SimHash over normalized tokens. */
  def simhashSignatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(Sketches.simhash(col("h")).as("sig"))

  /** SimHash near-dup pairs: LSH on the four 16-bit chunks (two docs
    * within Hamming distance 3 of each other must agree on at least
    * one chunk… for distance ≤ 3 over 4 chunks — pigeonhole), verify
    * with exact Hamming distance via bit_count(xor).
    *
    * ADAPTIVE bucket cap (10x-compare lesson): unlike MinHash band
    * signatures (64-bit hashes of 4-row bands — buckets only grow with
    * genuine similarity), the chunk key space here is a FIXED 16 bits,
    * so bucket sizes grow linearly with the corpus and a fixed cap
    * silently discards an ever-larger recall fraction (planted-pair
    * recall measured 10/50 at 10x under cap 64, vs 25-31/50 uncapped —
    * the neardup_recall_bounds floor fired). The cap therefore scales
    * as N/16 — "a bucket holding over 1/16th of the corpus matches
    * everything and discriminates nothing" — clamped to [64, 4096]:
    * base fixtures (N ≤ 1k docs) keep cap 64 exactly (every spec pin
    * unchanged), and the 4096 ceiling bounds per-bucket pair work once
    * the 16-bit key space itself saturates (N >> 65536 — the density
    * at which chunk-LSH needs wider keys / more tables, per Manku et
    * al. WWW'07, regardless of capping). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    // Materialized once for the same three-branch reason as minhashPairs.
    val sigs = simhashSignatures(docs).localCheckpoint()
    val capEff = simhashCapEff(sigs.count())
    val chunks = chunkExplode(sigs)
    val small = simhashChunkStats(sigs)
      .filter(col("bucket_n") <= capEff)
    val inSmall = chunks.join(small, Seq("chunk", "csig"))
    val a = inSmall.select(col("chunk"), col("csig"), col("doc_id").as("id1"), col("sig").as("s1"))
    val b = inSmall.select(col("chunk"), col("csig"), col("doc_id").as("id2"), col("sig").as("s2"))
    // Verify below the distinct (r16, same reorder as minhashPairs):
    // hamming is a pure function of the two sigs — computed in the
    // chunk join, filtered to ≤ maxHamming BEFORE the dedup exchange,
    // so the distinct shuffles only qualifying (id1, id2, hamming)
    // triples instead of every bucket collision with both 64-bit sigs.
    // At the sf1 fixture the candidate stream is 23.4M collisions
    // (CALIB_r16) of which a few hundred survive hamming ≤ 16 —
    // measured 7.80 → 6.95 s there (generation, not the exchange,
    // dominates at that SF); the point is the 100× watch query: its
    // dedup exchange now carries survivors, not collisions, so the
    // exchange term stops growing with bucket densification.
    a.join(b, Seq("chunk", "csig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-dup, blocked exactly by `label` (IVF-style:
    * label is the coarse quantizer cell, so only same-cell pairs are
    * compared — |cell|² work per cell instead of |corpus|²). Exact
    * within blocks → SQL-oracle-able. At 100 TB cells must themselves
    * be capped (the [[maxBucket]] guard) or sub-split by an LSH table —
    * see [[embeddingNearDupLsh]].
    *
    * OUTPUT IS BOUNDED (r14 verdict: the raw pair emission was the
    * repo's one output-superlinear query — within-label ≥τ pairs grow
    * ~quadratically in label density, 10.57× per-row at 100×). Emitted
    * per label: the qualifying-pair COUNT (linear state) plus the
    * top-`k` pairs by (cos DESC, id1, id2) via the X29 bounded-heap
    * [[graft.functions.Sketches.TopKPairAgg]] — ≤k rows per label,
    * map-side partial merge, so the candidate stream is folded where
    * it is generated and never shuffled or materialized. OUTPUT and
    * post-join state are O(labels·k).
    *
    * COMPUTE IS BOUNDED TOO (r15: with output capped, the within-label
    * self-join still scored all C(m,2) pairs — 495 s / 12× per-row at
    * the 100× fixture, where 10 labels hold ~20k members each). Each
    * label is profiled over its `cap` smallest-vec_id REPRESENTATIVES:
    * a bounded-heap agg (the same [[graft.functions.Sketches.TopKAgg]]
    * contract, score = −vec_id) selects them in one O(n·cap) streaming
    * pass with map-side partials, and a size-gated broadcast semi-join
    * (labels·cap id rows; [[Hints.broadcastIfEstimated]] withholds the
    * hint past the session threshold) keeps their vectors — never a
    * per-label window sort over the fact table. Pair scoring is then ≤ labels·cap²/2 regardless of
    * corpus size, so the whole query is two linear passes over the
    * vectors (one feeding the heap, one probing the semi-join) + a
    * constant.
    * `pair_count` is exact over the representative set (deterministic:
    * ids, not a random sample); labels with ≤ cap members — every label
    * at the oracle gate's sf0.01/sf0.1 — are profiled EXACTLY as
    * before. Unbounded exact pair mining within cells stays the job of
    * [[semDedupKeep]]/[[embeddingNearDupLsh]], whose cells are sized by
    * construction. */
  def embeddingNearDupByLabel(emb: DataFrame, threshold: Double, k: Int,
                              cap: Int,
                              idx: Option[(org.apache.spark.sql.SparkSession, String)] = None): DataFrame = {
    val v0 = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", Similarity.norm2(col("v")))
    val reps = v0.groupBy("label")
      .agg(Sketches.topK(cap)(negate(col("vec_id").cast("double")),
        col("vec_id")).as("keep"))
      .select(col("label"), explode(col("keep")).as("r"))
      .select(col("label"), col("r._2").as("vec_id"))
    // SIZE-GATED broadcast (r16 VERDICT task 1): labels·cap id rows is
    // broadcast-sized at any plausible label cardinality, but the hint
    // was unconditional — at a 50k-label corpus it is ~12.8M rows, and
    // the gate (the pagerank convention) lets it degrade to a shuffled
    // semi-join instead of forcing the broadcast. The estimate reads
    // ONE pruned column (labels·cap bounds the heap output; an earlier
    // checkpoint-and-count of the heap itself cost ~0.4 s/rep at sf1)
    // and is memoized per fixture dir on the registry path — keyed by
    // Indexes.tableName, which folds the input-data FINGERPRINT into
    // the key (r17 ADVICE: the raw dir path served a stale count to
    // the gate after an in-place fixture regen; the sibling semSizing
    // memo already used the fingerprint-folding key).
    def countLabels(): Long =
      emb.agg(countDistinct(col("label"))).head().getLong(0)
    val nLabels = idx match {
      case Some((_, d)) => labelCount.computeIfAbsent(
        graft.Indexes.tableName(d, "bylabel_nlabels"), _ => countLabels())
      case None => countLabels()
    }
    // estimate is an UPPER bound (r17 ADVICE): a (label string, vec_id
    // long) row is ~32 B unrounded but label width is data-dependent —
    // pad to 80 B/row ×2 margin so the gate degrades early, never OOMs
    val v = v0.join(
      Hints.broadcastIfEstimated(reps, nLabels * cap * 160L),
      Seq("label", "vec_id"), "left_semi")
    val a = v.select(col("label"), col("vec_id").as("id1"), col("v").as("v1"), col("n2").as("n21"))
    val b = v.select(col("label"), col("vec_id").as("id2"), col("v").as("v2"), col("n2").as("n22"))
    a.join(b, Seq("label"))
      .filter(col("id1") < col("id2"))
      .select(col("label"), col("id1"), col("id2"),
        round(Similarity.dot(col("v1"), col("v2"))
          / (sqrt(col("n21")) * sqrt(col("n22"))), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("label")
      .agg(count(lit(1)).as("pair_count"),
        Sketches.topKPair(k)(col("cos"), col("id1"), col("id2")).as("top"))
      .select(col("label"), col("pair_count"), posexplode(col("top")))
      .select(col("label"), col("pair_count"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col._2").as("id1"), col("col._3").as("id2"), col("col._1").as("cos"))
  }

  /** Embedding-cosine near-dup via the multi-table LSH postings —
    * the unblocked scale path (candidates = same (table, bucket),
    * verify = exact cosine). Approximate: recall vs the exact form is
    * what NearDupSpec asserts. */
  def embeddingNearDupLsh(emb: DataFrame, threshold: Double,
                          idx: Option[(org.apache.spark.sql.SparkSession, String)] = None): DataFrame = {
    // distinct corpusTag: this postings table is over the PLANTED-dup
    // corpus, not the raw embeddings ann_lsh_topk indexes; the verify
    // threshold pushes below the pair distinct (bucket-local scoring)
    Similarity.lshCandidatePairs(emb, idx = idx, corpusTag = "planted",
      minCos = Some(threshold))
  }

  /** X79 SemDeDup-style semantic dedup (public method: Abbas et al.
    * 2023, arXiv:2303.09540 — cluster the embedding space with a
    * coarse quantizer, compare only within-cluster pairs, drop every
    * vector with a semantic near-duplicate ranked before it).
    *
    * The quantizer here is the per-label DECIMAL-mean centroid table —
    * the same accumulation-order-independent math as
    * `embedding_centroids`, which is what keeps the whole pipeline
    * hash-exact vs the SQL oracle. Assignment is argmax-cosine over
    * the broadcast centroids, NOT the stored label: vectors that sit
    * nearer a foreign centroid migrate, so this is a learned-space
    * clustering, not a metadata block. Keep rule is the single-pass
    * screen `dedup_incremental` also uses: v is dropped iff some
    * u < v in its cluster has cos(u,v) ≥ τ — keepers are exactly the
    * id-minimal elements of the ≥τ neighbor relation per cluster.
    *
    * DELIBERATE deviation from the paper's keep rule: this is an
    * id-minimal SCREEN, not transitive duplicate-group grouping. On a
    * chain a–b–c with cos(a,b) ≥ τ, cos(b,c) ≥ τ but cos(a,c) < τ,
    * Abbas et al. keep one representative per connected duplicate
    * group (a and c survive); this screen drops b against a and then
    * ALSO drops c against the already-dropped b — keepers are not a
    * maximal independent set, so it can over-drop relative to the
    * cited method. The one-pass rule is chosen because it is
    * single-join computable (transitive grouping needs the iterated
    * connected-components machinery of X21) and expressible in exact
    * SQL, which is what lets the oracle hash the full partition.
    *
    * Scale: centroid build is one hash agg over (label, pos);
    * assignment is a crossJoin against the BROADCAST centroid table
    * (L rows, L = cell count — at 100 TB this is the trained coarse
    * quantizer, thousands of rows, still broadcast-sized) + a
    * per-vector argmax, linear end-to-end.
    *
    * SCREEN IS CAPPED (r16 — the r15 verdict's last superlinear
    * emitter: the raw within-cell self-join scored C(m,2) pairs per
    * cell, 273.5 s / 2.43× per-row at the 100× fixture where cells
    * hold ~20k members). Each vector is screened against at most
    * `cap` per-cell REPRESENTATIVES — the cell's cap smallest-vec_id
    * members, selected by the same bounded-heap
    * [[graft.functions.Sketches.TopKAgg]] one-pass, map-side-partial
    * pattern as [[embeddingNearDupByLabel]] (score = −vec_id), kept
    * via a SIZE-GATED broadcast semi-join (≤ cells·cap id rows). The
    * screen join feeds the representative vectors (≤ cells·cap rows)
    * against the full assignment through the same gate
    * ([[Hints.broadcastIfEstimated]], r16 VERDICT task 1): under the
    * session's autoBroadcastJoinThreshold the rep side broadcasts and
    * the fact table is never shuffled for the screen; past it — the
    * SemDeDup-paper 50k-cluster regime puts cells·cap full vectors at
    * ~6.8 GB — the hint is withheld and the planner runs the identical
    * shuffled equi-join on centroid instead of OOMing a forced
    * broadcast. Either way per-vector work is ≤ cap cosines: LINEAR in
    * corpus size. Both branches are hash-exact (NearDupSpec forces the
    * fallback with a floor threshold and compares).
    *
    * Semantics under the cap: representatives are the cap SMALLEST ids
    * per cell, and the drop rule only consults ids smaller than the
    * candidate — so every vector among its cell's first `cap` ids gets
    * EXACTLY the uncapped verdict (any u < v for such v is itself a
    * representative). Only vectors past the cap are screened against a
    * prefix (the cap smallest) instead of all smaller ids — the
    * SemDeDup-paper regime where cluster size is bounded at
    * quantization time anyway. Cells at the oracle gates (sf0.01/0.1)
    * sit far under the default cap, so the capped verdicts there are
    * bit-identical to the uncapped ones; the oracle mirrors the cut
    * with the same row_number-per-cell SQL regardless. */
  /** The SemDeDup centroid assignment (buildBest of [[semDedupKeep]]),
    * exposed for PlanAuditSpec to pin BOTH strategies of the N×L
    * fan-out join. The centroid side's broadcast is SIZE-GATED (r17
    * VERDICT task 4 — the file's own [[Hints.broadcastIfEstimated]]
    * convention was applied to the screen joins but not here): under
    * the session threshold the L centroid vectors broadcast (BNLJ, the
    * fixture/`trained coarse quantizer` regime); past it — a quantizer
    * grown to ~50k cells of 64 doubles is ~30-40 MB, over the default
    * 10 MB — the hint is withheld and the planner runs the same
    * cross join as a partitioned CartesianProduct instead of OOMing a
    * forced broadcast. Both branches are row-identical (NearDupSpec
    * forces the fallback with a floor threshold end-to-end). The
    * centroid table is tiny either way, so the checkpoint+count that
    * feeds the gate estimate is a scalar-cost probe, run once per
    * assignment build. */
  private[graft] def semAssignment(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = emb
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"),
        col("col").cast("double").cast("decimal(38,12)").as("x"))
      .groupBy("label", "pos")
      .agg(round(sum(col("x")).cast("double") / count(lit(1)), 9).as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))
      .select(col("label").cast("int").as("centroid"), col("cv"),
        Similarity.norm2(col("cv")).as("cn2"))
      .localCheckpoint()
    val nCent = cent.count()
    val dim = cent.select(size(col("cv")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0).toLong).getOrElse(0L)
    val v = emb.select(col("vec_id"), col("embedding").as("vf"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", Similarity.norm2(col("v")))
    val byBest = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("centroid"))
    // the stored vector is the SOURCE (float) array, not the double
    // cast the math runs on: float→double is exact, so casting back
    // on read reproduces bit-identical doubles at half the scan
    // bytes — the screen re-reads this column twice per query.
    // Gate estimate is an UPPER bound (r17 ADVICE): dim doubles + the
    // centroid/cn2 columns + array and row headers (128 B), ×2 margin
    // for broadcast hash-relation overhead — an over-estimate degrades
    // early (slower, safe); an under-estimate OOMs.
    v.crossJoin(Hints.broadcastIfEstimated(cent, nCent * (dim * 8L + 128L) * 2L))
      .select(col("vec_id"), col("vf"), col("v"), col("n2"), col("centroid"),
        round(Similarity.dot(col("v"), col("cv"))
          / (sqrt(col("n2")) * sqrt(col("cn2"))), 6).as("ccos"))
      .withColumn("rn", row_number().over(byBest))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid"), col("vf"), col("n2"))
  }

  def semDedupKeep(emb: DataFrame, threshold: Double,
                   cap: Int = SemDedupCap,
                   idx: Option[(org.apache.spark.sql.SparkSession, String)] = None): DataFrame = {
    def buildBest: DataFrame = semAssignment(emb)
    // Materialized ONCE (the Graph.scala convention): three consumers
    // below (both sides of the screen self-join + the verdict join)
    // would otherwise each recompute the N×L fan-out and argmax —
    // PlanAuditSpec pins the final plan at zero nested-loop joins.
    // With `idx` set (the registry path) the assignment persists as a
    // bucketed-on-centroid [[graft.Indexes]] artifact instead of a
    // localCheckpoint (r16 VERDICT task 3 — the knn_pv lesson: a
    // checkpoint pins a corpus-sized vector table in executor memory at
    // 100 TB, and erases the bucket layout the reps groupBy and the
    // shuffled screen fallback both key on). MEASURED at sf1 (filtered
    // bench protocol, r17): checkpoint baseline 1.37 s median / 1.33 min
    // → naive artifact 2.10 (per-rep sizing scanned the vector column)
    // → float-stored artifact + memoized sizing 1.45 / 1.40 — parity in
    // time, the memory pin gone; the artifact also amortizes across
    // re-runs where the checkpoint rebuilt per session.
    val best = (idx match {
      case Some((s, d)) =>
        graft.Indexes.table(s, d, "semdedup_best", Seq("centroid"))(buildBest)
      case None => buildBest.localCheckpoint()
    }).select(col("vec_id"), col("centroid"),
      col("vf").cast("array<double>").as("v"), col("n2"))
    // Gate sizing off the materialized assignment: rep rows ≤
    // cells·cap, id rows ~32 B, vector rows ~dim·8+48 B — upper
    // bounds, so the gate degrades EARLY. The probes are deliberately
    // cheap (a pruned one-column distinct count + a limit-1 dim read;
    // one agg over both columns measurably dragged the whole query
    // 1.37→2.10 s at sf1 by scanning the vector column per rep) and
    // memoized per artifact — warm reps run zero sizing jobs.
    def measureSizing(): (Long, Long) = {
      val nc = best.agg(countDistinct(col("centroid"))).head().getLong(0)
      val d = best.select(size(col("v")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0).toLong).getOrElse(0L)
      (nc, d)
    }
    val (nCells, dim) = idx match {
      case Some((_, d)) => semSizing.computeIfAbsent(
        graft.Indexes.tableName(d, "semdedup_best"),
        _ => measureSizing())
      case None => measureSizing()
    }
    // screen a-side: the cap smallest-vec_id representatives per cell
    // (bounded heap → size-gated broadcast semi-join, the
    // embeddingNearDupByLabel machinery verbatim)
    val reps = best.groupBy("centroid")
      .agg(Sketches.topK(cap)(negate(col("vec_id").cast("double")),
        col("vec_id")).as("keep"))
      .select(col("centroid"), explode(col("keep")).as("r"))
      .select(col("centroid"), col("r._2").as("vec_id"))
    // both estimates are UPPER bounds (r17 ADVICE): id rows padded to
    // 80 B ×2 (fixed row overhead), vector rows to dim doubles + the
    // centroid/id/norm columns and array headers (128 B) ×2 margin for
    // broadcast hash-relation overhead
    val a = best.join(
        Hints.broadcastIfEstimated(reps, nCells * cap * 160L),
        Seq("centroid", "vec_id"), "left_semi")
      .select(col("centroid"), col("vec_id").as("id1"),
        col("v").as("v1"), col("n2").as("n21"))
    val b = best.select(col("centroid"), col("vec_id").as("id2"),
      col("v").as("v2"), col("n2").as("n22"))
    val dropped = Hints.broadcastIfEstimated(a, nCells * cap * (dim * 8L + 128L) * 2L)
      .join(b, Seq("centroid"))
      .filter(col("id1") < col("id2"))
      .filter(round(Similarity.dot(col("v1"), col("v2"))
        / (sqrt(col("n21")) * sqrt(col("n22"))), 6) >= threshold)
      .select(col("id2").as("vec_id")).distinct()
    best.select(col("vec_id"), col("centroid"))
      .join(dropped.select(col("vec_id"), lit(true).as("is_dup")),
        Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("centroid"),
        not(coalesce(col("is_dup"), lit(false))).as("kept"))
  }

  /** Demo corpus with PLANTED near-dups: the documents plus, for
    * doc_id < 50, a copy truncated to ~80% of its text under
    * doc_id + 100000 — so the pair queries have deterministic non-empty
    * output on the pristine driver tables (which contain no dups). */
  def withPlantedDups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"),
          array_join(slice(TextFns.rawTokens(col("text")), lit(1),
            greatest(lit(3), (size(TextFns.rawTokens(col("text"))) * 4 / 5).cast("int"))), " ").as("text")))

  /** Distinct 3-gram shingle set per doc, the unit both the batch and
    * streaming incremental screens persist and exchange: (doc_id, s).
    * Empty-shingle docs (fewer than 3 tokens) are dropped — they can
    * never reach Jaccard ≥ θ against anything. */
  def shingles3(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(TextFns.ngrams(col("text"), 3)).as("s"))
      .filter(size(col("s")) > 0)

  /** Core of the incremental near-dup screen, shared VERBATIM by the
    * batch registry form (`dedup_incremental_simjoin`) and the
    * streaming `foreachBatch` form (StreamingOps.nearDupScreenStream):
    * the R-S prefix-filtered set-similarity join. Both sides' distinct
    * shingle sets are ranked by ONE global rarity order (gram frequency
    * over corpus ∪ batch, ascending, gram as tiebreak — prefix
    * correctness requires a single shared total order), only the
    * |s| − ⌈θ·|s|⌉ + 1 prefix grams explode per side, candidates are
    * the equi-join of batch prefixes against corpus prefixes, and exact
    * Jaccard ≥ θ verifies candidates only. EXACT: prefix filtering has
    * no false negatives, so the screen is oracle-able brute force.
    *
    * Returns the batch doc_ids verified as near-dups of SOME corpus
    * doc. doc_ids are assumed unique across corpus ∪ batch (both
    * callers construct them so); a shared id would self-match.
    *
    * 100 TB posture: unchanged from the registry form's doc — the
    * batch shuffles on its own prefix grams only, rare-first ordering
    * keeps prefix buckets small, the corpus is consulted but never
    * re-paired against itself. */
  def nearDupVerdicts(corpusSh: DataFrame, batchSh: DataFrame,
                      theta: Double): DataFrame = {
    // one materialization feeds freq, the ranked prefix build, and
    // both verify-join sides (the simjoin_prefix lesson)
    val sh = corpusSh.select(col("doc_id"), col("s")).withColumn("side", lit("c"))
      .unionByName(batchSh.select(col("doc_id"), col("s")).withColumn("side", lit("b")))
      .localCheckpoint()
    val freq = sh.select(explode(col("s")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("f"))
    val ranked = sh.select(col("doc_id"), col("side"), explode(col("s")).as("g"))
      .join(freq, "g")
      .groupBy("doc_id", "side")
      .agg(array_sort(collect_list(struct(col("f"), col("g")))).as("ord"),
        count(lit(1)).as("n"))
    val pref = ranked.select(col("doc_id"), col("side"),
      explode(slice(transform(col("ord"), x => x.getField("g")), lit(1),
        (col("n") - ceil(lit(theta) * col("n")) + 1).cast("int"))).as("g"))
    val cand = pref.filter(col("side") === "b").as("a")
      .join(pref.filter(col("side") === "c").as("b"), col("a.g") === col("b.g"))
      .select(col("a.doc_id").as("bid"), col("b.doc_id").as("cid"))
      .distinct()
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    cand
      .join(sh.filter(col("side") === "b")
        .select(col("doc_id").as("bid"), col("s").as("s1")), "bid")
      .join(sh.filter(col("side") === "c")
        .select(col("doc_id").as("cid"), col("s").as("s2")), "cid")
      .select(col("bid"),
        round(inter / ((size(col("s1")) + size(col("s2"))).cast("double") - inter), 9)
          .as("j"))
      .filter(col("j") >= theta)
      .select(col("bid").as("doc_id")).distinct()
  }

  /** The exact prefix-filtered set-similarity SELF-join behind
    * `simjoin_prefix` (see the registration comment for the method and
    * the 100 TB posture), factored out so the 10×-tractable planted
    * bound (`simjoin_prefix_bound`, r15 VERDICT task 6) runs the SAME
    * pipeline it bounds. Returns (id1, id2, jaccard) with id1 < id2
    * and jaccard ≥ theta. */
  def simJoinPrefix(docs: DataFrame, theta: Double): DataFrame = {
    // materialized once: sh feeds freq, the ranked prefix build, and
    // BOTH verify-join sides — four plan branches that would each
    // re-run tokenize+shingle+distinct otherwise (the
    // vectorsAndPostings lesson)
    val sh = docs
      .select(col("doc_id"), array_distinct(TextFns.ngrams(col("text"), 3)).as("s"))
      .filter(size(col("s")) > 0)
      .localCheckpoint()
    val freq = sh.select(explode(col("s")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("f"))
    // rarest-first canonical order per doc, then the prefix explode
    val ranked = sh.select(col("doc_id"), explode(col("s")).as("g"))
      .join(freq, "g")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("f"), col("g")))).as("ord"),
        count(lit(1)).as("n"))
    val pref = ranked.select(col("doc_id"),
        explode(slice(transform(col("ord"), x => x.getField("g")), lit(1),
          (col("n") - ceil(lit(theta) * col("n")) + 1).cast("int"))).as("g"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
    cand
      .join(sh.select(col("doc_id").as("id1"), col("s").as("s1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("s").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        round(inter / ((size(col("s1")) + size(col("s2"))).cast("double") - inter), 9)
          .as("jaccard"))
      .filter(col("jaccard") >= theta)
  }

  /** The X50 incremental screen's corpus/batch construction + survivor
    * output, shared by `dedup_incremental_simjoin` and its
    * 10×-tractable planted bound (r15 VERDICT task 6). Returns
    * (corpus docs, batch docs, surviving batch doc_ids). */
  def incrementalSimjoinParts(s: org.apache.spark.sql.SparkSession,
                              d: String, theta: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    val corpus = Tables.documents(s, d).filter(col("source") === "src1")
      .select(col("doc_id"), col("text"))
    val batch = withPlantedDups(corpus).filter(col("doc_id") >= 100000L)
      .unionByName(Tables.documents(s, d).filter(col("source") === "src2")
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
    val screened = nearDupVerdicts(shingles3(corpus), shingles3(batch), theta)
    val survivors = batch.select("doc_id").join(screened, Seq("doc_id"), "left_anti")
    (corpus, batch, survivors)
  }

  /** X53 fuzzy best match (entity resolution), the pipeline behind
    * `best_match_fuzzy` and its planted-exactness bound: for every doc
    * in the odd-id NEW batch, its single best even-id CORPUS match —
    * candidates from shared fingerprint-band buckets (the X21 blocking
    * graph), scored by exact trigram Jaccard over hashed shingle sets,
    * winner by (jaccard DESC, corpus id ASC) as a MERGEABLE
    * max-of-struct aggregation (map-side combine, no per-doc window).
    *
    * Three layers keep it linear at 100 TB:
    *
    * 1. CONTENT DEDUP (r16): one representative (min doc_id) per
    *    (distinct-trigram-set, parity) is scored; verdicts fan back to
    *    copies by content key. Exact — copies share candidates and
    *    scores, and the argmax tie-break elects the min-id copy.
    * 2. BUCKET CAP (r17 VERDICT task 1): the corpus side of each
    *    fingerprint bucket keeps its [[BmfBucketCap]] smallest-doc_id
    *    representatives (the minhash maxBucket convention, but keeping
    *    min-id members instead of dropping the bucket — every batch doc
    *    still gets a verdict). Per-batch-doc candidates ≤ 4·cap, so
    *    scored rows are LINEAR in batch size at any bucket density —
    *    CALIB_r17 measured the uncapped form quadratic under copy
    *    densification (854.9M scored rows / max_bucket 3799 at 1M
    *    docs). A no-op at every oracle fixture (cap sits above all
    *    real-fixture bucket sizes — see the constant's doc), so the
    *    UNCHANGED oracle proves output identity there.
    * 3. EXACT CONTENT CHANNEL: batch reps join corpus reps on content
    *    key DIRECTLY (jaccard exactly 1.0, winner = min even id with
    *    that content — provably the uncapped argmax, since Jaccard 1.0
    *    means equal sets means equal key). Identical-content matches
    *    therefore can NEVER be lost to the cap at any density; the
    *    expected-empty `best_match_fuzzy_bound` oracles this at every
    *    scale with planted even twins.
    *
    * Corpus-side state is PERSISTED (r17 VERDICT task 3 — the r17 form
    * `localCheckpoint`ed two corpus-sized tables, pinning ~1.6 KB/doc
    * of hashed shingle arrays in block-manager storage at 100 TB):
    * with `idx` set, the content-rep table (bucketed on ck — the
    * exact-channel and fan-out join key) and the capped bucket
    * postings (bucketed on bucket — the candidate join key) are
    * build-once [[graft.Indexes]] artifacts, the corpus half of the
    * screen being definitionally pre-ingested. Only the batch (odd)
    * side is transient per query. Candidate scoring stays bucket-LOCAL
    * (the sets ride INTO the bucket join; a pair's multi-KB arrays
    * never cross a pair-keyed exchange) and the verify intersects
    * HASHED shingle sets (primitive long arrays — 100× fixture
    * 142.9 → 41.5 s, r17).
    *
    * `corpusTag` isolates artifact families per corpus variant (the
    * minhashPairs convention): the bound's planted corpus must never
    * share artifacts with the pristine registry corpus. */
  def bestMatchFuzzy(docs: DataFrame, cap: Int = BmfBucketCap,
                     idx: Option[(org.apache.spark.sql.SparkSession, String)] = None,
                     corpusTag: String = "docs"): DataFrame = {
    def setsOf(dd: DataFrame) = dd
      .select(col("doc_id"), array_distinct(TextFns.ngrams(col("text"), 3)).as("s"))
      .filter(size(col("s")) > 0)
    def keysOf(dd: DataFrame) = setsOf(dd)
      .select(col("doc_id"),
        sha2(array_join(array_sort(col("s")), "\u0001"), 256).as("ck"))
    // hashed shingle sets: xxhash64 each distinct shingle once per doc
    // so the verify intersect probes primitive long arrays; set SIZES
    // are preserved (collisions within one doc's ~10² shingles:
    // ~1e-15), so jaccard — and the exact-string oracle — match
    // hash-exactly
    def hashedSetsOf(dd: DataFrame) = setsOf(dd)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(col("s"), x => xxhash64(x)))).as("sh"))
    val even = docs.filter(col("doc_id") % 2 === 0)
    // corpus artifact 1: min even doc_id per content key — feeds the
    // exact channel and the postings build
    def buildRep = keysOf(even).groupBy("ck").agg(min(col("doc_id")).as("doc_id"))
    val evenRep = idx match {
      case Some((s, d)) =>
        graft.Indexes.table(s, d, s"bmf_rep_$corpusTag", Seq("ck"))(buildRep)
      case None => buildRep.localCheckpoint()
    }
    // corpus artifact 2: CAPPED bucket postings (bucket, doc_id, sh).
    // The cap selects each bucket's `cap` smallest-doc_id reps with the
    // bounded-heap TopKAgg (score = −doc_id; one O(n·cap) streaming
    // pass, map-side partials — the embeddingNearDupByLabel machinery),
    // applied at BUILD time so steady-state queries never re-rank. The
    // cap constant folds into the artifact name: a retuned cap can
    // never be served a stale layout.
    def buildPostings = {
      val repDocs = even.join(evenRep.select("doc_id"), Seq("doc_id"), "left_semi")
      Clustering.fingerprintBuckets(repDocs)
        .groupBy("bucket")
        .agg(Sketches.topK(cap)(negate(col("doc_id").cast("double")),
          col("doc_id")).as("keep"))
        .select(col("bucket"), explode(col("keep")).as("r"))
        .select(col("bucket"), col("r._2").as("doc_id"))
        .join(hashedSetsOf(repDocs), "doc_id")
        .select(col("bucket"), col("doc_id"), col("sh"))
    }
    val postings = idx match {
      case Some((s, d)) =>
        graft.Indexes.table(s, d, s"bmf_postings_c${cap}_$corpusTag",
          Seq("bucket"))(buildPostings)
      case None => buildPostings.localCheckpoint()
    }
    // batch (odd) side: transient — checkpointed because keys feed rep
    // selection AND the fan-out, and the rep postings feed one join
    // whose two subtrees would otherwise re-tokenize the batch
    val oddKeys = keysOf(docs.filter(col("doc_id") % 2 === 1)).localCheckpoint()
    val oddRep = oddKeys.groupBy("ck").agg(min(col("doc_id")).as("bdoc"))
    val oddRepDocs = docs.join(
      oddRep.select(col("bdoc").as("doc_id")), Seq("doc_id"), "left_semi")
    val oddPostings = Clustering.fingerprintBuckets(oddRepDocs)
      .join(hashedSetsOf(oddRepDocs), "doc_id")
      .localCheckpoint()
    val inter = size(array_intersect(col("sb"), col("sc"))).cast("double")
    val union = (size(col("sb")) + size(col("sc"))).cast("double") - inter
    // bucket-local scoring: a pair colliding in several bands is scored
    // once per collision (≤4, identical jac) — harmless to the argmax,
    // so no pair distinct is needed at all
    val bucketPairs = oddPostings
      .select(col("bucket"), col("doc_id").as("bdoc"), col("sh").as("sb"))
      .join(postings
        .select(col("bucket"), col("doc_id").as("cdoc"), col("sh").as("sc")), "bucket")
      .select(col("bdoc"), col("cdoc"), (inter / union).as("jac"))
    val exactPairs = oddRep
      .join(evenRep.select(col("ck"), col("doc_id").as("cdoc")), "ck")
      .select(col("bdoc"), col("cdoc"), lit(1.0).as("jac"))
    // argmax: max of (jac, -cdoc) struct = best jaccard, then LOWEST
    // corpus id — an aggregation, not a window. The exact channel's
    // rows duplicate bucket-channel rows wherever the bucket channel
    // kept them (equal sets ⇒ inter/union is exactly 1.0) — identical
    // structs, so the union changes nothing where the cap is a no-op.
    val repResult = bucketPairs.unionByName(exactPairs)
      .groupBy("bdoc")
      .agg(max(struct(col("jac"), (-col("cdoc")).as("nc"))).as("m"))
      .select(col("bdoc"),
        (-col("m.nc")).cast("long").as("match_id"),
        round(col("m.jac"), 9).as("jaccard"))
    // fan the representative verdicts back out to every batch copy by
    // content key (a linear equi-join — copies inherit their rep's
    // match verbatim; exactly one odd rep per ck, so no fan-out blowup)
    oddKeys.select(col("doc_id"), col("ck"))
      .join(oddRep, "ck")
      .join(repResult, "bdoc")
      .select(col("doc_id"), col("match_id"), col("jaccard"))
  }

  /** Embeddings plus planted near-dups: for vec_id < 40, a copy under
    * vec_id + 100000 with every 8th dimension zeroed — cosine ≈ 0.93
    * to its original, far above the random-pair tail (≤ ~0.47). */
  def withPlantedEmbeddingDups(emb: DataFrame): DataFrame =
    emb.select("vec_id", "embedding", "label").unionByName(
      emb.filter(col("vec_id") < 40).select(
        (col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i % 8 === 0, lit(0.0f)).otherwise(x)).as("embedding"),
        col("label")))

  def all: Seq[Q] = Seq(
    // X2: per-doc signatures (deterministic; rows-only check — the
    // estimator itself is property-tested in NearDupSpec).
    Q.noOracle("minhash_signatures") { (s, d) =>
      minhashSignatures(Tables.spread(s, d, "documents"))
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("m0"), element_at(col("sig"), 2).as("m1"),
          element_at(col("sig"), 3).as("m2"), element_at(col("sig"), 4).as("m3"))
        .orderBy("doc_id")
    },
    // X2: banded-LSH near-dup pairs over docs ∪ planted 80%-truncated
    // copies (threshold 0.5 keeps the planted pairs, estimator ≈ 0.8).
    Q.noOracle("minhash_near_dup_pairs") { (s, d) =>
      minhashPairs(withPlantedDups(Tables.documents(s, d)), 0.5,
          idx = Some((s, d)), corpusName = "planted")
        .orderBy("id1", "id2")
    }.copy(headline = true),

    // X75: MinHash estimator calibration — for every LSH candidate
    // pair, the exact 3-gram Jaccard is computed and compared to the
    // signature-agreement estimate; the one-row report (count, mean
    // signed error, mean/max absolute error) is the "measure, don't
    // guess" gate a dedup pipeline runs before trusting a threshold.
    // Exact verification ON CANDIDATES ONLY is the production shape —
    // candidates are bucket-capped, so the exact-Jaccard join touches
    // |candidates| pairs, never n². (A sampled corpus-wide recall eval
    // goes vacuous at scale: dup pairs almost never land together in a
    // small sample; NearDupSpec's planted-pair test covers recall.)
    // Estimates ⇒ no SQL oracle; NearDupSpec bounds the errors at the
    // K=32 theory (σ ≤ √(J(1−J)/32) ≈ 0.09).
    Q.noOracle("minhash_calibration") { (s, d) =>
      val docs = withPlantedDups(Tables.documents(s, d))
      // same signature artifact as minhash_near_dup_pairs (threshold is
      // applied downstream of the signature table)
      val cand = minhashPairs(docs, 0.0, idx = Some((s, d)), corpusName = "planted")
      val grams = docs.select(col("doc_id"),
        array_distinct(TextFns.ngrams(col("text"), 3)).as("g"))
      val inter = size(array_intersect(col("g1"), col("g2"))).cast("double")
      val union = (size(col("g1")) + size(col("g2"))).cast("double") - inter
      val err = col("est_jaccard") - try_divide(inter, union)
      cand
        .join(grams.select(col("doc_id").as("id1"), col("g").as("g1")), "id1")
        .join(grams.select(col("doc_id").as("id2"), col("g").as("g2")), "id2")
        .select(err.as("err"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(col("err")), 6).as("mean_err"),
          round(avg(abs(col("err"))), 6).as("mean_abs_err"),
          round(max(abs(col("err"))), 6).as("max_abs_err"))
    },
    // X75 (oracled, VERDICT r09 task 7): the calibration BOUND as a
    // driver-checked query, mirroring hll_rolling_bound — every LSH
    // candidate pair whose MinHash estimate deviates more than the
    // cutoff from the exact 3-gram Jaccard. Expected result: ZERO rows,
    // and that emptiness IS the oracle-able claim — the estimates are
    // engine-specific, but "no candidate pair violates the bound" is
    // exact (signatures are deterministic under the fixed seed, so this
    // is a reproducible invariant, not a flaky tail event; measured max
    // at sf0.01 is 0.168). A broken hash family, banding bug, or
    // gram-set drift surfaces here as a row-count mismatch.
    //
    // The cutoff is a bound on the MAX over all candidate pairs, not a
    // per-pair quantile (r10 ADVICE): with n pairs the expected max of
    // n zero-mean σ-bounded estimates grows like σ·√(2·ln n), so a
    // fixed per-pair 5σ cutoff (0.45) would eventually produce
    // legitimate violations as the candidate count grows with scale
    // factor. Cutoff = max(0.45, σ_max·√(2·ln n) + 0.15) with
    // σ_max = √(0.25/32) ≈ 0.0884 keeps today's tightness at small SF
    // (the adaptive term only overtakes 0.45 past n ≈ 300 pairs) while
    // staying scale-valid; the +0.15 margin covers the sub-Gaussian
    // constant. The scalar pair count rides in as a broadcast cross
    // join — no second shuffle.
    Q("minhash_calibration_bound",
      """SELECT CAST(NULL AS BIGINT) AS id1, CAST(NULL AS BIGINT) AS id2,
        |  CAST(NULL AS DOUBLE) AS abs_err
        |WHERE false""".stripMargin) { (s, d) =>
      val docs = withPlantedDups(Tables.documents(s, d))
      val cand = minhashPairs(docs, 0.0, idx = Some((s, d)), corpusName = "planted")
      val grams = docs.select(col("doc_id"),
        array_distinct(TextFns.ngrams(col("text"), 3)).as("g"))
      val inter = size(array_intersect(col("g1"), col("g2"))).cast("double")
      val union = (size(col("g1")) + size(col("g2"))).cast("double") - inter
      val cutoff = greatest(lit(0.45),
        lit(math.sqrt(0.25 / 32)) * sqrt(lit(2.0) * log(col("n_pairs").cast("double"))) + lit(0.15))
      cand
        .join(grams.select(col("doc_id").as("id1"), col("g").as("g1")), "id1")
        .join(grams.select(col("doc_id").as("id2"), col("g").as("g2")), "id2")
        .select(col("id1"), col("id2"),
          abs(col("est_jaccard") - try_divide(inter, union)).as("abs_err"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_pairs"))))
        .filter(col("abs_err") > cutoff)
        .select(col("id1"), col("id2"), col("abs_err"))
        .orderBy("id1", "id2")
    },
    Q.noOracle("simhash_signatures") { (s, d) =>
      simhashSignatures(Tables.documents(s, d)).orderBy("doc_id")
    },
    // Embedding-cosine near-dup, label-blocked (exact within blocks →
    // fully oracled; threshold 0.3 catches the natural similar tail of
    // the synthetic vectors). BOUNDED emission (r15): per label the
    // qualifying-pair count plus the top-8 pairs by (cos DESC, id1,
    // id2) — the oracle mirrors the cap with a row_number()/count()
    // window over the same pair set, so the hash still pins every
    // emitted score AND the full pair cardinality per label. BOUNDED
    // compute (r15, second half): pairs are scored over each label's
    // 256 smallest-vec_id representatives — the oracle mirrors the
    // representative cut with the same row_number() OVER (PARTITION BY
    // label ORDER BY vec_id) cut, so both engines profile the
    // identical deterministic set (identical to the uncapped profile
    // at sf0.01/sf0.1, where the largest label holds 218 vectors).
    Q("embedding_near_dup_by_label",
      s"""WITH v0 AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS n2
        |  FROM embeddings),
        |v AS (
        |  SELECT vec_id, label, v, n2 FROM (
        |    SELECT v0.*, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rep_rn
        |    FROM v0) WHERE rep_rn <= $ByLabelCap),
        |scored AS (
        |  SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
        |    round(list_inner_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)), 6) AS cos
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
        |ranked AS (
        |  SELECT label, id1, id2, cos,
        |    row_number() OVER (PARTITION BY label ORDER BY cos DESC, id1, id2) AS rnk,
        |    count(*) OVER (PARTITION BY label) AS pair_count
        |  FROM scored WHERE cos >= 0.3)
        |SELECT label, CAST(pair_count AS BIGINT) AS pair_count,
        |  CAST(rnk AS INT) AS rnk, id1, id2, cos
        |FROM ranked WHERE rnk <= 8 ORDER BY label, rnk""".stripMargin) { (s, d) =>
      embeddingNearDupByLabel(Tables.embeddings(s, d), 0.3, 8, ByLabelCap,
        idx = Some((s, d))).orderBy("label", "rnk")
    },
    // X79 SemDeDup (fully oracled): centroid-quantized clusters →
    // within-cluster cosine pairs → id-minimal keeper per ≥τ
    // neighborhood. Emits the full keep/drop partition so the oracle
    // hashes assignment AND the screen, not just the survivor list.
    // The screen's a-side is capped to each cell's SemDedupCap
    // smallest-vec_id representatives (r16 — see semDedupKeep doc);
    // the oracle mirrors the cut with the same row_number-per-cell
    // SQL, interpolated from the one shared constant.
    Q("semdedup_keep",
      s"""WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS n2
        |  FROM embeddings),
        |ex AS (
        |  SELECT label, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
        |cm AS (
        |  SELECT label, pos,
        |    round(CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / count(*), 9) AS c
        |  FROM ex GROUP BY label, pos),
        |cent AS (
        |  SELECT label AS centroid, list(c ORDER BY pos) AS cv
        |  FROM cm GROUP BY label),
        |centn AS (
        |  SELECT centroid, cv,
        |    list_sum(list_transform(cv, x -> x * x)) AS cn2
        |  FROM cent),
        |best AS (
        |  SELECT vec_id, centroid, v, n2
        |  FROM (
        |    SELECT vec_id, centroid, v, n2,
        |      round(list_inner_product(v, cv) / (sqrt(n2) * sqrt(cn2)), 6) AS ccos
        |    FROM v CROSS JOIN centn)
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, centroid) = 1),
        |reps AS (
        |  SELECT centroid, vec_id, v, n2 FROM (
        |    SELECT best.*, row_number() OVER (PARTITION BY centroid ORDER BY vec_id) AS rep_rn
        |    FROM best) WHERE rep_rn <= $SemDedupCap),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM reps a JOIN best b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
        |  WHERE round(list_inner_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)), 6) >= 0.3)
        |SELECT b.vec_id, CAST(b.centroid AS INT) AS centroid,
        |  (d.vec_id IS NULL) AS kept
        |FROM best b LEFT JOIN dropped d ON b.vec_id = d.vec_id
        |ORDER BY b.vec_id""".stripMargin) { (s, d) =>
      semDedupKeep(Tables.embeddings(s, d), 0.3, SemDedupCap,
        idx = Some((s, d))).orderBy("vec_id")
    },
    // Embedding-cosine near-dup via multi-table LSH over planted
    // perturbed copies (approximate; recall asserted in NearDupSpec).
    Q.noOracle("embedding_near_dup_lsh") { (s, d) =>
      embeddingNearDupLsh(withPlantedEmbeddingDups(Tables.embeddings(s, d)), 0.8,
          idx = Some((s, d)))
        .orderBy("id1", "id2")
    },
    Q.noOracle("simhash_near_dup_pairs") { (s, d) =>
      simhashPairs(withPlantedDups(Tables.documents(s, d)), 16)
        .orderBy("id1", "id2")
    },

    // X2/X14 (oracled, r11): the LSH PLANTED-PAIR RECALL floors as one
    // driver-checked query, completing the bound-oracle family
    // (ann_recall_bounds covers top-k recall; this covers pair MINING
    // recall): each planted near-dup (doc x truncated to 80% of its
    // tokens; embedding x with every 8th dim zeroed — both copies
    // keyed x+100000) is a pair the banded/multi-table LSH MUST
    // recover, so "recovered fraction under the floor" is an
    // expected-empty violations table. Deterministic under the fixed
    // hash seeds; floors sit under the measured recall at every sf
    // with margin (NearDupSpec pins the sf0.001 points at 45/50 and
    // 36/40). A banding, bucketing, or signature regression now fails
    // the driver's row-count gate, not just the spec.
    Q("neardup_recall_bounds",
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS BIGINT) AS found,
        |  CAST(NULL AS BIGINT) AS planted, CAST(NULL AS DOUBLE) AS floor
        |WHERE false""".stripMargin) { (s, d) =>
      def recovered(pairs: DataFrame, method: String, nPlanted: Int,
                    floor: Double): DataFrame =
        pairs.filter(col("id2") === col("id1") + 100000L &&
            col("id1") < nPlanted)
          .agg(count(lit(1)).as("found"))
          .select(lit(method).as("method"), col("found"),
            lit(nPlanted.toLong).as("planted"), lit(floor).as("floor"))
      recovered(minhashPairs(withPlantedDups(Tables.documents(s, d)), 0.5,
          idx = Some((s, d)), corpusName = "planted"),
          "minhash_lsh", 50, 0.80)
        .unionAll(recovered(
          embeddingNearDupLsh(withPlantedEmbeddingDups(Tables.embeddings(s, d)),
            0.8, idx = Some((s, d))),
          "embedding_lsh", 40, 0.80))
        // SimHash's floor is honestly LOWER: hamming <= 16 over 64 bits
        // targets small perturbations, and the planted twins are a
        // STRONG 20%-truncation (measured 28-30/50 across sfs — its
        // operating point, vs MinHash's 49-50/50 on the same twins).
        // 0.40 still discriminates: broken chunked bucketing recovers
        // ~none.
        .unionAll(recovered(
          simhashPairs(withPlantedDups(Tables.documents(s, d)), 16),
          "simhash", 50, 0.40))
        .filter(col("found").cast("double") / col("planted") < col("floor"))
        .orderBy("method")
    },

    // X50+X2 (r11): INCREMENTAL near-dup screening — the near-dup
    // completion of X50's exact-fingerprint incremental dedup. An
    // incoming BATCH (planted 80%-truncated twins of corpus docs +
    // re-keyed src2 docs, i.e. near-dups AND genuinely novel text) is
    // screened against the src1 CORPUS by the R-S form of the prefix-
    // filtered set-similarity join: rank every doc's distinct 3-grams
    // by one SHARED global rarity order, explode only the
    // |s| − ⌈θ·|s|⌉ + 1 prefix grams per side, equi-join batch
    // prefixes against corpus prefixes, exact-verify Jaccard ≥ θ on
    // candidates only, then LEFT ANTI the verified dups out of the
    // batch. EXACT (prefix filtering has no false negatives), so the
    // whole screen — unlike the MinHash probe — is oracle-able against
    // DuckDB brute force.
    //
    // 100 TB posture: the corpus side's ranked prefix table is the
    // persisted artifact a production pipeline keeps next to the X50
    // fingerprint index (the shared rarity order must come from one
    // frequency table — here corpus ∪ batch — because prefix
    // correctness needs both sides ranked by the SAME total order);
    // the batch only shuffles on its own prefix grams, candidates are
    // rare-gram-bucketed, and exact verification touches candidates
    // only. The corpus is consulted, never re-paired against itself.
    Q("dedup_incremental_simjoin",
      """WITH src1 AS (SELECT doc_id, text FROM documents WHERE source = 'src1'),
        |rt AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS r
        |       FROM src1),
        |batch AS (
        |  SELECT b.doc_id + 100000 AS doc_id,
        |    array_to_string(r[1 : greatest(3, len(r) * 4 // 5)], ' ') AS text
        |  FROM src1 b JOIN rt USING (doc_id) WHERE b.doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE source = 'src2'),
        |ctoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), x -> len(x) > 0) AS t
        |  FROM src1),
        |btoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), x -> len(x) > 0) AS t
        |  FROM batch),
        |csh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM ctoks WHERE len(t) >= 3),
        |bsh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM btoks WHERE len(t) >= 3),
        |dup AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM bsh b JOIN csh c ON round(
        |    CAST(len(list_intersect(b.s, c.s)) AS DOUBLE) /
        |    CAST(len(b.s) + len(c.s) - len(list_intersect(b.s, c.s)) AS DOUBLE), 9) >= 0.6)
        |SELECT doc_id FROM batch
        |WHERE doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val (_, _, survivors) = incrementalSimjoinParts(s, d, 0.6)
      survivors.orderBy("doc_id")
    },

    // X50 bound (r15 VERDICT task 6 — the 10× oracle excludes carried
    // only a rationale, not a scaled signal): the screen is EXACT, so
    // every planted batch doc (x+100000, an 80%-truncation of corpus
    // doc x) whose exact trigram Jaccard to its ORIGIN is ≥ θ has a
    // qualifying corpus neighbor by construction and MUST be screened
    // out. Violations = qualifying planted docs that SURVIVED — an
    // expected-empty table, linear at every scale (50 planted pairs +
    // the linear screen itself), so it runs where the brute-force
    // NOT-EXISTS oracle cannot (6M rows).
    Q("dedup_incremental_simjoin_bound",
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS j
        |WHERE false""".stripMargin) { (s, d) =>
      val theta = 0.6
      val (corpus, batch, survivors) = incrementalSimjoinParts(s, d, theta)
      val bsh = shingles3(batch)
      val csh = shingles3(corpus)
      val planted = bsh.filter(col("doc_id") >= 100000L && col("doc_id") < 100050L)
        .select(col("doc_id"), (col("doc_id") - 100000L).as("origin"), col("s").as("s1"))
        .join(csh.select(col("doc_id").as("origin"), col("s").as("s2")), "origin")
      val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
      planted.select(col("doc_id"),
          round(inter / ((size(col("s1")) + size(col("s2"))).cast("double") - inter), 9)
            .as("j"))
        .filter(col("j") >= theta)
        .join(survivors, Seq("doc_id"), "left_semi")
        .orderBy("doc_id")
    },

    // X2+: EXACT set-similarity self-join via PREFIX FILTERING (the
    // PPJoin family's candidate rule): order each doc's distinct
    // 3-gram set rarest-first (global frequency asc, gram asc); two
    // sets with Jaccard ≥ θ MUST share a gram within each set's first
    // |s| − ⌈θ·|s|⌉ + 1 elements, so candidates are an equi-join on
    // prefix grams only — exact (no false negatives), which is why
    // this one IS oracle-able against brute force, unlike
    // MinHash/SimHash. Scoped to one source so the oracle's all-pairs
    // verify stays tractable at every sweep scale; planted truncated
    // copies guarantee non-empty output.
    //
    // 100 TB posture: the join keys on individual PREFIX grams
    // (rare-first ordering makes prefix grams low-frequency, so bucket
    // sizes stay small — the standard ppjoin argument); exact
    // verification touches candidates only; frequency ranking is one
    // hash agg + sorted-struct collect per doc, no windows. A ceil on
    // the float θ·|s| can only LENGTHEN the prefix — correctness never
    // rides a rounding edge.
    Q("simjoin_prefix",
      """WITH base AS (SELECT doc_id, text FROM documents WHERE source = 'src1'),
        |rt AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS r
        |       FROM base),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT b.doc_id + 100000,
        |    array_to_string(r[1 : greatest(3, len(r) * 4 // 5)], ' ')
        |  FROM base b JOIN rt USING (doc_id) WHERE b.doc_id < 50),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), x -> len(x) > 0) AS t
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM toks WHERE len(t) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    len(list_intersect(a.s, b.s)) AS li, len(a.s) AS na, len(b.s) AS nb
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id1, id2,
        |  round(CAST(li AS DOUBLE) / CAST(na + nb - li AS DOUBLE), 9) AS jaccard
        |FROM pairs
        |WHERE round(CAST(li AS DOUBLE) / CAST(na + nb - li AS DOUBLE), 9) >= 0.6
        |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      simJoinPrefix(withPlantedDups(
          Tables.documents(s, d).filter(col("source") === "src1")
            .select(col("doc_id"), col("text"))), 0.6)
        .orderBy("id1", "id2")
    },

    // X2+ bound (r15 VERDICT task 6, the second 10× oracle exclude):
    // prefix filtering is EXACT — no false negatives — so every
    // planted pair (x, x+100000) whose exact trigram Jaccard is ≥ θ
    // MUST appear in simjoin_prefix's output. Violations = qualifying
    // planted pairs MISSING from the output — expected-empty, linear
    // at every scale (the pipeline itself + a 50-pair check), which is
    // what lets the excluded brute-force oracle carry a scaled signal.
    Q("simjoin_prefix_bound",
      """SELECT CAST(NULL AS BIGINT) AS id1, CAST(NULL AS BIGINT) AS id2,
        |  CAST(NULL AS DOUBLE) AS jaccard
        |WHERE false""".stripMargin) { (s, d) =>
      val theta = 0.6
      val docs = withPlantedDups(
        Tables.documents(s, d).filter(col("source") === "src1")
          .select(col("doc_id"), col("text")))
      val out = simJoinPrefix(docs, theta)
      val sh = shingles3(docs)
      val planted = sh.filter(col("doc_id") < 50)
          .select(col("doc_id").as("id1"), col("s").as("s1"))
        .join(sh.filter(col("doc_id") >= 100000L && col("doc_id") < 100050L)
          .select((col("doc_id") - 100000L).as("id1"), col("doc_id").as("id2"),
            col("s").as("s2")), "id1")
      val inter = size(array_intersect(col("s1"), col("s2"))).cast("double")
      planted.select(col("id1"), col("id2"),
          round(inter / ((size(col("s1")) + size(col("s2"))).cast("double") - inter), 9)
            .as("jaccard"))
        .filter(col("jaccard") >= theta)
        .join(out.select(col("id1"), col("id2")), Seq("id1", "id2"), "left_anti")
        .orderBy("id1", "id2")
    },

    // X53 fuzzy best match (entity resolution): for every doc in a NEW
    // batch (odd ids), its single best already-ingested corpus match
    // (even ids) — candidates from shared fingerprint-band buckets (the
    // X21 blocking graph; SQL-expressible, unlike the MinHash UDAF
    // blocks), scored by exact trigram Jaccard, winner by (jaccard
    // DESC, corpus id ASC).
    //
    // 100 TB posture: candidates are a bucket equi-join (never
    // all-pairs), exact scoring touches candidates only, and the
    // per-doc argmax is a MERGEABLE max-of-struct aggregation
    // (map-side combine; no per-doc window sort). Jaccard is a single
    // IEEE division of integer counts — cross-engine exact, so the
    // argmax ordering cannot disagree between engines.
    Q("best_match_fuzzy",
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9\s]+', '', 'g')), '\s+'), t -> len(t) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, array_to_string(t[u.i:u.i+2], ' ') AS g
        |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 3),
        |fp AS (
        |  SELECT doc_id, ascii(substring(md5(g), 1, 1)) % 4 AS band,
        |    min(md5(g)) AS b
        |  FROM sh GROUP BY doc_id, band),
        |memb AS (SELECT doc_id, CAST(band AS VARCHAR) || ':' || b AS bucket FROM fp),
        |sets AS (SELECT doc_id, list(DISTINCT g) AS s FROM sh GROUP BY doc_id),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS bdoc, c.doc_id AS cdoc
        |  FROM memb b JOIN memb c USING (bucket)
        |  WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
        |scored AS (
        |  SELECT bdoc, cdoc,
        |    CAST(len(list_intersect(sb.s, sc.s)) AS DOUBLE)
        |      / CAST(len(sb.s) + len(sc.s) - len(list_intersect(sb.s, sc.s)) AS DOUBLE) AS jac
        |  FROM cand JOIN sets sb ON sb.doc_id = bdoc
        |            JOIN sets sc ON sc.doc_id = cdoc)
        |SELECT bdoc AS doc_id, cdoc AS match_id, round(jac, 9) AS jaccard
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY bdoc ORDER BY jac DESC, cdoc) = 1
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      bestMatchFuzzy(Tables.documents(s, d), idx = Some((s, d)))
        .orderBy("doc_id")
    },

    // X53 bound (r17 VERDICT task 1): the cap's exactness claim as a
    // driver-checked expected-empty query at every scale (the
    // simjoin_prefix_bound pattern). Plant, for each odd doc_id < 200
    // with a nonempty shingle set, an even-id twin with IDENTICAL text
    // under doc_id + BmfTwinOffset. A planted origin's best match must
    // then be Jaccard exactly 1.0 (a 1.0 candidate exists; nothing
    // beats it; the argmax returns THE max) -- and because
    // identical-content matches ride the content-key channel, this
    // holds REGARDLESS of bucket density or the cap, so the bound is
    // green even where the cap actively evicts (the guarantee the
    // min-id bucket cap alone could not make: a high-id twin in a
    // dense bucket would be evicted first). Violations = planted
    // origins whose returned match is missing or below 1.0.
    Q("best_match_fuzzy_bound",
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS jaccard
        |WHERE false""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val twins = docs
        .filter(col("doc_id") % 2 === 1 && col("doc_id") < 200)
        .select((col("doc_id") + BmfTwinOffset).as("doc_id"), col("text"))
      val out = bestMatchFuzzy(docs.unionByName(twins),
        idx = Some((s, d)), corpusTag = "planted")
      shingles3(docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 200))
        .select(col("doc_id"))
        .join(out, Seq("doc_id"), "left_outer")
        .filter(col("jaccard").isNull || col("jaccard") < 1.0)
        .select(col("doc_id"), col("jaccard"))
        .orderBy("doc_id")
    }
  )
}

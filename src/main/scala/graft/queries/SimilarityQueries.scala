package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, SimilarityDims}
import graft.functions.VecFunctions
import graft.queries.QueryHelpers._

/** Oracle-checked similarity-search queries over `embeddings`.
  *
  * The cosine kernel is the unrolled fixed-dim form whose SQL twin
  * executes the identical IEEE operations in the identical order, so
  * values are bit-exact across engines; outputs still round to 5 dp and
  * rank on (rounded cos, vec_id) for belt-and-braces determinism.
  */
object SimilarityQueries {

  private val D = SimilarityDims.D
  private val planes = Similarity.hyperplanes(nPlanes = 8, dim = D, seed = 13L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // embedding-cosine near-duplicate pairs (brute-force baseline)
    "sim_near_pairs" -> ((s, dir) =>
      Similarity.nearPairs(Similarity.emb(s, dir), tau = 0.4)
        .orderBy("id_a", "id_b")),

    // exact top-5 neighbors for the 10 query vectors
    "sim_topk" -> ((s, dir) =>
      Similarity.bruteTopK(Similarity.emb(s, dir), nQueries = 10, k = 5)
        .orderBy("qid", "rk")),

    // LSH-bucketed ANN top-3 (8 random hyperplanes, seed 13)
    "sim_ann_lsh" -> ((s, dir) =>
      Similarity.annTopK(Similarity.emb(s, dir), planes, nQueries = 10, k = 3)
        .orderBy("qid", "rk")),

    // near-dup pairs restricted to LSH buckets — the scale path for
    // sim_near_pairs
    "sim_near_pairs_lsh" -> ((s, dir) =>
      Similarity.nearPairsLsh(Similarity.emb(s, dir), planes, tau = 0.4)
        .orderBy("id_a", "id_b")),

    // IVF ANN top-3 (8 TRAINED coarse cells — KMeansND.fit output frozen
    // as literals, see TrainedIvfCentroids — nprobe=1; quantizer = the
    // k-means assignment kernel)
    "sim_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(Similarity.emb(s, dir), coarse, nQueries = 10, k = 3)
        .orderBy("qid", "rk")),

    // multi-probe IVF (nprobe=2): each query searches its 2 nearest
    // cells — the recall lever over sim_ann_ivf
    "sim_ann_ivf_mp" -> ((s, dir) =>
      Similarity.ivfTopKMulti(Similarity.emb(s, dir), coarse,
          nQueries = 10, k = 3, nprobe = 2)
        .orderBy("qid", "rk")),

    // multi-table LSH amplification (3 independent 6-plane tables,
    // candidates unioned then deduped) — the recall lever over
    // sim_near_pairs_lsh
    "sim_near_pairs_lsh_mt" -> ((s, dir) =>
      Similarity.nearPairsLshMulti(Similarity.emb(s, dir), mtPlanes, tau = 0.4)
        .orderBy("id_a", "id_b")),

    // product-quantization ADC top-3: corpus as 4×3-bit codes, per-query
    // distance lookup tables — the compressed-corpus ANN path
    "sim_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(Similarity.emb(s, dir),
          graft.operators.TrainedPqCodebooks.books, nQueries = 10, k = 3)
        .orderBy("qid", "rk")),

    // IVF+PQ composition: nprobe=2 cells select candidates, ADC prices
    // them — the full-production ANN stack
    "sim_ivf_pq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(Similarity.emb(s, dir),
          graft.operators.TrainedIvfCentroids.cells,
          graft.operators.TrainedPqCodebooks.books,
          nQueries = 10, k = 3, nprobe = 2)
        .orderBy("qid", "rk")),

    // broadcast-model IVF+PQ: same answer as sim_ivf_pq_topk (shares its
    // oracle SQL) but the centroids/codebooks are a broadcast TABLE, not
    // plan literals — the shape that still plans at nlist >= 1024
    "sim_ivf_pq_bt" -> ((s, dir) =>
      Similarity.ivfPqTopKBroadcast(Similarity.emb(s, dir),
          graft.operators.TrainedIvfCentroids.cells,
          graft.operators.TrainedPqCodebooks.books,
          nQueries = 10, k = 3, nprobe = 2)
        .orderBy("qid", "rk")),

    // residual IVF-PQ: codes quantize v − centroid(cell) with
    // residual-trained codebooks (lower distortion at the same code
    // budget — the last step of the ANN ladder)
    "sim_ivfpq_residual" -> ((s, dir) =>
      Similarity.ivfPqResidualTopK(Similarity.emb(s, dir),
          graft.operators.TrainedIvfCentroids.cells,
          graft.operators.TrainedResidualPq.books,
          nQueries = 10, k = 3, nprobe = 2)
        .orderBy("qid", "rk")),

    // broadcast-model residual IVF-PQ: same answer as sim_ivfpq_residual
    // (shares its oracle), centroids/codebooks as broadcast tables and
    // the residual via zip_with against the joined centroid vector —
    // the literal form's worst planning cost (a CASE chain per vector
    // component) gone
    "sim_ivfpq_residual_bt" -> ((s, dir) =>
      Similarity.ivfPqResidualTopKBroadcast(Similarity.emb(s, dir),
          graft.operators.TrainedIvfCentroids.cells,
          graft.operators.TrainedResidualPq.books,
          nQueries = 10, k = 3, nprobe = 2)
        .orderBy("qid", "rk")),

    // cross-extension integration: documents ⋈ embeddings on the shared
    // id space — per (lang, label) count + mean embedding norm (the
    // text↔vector linkage every multimodal corpus needs)
    "sim_doc_embedding_join" -> ((s, dir) => {
      val d = graft.Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val e = Similarity.withNorm(Similarity.emb(s, dir))
        .select(col("vec_id"), col("label"), col("nrm"))
      d.join(e, d("doc_id") === e("vec_id"))
        .groupBy(col("lang"), col("label"))
        .agg(count(lit(1)).as("n"), rnd(avg(col("nrm")), 5).as("avg_norm"))
        .orderBy("lang", "label")
    }),

    // embedding-cosine near-duplicate DEDUP: LSH-bucketed candidate
    // pairs (cos >= tau), then the keep-lowest-id survivor rule — any
    // document whose embedding near-dups a smaller doc_id is dropped.
    // No broadcast hint on the drop set: on a crawl corpus 30-50% of
    // documents are near-dups, so drops is O(corpus) and a forced
    // broadcast would OOM the driver at scale. AQE picks broadcast when
    // the runtime cardinality is actually small, shuffle anti-join
    // (scale-safe) otherwise.
    "dedup_embedding" -> ((s, dir) => {
      val e = Similarity.emb(s, dir)
      val drops = Similarity.nearPairsLsh(e, planes, tau = 0.4)
        .select(col("id_b").as("vec_id")).distinct()
      val docs = graft.Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      docs.join(e.select(col("vec_id")), docs("doc_id") === col("vec_id"))
        .join(drops, Seq("vec_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }))

  private val coarse = graft.operators.TrainedIvfCentroids.cells

  /** Three independent 6-plane tables for LSH amplification. */
  private val mtPlanes: Seq[Seq[Array[Double]]] =
    Seq(13L, 17L, 19L).map(seed =>
      Similarity.hyperplanes(nPlanes = 6, dim = D, seed = seed))

  // ---- oracle SQL generation ----

  private val embCte =
    "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n" +
      s"en AS (SELECT vec_id, v, sqrt(${VecFunctions.dotUnrolledSql("v", "v", SimilarityDims.D)}) AS nrm FROM e)"

  /** cosine with precomputed norms — mirrors Similarity.withNorm exactly */
  private def cosN(a: String, b: String, na: String, nb: String): String =
    s"(${VecFunctions.dotUnrolledSql(a, b, D)}) / ($na * $nb)"

  /** Inline literal-plane dot: v[1]*p1 + v[2]*p2 + … (constant-folded on
    * the Spark side the same way).
    */
  private def planeDotSql(v: String, p: Array[Double]): String =
    p.zipWithIndex.map { case (pv, i) => s"$v[${i + 1}]*${pv}" }.mkString(" + ")

  private def bucketSqlFor(v: String, ps: Seq[Array[Double]]): String =
    ps.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN (${planeDotSql(v, p)}) >= 0.0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  private def bucketSql(v: String): String = bucketSqlFor(v, planes)

  /** Per-coarse-centroid squared distance, mirroring the
    * SquaredDistance kernel's ascending left-associative accumulation.
    */
  private def cellDistSql(v: String, c: Array[Double]): String =
    c.zipWithIndex.map { case (cv, i) =>
      s"($v[${i + 1}] - $cv)*($v[${i + 1}] - $cv)"
    }.mkString(" + ")

  private def ivfSql: String = {
    val dcols = coarse.map(c => s"${cellDistSql("v", c.vec)} AS dd${c.cid}")
      .mkString(",\n        ")
    val leastArgs = coarse.map(c => s"dd${c.cid}").mkString(", ")
    val caseArms = coarse.map(c => s"WHEN dd${c.cid} = mind THEN ${c.cid}").mkString(" ")
    s"""WITH $embCte,
       |cd AS (SELECT vec_id, v, nrm,
       |        $dcols
       |      FROM en),
       |cm AS (SELECT *, least($leastArgs) AS mind FROM cd),
       |cc AS (SELECT vec_id, v, nrm,
       |        CAST(CASE $caseArms ELSE -1 END AS INT) AS cell FROM cm),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, cell FROM cc WHERE vec_id < 10),
       |j AS (SELECT q.qid, q.cell, b.vec_id, ${rndSql(cosN("q.qv", "b.v", "q.qnrm", "b.nrm"), 5)} AS cos5
       |      FROM q JOIN cc b USING (cell) WHERE b.vec_id <> q.qid),
       |r AS (SELECT qid, cell, vec_id, cos5,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos5 DESC, vec_id) AS INT) AS rk
       |      FROM j)
       |SELECT qid, cell, rk, vec_id, cos5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  /** Multi-probe IVF oracle: probe ranking via UNION ALL + row_number
    * (ORDER BY pdist, pcell — the same (d, c) struct order the Spark
    * sort_array uses; pdist is the identical expression text so values
    * are bit-equal).
    */
  private def ivfMpSql: String = {
    val dcols = coarse.map(c => s"${cellDistSql("v", c.vec)} AS dd${c.cid}")
      .mkString(",\n        ")
    val ddList = coarse.map(c => s"dd${c.cid}").mkString(", ")
    val leastArgs = ddList
    val caseArms = coarse.map(c => s"WHEN dd${c.cid} = mind THEN ${c.cid}").mkString(" ")
    val probeUnion = coarse.map(c =>
      s"SELECT qid, qv, qnrm, ${c.cid} AS pcell, dd${c.cid} AS pdist FROM cq")
      .mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |cd AS (SELECT vec_id, v, nrm,
       |        $dcols
       |      FROM en),
       |cm AS (SELECT *, least($leastArgs) AS mind FROM cd),
       |cc AS (SELECT vec_id, v, nrm,
       |        CAST(CASE $caseArms ELSE -1 END AS INT) AS cell FROM cm),
       |cq AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, $ddList
       |      FROM cd WHERE vec_id < 10),
       |pr AS (SELECT qid, qv, qnrm, pcell,
       |        row_number() OVER (PARTITION BY qid ORDER BY pdist, pcell) AS prk
       |      FROM ($probeUnion)),
       |p2 AS (SELECT qid, qv, qnrm, pcell FROM pr WHERE prk <= 2),
       |j AS (SELECT p2.qid, b.cell, b.vec_id,
       |        ${rndSql(cosN("p2.qv", "b.v", "p2.qnrm", "b.nrm"), 5)} AS cos5
       |      FROM p2 JOIN cc b ON b.cell = p2.pcell AND b.vec_id <> p2.qid),
       |r AS (SELECT qid, cell, vec_id, cos5,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos5 DESC, vec_id) AS INT) AS rk
       |      FROM j)
       |SELECT qid, cell, rk, vec_id, cos5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  /** PQ/ADC oracle: per-subspace argmin encoding of the corpus (same
    * dd/least/CASE shape as the IVF cells, over slice index ranges) +
    * per-query code-distance columns + CASE-lookup ADC sum. Distance
    * terms ascend within each subspace and subspaces sum in order, the
    * exact float order of the Spark kernel.
    */
  private def pqSql: String = {
    val books = graft.operators.TrainedPqCodebooks.books
    val m = books.length
    val subDim = books.head.head.vec.length
    def subDist(v: String, c: Array[Double], s: Int): String =
      c.zipWithIndex.map { case (cv, i) =>
        s"($v[${s * subDim + i + 1}] - $cv)*($v[${s * subDim + i + 1}] - $cv)"
      }.mkString(" + ")
    val ddCols = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${subDist("v", c.vec, s)} AS dd${s}_${c.cid}").mkString(",\n        ")
    val minCols = (0 until m).map(s =>
      s"least(${books(s).map(c => s"dd${s}_${c.cid}").mkString(", ")}) AS m$s")
      .mkString(",\n        ")
    val cellCols = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN dd${s}_${c.cid} = m$s THEN ${c.cid}").mkString(" ")
      s"CAST(CASE $arms ELSE -1 END AS INT) AS cell$s"
    }.mkString(",\n        ")
    val dtCols = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${subDist("qv", c.vec, s)} AS dt${s}_${c.cid}").mkString(",\n        ")
    val adc = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN ${c.cid} THEN q.dt${s}_${c.cid}").mkString(" ")
      s"(CASE cc.cell$s $arms END)"
    }.mkString(" + ")
    s"""WITH $embCte,
       |cd AS (SELECT vec_id, v,
       |        $ddCols
       |      FROM en),
       |cm AS (SELECT *,
       |        $minCols
       |      FROM cd),
       |cc AS (SELECT vec_id,
       |        $cellCols
       |      FROM cm),
       |q AS (SELECT vec_id AS qid, v AS qv,
       |        $dtCols
       |      FROM en WHERE vec_id < 10),
       |j AS (SELECT q.qid, cc.vec_id, ${rndSql(s"($adc)", 5)} AS adc5
       |      FROM q, cc WHERE cc.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, adc5,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY adc5 ASC, vec_id) AS INT) AS rk
       |      FROM j)
       |SELECT qid, rk, vec_id, adc5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  /** IVF+PQ oracle: IVF cell + probe CTEs (as in ivfMpSql) composed
    * with the PQ encode/table CTEs (as in pqSql); candidates join on the
    * probed cell and rank by the CASE-lookup ADC.
    */
  private def ivfPqSql: String = {
    val books = graft.operators.TrainedPqCodebooks.books
    val m = books.length
    val subDim = books.head.head.vec.length
    def subDist(v: String, c: Array[Double], s: Int): String =
      c.zipWithIndex.map { case (cv, i) =>
        s"($v[${s * subDim + i + 1}] - $cv)*($v[${s * subDim + i + 1}] - $cv)"
      }.mkString(" + ")
    // IVF side (full 64-dim cells)
    val cellDcols = coarse.map(c => s"${cellDistSql("v", c.vec)} AS cd${c.cid}")
      .mkString(",\n        ")
    val cdList = coarse.map(c => s"cd${c.cid}").mkString(", ")
    val cellArms = coarse.map(c => s"WHEN cd${c.cid} = mind THEN ${c.cid}").mkString(" ")
    val probeUnion = coarse.map(c =>
      s"SELECT qid, qv, ${c.cid} AS pcell, cd${c.cid} AS pdist FROM cq")
      .mkString("\n  UNION ALL ")
    // PQ side
    val codeDds = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${subDist("v", c.vec, s)} AS dd${s}_${c.cid}").mkString(",\n        ")
    val codeMins = (0 until m).map(s =>
      s"least(${books(s).map(c => s"dd${s}_${c.cid}").mkString(", ")}) AS m$s")
      .mkString(",\n        ")
    val codeCols = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN dd${s}_${c.cid} = m$s THEN ${c.cid}").mkString(" ")
      s"CAST(CASE $arms ELSE -1 END AS INT) AS code$s"
    }.mkString(",\n        ")
    val dtCols = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${subDist("qv", c.vec, s)} AS dt${s}_${c.cid}").mkString(",\n        ")
    val dtList = (for { s <- 0 until m; c <- books(s) }
      yield s"dt${s}_${c.cid}").mkString(", ")
    val adc = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN ${c.cid} THEN p2.dt${s}_${c.cid}").mkString(" ")
      s"(CASE cc.code$s $arms END)"
    }.mkString(" + ")
    s"""WITH $embCte,
       |vd AS (SELECT vec_id, v,
       |        $cellDcols
       |      FROM en),
       |vm AS (SELECT *, least($cdList) AS mind FROM vd),
       |pq AS (SELECT vec_id, v,
       |        CAST(CASE $cellArms ELSE -1 END AS INT) AS cell
       |      FROM vm),
       |pe AS (SELECT vec_id, cell, v,
       |        $codeDds
       |      FROM pq),
       |pm AS (SELECT *,
       |        $codeMins
       |      FROM pe),
       |cc AS (SELECT vec_id, cell,
       |        $codeCols
       |      FROM pm),
       |cq AS (SELECT vec_id AS qid, v AS qv, $cdList
       |      FROM vd WHERE vec_id < 10),
       |pr AS (SELECT qid, qv, pcell,
       |        row_number() OVER (PARTITION BY qid ORDER BY pdist, pcell) AS prk
       |      FROM ($probeUnion)),
       |pt AS (SELECT qid, qv, pcell,
       |        $dtCols
       |      FROM pr WHERE prk <= 2),
       |p2 AS (SELECT qid, pcell, $dtList FROM pt),
       |j AS (SELECT p2.qid, cc.cell, cc.vec_id, ${rndSql(s"($adc)", 5)} AS adc5
       |      FROM p2 JOIN cc ON cc.cell = p2.pcell AND cc.vec_id <> p2.qid),
       |r AS (SELECT qid, cell, vec_id, adc5,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY adc5 ASC, vec_id) AS INT) AS rk
       |      FROM j)
       |SELECT qid, cell, rk, vec_id, adc5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  /** Residual IVF-PQ oracle: residual components materialized as named
    * columns (r1..r64 = v[k] − CASE cell … centroid_k), PQ dd/code CTEs
    * over them, probe-local query residuals likewise. Float order
    * mirrors the Spark kernel term-for-term: (v[k]−cent_k)−code_i inside
    * ascending-index sums.
    */
  private def ivfPqResidualSql: String = {
    val books = graft.operators.TrainedResidualPq.books
    val m = books.length
    val subDim = books.head.head.vec.length
    val dim = SimilarityDims.D
    val cells = coarse.sortBy(_.cid)
    def centCase(cellCol: String, k: Int): String =
      "CASE " + cellCol + " " +
        cells.map(c => s"WHEN ${c.cid} THEN ${c.vec(k - 1)}").mkString(" ") + " END"
    val cellDcols = cells.map(c => s"${cellDistSql("v", c.vec)} AS cd${c.cid}")
      .mkString(",\n        ")
    val cdList = cells.map(c => s"cd${c.cid}").mkString(", ")
    val cellArms = cells.map(c => s"WHEN cd${c.cid} = mind THEN ${c.cid}").mkString(" ")
    val probeUnion = cells.map(c =>
      s"SELECT qid, qv, ${c.cid} AS pcell, cd${c.cid} AS pdist FROM cq")
      .mkString("\n  UNION ALL ")
    val rCols = (1 to dim).map(k =>
      s"(v[$k] - ${centCase("cell", k)}) AS r$k").mkString(",\n        ")
    def resDist(prefix: String, c: Array[Double], s: Int): String =
      c.zipWithIndex.map { case (cv, i) =>
        s"($prefix${s * subDim + i + 1} - $cv)*($prefix${s * subDim + i + 1} - $cv)"
      }.mkString(" + ")
    val codeDds = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${resDist("r", c.vec, s)} AS dd${s}_${c.cid}").mkString(",\n        ")
    val codeMins = (0 until m).map(s =>
      s"least(${books(s).map(c => s"dd${s}_${c.cid}").mkString(", ")}) AS m$s")
      .mkString(",\n        ")
    val codeCols = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN dd${s}_${c.cid} = m$s THEN ${c.cid}").mkString(" ")
      s"CAST(CASE $arms ELSE -1 END AS INT) AS code$s"
    }.mkString(",\n        ")
    val qrCols = (1 to dim).map(k =>
      s"(qv[$k] - ${centCase("pcell", k)}) AS qr$k").mkString(",\n        ")
    val dtCols = (for { s <- 0 until m; c <- books(s).sortBy(_.cid) }
      yield s"${resDist("qr", c.vec, s)} AS dt${s}_${c.cid}").mkString(",\n        ")
    val adc = (0 until m).map { s =>
      val arms = books(s).sortBy(_.cid)
        .map(c => s"WHEN ${c.cid} THEN p2.dt${s}_${c.cid}").mkString(" ")
      s"(CASE cc.code$s $arms END)"
    }.mkString(" + ")
    s"""WITH $embCte,
       |vd AS (SELECT vec_id, v,
       |        $cellDcols
       |      FROM en),
       |vm AS (SELECT *, least($cdList) AS mind FROM vd),
       |pq AS (SELECT vec_id, v,
       |        CAST(CASE $cellArms ELSE -1 END AS INT) AS cell
       |      FROM vm),
       |rr AS (SELECT vec_id, cell,
       |        $rCols
       |      FROM pq),
       |pe AS (SELECT vec_id, cell,
       |        $codeDds
       |      FROM rr),
       |pm AS (SELECT *,
       |        $codeMins
       |      FROM pe),
       |cc AS (SELECT vec_id, cell,
       |        $codeCols
       |      FROM pm),
       |cq AS (SELECT vec_id AS qid, v AS qv, $cdList
       |      FROM vd WHERE vec_id < 10),
       |pr AS (SELECT qid, qv, pcell,
       |        row_number() OVER (PARTITION BY qid ORDER BY pdist, pcell) AS prk
       |      FROM ($probeUnion)),
       |pp AS (SELECT qid, pcell,
       |        $qrCols
       |      FROM pr WHERE prk <= 2),
       |p2 AS (SELECT qid, pcell,
       |        $dtCols
       |      FROM pp),
       |j AS (SELECT p2.qid, cc.cell, cc.vec_id, ${rndSql(s"($adc)", 5)} AS adc5
       |      FROM p2 JOIN cc ON cc.cell = p2.pcell AND cc.vec_id <> p2.qid),
       |r AS (SELECT qid, cell, vec_id, adc5,
       |        CAST(row_number() OVER (PARTITION BY qid ORDER BY adc5 ASC, vec_id) AS INT) AS rk
       |      FROM j)
       |SELECT qid, cell, rk, vec_id, adc5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
  }

  private def lshMtSql: String = {
    val bucketCtes = mtPlanes.zipWithIndex.map { case (ps, t) =>
      s"b$t AS (SELECT vec_id, ${bucketSqlFor("v", ps)} AS bucket FROM en)"
    }.mkString(",\n")
    val candUnion = mtPlanes.indices.map(t =>
      s"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM b$t a JOIN b$t b " +
        "ON a.bucket = b.bucket AND a.vec_id < b.vec_id")
      .mkString("\n  UNION ALL ")
    s"""WITH $embCte,
       |$bucketCtes,
       |cand AS (SELECT DISTINCT id_a, id_b FROM ($candUnion)),
       |sc AS (SELECT id_a, id_b,
       |        ${cosN("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
       |      FROM cand JOIN en a ON a.vec_id = id_a JOIN en b ON b.vec_id = id_b)
       |SELECT id_a, id_b, ${rndSql("cos", 5)} AS cos5
       |FROM sc WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "sim_ann_ivf" -> ivfSql,
    "sim_ann_ivf_mp" -> ivfMpSql,
    "sim_near_pairs_lsh_mt" -> lshMtSql,
    "sim_pq_topk" -> pqSql,
    "sim_ivf_pq_topk" -> ivfPqSql,
    // the broadcast-table form computes the identical result, so the
    // literal form's oracle pins it too
    "sim_ivf_pq_bt" -> ivfPqSql,
    "sim_ivfpq_residual" -> ivfPqResidualSql,
    "sim_ivfpq_residual_bt" -> ivfPqResidualSql,

    "sim_doc_embedding_join" ->
      s"""WITH $embCte
         |SELECT d.lang, e2.label, count(*) AS n,
         |  ${rndSql("avg(en.nrm)", 5)} AS avg_norm
         |FROM documents d
         |JOIN en ON d.doc_id = en.vec_id
         |JOIN embeddings e2 ON e2.vec_id = en.vec_id
         |GROUP BY d.lang, e2.label ORDER BY lang, label""".stripMargin,

    "dedup_embedding" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM en),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        a.v AS va, b.v AS vb, a.nrm AS na, b.nrm AS nb
         |      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT DISTINCT id_b FROM p
         |      WHERE ${cosN("va", "vb", "na", "nb")} >= 0.4)
         |SELECT doc.doc_id, doc.lang
         |FROM documents doc JOIN en ON doc.doc_id = en.vec_id
         |WHERE en.vec_id NOT IN (SELECT id_b FROM d)
         |ORDER BY doc_id""".stripMargin,

    "sim_near_pairs_lsh" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM en),
         |p AS (SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
         |        a.v AS va, b.v AS vb, a.nrm AS na, b.nrm AS nb
         |      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |c AS (SELECT bucket, id_a, id_b, ${cosN("va", "vb", "na", "nb")} AS cos FROM p)
         |SELECT bucket, id_a, id_b, ${rndSql("cos", 5)} AS cos5
         |FROM c WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "sim_near_pairs" ->
      s"""WITH $embCte,
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb,
         |        a.nrm AS na, b.nrm AS nb
         |      FROM en a, en b WHERE a.vec_id < b.vec_id),
         |c AS (SELECT id_a, id_b, ${cosN("va", "vb", "na", "nb")} AS cos FROM p)
         |SELECT id_a, id_b, ${rndSql("cos", 5)} AS cos5
         |FROM c WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    "sim_topk" ->
      s"""WITH $embCte,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM en WHERE vec_id < 10),
         |j AS (SELECT qid, vec_id, ${rndSql(cosN("qv", "v", "qnrm", "nrm"), 5)} AS cos5
         |      FROM q, en WHERE vec_id <> qid),
         |r AS (SELECT qid, vec_id, cos5,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos5 DESC, vec_id) AS INT) AS rk
         |      FROM j)
         |SELECT qid, rk, vec_id, cos5 FROM r WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,

    "sim_ann_lsh" ->
      s"""WITH $embCte,
         |b AS (SELECT vec_id, v, nrm, ${bucketSql("v")} AS bucket FROM en),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm, bucket FROM b WHERE vec_id < 10),
         |j AS (SELECT q.qid, q.bucket, b.vec_id, ${rndSql(cosN("q.qv", "b.v", "q.qnrm", "b.nrm"), 5)} AS cos5
         |      FROM q JOIN b USING (bucket) WHERE b.vec_id <> q.qid),
         |r AS (SELECT qid, bucket, vec_id, cos5,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos5 DESC, vec_id) AS INT) AS rk
         |      FROM j)
         |SELECT qid, bucket, rk, vec_id, cos5 FROM r WHERE rk <= 3 ORDER BY qid, rk""".stripMargin)
}

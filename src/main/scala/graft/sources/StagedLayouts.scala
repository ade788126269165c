package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned table layouts staged from the flat fixtures.
  *
  * The reference's only storage contract is directory-per-partition
  * (readme.txt:16-24 — mapper outputs land in per-partition files;
  * mapper.py:53-74 routes rows to them); its honest 100-TB
  * generalization is the hive `col=value/` directory layout plus
  * partition pruning, which is THE most common access path on a large
  * warehouse: a date-bracketed scan must read only the matching
  * directories, never the whole table.
  *
  * The driver fixtures are single flat parquet files, so the layout is
  * staged here once per (scale dir): events rewritten as
  * `event_date=YYYY-MM-DD/` directories (30 dates at every sf), plus a
  * tiny calendar dim keyed by those dates. Staging is cached per scale
  * dir for the JVM's life and removed by a shutdown hook — the same
  * hygiene contract as the streaming sinks. At production scale the
  * table would be WRITTEN partitioned in the first place and this
  * staging step disappears; the queries and plans are unchanged.
  */
object StagedLayouts {

  private val staged = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // ---- staging-cost attribution -------------------------------------
  // Staged artifacts move a round loop / index build out of the
  // queries that scan them, so a timed comparison against an engine
  // running the loop inline is only honest when the one-time build
  // cost is REPORTED next to the per-query numbers (the round-14
  // adjudication ask). Every build below runs under [[timing]]; Bench
  // emits the per-artifact wall clock + total as `staging` /
  // `staging_sec` in its JSON.
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  private def timing[T](key: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Wall-clock seconds of every staged BUILD this JVM has run, keyed
    * `artifact:sfDir` — cache hits cost nothing and do not appear.
    */
  def stagingSeconds: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = staged.values().iterator()
      while (it.hasNext) {
        val p = java.nio.file.Paths.get(it.next())
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        }
      }
    }))
    true
  }

  private def stageDir(s: SparkSession, sfDir: String): String = {
    require(hookInstalled)
    staged.computeIfAbsent(sfDir, _ => timing(s"events:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_layout").toString
      val ev = graft.Tables.events(s, sfDir)
        .withColumn("event_date", to_date(col("ts")))
      // one shuffle keyed by the partition column → exactly one file per
      // date directory (without it every input task writes a sliver into
      // every directory — the classic small-files bug partitioned writes
      // hit at scale)
      ev.repartition(col("event_date"))
        .write.partitionBy("event_date").mode("overwrite")
        .parquet(s"$tmp/events_by_date")
      // calendar dim: one row per present date + ISO weekday attribute.
      // Written as a real parquet table (not an in-memory relation) so
      // the DPP planner sees the production shape: dim scan → filter →
      // broadcast → dynamic-pruning subquery on the fact scan.
      ev.select(col("event_date").as("d")).distinct()
        .withColumn("isodow", (weekday(col("d")) + lit(1)).cast("int"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$tmp/date_dim")
      tmp
    })
  }

  /** events with hive layout `event_date=.../` — the partition column
    * comes back from directory names, so date predicates prune at the
    * DIRECTORY level (PartitionFilters), before any file is opened.
    */
  def eventsByDate(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${stageDir(s, sfDir)}/events_by_date")

  /** Calendar dimension (d DATE, isodow 1=Mon..7=Sun) over the dates
    * present in events.
    */
  def dateDim(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${stageDir(s, sfDir)}/date_dim")

  // ---- bucketed fact tables (co-located join layout) -----------------

  private val bucketed = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Stage lineitem and orders as BUCKETED tables (8 buckets on the join
    * key, sorted within buckets) in the session catalog, data in a
    * registered temp dir. Bucketing is THE co-located-join layout at
    * warehouse scale: both sides pre-hashed into the same bucket scheme
    * means a fact-fact join needs NO exchange — the dominant cost of a
    * 100-TB fact-fact join paid once at write time instead of per
    * query. (The in-partition SMJ Sort remains: Spark ignores sortBy
    * metadata on read unless the legacy
    * `bucketedTableScan.outputOrdering` flag is on, because a bucket
    * that ever compacts to >1 file can't guarantee global order — the
    * sort is exchange-free and spills at worst locally, so the default
    * is the right production trade.) The `repartition(8, key)` before
    * the write aligns task hashing with bucket hashing (both Murmur3),
    * so each bucket gets exactly ONE file rather than a sliver per task
    * — the same small-files discipline as the hive layout above.
    *
    * Returns (lineitem table name, orders table name).
    */
  def bucketedLineitemOrders(s: SparkSession, sfDir: String): (String, String) = {
    require(hookInstalled)
    bucketed.computeIfAbsent(sfDir, _ => timing(s"bucketed:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val liName = s"graft_li_bkt_$tag"
      val ordName = s"graft_ord_bkt_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
      staged.put(s"bucketed:$sfDir", tmp)
      graft.Tables.lineitem(s, sfDir)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .repartition(8, col("l_orderkey"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/$liName")
        .mode("overwrite").saveAsTable(liName)
      graft.Tables.orders(s, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .repartition(8, col("o_orderkey"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/$ordName")
        .mode("overwrite").saveAsTable(ordName)
      (liName, ordName)
    })
  }

  // ---- incremental-ingest signature store -----------------------------

  private val sigStore =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** The persisted simhash signature STORE for incremental corpus
    * ingest (`dedup_incremental`): fingerprints of the already-ingested
    * corpus prefix (doc_id ≤ 4/5·max — the fixture's stand-in for
    * "yesterday's corpus"), exploded into combined block keys
    * (Dedup.fpBlockKeys) and written BUCKETED on `bk` — at production
    * scale this table is append-only across ingests and the probe join
    * needs no store-side exchange whatever the corpus volume (and the
    * batch side broadcasts anyway). Returns (table name, prefix
    * threshold); batch = doc_id > threshold.
    */
  def simhashStore(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    sigStore.computeIfAbsent(sfDir, _ => timing(s"sigstore:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_sigstore_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_sigstore").toString
      staged.put(s"sigstore:$sfDir", tmp)
      val docs = graft.Tables.documents(s, sfDir)
      val thr = docs.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
      graft.operators.Dedup.fpBlockKeys(
          graft.operators.Dedup.simhash(docs.where(col("doc_id") <= thr)))
        .repartition(8, col("bk"))
        .write.bucketBy(8, "bk").sortBy("bk")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  /** The CONVERGED cluster labels of the corpus PREFIX (doc_id ≤
    * 4/5·max — [[simhashStore]]'s threshold contract), materialized
    * once per scale dir: the second half of the incremental-cluster
    * state (`dedup_cluster_incremental` probes the block-key store for
    * delta pairs and re-roots THESE labels through the merge map). At
    * production scale this is yesterday's label table — written by
    * yesterday's ingest, read-only today.
    */
  def prefixClusterLabels(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    val dir = staged.computeIfAbsent(s"prefixcc:$sfDir", _ => timing(s"prefixcc:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_prefixcc").toString
      val docs = graft.Tables.documents(s, sfDir)
      val thr = docs.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
      graft.operators.Dedup.connectedComponentsConverged(
          graft.operators.Dedup.simhashPairs(docs.where(col("doc_id") <= thr)))
        .write.mode("overwrite").parquet(s"$tmp/labels")
      tmp
    })
    s.read.parquet(s"$dir/labels")
  }

  /** The MinHash twin of [[simhashStore]]: band rows (band, k0, k1,
    * doc_id, h0..h11) of the already-ingested prefix, signatures riding
    * the band rows, bucketed on the band key — the persisted probe side
    * of `dedup_incremental_minhash`. Same threshold contract.
    */
  def minhashStore(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    sigStore.computeIfAbsent(s"minhash:$sfDir", _ => timing(s"minhash:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_mhstore_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_mhstore").toString
      staged.put(s"mhstore:$sfDir", tmp)
      val docs = graft.Tables.documents(s, sfDir)
      val thr = docs.agg(max(col("doc_id"))).head.getLong(0) * 4 / 5
      graft.operators.Dedup.minhashBandRows(
          graft.operators.Dedup.minhashSignatureFast(
            docs.where(col("doc_id") <= thr), n = 8, nHash = 12),
          nHash = 12, rowsPerBand = 2)
        .repartition(8, col("band"), col("k0"), col("k1"))
        .write.bucketBy(8, "band", "k0", "k1").sortBy("band")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  /** The persisted IVF postings STORE for incremental ANN ingest
    * (`sim_ann_incremental`) — the `sim_*` twin of [[simhashStore]]:
    * the already-ingested embedding prefix (vec_id ≤ 4/5·max, the
    * fixture's "yesterday's corpus") assigned to its coarse cells via
    * the broadcast centroid table
    * (Similarity.ivfAssignBroadcast / TrainedIvfCentroids) and written
    * BUCKETED on `cell` — at production scale this table is
    * append-only across ingests (assignment is per-vector independent,
    * so appending a batch lands on the same rows a full rebuild would)
    * and the serve probe streams it with no store-side exchange.
    * Returns (table name, prefix threshold); batch = vec_id > thr.
    */
  def ivfPostingsStore(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    sigStore.computeIfAbsent(s"ivf:$sfDir", _ => timing(s"ivf:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_ivfstore_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfstore").toString
      staged.put(s"ivfstore:$sfDir", tmp)
      val embDf = graft.operators.Similarity.emb(s, sfDir)
      val thr = embDf.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
      graft.operators.Similarity.ivfAssignBroadcast(
          embDf.where(col("vec_id") <= thr),
          graft.operators.TrainedIvfCentroids.cells)
        .repartition(8, col("cell"))
        .write.bucketBy(8, "cell").sortBy("cell")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  /** Persisted SemDeDup drop set of the embedding PREFIX corpus
    * (vec_id ≤ 4/5·max — the ivfPostingsStore threshold): the prefix
    * vec_ids that lost at least one within-cell dup pair under the
    * keep-farthest rule. The incremental form
    * (`dedup_semantic_incremental`) unions this with the drops from
    * pairs touching the new batch — store×store pairs are never
    * re-scored (Similarity.semDedupIngest scaladoc). Tiny table (the
    * drop FRACTION is bounded by the corpus dup rate), one file.
    * Returns (table name, prefix threshold).
    */
  def semDropStore(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    sigStore.computeIfAbsent(s"semdrops:$sfDir", _ => timing(s"semdrops:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_semdrops_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_semdrops").toString
      staged.put(s"semdropstore:$sfDir", tmp)
      val embDf = graft.operators.Similarity.emb(s, sfDir)
      val thr = embDf.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
      val prefix = embDf.where(col("vec_id") <= thr)
      val kept = graft.operators.Similarity.semDedup(
        prefix, graft.operators.TrainedIvfCentroids.cells, tau = 0.4)
      prefix.select(col("vec_id"))
        .join(kept.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .coalesce(1)
        .write.option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  /** [[semDropStore]] REBUILT as three appends (vec_id % 3 sub-ranges —
    * the fixture's stand-in for three incremental-ingest days, the
    * simhashStoreAppended shape): the drop store a real SemDeDup
    * pipeline accumulates, one file per append. Rows are identical to
    * the one-shot store; only the file layout decays. Returns
    * (table name, prefix threshold).
    */
  def semDropStoreAppended(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    // dependency staged BEFORE entering the memo: a computeIfAbsent
    // mapping fn that calls another computeIfAbsent on the SAME map
    // throws ConcurrentHashMap's "Recursive update" whenever the two
    // keys happen to land in one hash bin — the bin layout varies with
    // the sfDir string, which is why 15 rounds never hit it and the
    // derived-dir sweep did (sim_ann_delete_pq, r16). Hoisted in every
    // same-map-nested builder; the hoisted call is itself memoized, so
    // the eager evaluation is a map hit when already staged.
    val (base, thr) = semDropStore(s, sfDir)
    sigStore.computeIfAbsent(s"semdropsapp:$sfDir", _ => timing(s"semdropsapp:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_semdrops_app_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_semdrops_app").toString
      staged.put(s"semdropsappstore:$sfDir", tmp)
      val rows = s.table(base)
      (0 until 3).foreach { day =>
        val w = rows.where(col("vec_id") % 3 === day).coalesce(1).write
        (if (day == 0) w.option("path", s"$tmp/$name").mode("overwrite")
         else w.mode("append")).saveAsTable(name)
      }
      (name, thr)
    })
  }

  /** The COMPACTED SemDeDup store PAIR — the lifecycle pass the r15
    * wave missed: deletes re-solved AROUND the drop store but never
    * folded the tombstones/resurrections INTO it, so it only grew.
    * This copy-on-write rewrite restores both stores to their
    * post-delete truth:
    *
    *  - postings: [[ivfPostingsStore]] minus the semantic tombstones
    *    (StoreLifecycle.semTombstonedVecs), rewritten ONE file per
    *    `cell` bucket with bucketing preserved (the
    *    simhashStoreCompacted plain-file-scan discipline — reading via
    *    the catalog would let autoBucketedScan fragment the rewrite);
    *  - drops: unaffected cells keep their persisted decisions
    *    verbatim; cells that lost a member are re-solved from their
    *    LIVE members only (Similarity.semDropsAll — the
    *    dedup_semantic_delete kernel), which is where a deleted
    *    dup-winner's loser RESURRECTS: it simply stops being a drop
    *    row in the rewritten store. Result = semDropsAll(live prefix)
    *    exactly, so serving needs no tombstone logic anywhere —
    *    `dedup_semantic_compact` runs the PLAIN ingest path against
    *    the pair and must equal the whole-corpus-minus-deleted
    *    recompute (the serving-invariance oracle). Back to one file
    *    (IncrementalSpec A/Bs the counts against [[semDropStoreAppended]]).
    *
    * Returns (postings table, drops table, prefix threshold).
    */
  def semStoresCompacted(s: SparkSession, sfDir: String): (String, String, Long) = {
    require(hookInstalled)
    semCmp.computeIfAbsent(s"semcmp:$sfDir", _ => timing(s"semcmp:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val postName = s"graft_ivfstore_semcmp_$tag"
      val dropName = s"graft_semdrops_cmp_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_semcmp").toString
      staged.put(s"semcmpstore:$sfDir", tmp)
      val (baseName, thr) = ivfPostingsStore(s, sfDir)
      val (dropsApp, _) = semDropStoreAppended(s, sfDir)
      val tombP = graft.operators.StoreLifecycle
        .semTombstonedVecs(col("vec_id"), thr)
      // plain-file scan (not the catalog table) so the bucket-aligned
      // exchange actually runs — the simhashStoreCompacted lesson
      val store = s.read.parquet(tableLocation(s, baseName))
      val live = store.where(!tombP)
      live.repartition(8, col("cell"))
        .write.bucketBy(8, "cell").sortBy("cell")
        .option("path", s"$tmp/$postName")
        .mode("overwrite").saveAsTable(postName)
      val affCells = store.where(tombP).select(col("cell")).distinct()
      val keptDropsU = s.read.parquet(tableLocation(s, dropsApp))
        .join(store.select(col("vec_id"), col("cell")), "vec_id")
        .join(affCells, Seq("cell"), "left_anti")
        .select(col("vec_id"))
      val resolvedA = graft.operators.Similarity.semDropsAll(
        graft.operators.Similarity.withCentroidDist(
          live.join(affCells, Seq("cell"), "left_semi"),
          graft.operators.TrainedIvfCentroids.cells),
        tau = 0.4)
      keptDropsU.unionByName(resolvedA).coalesce(1)
        .write.option("path", s"$tmp/$dropName")
        .mode("overwrite").saveAsTable(dropName)
      (postName, dropName, thr)
    })
  }

  private val semCmp =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Long)]()

  // ---- store lifecycle: multi-append + compacted variants -------------

  /** The simhash signature store REBUILT as three bucketed APPENDS
    * (sub-ranges doc_id % 3 of [[simhashStore]]'s rows — the fixture's
    * stand-in for three ingest days): every append writes its own file
    * per bucket, so the table accumulates 3×8 files — the small-files
    * decay a real append-only store suffers, staged honestly so
    * compaction has something real to fix (IncrementalSpec pins the
    * before/after file counts). Rows are identical to the one-shot
    * store; the probe plan is unchanged (still bucketed on `bk`).
    * Returns (table name, prefix threshold).
    */
  def simhashStoreAppended(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc)
    val (base, thr) = simhashStore(s, sfDir)
    sigStore.computeIfAbsent(s"sigapp:$sfDir", _ => timing(s"sigapp:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_sigstore_app_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_sigstore_app").toString
      staged.put(s"sigappstore:$sfDir", tmp)
      val rows = s.table(base)
      (0 until 3).foreach { day =>
        val w = rows.where(col("doc_id") % 3 === day)
          .repartition(8, col("bk"))
          .write.bucketBy(8, "bk").sortBy("bk")
        (if (day == 0) w.option("path", s"$tmp/$name").mode("overwrite")
         else w.mode("append")).saveAsTable(name)
      }
      (name, thr)
    })
  }

  /** The COMPACTED simhash store: [[simhashStoreAppended]] with the
    * lifecycle tombstones (StoreLifecycle.tombstonedDocs) folded in
    * and the layout rewritten copy-on-write — back to ONE file per
    * bucket, still bucketed on `bk` so the exchange-free probe plan
    * survives the rewrite. This is the compaction pass a production
    * store runs after accumulated appends + deletes; serving from it
    * must equal serving from (appended store ▷ tombstones) — the
    * `dedup_incremental_compact` gate. Returns (table name, thr).
    */
  def simhashStoreCompacted(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc)
    val (app, thr) = simhashStoreAppended(s, sfDir)
    sigStore.computeIfAbsent(s"sigcmp:$sfDir", _ => timing(s"sigcmp:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_sigstore_cmp_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_sigstore_cmp").toString
      staged.put(s"sigcmpstore:$sfDir", tmp)
      // read the store's FILES as a plain parquet scan (what a real
      // compactor does): reading via the catalog table claims
      // HashPartitioning(bk, 8), which lets Catalyst drop the
      // repartition as redundant — and then autoBucketedScan executes
      // the scan UNBUCKETED (nothing downstream needs the
      // distribution), so write tasks hold mixed buckets and the
      // rewrite fragments to ~17 files instead of 8 (observed; the
      // IncrementalSpec A/B caught it). A plain scan advertises no
      // partitioning, so the bucket-aligned exchange actually runs.
      s.read.parquet(tableLocation(s, app))
        .where(!graft.operators.StoreLifecycle.tombstonedDocs(col("doc_id"), thr))
        .repartition(8, col("bk"))
        .write.bucketBy(8, "bk").sortBy("bk")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  /** The SCHEMA-EVOLVED simhash store — the add-column lifecycle step
    * the versioned store family was missing: two legacy ingest batches
    * written under the original (doc_id, fp, bk) schema, then
    * `ALTER TABLE ... ADD COLUMNS (lang STRING)` (metadata-only — no
    * file is rewritten, the Delta/Iceberg add-column shape), then one
    * post-evolution batch carrying the new column. Old files simply
    * lack the column and the reader NULL-fills it; the table keeps its
    * `bk` bucket spec across the evolution, so the exchange-free probe
    * plan survives (IncrementalSpec pins both). Batch split is the
    * deterministic doc_id % 3 rule (2 = evolved), lang =
    * ('en','de','fr')[(doc_id DIV 3) % 3] — reconstructible by the
    * DuckDB oracle without ever seeing the store. Returns
    * (table name, thr).
    */
  def simhashStoreEvolved(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc)
    val (base, thr) = simhashStore(s, sfDir)
    sigStore.computeIfAbsent(s"sigevo:$sfDir", _ => timing(s"sigevo:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_sigstore_evo_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_sigstore_evo").toString
      staged.put(s"sigevostore:$sfDir", tmp)
      val rows = s.table(base)
      (0 until 2).foreach { day =>
        val w = rows.where(col("doc_id") % 3 === day)
          .repartition(8, col("bk"))
          .write.bucketBy(8, "bk").sortBy("bk")
        (if (day == 0) w.option("path", s"$tmp/$name").mode("overwrite")
         else w.mode("append")).saveAsTable(name)
      }
      s.sql(s"ALTER TABLE $name ADD COLUMNS (lang STRING)")
      rows.where(col("doc_id") % 3 === 2)
        .withColumn("lang", expr(
          "CASE ((doc_id DIV 3) % 3) WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END"))
        .repartition(8, col("bk"))
        .write.bucketBy(8, "bk").sortBy("bk")
        .mode("append").saveAsTable(name)
      (name, thr)
    })
  }

  /** The simhash store's VERSION MANIFEST — the read-at-version log
    * over the lifecycle the appended/compacted stores already stage:
    * copy-on-write keeps superseded versions on disk, and this tiny
    * persisted table (the log IS storage — the Delta/Iceberg shape) is
    * what resolves "version N" to a concrete table. One row per
    * addressable version: v3 = the 3-append ingest ladder's final
    * state (pre-delete), v4 = the tombstone-folding compaction
    * (current = max(version)). Versions 1–2 are the mid-ladder append
    * states — real in the file layout but not separately addressable
    * (each append extends the same table), exactly like a log whose
    * older snapshots have been vacuumed. At production scale the
    * manifest is the only thing a time-travel read ever scans before
    * touching data: resolving a version is a K-row driver lookup, and
    * serving then runs the UNCHANGED bucketed probe plan against the
    * resolved table.
    */
  def simhashStoreVersions(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc)
    val (app, thrA) = simhashStoreAppended(s, sfDir)
    val (cmp, thrC) = simhashStoreCompacted(s, sfDir)
    val dir = staged.computeIfAbsent(s"sigversions:$sfDir",
      _ => timing(s"sigversions:$sfDir") {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_sigversions").toString
        import s.implicits._
        Seq((3, app, "ingest", thrA), (4, cmp, "compact+delete", thrC))
          .toDF("version", "table_name", "action", "thr")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/manifest")
        tmp
      })
    s.read.parquet(s"$dir/manifest")
  }

  /** The MERGE-ON-READ lifecycle manifest — the delete path
    * [[simhashStoreCompacted]]'s copy-on-write rewrite cannot afford
    * at high churn, staged as one addressable version ladder (the
    * log-is-storage shape of [[simhashStoreVersions]], extended with a
    * per-version DELETE-FILE pointer so MoR and CoW serve from the
    * SAME manifest). One row per servable version
    * (version, table_name, delete_dir, action, thr):
    *
    *   3 ingest      — the 3-append ladder; no delete files;
    *   4 mor-delete  — the SAME data files (file-for-file: the delete
    *                   wrote one kilobyte-scale position-tombstone
    *                   file, StoreLifecycle.positionTombstones, and
    *                   touched nothing else) + that delete file;
    *   5 cow-compact — the folding compaction: ONE bucketed rewrite
    *                   off the MoR read, tombstones folded in,
    *                   delete_dir EMPTY (0 files — the fold retires
    *                   the positional files).
    *
    * Serving v4 (scan ▷ position anti-join) and v5 (plain scan) must
    * answer identically — IncrementalSpec pins it row-for-row plus the
    * file-count A/Bs on both sides of the fold.
    */
  def simhashStoreMorManifest(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc)
    val (app, thr) = simhashStoreAppended(s, sfDir)
    val dir = staged.computeIfAbsent(s"sigmor:$sfDir",
      _ => timing(s"sigmor:$sfDir") {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_sigmor").toString
        // v4's delete file: positions of the tombstoned physical rows,
        // read off the store's own scan — data files untouched
        graft.operators.StoreLifecycle.positionTombstones(s.table(app),
            graft.operators.StoreLifecycle.tombstonedDocs(col("doc_id"), thr))
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/deletes_v4")
        // v5: fold the tombstones — plain-file scan for the same
        // autoBucketedScan fragmentation reason as simhashStoreCompacted
        val tag = java.lang.Integer.toHexString(sfDir.hashCode)
        val name = s"graft_sigstore_morcmp_$tag"
        graft.operators.StoreLifecycle.applyPositionTombstones(
            s.read.parquet(tableLocation(s, app)),
            s.read.parquet(s"$tmp/deletes_v4"))
          .repartition(8, col("bk"))
          .write.bucketBy(8, "bk").sortBy("bk")
          .option("path", s"$tmp/$name")
          .mode("overwrite").saveAsTable(name)
        java.nio.file.Files
          .createDirectory(java.nio.file.Paths.get(s"$tmp/deletes_v5"))
        import s.implicits._
        Seq((3, app, "", "ingest", thr),
            (4, app, s"$tmp/deletes_v4", "mor-delete", thr),
            (5, name, s"$tmp/deletes_v5", "cow-compact", thr))
          .toDF("version", "table_name", "delete_dir", "action", "thr")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/manifest")
        tmp
      })
    s.read.parquet(s"$dir/manifest")
  }

  /** The COMPACTED IVF-PQ postings store — [[simhashStoreCompacted]]'s
    * twin on the fastest-growing store (codes per vector, many
    * batches): [[ivfPqPostingsStore]] with the vector tombstones
    * (StoreLifecycle.tombstonedVecs) folded in, rewritten one file
    * per `cell` bucket. `sim_ann_delete_pq` serves from it and must
    * match the whole-corpus-minus-deleted recompute. Returns
    * (table name, thr).
    */
  def ivfPqStoreCompacted(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    // hoisted out of the memo — the same-map "Recursive update" hazard
    // (semDropStoreAppended scaladoc; this builder is the one the
    // derived sweep caught red)
    val (base, thr) = ivfPqPostingsStore(s, sfDir)
    sigStore.computeIfAbsent(s"ivfpqcmp:$sfDir", _ => timing(s"ivfpqcmp:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_ivfpqstore_cmp_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpqcmp").toString
      staged.put(s"ivfpqcmpstore:$sfDir", tmp)
      // plain-file scan for the same reason as simhashStoreCompacted
      s.read.parquet(tableLocation(s, base))
        .where(!graft.operators.StoreLifecycle.tombstonedVecs(col("vec_id"), thr))
        .repartition(8, col("cell"))
        .write.bucketBy(8, "cell").sortBy("cell")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  private def tableLocation(s: SparkSession, tableName: String): String =
    s.sql(s"DESCRIBE TABLE EXTENDED $tableName")
      .where(col("col_name") === "Location")
      .head.getString(1)

  /** Parquet data-file count of a staged TABLE's directory — the
    * compaction A/B measurement (IncrementalSpec).
    */
  def tableFileCount(s: SparkSession, tableName: String): Int = {
    val loc = tableLocation(s, tableName).stripPrefix("file:")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(loc)).iterator().asScala
      .count(p => p.toString.endsWith(".parquet"))
  }

  // ---- shared co-occurrence edge list (graph consumers) --------------

  /** Part co-occurrence (market-basket) edge list `(u, v)` with u < v,
    * one edge per part pair sharing an order — MATERIALIZED once per
    * scale dir and shared by every graph consumer (k-core, triangles).
    *
    * The build (distinct (order, part) self-join + distinct) is the
    * dominant cost of both consumers and is identical for both; before
    * staging, each re-derived it independently — a bench double-pay
    * flagged in the round-9 adjudication. At warehouse scale this IS
    * the production shape: a derived graph relation is written once
    * and consumers scan it, rather than re-joining the fact table per
    * query. The parquet round-trip also hands the consumers real scan
    * stats (size-based join planning) instead of an opaque subtree.
    */
  def basketEdges(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    val dir = staged.computeIfAbsent(s"basket:$sfDir", _ => timing(s"basket:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_basket").toString
      val op = graft.Tables.lineitem(s, sfDir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      op.alias("a").join(op.alias("b"), col("a.ok") === col("b.ok"))
        .where(col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
        .write.mode("overwrite").parquet(s"$tmp/basket_edges")
      tmp
    })
    s.read.parquet(s"$dir/basket_edges")
  }

  // ---- shared simhash near-dup pairs + cluster labels ----------------

  /** Simhash Hamming-≤3 near-dup pairs over `documents` AND their
    * 6-round hash-min CC label table, materialized once per scale dir.
    * FOUR registered queries consume this build (`dedup_simhash_hamming`
    * the pairs; `dedup_cluster` / `dedup_canonical` /
    * `pipeline_split_leakproof` the labels) and each re-derived it
    * independently — the same triple-pay shape as the basket edges,
    * and like there the shared build (simhash fingerprints + banded
    * self-join + 6 CC join-aggregate rounds) dominates while the
    * materialized outputs are tiny (pair list + one row per clustered
    * doc). The labels are built FROM the staged pairs, so the pair
    * computation runs exactly once. Production shape: a dedup pipeline
    * writes its pair/cluster tables once and every downstream consumer
    * (canonicalization, splits, audits) scans them.
    */
  private def simhashDir(s: SparkSession, sfDir: String): String = {
    require(hookInstalled)
    staged.computeIfAbsent(s"simhashcc:$sfDir", _ => timing(s"simhashcc:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_simhash").toString
      graft.operators.Dedup
        .simhashPairs(graft.Tables.documents(s, sfDir), maxHam = 3)
        .write.mode("overwrite").parquet(s"$tmp/pairs")
      val pairs = s.read.parquet(s"$tmp/pairs")
        .select(col("doc_a"), col("doc_b"))
      graft.operators.Dedup.connectedComponents(pairs, iters = 6)
        .write.mode("overwrite").parquet(s"$tmp/labels")
      tmp
    })
  }

  // ---- shared HyperBall round states ---------------------------------

  /** The packed HyperBall register states for rounds 0..3 over the
    * supply graph, materialized once per scale dir. TWO registered
    * queries consume the identical round loop (`graph_ball_sketch`
    * folds the last state; `graph_eff_diameter` folds every state) and
    * each re-ran the 3 edge-join/merge rounds independently — the
    * basket-edges/simhash shape again. The staged artifact is |V| rows
    * of 64-long arrays per round (~tens of MB at sf0.1); production
    * shape: a HyperANF run checkpoints its per-round states and every
    * downstream statistic (per-node sizes, neighborhood function,
    * centralities) reads them.
    */
  private def hyperballDir(s: SparkSession, sfDir: String): String = {
    require(hookInstalled)
    staged.computeIfAbsent(s"hyperball:$sfDir", _ => timing(s"hyperball:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hball").toString
      val sts = graft.operators.HyperBall.packedStates(
        graft.queries.GraphQueries.supplyEdges(s, sfDir), rounds = 3,
        eager = true, broadcastSketches = None, broadcastMaxNodes = 150000L)
      sts.zipWithIndex.foreach { case (st, r) =>
        st.write.mode("overwrite").parquet(s"$tmp/round$r")
      }
      tmp
    })
  }

  /** Round-indexed packed states (index = round, 0..3). */
  def hyperballStates(s: SparkSession, sfDir: String): Seq[DataFrame] = {
    val dir = hyperballDir(s, sfDir)
    (0 to 3).map(r => s.read.parquet(s"$dir/round$r"))
  }

  /** The compressed (PQ-coded) twin of [[ivfPostingsStore]]: the
    * embedding prefix encoded to (cell, vec_id, code0..code3) via the
    * broadcast IVF+PQ model (Similarity.ivfPqEncodeBroadcast) and
    * written bucketed on `cell` — at 100 TB the store carries a few
    * small ints per vector (the original floats never enter it) and
    * is append-only across ingests. Returns (table name, threshold).
    */
  def ivfPqPostingsStore(s: SparkSession, sfDir: String): (String, Long) = {
    require(hookInstalled)
    sigStore.computeIfAbsent(s"ivfpq:$sfDir", _ => timing(s"ivfpq:$sfDir") {
      val tag = java.lang.Integer.toHexString(sfDir.hashCode)
      val name = s"graft_ivfpqstore_$tag"
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpqstore").toString
      staged.put(s"ivfpqstore:$sfDir", tmp)
      val embDf = graft.operators.Similarity.emb(s, sfDir)
      val thr = embDf.agg(max(col("vec_id"))).head.getLong(0) * 4 / 5
      graft.operators.Similarity.ivfPqEncodeBroadcast(
          embDf.where(col("vec_id") <= thr),
          graft.operators.TrainedIvfCentroids.cells,
          graft.operators.TrainedPqCodebooks.books)
        .repartition(8, col("cell"))
        .write.bucketBy(8, "cell").sortBy("cell")
        .option("path", s"$tmp/$name")
        .mode("overwrite").saveAsTable(name)
      (name, thr)
    })
  }

  // ---- persisted unigram-LM tokenizer model --------------------------

  /** The fitted 2-round unigram-LM model (piece, cnt) materialized
    * once per scale dir — the tokenizer-SERVING store: training runs
    * once (UnigramLm.fit, the cap-bounded EM) and writes its model
    * table; every encode consumer reads the table and computes the
    * Laplace weights in-plan, so the serving path has zero driver
    * collect at any corpus size (`text_unigram_encode_store`).
    */
  def unigramModel(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    val dir = staged.computeIfAbsent(s"unigram:$sfDir", _ => timing(s"unigram:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_unigram").toString
      graft.operators.UnigramLm
        .fit(graft.Tables.documents(s, sfDir), rounds = 2)
        .write.mode("overwrite").parquet(s"$tmp/model")
      tmp
    })
    s.read.parquet(s"$dir/model")
  }

  // ---- shared label-prop community labels ----------------------------

  /** Label-prop partitions (node, community) after rounds 1..4 over
    * the supply graph, materialized once per scale dir from ONE loop
    * run — the basket-edges/simhash-labels shape again: THREE
    * registered queries consume the identical round loop
    * (`graph_label_prop` the round-3 labels themselves;
    * `graph_modularity` scores that partition; `graph_modularity_sweep`
    * prices all four candidates) and the loop is the dominant cost of
    * all of them while each artifact is |V| rows of two longs.
    * Production shape: community detection writes its partition
    * table(s) once and every consumer (scores, rollups, routing,
    * round-count tuning) scans them.
    */
  private def lpaDir(s: SparkSession, sfDir: String): String = {
    require(hookInstalled)
    staged.computeIfAbsent(s"lpa:$sfDir", _ => timing(s"lpa:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_lpa").toString
      graft.operators.LabelProp
        .runStates(graft.queries.GraphQueries.supplyEdges(s, sfDir),
          rounds = 4)
        .zipWithIndex.foreach { case (st, i) =>
          st.write.mode("overwrite").parquet(s"$tmp/round${i + 1}")
        }
      tmp
    })
  }

  def lpaLabels(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${lpaDir(s, sfDir)}/round3")

  /** The SCC labeling of the fulfillment-flow graph (node, scc_id),
    * materialized once per scale dir — the lpaLabels staging shape: at
    * production scale the SCC batch (graph_scc's operator, Scc.scc)
    * checkpoints its labeling and every downstream analysis
    * (`graph_scc_condense`'s condensation DAG here) scans that |V|-row
    * table instead of re-running the 18-round trim/color ladder.
    */
  def sccLabels(s: SparkSession, sfDir: String): DataFrame = {
    require(hookInstalled)
    val dir = staged.computeIfAbsent(s"scc:$sfDir", _ => timing(s"scc:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_scc").toString
      graft.operators.Scc
        .scc(graft.queries.GraphQueries.flowEdges(s, sfDir),
          trimRounds = 6, propRounds = 6, peels = 1)
        .write.mode("overwrite").parquet(s"$tmp/labels")
      tmp
    })
    s.read.parquet(s"$dir/labels")
  }

  /** Round-indexed LPA partitions ((rounds, labels) for rounds 1..4)
    * — ONE loop run staged per scale dir (the hyperballStates shape),
    * priced by `graph_modularity_sweep`; round 3 is [[lpaLabels]], the
    * shipped partition, read by `graph_label_prop`/`graph_modularity`
    * from the SAME artifact.
    */
  def lpaLabelStates(s: SparkSession, sfDir: String): Seq[(Int, DataFrame)] = {
    val dir = lpaDir(s, sfDir)
    (1 to 4).map(r => (r, s.read.parquet(s"$dir/round$r")))
  }

  // ---- shared Brandes forward states ---------------------------------

  /** The seeded Brandes forward frame (s, node, dist, sigma) — 3 rounds
    * from suppliers 1..5 over the supply graph — materialized once per
    * scale dir. TWO registered queries consume the identical forward
    * pass (`graph_harmonic` aggregates it directly; `graph_betweenness`
    * runs the backward dependency walk over it) and each re-ran the 3
    * frontier/path-count rounds independently — the HyperBall
    * `packedStates` shape again, and like there the shared build is the
    * dominant stage while the artifact is small (|reached| rows of 4
    * integers). Production shape: a centrality batch checkpoints its
    * forward SSSP/path-count states and every downstream score
    * (harmonic, betweenness, stress, ...) reads them.
    */
  private def brandesDir(s: SparkSession, sfDir: String): String = {
    require(hookInstalled)
    staged.computeIfAbsent(s"brandes:$sfDir", _ => timing(s"brandes:$sfDir") {
      val tmp = java.nio.file.Files.createTempDirectory("graft_brandes").toString
      val seeds = graft.Tables.supplier(s, sfDir)
        .where(col("s_suppkey") <= 5)
        .select(col("s_suppkey").as("node"))
      graft.operators.Betweenness
        .forward(graft.queries.GraphQueries.supplyEdges(s, sfDir), seeds,
          rounds = 3)
        .write.mode("overwrite").parquet(s"$tmp/forward")
      tmp
    })
  }

  /** (s, node, dist, sigma) — the staged 3-round, 5-source forward frame. */
  def brandesForward(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${brandesDir(s, sfDir)}/forward")

  /** (doc_a, doc_b, ham) — verified simhash pairs, Hamming ≤ 3. */
  def simhashPairs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${simhashDir(s, sfDir)}/pairs")

  /** (d, lbl) — 6-round hash-min CC labels over the pairs. */
  def simhashLabels(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"${simhashDir(s, sfDir)}/labels")
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Contract checks on the SparkEntry registry itself — no Spark session
  * needed.
  *
  * The registry merges 16 module maps with `++`, so a name collision
  * between modules would SILENTLY shadow one module's query (and its
  * oracle could then grade a different query's dump). These checks turn
  * that into a loud failure at test time.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("KMeans", KMeansQueries.queries, KMeansQueries.oracleSql),
    ("Relational", RelationalQueries.queries, RelationalQueries.oracleSql),
    ("Analytic", AnalyticQueries.queries, AnalyticQueries.oracleSql),
    ("Pipeline", PipelineQueries.queries, PipelineQueries.oracleSql),
    ("Temporal", TemporalQueries.queries, TemporalQueries.oracleSql),
    ("Tpch", TpchQueries.queries, TpchQueries.oracleSql),
    ("SqlText", SqlTextQueries.queries, SqlTextQueries.oracleSql),
    ("Streaming", StreamingQueries.queries, StreamingQueries.oracleSql),
    ("Dedup", DedupQueries.queries, DedupQueries.oracleSql),
    ("Text", TextQueries.queries, TextQueries.oracleSql),
    ("Similarity", SimilarityQueries.queries, SimilarityQueries.oracleSql),
    ("Multimodal", MultimodalQueries.queries, MultimodalQueries.oracleSql),
    ("Warehouse", WarehouseQueries.queries, WarehouseQueries.oracleSql),
    ("Graph", GraphQueries.queries, GraphQueries.oracleSql),
    ("Quality", QualityQueries.queries, QualityQueries.oracleSql),
    ("Spatial", SpatialQueries.queries, SpatialQueries.oracleSql))

  test("no query name collides across modules (++ would silently shadow)") {
    val owners = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dups = owners.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query names: ${dups.map { case (n, os) => s"$n in ${os.map(_._2).mkString("+")}" }}")
    assert(SparkEntry.queries.size == owners.size)
  }

  test("no query name is defined twice WITHIN a module source file (Map literals dedup silently)") {
    // a cross-module collision fails the test above, but a duplicate
    // key inside ONE module's Map literal silently keeps the LAST
    // entry — the shadowed query's code still compiles, its oracle
    // still grades, and nothing runs it (a real near-miss: a second
    // q_incr_join was added to WarehouseQueries without noticing the
    // first). Maps can't see their own lost keys, so this check reads
    // the SOURCE: every `"name" -> ((s, dir)` query-entry key must be
    // unique within its file.
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assert(java.nio.file.Files.isDirectory(dir),
      s"queries source dir not found at ${dir.toAbsolutePath}")
    val entry = """"([A-Za-z0-9_]+)"\s*->\s*\(\(s, dir\)""".r
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).foreach { f =>
        val src = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
        val names = entry.findAllMatchIn(src).map(_.group(1)).toSeq
        val dups = names.groupBy(identity).filter(_._2.size > 1).keys
        assert(dups.isEmpty,
          s"${f.getFileName}: duplicate query entries $dups — the first is silently shadowed")
      }
  }

  test("every oracle key has a registered query, within its own module") {
    modules.foreach { case (m, qs, os) =>
      val orphan = os.keySet -- qs.keySet
      assert(orphan.isEmpty, s"$m: oracle SQL without a query: $orphan")
    }
  }

  test("no-oracle queries are exactly the declared rows-only set") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the free-convergence fits: level/iteration counts are
    // data-dependent, so no fixed unrolled oracle exists — each has a
    // hash-gated unrolled twin and a spec cross-check instead
    // (kmeans_fit_unrolled / kmeans_fit_nd_unrolled / KMeansSpec MLlib
    // identity / graph_louvain_multi + GraphSpec /
    // q_als_rank2_fit_unrolled + AnalyticSpec BigInt replay)
    val declared = Set("kmeans_fit", "kmeans_fit_nd", "kmeans_mllib",
      "graph_louvain_fit", "q_als_rank2_fit")
    assert(noOracle == declared,
      s"rows-only set drifted: extra=${noOracle -- declared} missing=${declared -- noOracle} — " +
        "new queries need oracle SQL or an explicit entry here")
  }

  test("README's canonical Registry line carries the registry's actual counts") {
    // the single source of truth for current counts is the registry
    // itself; README carries exactly ONE human-readable copy, and this
    // assert is what keeps it honest (the dozen hand-synced totals that
    // drifted every round are gone — history sections keep their own
    // frozen numbers)
    val p = java.nio.file.Paths.get("README.md")
    assert(java.nio.file.Files.isRegularFile(p),
      s"README.md not found at ${p.toAbsolutePath} (forked-test cwd moved?)")
    val readme = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val line = """\*\*(\d+) queries / (\d+) DuckDB-oracle-checked\*\*""".r
    val ms = line.findAllMatchIn(readme).toSeq
    assert(ms.size == 1,
      s"README must carry exactly one '**N queries / M DuckDB-oracle-checked**' line, found ${ms.size}")
    assert(ms.head.group(1).toInt == SparkEntry.queries.size,
      s"README says ${ms.head.group(1)} queries, registry has ${SparkEntry.queries.size}")
    assert(ms.head.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${ms.head.group(2)} oracle-checked, registry has ${SparkEntry.oracleSql.size}")
  }

  test("oracle SQL never names an output column with a DuckDB reserved word") {
    // `check` burned a round once (verify SKILL.md gotchas); extendable
    val reserved = Seq("(?i)\\bAS check\\b", "(?i)\\bAS order\\b",
      "(?i)\\bAS table\\b")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      reserved.foreach { r =>
        assert(!r.r.findFirstIn(sql).isDefined,
          s"$name: oracle aliases a DuckDB reserved word ($r)")
      }
    }
  }
}

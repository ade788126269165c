package graft

import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries

/** Training-pipeline operator properties: hash-split determinism and
  * disjointness, stratification law, scaling bounds, sketch quality
  * (including the driver-side Bloom filter / frequent-items sketches that
  * have no SQL-expressible oracle form).
  */
class PipelineSpec extends SparkSpec {

  private def q(name: String) = PipelineQueries.queries(name)(spark, sf)

  test("dedup_canonical: total resolution, idempotent keepers, longest-text rule") {
    val rows = graft.queries.DedupQueries.queries("dedup_canonical")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every doc resolves to a canonical")
    val canonOf = rows.map(r => r._1 -> r._2).toMap
    // keepers map to themselves (idempotent resolution)
    canonOf.values.toSet.foreach { (c: Long) => assert(canonOf(c) == c) }
    // the keeper has the longest text in its cluster (ties -> lowest id)
    val len = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (keeper, members) =>
      val best = members.map(_._1).maxBy(d => (len(d), -d))
      assert(keeper == best, s"cluster of $keeper should keep $best")
      members.foreach { case (_, _, csize) =>
        assert(csize == members.length.toLong)
      }
    }
  }

  test("leakproof split: clusters never span splits; singletons match q_split") {
    val rows = graft.queries.DedupQueries
      .queries("pipeline_split_leakproof")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs, "every doc gets a split")
    // the leakage guarantee: all members of a cluster share one split
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cl spans splits: ${members.map(_._3).distinct}")
    }
    // singleton docs (cluster == own id) degrade to the doc-keyed split
    val plain = q("q_split").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    rows.filter(r => r._1 == r._2).foreach { case (id, _, split) =>
      assert(split == plain(id), s"singleton $id should match q_split")
    }
  }

  test("q_split: deterministic under repartitioning, exhaustive, ~80/10/10") {
    val a = q("q_split").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // identical assignment when the input arrives in a different layout
    val b = q("q_split").repartition(7).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    val nDocs = Tables.documents(spark, sf).count()
    assert(a.size == nDocs)
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / nDocs)
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toMap.toString)
    assert(frac("val") < 0.2 && frac("test") < 0.2)
  }

  test("q_stratified_sample: per-stratum size = ceil(0.2 * stratum)") {
    val got = q("q_stratified_sample").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.2).toLong).toMap
    assert(got == want)
  }

  test("q_feature_scale: minmax bounded in [0,1], zscore near-zero mean") {
    val rows = q("q_feature_scale").select("l_returnflag", "minmax", "zscore").collect()
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
    val meanZ = rows.map(_.getDouble(2)).sum / rows.length
    assert(math.abs(meanZ) < 0.01, s"mean z-score $meanZ")
  }

  test("sketch pins hold: approx distinct + approx quantile within bounds") {
    assert(q("q_approx_distinct").collect().forall(_.getBoolean(2)))
    assert(q("q_approx_quantile").collect().forall(_.getBoolean(2)))
  }

  test("Bloom filter sketch: no false negatives, bounded false positives") {
    val o = Tables.orders(spark, sf)
    val urgent = o.where(col("o_orderpriority") === "1-URGENT")
    val bf = urgent.stat.bloomFilter("o_custkey", 1000L, 0.03)
    val urgentKeys = urgent.select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(urgentKeys.forall(bf.mightContain), "false negative in Bloom filter")
    val others = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).filterNot(urgentKeys)
    if (others.nonEmpty) {
      val fpr = others.count(bf.mightContain).toDouble / others.length
      assert(fpr < 0.15, s"false-positive rate $fpr")
    }
  }

  test("frequent-items sketch finds every truly frequent value") {
    val li = Tables.lineitem(spark, sf)
    val freq = li.stat.freqItems(Array("l_returnflag"), 0.3)
      .collect().head.getSeq[String](0).toSet
    // every flag with support > 30% must be in the sketch result
    val n = li.count()
    val truly = li.groupBy("l_returnflag").count().collect()
      .filter(_.getLong(1) > 0.3 * n).map(_.getString(0)).toSet
    assert(truly.subsetOf(freq), s"missing ${truly -- freq}")
  }

  test("mix temperature: weights sum to 1, α=0.5 boosts small sources above large") {
    val rows = q("pipeline_mix_temperature").collect()
    assert(rows.length > 1, "fixture has multiple sources")
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    // each weight display-rounds at 6 dp; the sum drifts at most n·5e-7
    assert(math.abs(wSum - 1.0) < rows.length * 5e-7, s"weights sum to $wSum")
    // α < 1 flattens the mix: the smallest source is up-sampled
    // (boost > 1) and the largest down-sampled (boost < 1); boost is
    // monotone decreasing in source size
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("boost") > 1.0)
    assert(bySize.last.getAs[Double]("boost") < 1.0)
    val boosts = bySize.map(_.getAs[Double]("boost"))
    assert(boosts.zip(boosts.tail).forall { case (a, b) => a >= b },
      "boost must fall as source size grows")
  }

  test("mixture sample: exact flattened rates, small domains up-sampled, gate filters") {
    val rows = q("pipeline_mixture_sample").collect()
    val nBySrc = Tables.documents(spark, sf).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = nBySrc.values.sum
    // driver-side recompute of the exact integer rate algebra
    val sD = nBySrc.map { case (k, n) =>
      k -> math.floor(math.sqrt(n.toDouble) * 1000.0).toLong }
    val ss = sD.values.sum
    val t = total / 2
    val rate = nBySrc.map { case (k, n) =>
      k -> (BigInt(1000000) * BigInt(t) * BigInt(sD(k)) /
        (BigInt(ss) * BigInt(n))).min(BigInt(1000000)).toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("rate_u") == rate(r.getAs[String]("source")),
        s"rate mismatch for ${r.getAs[String]("source")}")
    }
    // α = ½ flattening direction: strictly smaller domain ⇒ rate ≥,
    // and the extremes differ strictly when the counts do
    val bySize = nBySrc.toSeq.sortBy(_._2)
    if (bySize.head._2 < bySize.last._2)
      assert(rate(bySize.head._1) > rate(bySize.last._1),
        "smallest domain must be up-sampled vs the largest")
    // the hash gate really selects a strict, non-empty subset
    assert(rows.nonEmpty && rows.length < total)
    // doc-level replay: acceptance is exactly h('mx'||id) % 1e6 < rate
    val md = java.security.MessageDigest.getInstance("MD5")
    def hU(id: Long): Long = {
      val d = md.digest(s"mx$id".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expected = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, s0) => hU(id) < rate(s0) }.map(_._1).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected)
  }

  test("quality classifier distills the rule gate: positives outscore negatives per token") {
    val rows = q("pipeline_classifier_score").collect()
    val gate = graft.queries.TextQueries.queries("text_gopher_rules")(spark, sf)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (pos, neg) = rows.partition(r => gate(r.getAs[Long]("doc_id")))
    assert(pos.nonEmpty && neg.nonEmpty, "fixture must exercise both classes")
    // keep is exactly the sign of the score
    rows.foreach(r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("score_u") > 0L)))
    // the learned per-token log-odds separate the classes the labels
    // came from (score normalized by length so the pin is about the
    // token model, not doc length or the shared prior)
    def meanPerTok(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(r => r.getAs[Long]("score_u").toDouble /
        math.max(r.getAs[Int]("n_words"), 1)).sum / xs.length
    assert(meanPerTok(pos) > meanPerTok(neg),
      s"per-token score must separate: pos=${meanPerTok(pos)} neg=${meanPerTok(neg)}")
  }

  test("classifier calibration: balanced deciles, top out-passes bottom") {
    val rows = q("pipeline_classifier_calibration").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty &&
      rows.map(_._1).toSeq == (1 to rows.length).toSeq)
    // ntile balance: decile sizes differ by at most one
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // the distilled ranking agrees with its teacher: the top decile's
    // gate pass rate strictly exceeds the bottom decile's (measured
    // 1.00 vs 0.18 at sf0.01)
    assert(rows.head._4 > rows.last._4,
      s"no calibration signal: head=${rows.head._4} tail=${rows.last._4}")
  }

  test("quantile-by-sample: the hash-priority sample survives repartitioning") {
    import org.apache.spark.sql.functions._
    import graft.operators.DistinctSketch
    // the whole point of hash-priority sampling: the drawn set is a
    // property of the DATA (smallest md5 row-hashes), not of the
    // partitioning — so retries, shuffles and cluster-size changes
    // can't silently redraw it (rand()-based sampling fails all three)
    def draw(parts: Int): Seq[Double] = {
      val li = Tables.lineitem(spark, sf)
        .repartition(parts)
        .select(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"),
          DistinctSketch.hash60(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")))
            .as("h"))
      graft.plans.TopKPerGroup(li, Seq("flag"), "h", descending = false, k = 256)
        .groupBy(col("flag"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .orderBy("flag")
        .collect().flatMap(_.getSeq[Double](1)).toSeq
    }
    val a = draw(2)
    val b = draw(7)
    assert(a.nonEmpty && a == b,
      "sample changed under repartitioning — not a pure order statistic")
  }

  test("dedup_substring: spans are maximal, disjoint, and truly duplicated") {
    val W = 8
    val spans = graft.queries.DedupQueries.queries("dedup_substring")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty, "fixture corpus must contain duplicated spans")
    // per-doc invariants of the gaps-and-islands merge
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, s, e, nw) =>
        assert(e >= s + W - 1, s"doc $doc: span [$s,$e] shorter than a window")
        // fixed-width windows: n contiguous duplicated starts span
        // exactly e - s - W + 2 windows
        assert(nw == e - s - W + 2,
          s"doc $doc: span [$s,$e] claims $nw windows, merge arithmetic broken")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          // maximality: merged spans are separated by a real gap (> 1
          // token between a span end and the next span start would have
          // merged if the windows overlapped or touched)
          assert(s2 > e1 + 1, s"doc $doc: spans [$e1] and [$s2] should have merged")
        case _ =>
      }
    }
    // ground truth: recompute duplicated windows naively on the driver
    // and check every reported span is wall-to-wall covered by them
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)).toMap
    val occ = scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (_, ts) =>
      ts.sliding(W).filter(_.length == W)
        .foreach(win => occ.updateWith(win.mkString(" "))(c => Some(c.getOrElse(0) + 1)))
    }
    val dupStarts = docs.map { case (d, ts) =>
      d -> ts.sliding(W).zipWithIndex.collect {
        case (win, i) if win.length == W && occ(win.mkString(" ")) > 1 => i + 1L
      }.toSet
    }
    spans.foreach { case (doc, s, e, _) =>
      (s to (e - W + 1)).foreach { i =>
        assert(dupStarts(doc).contains(i),
          s"doc $doc: window at $i inside span [$s,$e] is not duplicated")
      }
    }
    // completeness: every duplicated window lands inside some span
    val covered = spans.groupBy(_._1).map { case (d, ss) =>
      d -> ss.flatMap { case (_, s, e, _) => s to (e - W + 1) }.toSet
    }
    dupStarts.foreach { case (d, starts) =>
      assert(starts.subsetOf(covered.getOrElse(d, Set.empty[Long])),
        s"doc $d: duplicated windows ${starts -- covered.getOrElse(d, Set.empty[Long])} missing from spans")
    }
  }

  test("dedup_substring_clean: removal equals the naive first-occurrence replay") {
    val W = 8
    val got = graft.queries.DedupQueries.queries("dedup_substring_clean")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)).toMap
    assert(got.keySet == docs.keySet, "every doc must appear in the stats")
    // naive replay: first (doc, start) per duplicated window is kept,
    // every other occurrence's token range is removed (positional cover)
    val occ = scala.collection.mutable.Map.empty[String, List[(Long, Long)]]
    docs.toSeq.sortBy(_._1).foreach { case (d, ts) =>
      ts.sliding(W).zipWithIndex.foreach { case (win, i) =>
        if (win.length == W) {
          val k = win.mkString(" ")
          occ.updateWith(k)(l => Some((d, i + 1L) :: l.getOrElse(Nil)))
        }
      }
    }
    val removedPos = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    occ.values.filter(_.size > 1).foreach { os =>
      val first = os.min
      os.filter(_ != first).foreach { case (d, s) =>
        val set = removedPos.getOrElseUpdate(d, scala.collection.mutable.Set.empty)
        (s until s + W).foreach(set += _)
      }
    }
    docs.keys.foreach { d =>
      val (nt, rt, kt) = got(d)
      assert(nt == docs(d).length.toLong, s"doc $d token count")
      assert(rt == removedPos.get(d).map(_.size.toLong).getOrElse(0L),
        s"doc $d removed-token count diverged from the naive replay")
      assert(kt == nt - rt, s"doc $d kept+removed must partition the tokens")
    }
    // the pass is a real dedup on this corpus — something is removed —
    // but not a shredder: the corpus keeps most of its tokens. (A
    // per-doc floor would be WRONG: a doc that is wall-to-wall
    // duplicated spans of earlier docs legitimately loses everything —
    // that is the entire point of the cleaner.)
    val (totalN, totalR) = (got.values.map(_._1).sum, got.values.map(_._2).sum)
    assert(totalR > 0, "corpus has duplicated spans; removal must be non-zero")
    assert(totalN - totalR > totalN / 2,
      s"cleaner removed $totalR of $totalN tokens — more than half the corpus")
  }

  test("prefix-filtered jaccard equals the naive all-pairs join (lossless prune)") {
    import graft.operators.Dedup
    // sf0.01: the naive inverted self-join is feasible here (~5.8M
    // rows) and the corpus holds 25 pairs at τ = 7/10 — a non-vacuous
    // equality
    val d = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Dedup.jaccardPrefixPairs(d, n = 5, tauNum = 7, tauDen = 10)
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive over the same exact-dup collapse (min-doc_id per lowered
    // text — a no-op on this fixture, which has no identical texts)
    val uniq = d.select(lower(col("text")).as("t"), col("doc_id"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("t").as("text"))
    val ss = Dedup.wordShingles(uniq, 5)
    val sizes = ss.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val naive = ss.select(col("doc_id").as("doc_a"), col("sh"))
      .join(ss.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .where(lit(10) * col("inter") >= lit(7) * (col("na") + col("nb") - col("inter")))
      .select("doc_a", "doc_b", "inter").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "gate corpus must contain τ ≥ 0.7 pairs")
    assert(got == naive,
      s"prefix prune diverged: missing=${naive -- got} extra=${got -- naive}")
  }

  test("dsir select: target-like raw docs outrank the rest, scores exact under re-partitioning") {
    val top = q("pipeline_dsir_select").collect()
    assert(top.length == 100)
    // ranks are 1..100, strictly ordered by (score desc, doc_id)
    val ranked = top.map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    assert(ranked.map(_._1).toSeq == (1 to 100))
    ranked.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
        s"rank order violated: $a then $b")
    }
    // determinism: identical result from a re-partitioned input (the
    // content-hash discipline — no rand(), no partition-order effects)
    val docs = Tables.documents(spark, sf).repartition(13)
    val again = graft.operators.Dsir.select(docs, "en", 64, 100)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(4)))
    assert(again.toSeq == ranked.toSeq, "selection changed under repartitioning")
  }

  test("rho select equals a full two-model driver replay; selection is learnability-ordered") {
    val got = q("pipeline_rho_select").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // independent replay: same tokenizer, same disjoint-slice models
    // (top-1000, ties lexicographic), same integer-micro losses
    val rows = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16) % 100
    }
    val bgs = rows.map { case (id, t) =>
      val ts = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> (if (ts.length >= 2) ts.sliding(2).map(_.mkString(" ")).toSeq
             else Seq.empty[String])
    }
    def model(pred: Long => Boolean): Set[String] =
      bgs.filter(b => pred(bucket(b._1))).flatMap(_._2)
        .groupBy(identity).map { case (bg, os) => bg -> os.size }.toSeq
        .sortBy { case (bg, c) => (-c, bg) }.take(1000).map(_._1).toSet
    val ref = model(_ < 25)
    val cur = model(b => b >= 50 && b < 75)
    assert(ref != cur, "the two slices must train distinguishable models")
    val scored = bgs.map { case (id, bg) =>
      val nb = bg.size.toLong
      def loss(m: Set[String]): Long =
        if (nb == 0) 1000000L else (nb - bg.count(m)) * 1000000L / nb
      (id, nb, loss(ref), loss(cur))
    }
    val expect = scored.map { case (id, nb, lr, lc) => (id, nb, lr, lc, lc - lr) }
      .sortBy { case (id, _, _, _, rho) => (-rho, id) }.take(64)
      .zipWithIndex.map { case ((id, nb, lr, lc, rho), i) =>
        (i + 1, id, nb, lr, lc, rho) }
    assert(got.toSeq == expect.toSeq,
      s"replay mismatch:\n got=${got.take(5).toSeq}…\n exp=${expect.take(5).toSeq}…")
    // the rule selects real signal: scores spread, and every selected
    // doc's rho dominates every unselected doc's
    assert(got.map(_._6).distinct.length > 1, "rho is constant — vacuous gate")
    val cut = got.map(_._6).min
    val unselected = scored.map { case (id, _, lr, lc) => (lc - lr, id) }
      .filterNot(s => got.exists(_._2 == s._2))
    assert(unselected.forall(_._1 <= cut),
      "an unselected doc outscores a selected one")
  }

  test("A-Res WOR sample equals a driver-side recompute of top-50 keys") {
    val got = q("q_sample_wor").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got.map(_._1) == (1 to 50))
    // independent recompute: same md5 uniform, same capped weight,
    // same power key, ranked in plain Scala
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws$id".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val want = docs.map { case (id, nc) =>
      val w = math.min(nc.toDouble, 2000.0) / 2000.0
      val key = math.floor(math.pow(u(id), 1.0 / w) * 1e6 + 0.5) / 1e6
      (id, key)
    }.sortBy { case (id, k) => (-k, id) }.take(50).map(_._1).toSeq
    assert(got.map(_._2) == want, "selection diverged from driver recompute")
  }

  test("grouped A-Res runs through the custom bounded-heap operator, no window sort") {
    val df = q("q_sample_wor_grouped")
    val p = plan(df)
    assert(p.contains("TopKPerGroup"),
      "grouped sample must use the custom physical operator:\n" + p.take(1500))
    // per-lang ranks are 1..5 and keys descend within each lang
    val rows = df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._2).sorted.toSeq == (1 to g.length),
        s"$lang ranks not contiguous")
      g.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"$lang keys not descending")
        case _ =>
      }
    }
  }

  test("shuffle-shard: a permutation, balanced, reproducible under re-partitioning") {
    val rows = q("pipeline_shuffle_shard").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    // (shard, pos) is a bijection: positions within a shard are 1..n_s
    rows.groupBy(_._2).foreach { case (shard, members) =>
      assert(members.map(_._3).sorted.toSeq == (1 to members.length),
        s"shard $shard positions not contiguous")
    }
    // md5 balance: no shard more than 3x the ideal share on the fixture
    val maxShard = rows.groupBy(_._2).values.map(_.length).max
    assert(maxShard <= 3 * (nDocs.toInt / 16 + 1),
      s"shard skew: max $maxShard of $nDocs")
    // reproducible from a differently-partitioned scan
    val again = graft.queries.PipelineQueries.queries("pipeline_shuffle_shard")(
      spark, sf).collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSeq == rows.toSeq)
  }
}

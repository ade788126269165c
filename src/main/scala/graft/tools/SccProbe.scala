package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Density/depth probe for the directed fulfillment-flow SCC graph
  * (the density-before-build discipline): driver-side Tarjan for the
  * true SCC distribution, plus a replay of the trim+coloring algorithm
  * to measure the (trimRounds, propRounds, peels) the fixed unrolled
  * form needs at each gate scale.
  * Usage: runMain graft.tools.SccProbe <sfDir>
  */
object SccProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.queries.GraphQueries.flowEdges(spark, args(0)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    println(s"nodes=${nodes.length} edges=${edges.length}")

    // iterative Tarjan
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = mutable.Map[Long, Int]()
    val low = mutable.Map[Long, Int]()
    val onStack = mutable.Set[Long]()
    val stack = mutable.Stack[Long]()
    val sccOf = mutable.Map[Long, Long]()
    var counter = 0
    for (root <- nodes if !index.contains(root)) {
      val work = mutable.Stack[(Long, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.pop()
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack.push(v); onStack += v
        }
        val succs = adj.getOrElse(v, Array.empty[Long])
        var i = pi
        var recursed = false
        while (i < succs.length && !recursed) {
          val w = succs(i)
          if (!index.contains(w)) {
            work.push((v, i + 1)); work.push((w, 0)); recursed = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            val comp = mutable.Buffer[Long]()
            var w = -1L
            while (w != v) { w = stack.pop(); onStack -= w; comp += w }
            val id = comp.min
            comp.foreach(sccOf(_) = id)
          }
          work.headOption.foreach { case (p, _) =>
            low(p) = math.min(low(p), low(v)) }
        }
      }
    }
    val sizes = sccOf.groupBy(_._2).map(_._2.size).toSeq
    val hist = sizes.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (sz, g) => s"$sz:${g.size}" }
    println(s"n_scc=${sizes.length} nontrivial=${sizes.count(_ > 1)} " +
      s"size_hist=${hist.mkString(" ")}")

    // trim + coloring replay: measure converged round counts.
    // CAVEAT: the propagation loops below update IN PLACE (Gauss-
    // Seidel), which converges in fewer rounds than the SYNCHRONOUS
    // (Jacobi) rounds the Spark operator and the unrolled oracle
    // implement — use these fwd/back counts as a sanity floor only;
    // the registered depths come from the provable synchronous bound
    // (longest in-color path ≤ 6 edges for ≤ 7-line orders). Trim
    // counts ARE synchronous (whole-set sweeps) and transfer directly.
    var alive = nodes.toSet
    var peel = 0
    val settledScc = mutable.Map[Long, Long]()
    var maxTrim = 0; var maxF = 0; var maxB = 0
    while (alive.nonEmpty) {
      peel += 1
      // trim to fixpoint
      var trimRounds = 0
      var trimming = true
      while (trimming) {
        val ae = edges.filter(e => alive(e._1) && alive(e._2))
        val hasOut = ae.map(_._1).toSet
        val hasIn = ae.map(_._2).toSet
        val trimmed = alive.filter(v => !hasOut(v) || !hasIn(v))
        if (trimmed.isEmpty) trimming = false
        else {
          trimRounds += 1
          trimmed.foreach(v => settledScc(v) = v)
          alive = alive -- trimmed
        }
      }
      maxTrim = math.max(maxTrim, trimRounds)
      if (alive.nonEmpty) {
        val ae = edges.filter(e => alive(e._1) && alive(e._2))
        val f = mutable.Map[Long, Long](alive.toSeq.map(v => v -> v): _*)
        var rounds = 0; var changed = true
        while (changed) {
          changed = false; rounds += 1
          for ((s, d) <- ae) if (f(s) < f(d)) { f(d) = f(s); changed = true }
        }
        maxF = math.max(maxF, rounds)
        val b = mutable.Map[Long, Long](alive.toSeq.map(v => v -> v): _*)
        var rounds2 = 0; changed = true
        while (changed) {
          changed = false; rounds2 += 1
          for ((s, d) <- ae if f(s) == f(d))
            if (b(d) < b(s)) { b(s) = b(d); changed = true }
        }
        maxB = math.max(maxB, rounds2)
        val settled = alive.filter(v => b(v) == f(v))
        settled.foreach(v => settledScc(v) = f(v))
        println(s"peel $peel: trim_rounds=$trimRounds fwd=$rounds back=$rounds2 " +
          s"settled=${settled.size} remaining=${alive.size - settled.size}")
        alive = alive -- settled
      } else {
        println(s"peel $peel: trim_rounds=$trimRounds emptied the graph")
      }
    }
    println(s"peels=$peel max_trim=$maxTrim max_fwd=$maxF max_back=$maxB")
    println(s"coloring == tarjan: ${nodes.forall(v => settledScc(v) == sccOf(v))}")
    spark.stop()
  }
}

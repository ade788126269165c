package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter as relational algebra — the constant-memory
  * membership sketch for decontamination and join pre-filtering.
  *
  * Why a HAND-ROLLED bloom instead of `DataFrameStatFunctions.bloomFilter`
  * or Spark's internal `BloomFilterAggregate`: those hash with
  * implementation-private Murmur3 variants and serialize an opaque binary,
  * so a cross-engine oracle can only pin error bounds. This one is K
  * universal hashes `((a·h + b) mod P) mod m` over [[Dedup.MinhashP]]
  * (the minhash family, distinct seed), bits packed 32 per BIGINT word
  * (shift counts ≤ 31 — no sign-bit semantics to match across engines).
  * Both engines rebuild the IDENTICAL bit array, so bloom answers —
  * including every false positive — hash-gate exactly; no probabilistic
  * pin needed.
  *
  * Scale shape: the filter is a FIXED-size long array (m/32 words)
  * independent of the keyed set's cardinality in bytes-broadcast terms —
  * the membership structure you can still broadcast when the key set
  * itself (the [[Dedup.contamination]] sorted array, a join's small-side
  * keys) outgrows executor memory. Build cost is two tiny shuffles
  * (distinct bit positions, then a ≤ m/32-row word OR-aggregate); probe
  * cost is K array reads per row — pure scan bandwidth, no join.
  *
  * Reference analogue: none (the reference ships no sketch structures);
  * this extends the decontamination family per the builder brief.
  */
object Bloom {

  /** Number of hash probes per element. */
  val K = 3

  /** Universal-hash coefficients — same family as the minhash signature
    * ((a·h+b) mod P with a,b < P < 2³¹ ⇒ products < 2⁶², overflow-free
    * in BIGINT on both engines), seeded apart from every other consumer
    * of [[Dedup.minhashCoeffs]].
    */
  val coeffs: Seq[(Long, Long)] = Dedup.minhashCoeffs(K, seed = 733L)

  /** The K bit positions of hash `h` (a long in [0, P)) in an m-bit
    * filter. Pure integer Column arithmetic — the Spark twin of
    * [[positionSql]].
    */
  def positions(h: Column, mBits: Int): Seq[Column] = {
    // normalize into [0, P) FIRST: a raw 60-bit hash would overflow a·h
    // in 64-bit and element_at's negative-index read-from-the-END would
    // silently break the no-false-negative contract. pmod is identity
    // for in-domain callers, so the SQL twin (whose callers all pass
    // pre-reduced hashes) stays in exact sync.
    val hm = pmod(h, lit(Dedup.MinhashP))
    coeffs.map { case (a, b) =>
      (lit(a) * hm + lit(b)) % lit(Dedup.MinhashP) % lit(mBits.toLong)
    }
  }

  /** SQL twin of [[positions]] for hash expression `h` — keep in exact
    * sync. */
  def positionSql(h: String, mBits: Int): Seq[String] =
    coeffs.map { case (a, b) =>
      s"((($a * $h) + $b) % ${Dedup.MinhashP}) % $mBits"
    }

  /** Build the filter from the `hm` column (long hashes in [0, P)):
    * a 1-row frame with `bits` = array<bigint> of mBits/32 words, each
    * holding 32 filter bits. Meant for `crossJoin(broadcast(...))` by
    * probe stages.
    *
    * Word packing uses 32 bits per 64-bit word so every shift count is
    * ≤ 31: DuckDB and the JVM agree trivially, and `1 << s` never
    * touches the sign bit.
    */
  def buildBits(hashes: DataFrame, mBits: Int): DataFrame = {
    require(mBits % 32 == 0, s"mBits must pack whole 32-bit words: $mBits")
    val words = mBits / 32
    hashes
      .select(explode(array(positions(col("hm"), mBits): _*)).as("p"))
      .distinct()
      // p/32 and p%32 are power-of-two ops — exact in double, so floor()
      // is the true integer word index (same trick as the band keys)
      .select(floor(col("p") / lit(32)).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(32L)).cast("int")).as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("b"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("b"))).as("wm"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("wm"), w), lit(0L))).as("bits"))
  }

  /** Probe: true iff all K positions of `h` are set in `bits` (element 1
    * = words[0]). May false-positive, never false-negative — and both
    * engines false-positive on the SAME keys by construction.
    */
  def mightContain(bits: Column, h: Column, mBits: Int): Column =
    positions(h, mBits).map { p =>
      element_at(bits, floor(p / lit(32)).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(32L)).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)

  /** SQL twin of one [[mightContain]] probe term, against a `bw(w, b)`
    * word table aliased `wa` (LEFT-joined on `wa.w = p DIV 32`; missing
    * word ⇒ bit clear). `p` is the position expression string.
    */
  def probeSql(wa: String, p: String): String =
    s"(coalesce($wa.b, 0) & (1::BIGINT << CAST(($p) % 32 AS INT))) != 0"
}

package graft.operators

/** Deterministic parameter generation for hash-family operators
  * (MinHash permutations, SimHash bit hashing, random hyperplanes).
  *
  * All "randomness" in the engine is derived from splitmix64 over a
  * fixed seed so that (a) runs are reproducible across sessions and
  * cluster sizes, and (b) the DuckDB oracle SQL can embed the exact
  * same constants as literals — one source of truth, two dialects.
  */
object DetParams {

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def stream(seed: Long): Iterator[Long] =
    Iterator.iterate(splitmix64(seed))(splitmix64)

  /** Prime just above 2^32; MinHash permutation modulus. With
    * a < 2^30 and base hash h < 2^32, a*h + b < 2^62 — no 64-bit
    * overflow in either Spark or DuckDB. */
  val MinhashP: Long = 4294967311L

  /** Number of MinHash hash functions (signature length). */
  val MinhashK: Int = 12

  /** LSH banding: 2 bands x 6 rows — tuned so the word-soup testdata
    * (mean trigram Jaccard ~0.4) yields a bounded candidate set while
    * J>0.9 near-dups are caught with p~0.8. At other similarity
    * profiles, retune bands/rows (threshold ~ (1/b)^(1/r)). */
  val MinhashBands: Int = 2
  val MinhashRows: Int = 6

  /** MinHash permutation params h_i(x) = (a_i * x + b_i) mod P. */
  val (minhashA, minhashB): (Array[Long], Array[Long]) = {
    val it = stream(0x5eed0001L)
    val a = Array.fill(MinhashK)((it.next().abs % ((1L << 30) - 1)) | 1L)
    val b = Array.fill(MinhashK)(it.next().abs % (1L << 30))
    (a, b)
  }

  /** Random hyperplanes for sign-LSH over 64-dim embeddings:
    * values in [-1, 1] with 3 decimals (exact in double, so the SQL
    * literal "0.123" parses to the identical double in Java and C++). */
  val EmbedDim: Int = 64
  val PlaneBandsCount: Int = 4
  val PlaneBitsPerBand: Int = 4
  val NumPlanes: Int = PlaneBandsCount * PlaneBitsPerBand

  val hyperplanes: Array[Array[Double]] = {
    val it = stream(0x5eed0002L)
    Array.fill(NumPlanes, EmbedDim)(((it.next().abs % 2001L) - 1000L) / 1000.0)
  }

  /** Render a double that was constructed as k/1000 exactly. */
  def lit3(d: Double): String = f"$d%.3f"
}

package graft

/** THE single test-scope recompute of the winnowing pipeline's hash and
  * fingerprint selection (r11 review: three hand-synced copies of the
  * trigram hash drifted-by-construction — the engine, CorpusOpsSpec's
  * local pin, and the property spec each re-stated it; now the pin test
  * proves engine ≡ THIS object row-for-row and every other law is
  * proven against THIS object, so transfer claims are structural).
  * Constants come from the production objects, not fresh literals. */
object WinnowRef {
  val P: Long = graft.operators.TextOps.MinhashPrime
  val B: Long = 2654435761L

  private def f(x: Long): Long = java.lang.Math.floorMod(x, P)

  /** the engine's polynomial rolling trigram hash, exact in long */
  def trig(c1: Long, c2: Long, c3: Long): Long =
    ((f(c1) * B + f(c2)) % P * B + f(c3)) % P

  /** distinct min-per-4-window fingerprints of a token-code sequence */
  def fingerprints(c: Seq[Long]): Set[Long] = {
    val h = (0 until math.max(c.length - 2, 0)).map(i => trig(c(i), c(i + 1), c(i + 2)))
    if (h.length < 4) Set.empty
    else (0 to h.length - 4).map(i => h.slice(i, i + 4).min).toSet
  }
}

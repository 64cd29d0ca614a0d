package graft.core

/** Wall-clock accumulator for FIXTURE/TWIN construction — the
  * once-per-JVM memoized artifacts that exist to CHECK a gate
  * (from-scratch rebuild twins) or to SEED it ("yesterday's" base
  * stores, synthetic epoch corpora), as opposed to the engine work
  * the gate measures. [[graft.Bench]] samples the running total
  * around every query and reports `cold_fixtures` separately from
  * `cold_engine` on the metric line, so the cold headline tracks the
  * engine again (the r15 finding: m13's once-per-JVM decode twin was
  * 43.8s of a 576.8s cold total — fixture cost masquerading as
  * engine cost).
  *
  * Builders run inside `computeIfAbsent` on whichever gate thread
  * gets there first — the counter is atomic, and a REENTRANT guard
  * keeps nested timed sections (a twin builder rendering a synthetic
  * corpus that is itself timed) from double-counting: only the
  * outermost section on each thread accumulates.
  */
object FixtureClock {
  private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = ThreadLocal.withInitial[Integer](() => 0)

  /** Clock seam: the spec swaps in a deterministic tick so the
    * no-double-count and hit-is-free properties are pinned exactly,
    * structurally — not with wall-clock upper bounds that flake when
    * the box stalls mid-sleep (the r16 advice). Production never
    * touches this. */
  @volatile private[core] var nanoClock: () => Long = () => System.nanoTime()

  /** Total fixture-construction nanos so far this JVM. */
  def totalNanos: Long = nanos.get()

  /** Memoize-with-attribution: `m.computeIfAbsent(k, builder)` with
    * the builder's wall time (first invocation only — the miss)
    * accumulated as fixture construction. Drop-in at each memo site:
    * only the call head changes, the builder lambda stays verbatim. */
  def memo[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V], k: K)
                (builder: K => V): V =
    m.computeIfAbsent(k, key => timed(builder(key)))

  /** Run `body`, attributing its wall time to fixture construction
    * (outermost-per-thread only). */
  def timed[T](body: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = nanoClock()
    try body
    finally {
      depth.set(d)
      if (d == 0) nanos.addAndGet(nanoClock() - t0)
    }
  }
}

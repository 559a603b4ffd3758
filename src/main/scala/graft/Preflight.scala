package graft

import org.apache.spark.sql.SparkSession

/** Session preflight checks — turns measured operational floors into
  * guards instead of obscure runtime failures.
  *
  * THE SPILL FLOOR (r18, SCALE.md "The spill regime, measured"): on a
  * starved heap the engine's shuffle-heavy operators complete by
  * SPILLING (86 GB across the five heaviest at 3 g / 8 slots — 0.375
  * GB per slot), but at 3 g / 32 slots (0.09 GB/slot) the spill
  * writer ITSELF cannot allocate its page and the JVM dies inside
  * `UnsafeSorterSpillWriter.<init>` — an OOM with no actionable
  * message, far from the actual mis-sizing. The measured boundary:
  * spill-not-OOM holds at ≥ ~0.4 GB/slot for these shuffle widths;
  * the standard 1 GB/core deployment sizing is 2.5× above the floor.
  *
  * [[heapPerSlotWarning]] is the pure check (unit-testable);
  * [[checkSpillFloor]] applies it to a live session — refusing below
  * the measured floor unless `lenient`, where it logs instead. Wired
  * into the Bench/Verify mains as a warning so a mis-sized
  * SPARK_DRIVER_MEM/SPARK_GRAFT_CPUS combination identifies itself
  * up front.
  */
object Preflight {

  /** The measured spill-writer floor, bytes of heap per executor slot
    * (0.375 GB/slot completed with 86 GB spilled; 0.09 GB/slot died in
    * the spill writer — the guard draws the line at the measured
    * SURVIVING configuration). */
  val SpillFloorBytesPerSlot: Long = (0.375 * (1L << 30)).toLong

  /** Pure form: None when `heapBytes / slots` clears the floor, else
    * the actionable message. */
  def heapPerSlotWarning(heapBytes: Long, slots: Int): Option[String] = {
    val perSlot = heapBytes / math.max(slots, 1)
    if (perSlot >= SpillFloorBytesPerSlot) None
    else Some(
      f"heap/slots = ${perSlot / (1L << 30).toDouble}%.2f GB/slot is below " +
        f"the measured spill floor of ${SpillFloorBytesPerSlot / (1L << 30).toDouble}%.3f GB/slot " +
        "(SCALE.md r18 'The spill regime, measured'): below it the shuffle " +
        "spill writer itself cannot allocate its page and the JVM dies in " +
        "UnsafeSorterSpillWriter.<init> instead of spilling. Lower the slot " +
        "count (SPARK_GRAFT_CPUS / executor cores) or raise the heap " +
        "(SPARK_DRIVER_MEM / executor memory); the standard 1 GB/core " +
        "sizing is 2.5x above the floor.")
  }

  /** Live-session check: slots = the local scheduler's parallelism,
    * heap = this JVM's -Xmx (local mode — driver and executors share
    * one heap; on a real cluster apply [[heapPerSlotWarning]] to each
    * executor's memory/cores). Refuses below the floor; `lenient`
    * downgrades to a stderr warning (the bench/verify mains' mode, so
    * a deliberate starved-heap experiment still runs). */
  def checkSpillFloor(spark: SparkSession, lenient: Boolean = false): Unit =
    heapPerSlotWarning(Runtime.getRuntime.maxMemory,
      spark.sparkContext.defaultParallelism).foreach { msg =>
      if (lenient) System.err.println(s"[preflight] WARNING: $msg")
      else throw new IllegalArgumentException(s"preflight: $msg")
    }
}

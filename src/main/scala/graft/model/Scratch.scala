package graft.model

/** Session-unique scratch directories for the source/sink round-trip
  * queries (CSV/ORC/text/XML sources, overwrite/versioned/incremental
  * sinks): each JVM gets its own namespace under `target/tmp`, so two
  * concurrent sessions pointed at the same data dir can never race one
  * another's overwrite-write against a read-back. Within a session the
  * path is deterministic per (key, dir) — repeated calls reuse and
  * overwrite the same directory (the memoization/idempotence the
  * versioned and incremental sinks rely on) instead of accreting one
  * directory per invocation.
  */
object Scratch {
  private val runId = java.util.UUID.randomUUID().toString.take(8)

  /** Scratch path for query `key` over data dir `d`. The dir component
    * masks to non-negative before hex-rendering (`math.abs` alone is
    * still negative for `Int.MinValue`).
    */
  def dir(key: String, d: String): String =
    s"target/tmp/${key}_${runId}_${(d.hashCode & 0x7fffffff).toHexString}"
}

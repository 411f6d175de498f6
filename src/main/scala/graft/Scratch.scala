package graft

/** Per-process scratch root for everything a query materializes and throws
  * away: stream checkpoints, state-store directories, staged replay slices,
  * index layouts, compaction outputs.
  *
  * Why it exists (r8 verdict #3): the streaming bench entries flapped
  * between sweeps — s5/s12/s15 were each flagged-then-adjudicated on
  * identical code — because their per-run cost includes creating stream
  * checkpoint roots and HDFS-state-store layouts under `java.io.tmpdir`,
  * which on this machine is DISK-backed (/tmp on the root device). The
  * variance was filesystem setup, not compute. Routing all scratch to a
  * tmpfs (`/dev/shm` when writable, overridable with SPARK_GRAFT_SCRATCH)
  * makes checkpoint/state I/O memory-speed and per-sweep-stable, so a
  * streaming min measures the pipeline.
  *
  * Production note: on a real cluster checkpoint locations must be a
  * durable shared filesystem (HDFS/S3) configured by the caller — this
  * root is only the default for the local test/bench stand-ins, which are
  * torn down after each run anyway (the shutdown hook removes the whole
  * tree, so repeated Verify/Bench runs never accrete state).
  */
object Scratch {

  /** Minimum usable space (bytes) the tmpfs must report before it is
    * chosen as the scratch root — ADVICE r9: /dev/shm is typically capped
    * at 50% of RAM, and exhausting it mid-run surfaces as an opaque task
    * failure, so a too-small tmpfs must fall back to disk UP FRONT rather
    * than ENOSPC later. 8 GiB covers the worst observed per-run usage
    * (sf0.1 staged slices + checkpoints + index layouts ≈ 2 GiB) with 4×
    * headroom; override with SPARK_GRAFT_SCRATCH_MIN_FREE (bytes) on
    * machines where the default is wrong in either direction. An explicit
    * SPARK_GRAFT_SCRATCH is trusted as-is — the caller chose it. */
  private def minFreeBytes: Long =
    sys.env.get("SPARK_GRAFT_SCRATCH_MIN_FREE").map(_.toLong)
      .getOrElse(8L << 30)

  private def usableSpace(p: java.nio.file.Path): Long =
    try java.nio.file.Files.getFileStore(p).getUsableSpace
    catch { case _: Exception => 0L }

  /** The per-process root. Resolution order: SPARK_GRAFT_SCRATCH env var,
    * then /dev/shm when writable AND reporting at least [[minFreeBytes]]
    * usable (tmpfs on Linux), then java.io.tmpdir. The choice is logged
    * once so an unexpected disk fallback is visible in the run output. */
  lazy val root: java.nio.file.Path = {
    val explicit = sys.env.get("SPARK_GRAFT_SCRATCH")
      .map(java.nio.file.Paths.get(_))
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        java.nio.file.Files.isWritable(p))
    val base = explicit
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm) &&
          usableSpace(shm) >= minFreeBytes) Some(shm)
        else {
          if (java.nio.file.Files.isDirectory(shm))
            System.err.println(s"[graft.Scratch] /dev/shm skipped " +
              s"(usable ${usableSpace(shm)} < required $minFreeBytes bytes " +
              "or not writable); scratch falls back to java.io.tmpdir")
          None
        }
      }
      .getOrElse(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp")))
    System.err.println(s"[graft.Scratch] scratch root under $base")
    val r = java.nio.file.Files.createTempDirectory(base, "graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      try java.nio.file.Files.walk(r)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case _: Exception => () }
    }))
    r
  }

  /** A fresh directory under [[root]]. */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}

package graft

/** Pins the state-partition right-sizing contract (r7's 8-partition
  * stores) now that the override rides a CLONED session instead of a
  * set/start/restore on the parent: the checkpointed count must be
  * exactly 8 — deterministically, not race-dependently — and the parent
  * session's conf must never be touched.
  */
class StatePartitionsSpec extends SparkSpec {

  test("stateful stream checkpoints exactly 8 state partitions; parent conf untouched") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val base = java.nio.file.Files
      .createTempDirectory("graft-statepart").toString
    val sinkPath = base + "/sink"
    streaming.Streaming.runStreamDedup(spark, "/root/testdata/sf0.001", sinkPath)

    // The state dir layout IS the pinned count: state/0/<partition id>.
    val stateDir = new java.io.File(sinkPath + ".ckpt/state/0")
    val parts = stateDir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).sorted.toSeq
    assert(parts === (0 until 8), s"state partition dirs: $parts")

    // The offset-seq metadata records the conf the stream planned under.
    val offsets = java.nio.file.Files.readString(
      java.nio.file.Paths.get(sinkPath + ".ckpt/offsets/0"))
    assert(offsets.contains("\"spark.sql.shuffle.partitions\":\"8\""),
      s"offsets metadata lacks the pinned count: $offsets")

    // No parent-session conf mutation, even transiently observable after.
    assert(spark.conf.get("spark.sql.shuffle.partitions") === before)
  }

  test("cloned session carries parent runtime conf, parent stays isolated") {
    spark.conf.set("spark.graft.test.marker", "carried")
    try {
      val ss = streaming.Streaming.sessionWithStatePartitions(spark, 8)
      assert(ss.conf.get("spark.sql.shuffle.partitions") === "8")
      assert(ss.conf.get("spark.graft.test.marker") === "carried")
      assert(spark.conf.get("spark.sql.shuffle.partitions") !== "8")
    } finally spark.conf.unset("spark.graft.test.marker")
  }
}

package graft.tools

/** Shared benchmark-main plumbing (review r20): the load-average
  * reader, the 3-decimal formatter, and the temp+atomic-rename JSON
  * artifact write that ServeProbe / ServeBreakdown / ServeConcurrent
  * were each carrying a copy of.
  */
private[tools] object ToolIO {

  /** 1-minute system load average (includes this JVM's own warmup —
    * the bench-hygiene lessons apply).
    */
  def load(): Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  def f3(d: Double): String = BigDecimal(d).setScale(3,
    BigDecimal.RoundingMode.HALF_UP).toString

  /** temp + atomic rename — a crash mid-write must not truncate the
    * record of an expensive probe.
    */
  def writeAtomic(outFile: String, line: String): Unit = {
    val out = java.nio.file.Paths.get(outFile).toAbsolutePath
    val tmp = java.nio.file.Files.createTempFile(
      out.getParent, ".tool_", ".json")
    java.nio.file.Files.writeString(tmp, line)
    java.nio.file.Files.move(tmp, out,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }
}

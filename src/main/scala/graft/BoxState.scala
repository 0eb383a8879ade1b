package graft

/** Box-state sampling shared by [[Bench]] and the scale smoke — the
  * fields that let a grader adjudicate "regression or contention?" from
  * the committed artifact alone (the r11/r12 problem): 1-minute load
  * average and the count of java processes OUTSIDE this JVM's ancestor
  * chain (the chain legitimately holds sbt and, under the driver, its
  * runner; any other JVM is contending for the same cores). */
object BoxState {

  /** 1-minute system load average (-1.0 where the JVM cannot read it). */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage

  /** Java processes on the box outside this JVM's ancestor chain. */
  def foreignJvms(): Int = {
    import scala.jdk.CollectionConverters._
    var lineage = Set.empty[Long]
    var p = java.util.Optional.of(ProcessHandle.current())
    while (p.isPresent) { lineage += p.get.pid(); p = p.get.parent() }
    ProcessHandle.allProcesses().iterator().asScala.count { h =>
      !lineage.contains(h.pid()) && h.info().command()
        .map[Boolean](c => c == "java" || c.endsWith("/java")).orElse(false)
    }
  }

  /** Taint verdict for a record whose run STARTED at `loadStart`: the
    * launcher's own sbt spin leaves ~0.5-1.0 in the 1-min average, while
    * the contamination class behind past adjudications reads 2-4+; any
    * foreign JVM at either endpoint is an automatic taint. */
  def tainted(loadStart: Double, foreignStart: Int, foreignEnd: Int): Boolean =
    loadStart > 1.5 || foreignStart > 0 || foreignEnd > 0
}

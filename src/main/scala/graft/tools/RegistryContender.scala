package graft.tools

import graft.run.RunRegistry

/** Cross-process lock contender (OrchestrationSpec's second JVM): hammers
  * `updateMetrics` on one run id until the run leaves RUNNING (the call
  * returns None) or `maxMillis` elapses. A correctly-serialized registry
  * makes the sequence "read RUNNING → terminal transition lands in the
  * other process → save stale RUNNING metrics" impossible, because the
  * read-modify-write holds the OS file lock end-to-end — so after this
  * prints STOPPED the record must still be terminal with the terminal
  * metrics.
  *
  *   runMain graft.tools.RegistryContender <registryDir> <runId> <maxMillis>
  */
object RegistryContender {
  def main(args: Array[String]): Unit = {
    val Array(dir, runId, maxMillis) = args
    val reg = new RunRegistry(dir)
    val deadline = System.nanoTime() + maxMillis.toLong * 1000000L
    var writes = 0L
    var live = true
    while (live && System.nanoTime() < deadline) {
      reg.updateMetrics(runId, writes + 1, writes + 1, "0.01") match {
        case Some(_) => writes += 1
        case None    => live = false // run left RUNNING: stop writing
      }
    }
    println(s"${if (live) "TIMEOUT" else "STOPPED"} $writes")
  }
}

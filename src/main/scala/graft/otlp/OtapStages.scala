package graft.otlp

/** Stage-level timing for the OTAP decode stack (dev tool backing
  * SCALE.md's OTAP cost breakdown; see tools.OtapProfile for the
  * end-to-end numbers). Package-private access lets it time the
  * envelope parse and the Arrow-IPC row materialization separately
  * from attribute assembly. */
object OtapStages {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(2000)
    val n = 500
    val (logsInit, logsCont, attrsInit, attrsCont) =
      OtapEncoder.logsRecordSlices(n)
    val init = OtapEncoder.batchMessage(0, logsInit, attrsInit)
    val cont = OtapEncoder.batchMessage(1, logsCont, attrsCont)

    var counting = false
    def time(label: String)(f: => Unit): Unit = {
      counting = false
      (0 until 200).foreach(_ => f)
      counting = true
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) { f; i += 1 }
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e3 / iters}%9.1f us/msg")
    }

    time("envelope payloads()") { OtapDecoder.payloads(cont) }

    val dec = new OtapStreamDecoder(nsAsLong = false)
    dec.decode(init)
    // counters only accumulate in the TIMED phase: the 200 warmup calls
    // run cold (JIT) and would inflate the per-stage split relative to
    // the steady-state headline they decompose
    var read = 0L; var asm = 0L; var peek = 0L
    time("full decode()") {
      dec.decode(cont)
      if (counting) {
        read += dec.lastReadNanos; asm += dec.lastAssembleNanos
        peek += dec.lastPeekNanos
      }
    }
    println(f"  of which ipc-read       ${read / 1e3 / iters}%9.1f us/msg")
    println(f"  of which assemble       ${asm / 1e3 / iters}%9.1f us/msg")
    println(f"  of which schema-peek    ${peek / 1e3 / iters}%9.1f us/msg")
  }
}

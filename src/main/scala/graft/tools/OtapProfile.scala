package graft.tools

import graft.otlp.{OtapEncoder, OtapStreamDecoder, OtlpProtoParser}
import graft.streaming.RowBin

/** Dev profiler for the OTAP server-side cost stack (VERDICT r12 #4:
  * the first graded OTAP window trailed gRPC-unary 2.7×; name where the
  * Arrow-stream path spends). Times, single-threaded and server-free,
  * the three stages `OtlpServer.otapMessage` runs per message — OTAP
  * IPC decode, RowBin encode — against the unary comparator
  * (protobuf parse + RowBin encode) on an equivalent 500-record body.
  *
  * Usage: runMain graft.tools.OtapProfile [iters]
  * Prints per-stage µs/message and the implied single-thread rows/s —
  * the numbers SCALE.md's OTAP paragraph cites. */
object OtapProfile {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(2000)
    val n = 500
    val (logsInit, logsCont, attrsInit, attrsCont) =
      OtapEncoder.logsRecordSlices(n)
    def otapMsg(i: Long, init: Boolean) =
      if (init) OtapEncoder.batchMessage(i, logsInit, attrsInit)
      else OtapEncoder.batchMessage(i, logsCont, attrsCont)

    // mirror Bench.grpcLogsBody(500): the unary protobuf comparator
    val pbBody = {
      import graft.streaming.GrpcWire.Pb
      def strAttr(k: String, v: String) =
        Pb.msg { o => Pb.string(o, 1, k)
          Pb.lenDelim(o, 2, Pb.msg(x => Pb.string(x, 1, v))) }
      val rec = Pb.msg { o =>
        Pb.fixed64(o, 1, 1640000000000000000L)
        Pb.vint(o, 2, 9)
        Pb.string(o, 3, "INFO")
        Pb.lenDelim(o, 5, Pb.msg(x =>
          Pb.string(x, 1,
            "benchmark log record with a reasonably sized message body")))
        Pb.lenDelim(o, 6, Pb.msg { x =>
          Pb.string(x, 1, "thread.id")
          Pb.lenDelim(x, 2, Pb.msg(y => Pb.vint(y, 3, 42L)))
        })
      }
      val scopeLogs = Pb.msg { x =>
        Pb.lenDelim(x, 1, Pb.msg(y => Pb.string(y, 1, "bench-logger")))
        (0 until n).foreach(_ => Pb.lenDelim(x, 2, rec))
      }
      Pb.msg { o =>
        Pb.lenDelim(o, 1, Pb.msg { rl =>
          Pb.lenDelim(rl, 1, Pb.msg { x =>
            Pb.lenDelim(x, 1, strAttr("service.name", "bench-service"))
            Pb.lenDelim(x, 1, strAttr("host.name", "bench-host"))
          })
          Pb.lenDelim(rl, 2, scopeLogs)
        })
      }
    }

    def time(label: String, reps: Int)(f: Int => Long): Unit = {
      var rows = 0L
      (0 until math.min(reps / 10 + 1, 200)).foreach(f(_)) // warmup
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { rows += f(i); i += 1 }
      val el = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s ${el / reps * 1e6}%9.1f us/msg  " +
        f"${rows / el}%,12.0f rows/s (1 thread)")
    }

    val bin = RowBin.forSignal("logs")

    // OTAP: one long-lived decoder, initial then continuations — the
    // steady-state stream shape the bench runs
    val dec = new OtapStreamDecoder(nsAsLong = false)
    dec.decode(otapMsg(0, init = true))
    val cont = otapMsg(1, init = false)
    time("otap decode", iters) { _ =>
      dec.decode(cont).signal("logs").size.toLong
    }
    time("otap decode+rowbin", iters) { _ =>
      val p = dec.decode(cont)
      p.signal("logs").foreach(bin.toBytes)
      p.signal("logs").size.toLong
    }
    val dec2 = new OtapStreamDecoder(nsAsLong = false)
    time("otap decode (cold stream)", math.min(iters, 500)) { i =>
      dec2.decode(otapMsg(i * 2L, init = true)).signal("logs").size.toLong
    }
    time("proto parse", iters) { _ =>
      OtlpProtoParser.parse(pbBody, "logs", nsAsLong = false).signal("logs").size.toLong
    }
    time("proto parse+rowbin", iters) { _ =>
      val p = OtlpProtoParser.parse(pbBody, "logs", nsAsLong = false)
      p.signal("logs").foreach(bin.toBytes)
      p.signal("logs").size.toLong
    }
  }
}

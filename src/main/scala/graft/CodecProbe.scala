package graft

/** Scratch micro-profile of the JDK codec fixture encoders/decoders
  * (the mm_real_codecs hot loop) — per-call driver-side timings, no
  * Spark session. Usage: graft.CodecProbe [n] */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val threads = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    def time(tag: String)(f: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = 0
          while (i < n) { f(i); i += 1 }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      println(f"$tag%12s ${(System.nanoTime() - t0) / 1e6 / n}%8.3f ms/call (x$threads threads)")
    }
    val C = graft.multimodal.Multimodal.JdkCodec
    (1 to 50).foreach { _ =>
      C.encodePng(64, 48); C.encodeWav(800); C.encodeMp4(1920, 1080, 5000)
      C.imageDims(C.encodePng(64, 48)); C.audioDurationMs(C.encodeWav(800))
    }
    val png = C.encodePng(64, 48)
    val wav = C.encodeWav(800)
    time("png")(i => C.encodePng((i % 64) + 1, (i % 48) + 1))
    time("wav")(i => C.encodeWav((i % 800) + 8))
    time("mp4")(i => C.encodeMp4((i % 3840) + 16, (i % 2160) + 16, i % 10000 + 40))
    time("dec-png")(_ => C.imageDims(png))
    time("dec-wav")(_ => C.audioDurationMs(wav))
  }
}

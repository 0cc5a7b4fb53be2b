package graft.operators

/** The general-codec seam, made OPERATIONAL: an external `ffmpeg` /
  * `ffprobe` shim for the containers the pure-JVM decoders do not
  * cover (H.264/H.265/VP9/AV1 …). The JVM build's contract stands —
  * no codec libraries ship with the engine — but where a deployment
  * has the binaries on PATH (or names them via config), video decode
  * upgrades from the loud [[Multimodal.stubDecode]] to a real probe
  * and frame sampler, with ZERO code changes:
  *
  *   - [[available]] is the capability probe (one `-version` exec,
  *     cached per resolved binary path); absent binaries produce the
  *     same loud `UnsupportedOperationException` the stub throws,
  *     now naming the knobs that would fix it;
  *   - [[probe]] returns (width, height, frames) off `ffprobe`'s
  *     stream header read — the shape [[Multimodal.mediaDecode]]
  *     expects;
  *   - [[sampleFrames]] pipes every Nth frame out as PNG bytes
  *     (`image2pipe`), split on the PNG signature — the shape
  *     [[VideoFrames]] hashes.
  *
  * Resolution order: system property `graft.ffmpeg.bin` /
  * `graft.ffprobe.bin`, then env `GRAFT_FFMPEG` / `GRAFT_FFPROBE`,
  * then the bare name on PATH.
  *
  * Scale shape: one process exec per VIDEO inside the executor task
  * that holds its bytes — the standard shim cost; payloads land in a
  * task-local temp file (ffmpeg needs seekable input for most
  * containers) and are deleted before the call returns. Nothing here
  * touches the driver.
  */
object FfmpegShim {

  def ffmpegBin: String = sys.props.getOrElse("graft.ffmpeg.bin",
    sys.env.getOrElse("GRAFT_FFMPEG", "ffmpeg"))
  def ffprobeBin: String = sys.props.getOrElse("graft.ffprobe.bin",
    sys.env.getOrElse("GRAFT_FFPROBE", "ffprobe"))

  // capability probe, cached per resolved path (the props/env can
  // change under test; a plain lazy val would pin the first answer)
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def runnable(bin: String): Boolean =
    probeCache.computeIfAbsent(bin, { b =>
      try {
        val p = new ProcessBuilder(b, "-version")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        p.waitFor() == 0
      } catch { case _: java.io.IOException => false }
    })

  /** True when BOTH binaries answer `-version` — the capability the
    * general-codec paths gate on.
    */
  def available: Boolean = runnable(ffprobeBin) && runnable(ffmpegBin)

  private def requireAvailable(): Unit =
    if (!available) throw new UnsupportedOperationException(
      s"general video codecs need ffmpeg/ffprobe: `$ffprobeBin` / " +
        s"`$ffmpegBin` not runnable — install them on PATH or point " +
        "graft.ffprobe.bin/graft.ffmpeg.bin (or GRAFT_FFPROBE/" +
        "GRAFT_FFMPEG) at the binaries; MJPEG-in-AVI/MOV and Y4M " +
        "decode natively without them")

  private def withTemp[T](payload: Array[Byte])(body: String => T): T = {
    val f = java.io.File.createTempFile("graft_shim_", ".bin")
    try {
      java.nio.file.Files.write(f.toPath, payload)
      body(f.getAbsolutePath)
    } finally { f.delete(); () }
  }

  private def exec(cmd: Seq[String]): Array[Byte] = {
    val p = new ProcessBuilder(cmd: _*).start()
    // Drain stderr CONCURRENTLY with stdout: ffmpeg on corrupt input
    // can emit more than the OS pipe buffer (~64 KB) of diagnostics;
    // a sequential stdout-then-stderr read deadlocks (process blocked
    // writing stderr, exec blocked reading stdout).
    val errBuf = new java.util.concurrent.atomic.AtomicReference[Array[Byte]](
      Array.emptyByteArray)
    val drain = new Thread(() =>
      try errBuf.set(p.getErrorStream.readAllBytes())
      catch { case _: java.io.IOException => () },
      "graft-ffmpeg-stderr-drain")
    drain.setDaemon(true)
    drain.start()
    val out = p.getInputStream.readAllBytes()
    drain.join()
    val err = new String(errBuf.get,
      java.nio.charset.StandardCharsets.UTF_8)
    val code = p.waitFor()
    if (code != 0) throw new java.io.IOException(
      s"${cmd.head} exited $code: ${err.takeRight(500)}")
    out
  }

  /** (width, height, frames) off the first video stream's header —
    * the [[Multimodal.mediaDecode]] shape. `frames` is the packet
    * count (exact for the common one-packet-per-frame codecs).
    */
  def probe(payload: Array[Byte]): (Int, Int, Int) = {
    requireAvailable()
    withTemp(payload) { path =>
      val out = new String(exec(Seq(ffprobeBin, "-v", "error",
        "-select_streams", "v:0", "-count_packets", "-show_entries",
        "stream=width,height,nb_read_packets", "-of", "csv=p=0", path)),
        java.nio.charset.StandardCharsets.UTF_8).trim
      out.split(",") match {
        case Array(w, h, n) => (w.trim.toInt, h.trim.toInt, n.trim.toInt)
        case Array(w, h) => (w.trim.toInt, h.trim.toInt, 0)
        case other => throw new java.io.IOException(
          s"unparseable ffprobe output: ${other.mkString(",")}")
      }
    }
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Split an `image2pipe` PNG stream into individual payloads. */
  private[operators] def splitPngs(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i <= bytes.length - PngSig.length) {
      if (java.util.Arrays.equals(bytes, i, i + PngSig.length,
          PngSig, 0, PngSig.length)) { starts += i; i += PngSig.length }
      else i += 1
    }
    (starts.toSeq :+ bytes.length).sliding(2).collect {
      case Seq(a, b) if b > a =>
        java.util.Arrays.copyOfRange(bytes, a, b)
    }.toSeq
  }

  /** Every `everyNth`-th frame of the video, capped at `maxFrames`,
    * re-encoded as PNG payloads — the [[VideoFrames]] hashing shape.
    */
  def sampleFrames(payload: Array[Byte], everyNth: Int = 1,
      maxFrames: Int = 16): Seq[Array[Byte]] = {
    require(everyNth >= 1 && maxFrames >= 1)
    requireAvailable()
    withTemp(payload) { path =>
      splitPngs(exec(Seq(ffmpegBin, "-v", "error", "-i", path,
        "-vf", s"select=not(mod(n\\,$everyNth))", "-fps_mode", "vfr",
        "-frames:v", maxFrames.toString,
        "-f", "image2pipe", "-c:v", "png", "-")))
    }
  }
}

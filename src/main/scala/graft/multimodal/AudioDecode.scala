package graft.multimodal

/** Real byte-level WAV (RIFF PCM) audio decoding and encoding, pure JVM,
  * zero dependencies — the audio half of making the multimodal surface
  * first-class (the image half is [[ImageDecode]]). Scope: the format a
  * training-data pipeline actually stages — linear PCM, 8/16-bit,
  * mono/stereo — via a proper RIFF chunk walk (fmt / data, ancillary
  * chunks skipped). Compressed codecs (MP3/AAC/…) stay behind the stub
  * seam: they genuinely need native libraries.
  *
  * Encoder and decoder share only the constants; the spec additionally
  * cross-checks the encoder's bytes through `javax.sound.sampled` (the
  * JDK's own independent WAV reader) so a symmetric encode/decode bug
  * cannot hide — the q158 ImageIO discipline applied to audio.
  */
object AudioDecode {

  /** Decoded PCM: interleaved samples normalized to 16-bit signed
    * (8-bit input is offset-binary, rescaled by <<8 − 32768). */
  final case class DecodedAudio(sampleRate: Int, channels: Int,
      samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 <= b.length) new String(b, o, 4, "US-ASCII") else ""

  /** RIFF chunk walk: fmt (PCM only) then data. Returns None for
    * non-RIFF/non-PCM/truncated input rather than guessing. */
  def decodeWav(bytes: Array[Byte]): Option[DecodedAudio] = {
    try {
      if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
        return None
      var off = 12
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtSeen = false
      var data: Array[Byte] = null
      while (data == null && off + 8 <= bytes.length) {
        val id = tag(bytes, off); val len = le32(bytes, off + 4)
        val body = off + 8
        if (len < 0 || body + len > bytes.length) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val audioFormat = le16(bytes, body)
            if (audioFormat != 1) return None // linear PCM only
            channels = le16(bytes, body + 2)
            sampleRate = le32(bytes, body + 4)
            bits = le16(bytes, body + 14)
            fmtSeen = true
          case "data" =>
            if (!fmtSeen) return None
            data = java.util.Arrays.copyOfRange(bytes, body, body + len)
          case _ => () // LIST/INFO/fact/...: skip
        }
        off = body + len + (len & 1) // chunks are word-aligned
      }
      if (data == null || channels <= 0 || sampleRate <= 0) return None
      bits match {
        case 16 =>
          if (data.length % 2 != 0) return None
          val out = new Array[Short](data.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
            i += 1
          }
          Some(DecodedAudio(sampleRate, channels, out))
        case 8 =>
          val out = new Array[Short](data.length)
          var i = 0
          while (i < out.length) {
            out(i) = (((data(i) & 0xff) << 8) - 32768).toShort
            i += 1
          }
          Some(DecodedAudio(sampleRate, channels, out))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mono mixdown: each frame becomes the truncating integer mean of its
    * channels (truncation toward zero — the semantics both JVM `/` and
    * the oracle's integer division share, so q168 replays it exactly).
    * Mono input passes through untouched. */
  def mixdownMono(a: DecodedAudio): DecodedAudio = {
    if (a.channels == 1) a
    else {
      val n = a.nFrames
      val out = new Array[Short](n)
      var f = 0
      while (f < n) {
        var s = 0L
        var c = 0
        while (c < a.channels) { s += a.samples(f * a.channels + c); c += 1 }
        out(f) = (s / a.channels).toShort
        f += 1
      }
      DecodedAudio(a.sampleRate, 1, out)
    }
  }

  /** The classic dyadic low-pass taps [1,4,6,4,1]/16: unity DC gain
    * (taps sum to the scale) and an EXACT zero at Nyquist (alternating
    * signs cancel: 1−4+6−4+1 = 0) — the anti-alias pre-filter for 2×
    * decimation. MultimodalSpec pins both properties as theorems. */
  val Binomial5: Array[Int] = Array(1, 4, 6, 4, 1)

  /** Linear-phase integer FIR filter, applied independently per channel
    * with zero-padded edges:
    * `out[f] = (Σ_k taps(k) · x[f + k − (T−1)/2]) / scale`, the division
    * truncating toward zero (JVM `/` — the semantics the oracle's DuckDB
    * `//` shares, same convention as [[mixdownMono]]). Odd tap count
    * required (symmetric linear phase, integral group delay). All
    * arithmetic is exact Long; with `Σ|taps| ≤ scale · 1` the output
    * stays within Short by construction. */
  def firLowpass(a: DecodedAudio, taps: Array[Int] = Binomial5,
      scale: Int = 16): DecodedAudio = {
    require(taps.length % 2 == 1, "FIR tap count must be odd")
    require(scale > 0, "FIR scale must be positive")
    val c = (taps.length - 1) / 2
    val n = a.nFrames
    val out = new Array[Short](a.samples.length)
    var ch = 0
    while (ch < a.channels) {
      var f = 0
      while (f < n) {
        var s = 0L
        var k = 0
        while (k < taps.length) {
          val j = f + k - c
          if (j >= 0 && j < n) s += taps(k).toLong * a.samples(j * a.channels + ch)
          k += 1
        }
        out(f * a.channels + ch) = (s / scale).toShort
        f += 1
      }
      ch += 1
    }
    DecodedAudio(a.sampleRate, a.channels, out)
  }

  /** Anti-aliased 2× downsample: the binomial low-pass (exact Nyquist
    * zero) followed by [[decimate]](2) — the PROPER resampler next to
    * the unfiltered decimation baseline. */
  def lowpassDecimate2(a: DecodedAudio): DecodedAudio =
    decimate(firLowpass(a), 2)

  /** Integer-factor decimation: keep every `n`-th frame and divide the
    * sample rate by `n`. This is the unfiltered decimation BASELINE (the
    * aliasing-prone fast path a feature pipeline uses on already-band-
    * limited signals); [[lowpassDecimate2]] is the anti-aliased variant. */
  def decimate(a: DecodedAudio, n: Int): DecodedAudio = {
    require(n > 0, "decimation factor must be positive")
    require(a.sampleRate % n == 0,
      s"sample rate ${a.sampleRate} not divisible by $n")
    if (n == 1) a
    else {
      val frames = (a.nFrames + n - 1) / n
      val out = new Array[Short](frames * a.channels)
      var g = 0
      while (g < frames) {
        var c = 0
        while (c < a.channels) {
          out(g * a.channels + c) = a.samples(g * n * a.channels + c)
          c += 1
        }
        g += 1
      }
      DecodedAudio(a.sampleRate / n, a.channels, out)
    }
  }

  /** In-place fast Walsh–Hadamard transform in NATURAL (Hadamard) order —
    * the O(n log n) butterfly. Coefficients are exact integers:
    * `c(k) = Σ_n s(n) · (−1)^popcount(k AND n)`, the ±1 orthogonal basis
    * audio fingerprinting uses as its cheap spectral front end (every
    * arithmetic op is an integer add/sub, so two engines can replay the
    * coefficients bit for bit — no FFT float twiddles). `x.length` must
    * be a power of two. */
  def whtInPlace(x: Array[Long]): Array[Long] = {
    val n = x.length
    require(n > 0 && (n & (n - 1)) == 0, s"WHT length $n not a power of two")
    var h = 1
    while (h < n) {
      var i = 0
      while (i < n) {
        var j = i
        while (j < i + h) {
          val a = x(j); val b = x(j + h)
          x(j) = a + b; x(j + h) = a - b
          j += 1
        }
        i += 2 * h
      }
      h *= 2
    }
    x
  }

  /** Per-band WHT energies of a MONO stream: consecutive `block`-frame
    * windows (ragged tail dropped), per window the WHT butterfly, and
    * per band k the sum over windows of c(k)² — the integer spectral
    * signature a fingerprinting/quality stage keys on. Returns
    * (full blocks, energies[0..block)). Bounded exactly: |c| ≤
    * block·2^15, so one block's energy ≤ block²·2^30 — Long-safe up to
    * ~2^33 blocks at block = 8. */
  def whtBandEnergies(a: DecodedAudio, block: Int = 8): (Int, Array[Long]) = {
    require(a.channels == 1, s"whtBandEnergies expects mono, got ${a.channels}")
    val nBlocks = a.nFrames / block
    val energies = new Array[Long](block)
    val buf = new Array[Long](block)
    var b = 0
    while (b < nBlocks) {
      var n = 0
      while (n < block) { buf(n) = a.samples(b * block + n).toLong; n += 1 }
      whtInPlace(buf)
      var k = 0
      while (k < block) { energies(k) += buf(k) * buf(k); k += 1 }
      b += 1
    }
    (nBlocks, energies)
  }

  /** Splice an ancillary chunk between `fmt ` and `data` in a canonical
    * [[encodeWav]] output and patch the RIFF size — produces a
    * byte-different but content-identical file (the chunk walk skips
    * unknown chunks), the WAV analogue of a PNG filter-strategy change.
    * Payload is padded to word alignment per the RIFF rule. */
  def withAncillaryChunk(wav: Array[Byte], chunkTag: String,
      payload: Array[Byte]): Array[Byte] = {
    require(chunkTag.length == 4, "RIFF chunk tags are 4 bytes")
    require(wav.length >= 44 && tag(wav, 0) == "RIFF",
      "input is not a canonical encodeWav output")
    val padded = payload.length + (payload.length & 1)
    val insertAt = 36 // after RIFF(12) + "fmt "(8+16)
    val out = java.nio.ByteBuffer.allocate(wav.length + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, insertAt)
      .put(chunkTag.getBytes("US-ASCII")).putInt(payload.length)
      .put(payload).put(new Array[Byte](padded - payload.length))
      .put(wav, insertAt, wav.length - insertAt)
    val arr = out.array()
    val riffLen = le32(wav, 4) + 8 + padded
    arr(4) = (riffLen & 0xff).toByte
    arr(5) = ((riffLen >> 8) & 0xff).toByte
    arr(6) = ((riffLen >> 16) & 0xff).toByte
    arr(7) = ((riffLen >> 24) & 0xff).toByte
    arr
  }

  /** Minimal PCM16 WAV encoder (canonical 44-byte header + data). */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "sampleRate/channels must be positive")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}

package graft.multimodal

import java.io.ByteArrayInputStream

/** REAL media decode, JDK-only: `javax.imageio` for images (PNG/JPEG/
  * GIF/BMP — the formats the JDK ships readers for) and
  * `javax.sound.sampled` for RIFF/WAVE PCM audio.
  *
  * This is the branch behind [[Multimodal.decodeStub]]: a cheap
  * magic-byte sniff decides per row whether the blob is a container
  * the JDK can decode — only then does the decoder run, so tables of
  * non-media blobs (the testdata's utf-8 text bytes) never pay a
  * speculative decode attempt and keep their deterministic stub
  * metadata (the hash gate depends on that). A real image/audio lake
  * takes the real branch row by row with no plan change: the decode
  * still happens inside the scan stage (mapPartitions), only scalars
  * and fingerprints leave it, and nothing blob-sized ever shuffles.
  *
  * The reference has no media surface at all (SURVEY §2 — tables
  * only); this is the extension tier's production-shape plumbing.
  */
object MediaDecode {

  /** Container sniff by magic bytes: "png" | "jpeg" | "gif" | "bmp" |
    * "wav" | "" (unknown → caller falls back to the stub). Constant
    * work per row; never throws. */
  def sniff(bytes: Array[Byte]): String = {
    def at(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 12) ""
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
      "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
      "gif"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "wav"
    else ""
  }

  /** Real metadata for a decodable blob; None → stub fallback.
    * Images: actual pixel dimensions, n_frames = 1 (ImageIO decodes
    * the first frame; multi-frame GIFs would enumerate the reader's
    * image count — not needed for the fingerprint path). Audio: frame
    * count from the WAV header, width/height 0. */
  def decodeMeta(bytes: Array[Byte]): Option[Multimodal.MediaMeta] =
    sniff(bytes) match {
      case "" => None
      case "wav" =>
        pcmSamples(bytes).map(s => Multimodal.MediaMeta(
          bytes.length.toLong, "wav", 0, 0, s.length))
      case fmt =>
        decodeImage(bytes).map(img => Multimodal.MediaMeta(
          bytes.length.toLong, fmt, img.getWidth, img.getHeight, 1))
    }

  private def decodeImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** REAL aHash luminance grid: decode, average-pool the actual pixels
    * into `grid`×`grid` cells of mean ITU-R 601 luma (0–255, integer
    * arithmetic — sums of bytes divided once, so the grid is exact and
    * reproducible). Drop-in replacement for the md5-derived stub grid
    * in q177's pipeline: everything downstream of the 64-int array
    * (threshold bits, 16-bit bands, banded Hamming join) is unchanged. */
  def luminanceGrid(bytes: Array[Byte], grid: Int = 8)
      : Option[Array[Int]] =
    decodeImage(bytes).filter(i => i.getWidth >= grid && i.getHeight >= grid)
      .map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Int](grid * grid)
        var gy = 0
        while (gy < grid) {
          val y0 = gy * h / grid; val y1 = (gy + 1) * h / grid
          var gx = 0
          while (gx < grid) {
            val x0 = gx * w / grid; val x1 = (gx + 1) * w / grid
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                // ITU-R 601 integer luma: (299R + 587G + 114B) / 1000
                sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
                x += 1
              }
              y += 1
            }
            out(gy * grid + gx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
            gx += 1
          }
          gy += 1
        }
        out
      }

  /** Real PCM samples from a RIFF/WAVE blob, normalized to signed Int
    * (16-bit → as-is, 8-bit unsigned → recentred ×256); None when the
    * header doesn't parse. Streams through the JDK's AudioSystem, so
    * compressed WAV variants the JDK knows (A-law/µ-law) decode too. */
  def pcmSamples(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val in = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val data = in.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        if (bits == 16) {
          val n = data.length / 2
          val out = new Array[Int](n)
          val le = !fmt.isBigEndian
          var i = 0
          while (i < n) {
            val (lo, hi) = if (le) (data(2 * i), data(2 * i + 1))
              else (data(2 * i + 1), data(2 * i))
            out(i) = ((hi << 8) | (lo & 0xff)).toShort.toInt
            i += 1
          }
          Some(out)
        } else if (bits == 8) {
          Some(data.map(b => ((b & 0xff) - 128) * 256))
        } else None
      } finally in.close()
    } catch { case _: Exception => None }

  /** Short-time energy over real PCM: Σ(s/256)² per [[Multimodal]]-
    * style win/hop frame — the real-audio twin of q183's in-scan
    * [[graft.functions.FrameEnergies]] (which frames raw bytes). The
    * /256 keeps 16-bit energies in the same magnitude family as the
    * byte-domain stub so downstream thresholds transfer. */
  def shortTimeEnergy(samples: Array[Int], win: Int, hop: Int)
      : Array[Long] = {
    if (samples.length < win) Array.empty
    else Array.tabulate((samples.length - win) / hop + 1) { f =>
      var e = 0L
      var i = f * hop
      val end = f * hop + win
      while (i < end) {
        val s = samples(i) / 256
        e += s.toLong * s
        i += 1
      }
      e
    }
  }
}

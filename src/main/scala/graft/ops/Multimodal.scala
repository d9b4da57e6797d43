package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * opaque binary payloads + typed metadata, with decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The codecs are REAL, JDK-native ones:
  *  - image: PNG encode/decode via javax.imageio.ImageIO;
  *  - audio: WAV (RIFF, 16-bit PCM) via javax.sound.sampled.AudioSystem;
  *  - video: an MJPEG-style container of PNG frames (magic | frameCount |
  *    per-frame length-prefixed PNG), frame-sampled and decoded with
  *    ImageIO per frame.
  *
  * The synthetic payloads are deterministic functions of the media id, so
  * every decoded feature (dimensions, channels, frame count, mean of the
  * first channel) is independently derivable by the SQL oracle — the
  * check proves the decoders return exactly what was encoded.
  */
object Multimodal {

  val VideoMagic: Int = 0x47465456 // "GFTV"

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, width: Int,
                                 height: Int, channels: Int, n_frames: Int,
                                 mean0: Double)

  // --- deterministic payload parameters (mirrored by the SQL oracle) ---
  def imageDims(id: Long): (Int, Int) = (16 + (id % 48).toInt, 16 + (id % 32).toInt)
  def imageColor(id: Long): (Int, Int, Int) =
    (((id * 37) % 256).toInt, ((id * 59) % 256).toInt, ((id * 83) % 256).toInt)
  def audioSamples(id: Long): Int = 256 + (id % 512).toInt
  def audioAmplitude(id: Long): Int = ((id % 2000) - 1000).toInt
  def videoFrames(id: Long): Int = 2 + (id % 4).toInt
  def videoSide(id: Long): Int = 16 + (id % 8).toInt

  // ------------------------------------------------------------------
  // Encoders (used by the synthesizer; deterministic given the id)

  def encodePng(width: Int, height: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val packed = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, packed); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(VideoMagic)
    dos.writeInt(frames.length)
    frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
    out.toByteArray
  }

  /** Deterministic synthetic media table: real PNG/WAV/video payloads
    * derived from the id; kind cycles image/audio/video.
    */
  def synthesize(spark: SparkSession, n: Long, numPartitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).map { id =>
      (id % 3) match {
        case 0 =>
          val (w, h) = imageDims(id)
          MediaRow(id, "image", encodePng(w, h, imageColor(id)))
        case 1 =>
          val a = audioAmplitude(id).toShort
          MediaRow(id, "audio", encodeWav(Array.fill(audioSamples(id))(a)))
        case _ =>
          val side = videoSide(id)
          val (r, g, b) = imageColor(id)
          val frames = (0 until videoFrames(id)).map { f =>
            encodePng(side, side, ((r + 5 * f) % 256, g, b))
          }
          MediaRow(id, "video", encodeVideo(frames))
      }
    }
  }

  // ------------------------------------------------------------------
  // Decoders

  /** Decode a PNG/JPEG/BMP/GIF payload: (width, height, bands, meanRed). */
  def decodeImage(content: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) return None
    var sum = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum += (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    Some((img.getWidth, img.getHeight, img.getRaster.getNumBands,
      sum / (img.getWidth.toLong * img.getHeight)))
  }

  /** Decode a WAV payload: (nSamples, channels, meanSampleValue). */
  def decodeWav(content: Array[Byte]): Option[(Int, Int, Double)] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      val n = data.length / 2
      var sum = 0.0
      var i = 0
      while (i < n) {
        sum += ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toDouble
        i += 1
      }
      Some((n, fmt.getChannels, if (n == 0) 0.0 else sum / n))
    } catch { case _: Exception => None }
  }

  /** Split a video container into its PNG frame payloads. */
  def videoFramePayloads(content: Array[Byte]): Option[Array[Array[Byte]]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
    try {
      if (in.readInt() != VideoMagic) return None
      val n = in.readInt()
      Some(Array.fill(n) {
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        buf
      })
    } catch { case _: Exception => None }
  }

  /** Deterministic frame sampling offsets (every `sampleEvery`-th frame). */
  def frameOffsets(nFrames: Int, sampleEvery: Int): Array[Int] =
    (0 until nFrames by sampleEvery).toArray

  /** Decode + feature extraction as a partition-preserving batch stage:
    * one pass per partition, no shuffle, codec state reusable per batch.
    * mean0 is the mean of the first channel (red for images, PCM sample
    * value for audio, red of frame 0 for video).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        row.kind match {
          case "image" =>
            decodeImage(row.content).map { case (w, h, bands, mean) =>
              MediaFeatures(row.media_id, row.kind, w, h, bands, 1, mean)
            }
          case "audio" =>
            decodeWav(row.content).map { case (n, ch, mean) =>
              MediaFeatures(row.media_id, row.kind, n, 1, ch, n, mean)
            }
          case _ =>
            videoFramePayloads(row.content).flatMap { frames =>
              // zero-frame containers are malformed media, skipped like
              // any other undecodable payload
              frames.headOption.flatMap(decodeImage).map {
                case (w, h, bands, mean) =>
                  MediaFeatures(row.media_id, row.kind, w, h, bands,
                    frames.length, mean)
              }
            }
        }
      }
    }
  }

  /** Real image resize preserving aspect ratio: decode, scale so the max
    * side is `maxSide`, re-encode PNG.
    */
  def resizeImage(content: Array[Byte], maxSide: Int): Option[Array[Byte]] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) return None
    val scale = maxSide.toDouble / math.max(img.getWidth, img.getHeight)
    if (scale >= 1.0) return Some(content)
    val w = math.max(1, (img.getWidth * scale).toInt)
    val h = math.max(1, (img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** Sample every `sampleEvery`-th frame of a video payload, decoded. */
  def sampleFrames(content: Array[Byte], sampleEvery: Int): Array[(Int, Int, Int, Double)] =
    videoFramePayloads(content) match {
      case Some(frames) =>
        frameOffsets(frames.length, sampleEvery).flatMap(i => decodeImage(frames(i)))
      case None => Array.empty
    }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: images / audio /
  * video travel as opaque `BinaryType` columns next to typed metadata,
  * and the per-record operations (decode, feature-extract, resize,
  * frame-sample) run as partition-batched typed transforms —
  * `Dataset.mapPartitions` is the JVM analog of `mapInPandas`: one
  * iterator per partition, records processed in a tight loop without
  * per-row planning overhead, output schema declared via Encoders.
  *
  * STUB BOUNDARY (clearly marked): the image/audio codecs are not in
  * this environment, so `decodeBytes` parses a deterministic fake
  * container format written by the `fabricate*` functions instead of
  * JPEG/WAV/MP4. Everything AROUND the codec — binary schema, typed
  * metadata, partition batching, frame explode shapes, embedding
  * handoff into [[Similarity]] — is real, tested, and would be
  * unchanged with a real codec on the classpath.
  *
  * Container layout (big-endian ints): magic(4) | w(4) | h(4) |
  * payload(w*h bytes, splitmix-derived). Video: magic | nFrames | w |
  * h | frames(nFrames*w*h).
  */
object Multimodal {

  val ImageMagic = 0x47494D47 // "GIMG"
  val VideoMagic = 0x47564944 // "GVID"
  val AudioMagic = 0x47415544 // "GAUD"

  @inline private def mix64(x0: Long): Long = graft.plans.Kernels.mix64(x0)

  // ----------------------------------------------------- fabrication

  /** Deterministic fake image bytes from a seed: dimensions derive from
    * the seed, payload from splitmix64. STUB stand-in for real encoded
    * images; lets oracle queries verify the decode loop independently.
    */
  def fabricateImage(seed: Long): Array[Byte] = {
    val w = 16 + (math.floorMod(seed, 48L)).toInt
    val h = 16 + (math.floorMod(seed * 7, 48L)).toInt
    val out = java.nio.ByteBuffer.allocate(12 + w * h)
    out.putInt(ImageMagic).putInt(w).putInt(h)
    var i = 0
    while (i < w * h) { out.put((mix64(seed * 1048576 + i) & 0xFF).toByte); i += 1 }
    out.array()
  }

  /** Deterministic fake video: `1 + seed % 24` frames of 8×8. */
  def fabricateVideo(seed: Long): Array[Byte] = {
    val nFrames = 1 + math.floorMod(seed, 24L).toInt
    val (w, h) = (8, 8)
    val out = java.nio.ByteBuffer.allocate(16 + nFrames * w * h)
    out.putInt(VideoMagic).putInt(nFrames).putInt(w).putInt(h)
    var i = 0
    while (i < nFrames * w * h) { out.put((mix64(seed * 4096 + i) & 0xFF).toByte); i += 1 }
    out.array()
  }

  /** Deterministic fake audio: header carries an arithmetic-derivable
    * sample rate and length, payload is 8-bit PCM from splitmix64.
    * Layout: magic(4) | sampleRate(4) | nSamples(4) | payload(nSamples).
    */
  def fabricateAudio(seed: Long): Array[Byte] = {
    val rate = 8000 + math.floorMod(seed, 3L).toInt * 4000
    val n = 1000 + math.floorMod(seed * 11, 3000L).toInt
    val out = java.nio.ByteBuffer.allocate(12 + n)
    out.putInt(AudioMagic).putInt(rate).putInt(n)
    var i = 0
    while (i < n) { out.put((mix64(seed * 65536 + i) & 0xFF).toByte); i += 1 }
    out.array()
  }

  private val fabricateImageUdf = udf(fabricateImage _)
  private val fabricateVideoUdf = udf(fabricateVideo _)
  private val fabricateAudioUdf = udf(fabricateAudio _)
  def fabricateImageCol(seed: org.apache.spark.sql.Column) = fabricateImageUdf(seed)
  def fabricateVideoCol(seed: org.apache.spark.sql.Column) = fabricateVideoUdf(seed)
  def fabricateAudioCol(seed: org.apache.spark.sql.Column) = fabricateAudioUdf(seed)

  // ---------------------------------------------------------- decode

  case class ImageMeta(id: Long, width: Int, height: Int, n_bytes: Long,
                       mean_intensity: Double)

  /** Decode + feature-extract over a binary image column, batched per
    * partition. Input: (id, content). The header parse + intensity
    * stats are the STUB codec; the partition-iterator shape is the real
    * 100-TB plumbing (no per-row UDF setup, no driver collect).
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = java.nio.ByteBuffer.wrap(bytes)
        require(b.getInt() == ImageMagic, s"not a fake image: id $id")
        val w = b.getInt(); val h = b.getInt()
        var sum = 0L
        var i = 0
        while (i < w * h) { sum += (bytes(12 + i) & 0xFF); i += 1 }
        ImageMeta(id, w, h, w.toLong * h, sum.toDouble / (w * h))
      }
    }(Encoders.product[ImageMeta]).toDF()
  }

  /** Resize: deterministic nearest-neighbor downsample of the fake
    * payload to (newW × newH) — new binary out, same container format.
    */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
                   newW: Int, newH: Int): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val b = java.nio.ByteBuffer.wrap(bytes)
        require(b.getInt() == ImageMagic)
        val w = b.getInt(); val h = b.getInt()
        val out = java.nio.ByteBuffer.allocate(12 + newW * newH)
        out.putInt(ImageMagic).putInt(newW).putInt(newH)
        var y = 0
        while (y < newH) {
          var x = 0
          while (x < newW) {
            val sx = x * w / newW; val sy = y * h / newH
            out.put(bytes(12 + sy * w + sx))
            x += 1
          }
          y += 1
        }
        (id, out.array())
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("id", "content")
  }

  case class Frame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every `everyN`-th frame of a video binary becomes
    * its own row (id, frame_idx, frame bytes) — the explode shape a
    * vision-model preprocessing pipeline feeds from.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   everyN: Int): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val b = java.nio.ByteBuffer.wrap(bytes)
        require(b.getInt() == VideoMagic, s"not a fake video: id $id")
        val n = b.getInt(); val w = b.getInt(); val h = b.getInt()
        val frameSize = w * h
        (0 until n by everyN).map { f =>
          val frame = java.util.Arrays.copyOfRange(bytes, 16 + f * frameSize,
            16 + (f + 1) * frameSize)
          Frame(id, f, frame)
        }
      }
    }(Encoders.product[Frame]).toDF()
  }

  case class AudioWindow(id: Long, sample_rate: Int, window_idx: Int,
                         n_samples: Int, energy: Double)

  /** Windowed audio feature extraction: each `windowSamples`-sample
    * window of an audio binary becomes a row (id, rate, window index,
    * samples in window, mean-square energy) — the audio analog of
    * [[sampleFrames]]'s explode shape, feeding an acoustic-model
    * preprocessing pipeline. The last window may be short; energy is
    * over the signed 8-bit samples.
    */
  def audioWindows(df: DataFrame, idCol: String, binCol: String,
                   windowSamples: Int): DataFrame = {
    require(windowSamples > 0)
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val b = java.nio.ByteBuffer.wrap(bytes)
        require(b.getInt() == AudioMagic, s"not a fake audio: id $id")
        val rate = b.getInt(); val n = b.getInt()
        val nWin = (n + windowSamples - 1) / windowSamples
        (0 until nWin).map { w =>
          val start = w * windowSamples
          val end = math.min(start + windowSamples, n)
          var sum = 0.0
          var i = start
          while (i < end) {
            val s = bytes(12 + i).toDouble // signed 8-bit sample
            sum += s * s
            i += 1
          }
          AudioWindow(id, rate, w, end - start, sum / (end - start))
        }
      }
    }(Encoders.product[AudioWindow]).toDF()
  }

  /** Binary → deterministic pseudo-embedding (unit-norm Float array):
    * the STUB for a learned vision/audio encoder, shaped exactly like
    * the real thing so the output feeds [[Similarity.cosineTopK]] /
    * [[Dedup.embeddingNearDupPairs]] unchanged.
    */
  def embedBinary(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          v(i % dim) += (bytes(i) & 0xFF) / 255.0f - 0.5f
          i += 1
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
        (id, if (norm == 0) v else v.map(_ / norm))
      }
    }(Encoders.tuple(Encoders.scalaLong,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()))
      .toDF("id", "embedding")
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-pipeline north star).
  *
  * Media travels as an opaque `binary` column plus typed metadata; decode /
  * feature-extraction runs per-partition over an iterator (constant memory,
  * no driver collect, one task per partition — the shape a real
  * decoder-library call would slot into). The decode itself is a STUB: this
  * container has no image/audio codecs, so [[FakeDecoder]] derives
  * deterministic pseudo-features from the bytes. The Spark-side plumbing —
  * schema, batching, partition flow — is real and tested.
  */
object Multimodal {

  /** A media row: opaque payload + metadata (the schema a binary-asset lake
    * table would carry). */
  case class MediaRow(doc_id: Long, media_type: String, n_bytes: Long,
                      content: Array[Byte])

  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           checksum: Long, features: Array[Double])

  /** STUB decoder — deterministic fake standing in for e.g. JPEG decode +
    * embedding. Real deployments swap this object out; the pipeline around
    * it is unchanged. */
  object FakeDecoder {
    val dim = 8
    // integer byte-sums per slot, divided once: exact in FP regardless of
    // accumulation order, so any engine recomputing it gets identical bits
    // (the DuckDB oracle does, via hex(encode(text)))
    def decode(content: Array[Byte]): Array[Double] = {
      val s = new Array[Long](dim)
      var i = 0
      while (i < content.length) { s(i % dim) += (content(i) & 0xFF).toLong; i += 1 }
      val f = new Array[Double](dim)
      i = 0
      while (i < dim) { f(i) = s(i) / 255.0; i += 1 }
      f
    }
    def checksum(content: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      h
    }
  }

  /** documents.text reinterpreted as a binary media payload — the fixture
    * stand-in for an image/audio bytes column. */
  def asMedia(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 2 === 0, "image/fake").otherwise("audio/fake").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      col("text").cast("binary").as("content")
    ).as[MediaRow]
  }

  /** Per-partition decode + featurize: the mapPartitions shape that a
    * batched native decoder (or Arrow-batched python worker) plugs into. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes,
          FakeDecoder.checksum(r.content), FakeDecoder.decode(r.content))
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stub deterministically truncates/pads the payload to `targetBytes`
    * so downstream batching sees realistic size changes. */
  def resizeStub(media: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val out = java.util.Arrays.copyOf(r.content, targetBytes)
      r.copy(n_bytes = targetBytes.toLong, content = out)
    })
  }

  /** STUB frame sampling: a video decoder would emit every Nth frame; the
    * stub emits every Nth `frameBytes`-sized slice of the payload as its
    * own MediaRow (doc_id preserved, media_type tagged per frame). */
  def frameSampleStub(media: Dataset[MediaRow], frameBytes: Int,
                      everyNth: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val nFrames = r.content.length / frameBytes
      (0 until nFrames by everyNth).iterator.map { f =>
        val slice = java.util.Arrays.copyOfRange(
          r.content, f * frameBytes, (f + 1) * frameBytes)
        MediaRow(r.doc_id, s"${r.media_type};frame=$f", frameBytes.toLong, slice)
      }
    })
  }

  /** Declared query: metadata + content digest per media row (the part of
    * the pipeline that is expressible in any engine, used as the oracle
    * anchor for the binary plumbing). */
  def multimodalExtractMeta(documents: DataFrame): DataFrame =
    asMedia(documents).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("doc_id")

  /** Declared query exercising [[frameSampleStub]] end-to-end: every 2nd
    * complete 64-byte frame's energy (byte-sum / 255 — exact integer
    * arithmetic divided once, so bit-identical in any engine). This is
    * the video-frame-sampling plumbing made real: slice fan-out in
    * mapPartitions, per-frame kernel, ordered (doc, frame) output; a real
    * codec replaces the energy kernel, the flow is unchanged. The DuckDB
    * oracle recomputes the identical frames byte-for-byte from
    * hex(encode(text)). */
  def multimodalFrameEnergies(documents: DataFrame, frameBytes: Int = 64,
                              everyNth: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    frameSampleStub(asMedia(documents), frameBytes, everyNth)
      .map { r =>
        val fno = r.media_type.substring(r.media_type.indexOf("frame=") + 6).toLong
        var s = 0L
        r.content.foreach(b => s += (b & 0xFF).toLong)
        (r.doc_id, fno, s / 255.0)
      }
      .toDF("doc_id", "frame_no", "energy")
      .orderBy("doc_id", "frame_no")
  }

  /** Perceptual-hash-style near-dup detection for media payloads — the
    * image-dedup analogue of [[graft.ext.Dedup.dedupSimhash]] for text: a
    * 16-bit blockhash signature (bit b set iff the byte-sum of slot-b
    * bytes, i % 16 == b, exceeds the per-block mean — the integer compare
    * `sum·16 > total`, exact in any engine), candidates via 3-chunk
    * pigeonhole (hamming ≤ 2 guarantees an equal 6/5/5-bit chunk, so the
    * pair search is an equi-join, never all-pairs), verified with
    * bit_count(xor). A real pHash/dHash swaps in for the byte kernel; the
    * signature→band→verify flow — the part that must scale — is
    * unchanged. DuckDB recomputes identical signatures from
    * hex(encode(text)), so the whole pipeline is a hash-match gate. */
  def multimodalBlockhash(documents: DataFrame, maxHamming: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sig = asMedia(documents).map { r =>
      val s = new Array[Long](16)
      var i = 0
      while (i < r.content.length) { s(i % 16) += (r.content(i) & 0xFFL); i += 1 }
      var total = 0L
      s.foreach(total += _)
      var h = 0
      var b = 0
      while (b < 16) { if (s(b) * 16 > total) h |= (1 << b); b += 1 }
      (r.doc_id, h)
    }.toDF("doc_id", "bh")
    val chunks = sig.select(col("doc_id"), col("bh"),
      explode(array(
        struct(lit(0).as("chunk"), col("bh").bitwiseAND(63).as("key")),
        struct(lit(1).as("chunk"), shiftright(col("bh"), 6).bitwiseAND(31).as("key")),
        struct(lit(2).as("chunk"), shiftright(col("bh"), 11).bitwiseAND(31).as("key"))
      )).as("ck"))
      .select(col("doc_id"), col("bh"), col("ck.chunk"), col("ck.key"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.bh").as("ha"), col("b.bh").as("hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb")).cast("long")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Declared query exercising the full mapPartitions decode path. The
    * fake decoder is pure integer/byte arithmetic, so the DuckDB oracle
    * recomputes checksum and features byte-for-byte from hex(encode(text))
    * — a hard hash-match gate on the whole decode plumbing. */
  def multimodalFakeFeatures(documents: DataFrame): DataFrame = {
    val feats = extractFeatures(asMedia(documents)).toDF()
    feats.select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("checksum"),
        element_at(col("features"), 1).as("f0"),
        element_at(col("features"), 2).as("f1"))
      .orderBy("doc_id")
  }

  /** Voice-activity-style segmentation over the frame stream — the audio
    * sibling of [[multimodalFrameEnergies]]: frames whose energy clears a
    * threshold are "active", and maximal runs of consecutive active
    * frames collapse to (start, end, length) segments — the VAD pass an
    * audio-training pipeline runs to cut silence before transcription.
    * Real VAD swaps into the energy kernel; the segmentation — the part
    * that must scale — is the gaps-and-islands row_number difference
    * (frame_no − rank is constant along an unbroken active run), pure
    * integer arithmetic on the frame ids, one window + one agg on the
    * doc key. Energy is exact (integer byte-sum / 255, the frame-energy
    * contract), so the threshold compare lands identically in both
    * engines and the DuckDB oracle recomputes the very same segments
    * from hex(encode(text)). */
  def multimodalVadSegments(documents: DataFrame, frameBytes: Int = 64,
                            threshold: Double = 23.7): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val frames = frameSampleStub(asMedia(documents), frameBytes, everyNth = 1)
      .map { r =>
        val fno = r.media_type.substring(r.media_type.indexOf("frame=") + 6).toLong
        var s = 0L
        r.content.foreach(b => s += (b & 0xFF).toLong)
        (r.doc_id, fno, s / 255.0, r.content.length)
      }
      .toDF("doc_id", "frame_no", "energy", "n_bytes")
      // complete frames only (the tail fragment has fewer bytes and a
      // spuriously low energy — same cnt=64 gate as frame_energies)
      .filter(col("n_bytes") === frameBytes)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    frames
      .filter(col("energy") > threshold)
      .withColumn("island", col("frame_no") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("frame_no")).as("seg_start"), max(col("frame_no")).as("seg_end"),
        count(lit(1)).as("n_frames"))
      .select(col("doc_id"), col("seg_start"), col("seg_end"), col("n_frames"))
      .orderBy("doc_id", "seg_start")
  }

  /** r5c: landmark audio fingerprint — the Shazam-style invariant next to
    * [[multimodalBlockhash]]'s image pHash: the SIGN of consecutive
    * frame-energy deltas, packed into one integer. Energy-delta signs
    * survive volume scaling and re-encoding noise (absolute energies
    * don't), which is why every audio-dedup pipeline fingerprints deltas.
    * Kernel: 32-byte frames → integer byte-sum energies → bit i set iff
    * energy[i+1] > energy[i], first 48 deltas (fits a positive int64 in
    * any engine). Per-doc map-side kernel (a real spectrogram landmark
    * extractor swaps in; the signature→bucket flow is unchanged) + ONE
    * fingerprint window for bucket sizes — match discovery is an
    * equi-GROUP, never a pair join. Pure integer arithmetic ⇒ the DuckDB
    * oracle rebuilds identical fingerprints from hex(encode(text)). */
  def multimodalAudioFingerprint(documents: DataFrame, frameBytes: Int = 32,
                                 maxDeltas: Int = 48): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sig = asMedia(documents).map { r =>
      val nFrames = r.content.length / frameBytes
      val e = new Array[Long](nFrames)
      var f = 0
      while (f < nFrames) {
        var s = 0L
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { s += (r.content(i) & 0xFFL); i += 1 }
        e(f) = s
        f += 1
      }
      var fp = 0L
      var d = 0
      while (d < nFrames - 1 && d < maxDeltas) {
        if (e(d + 1) > e(d)) fp |= (1L << d)
        d += 1
      }
      (r.doc_id, nFrames.toLong, fp)
    }.toDF("doc_id", "n_frames", "fingerprint")
    sig
      .withColumn("n_matching",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
      .orderBy("doc_id")
  }

  /** r5c6: keyframe selection — for each [[multimodalVadSegments]]-style
    * active shot, keep the single highest-energy frame (ties to the
    * earliest frame number): the thumbnail/representative-frame pass a
    * video-training pipeline runs after shot detection so downstream
    * encoders see one frame per shot instead of every frame. Reuses the
    * identical segmentation contract (64-byte complete frames, exact
    * integer byte-sum / 255 energies, threshold compare, gaps-and-
    * islands) so shots here and segments there can never disagree; the
    * argmax is one rank over the (doc, island) key — energies are exact
    * dyadic rationals, so the desc compare lands identically in DuckDB.
    * A real decoder swaps into the frame kernel; the shot→argmax plan —
    * the part that must scale — is unchanged. */
  def multimodalKeyframeSelect(documents: DataFrame, frameBytes: Int = 64,
                               threshold: Double = 23.7): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val frames = frameSampleStub(asMedia(documents), frameBytes, everyNth = 1)
      .map { r =>
        val fno = r.media_type.substring(r.media_type.indexOf("frame=") + 6).toLong
        var s = 0L
        r.content.foreach(b => s += (b & 0xFF).toLong)
        (r.doc_id, fno, s / 255.0, r.content.length)
      }
      .toDF("doc_id", "frame_no", "energy", "n_bytes")
      .filter(col("n_bytes") === frameBytes)
    val order = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    val active = frames
      .filter(col("energy") > threshold)
      .withColumn("island", col("frame_no") - row_number().over(order))
    val shot = Window.partitionBy(col("doc_id"), col("island"))
    active
      .withColumn("seg_start", min(col("frame_no")).over(shot))
      .withColumn("seg_end", max(col("frame_no")).over(shot))
      .withColumn("rk", row_number().over(
        shot.orderBy(col("energy").desc, col("frame_no"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("seg_start"), col("seg_end"),
        col("frame_no").as("keyframe_no"), col("energy").as("key_energy"))
      .orderBy("doc_id", "seg_start")
  }
}

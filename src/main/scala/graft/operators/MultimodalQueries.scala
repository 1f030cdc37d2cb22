package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (SURVEY.md §2.12): media as opaque
  * `binary` columns with typed metadata, joined to text + embeddings.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * deterministic fake (parse synthetic header fields out of the bytes) —
  * clearly marked below — while everything Spark-side is real and tested:
  * the binary column plumbing, the doc↔embedding join, the
  * `mapPartitions` batch shape a Pandas-UDF/mapInPandas decode would use
  * on a real cluster, and the partition-preserving schema handoff.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  def specs: Seq[QuerySpec] = Seq(

    // Text ⋈ embedding bundling: one row per document with its vector and
    // typed metadata. documents.doc_id ↔ embeddings.vec_id (FIXTURES.md).
    // Equi-join on the shared key — sort-merge at scale, broadcast when
    // one side is a sampled subset.
    QuerySpec(
      "multimodal_join",
      (s, dir) =>
        docs(s, dir).join(emb(s, dir),
            col("doc_id") === col("vec_id"))
          .select(
            col("doc_id"), col("lang"), col("label"),
            col("n_chars"),
            size(col("embedding")).as("dim"),
            round(sqrt(aggregate(col("embedding").cast("array<double>"),
              lit(0.0), (acc, x) => acc + x * x)), 6).as("emb_norm"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, label, n_chars,
                     CAST(LEN(embedding) AS INT) AS dim,
                     ROUND(SQRT((SELECT SUM(x*x) FROM
                       (SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS x))), 6) AS emb_norm
              FROM documents JOIN embeddings ON doc_id = vec_id
              ORDER BY doc_id""")),

    // Binary decode via mapPartitions — the media path. The 16-byte blob
    // is a STUBBED "image": md5(text) standing in for real bytes (no
    // codecs in this container); the decode kernel parses big-endian
    // header fields exactly as a real one would parse a PNG/JPEG header.
    // Batch shape is the real one: one partition in, one iterator out, no
    // driver collect — swap `fakeDecode` for an actual codec and the plan
    // is unchanged at 100 TB.
    QuerySpec(
      "multimodal_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val withBlob = docs(s, dir)
          .select(col("doc_id"), unhex(md5(col("text"))).as("media"))
          .as[(Long, Array[Byte])]
        withBlob.mapPartitions { iter =>
          iter.map { case (id, bytes) =>
            // STUB decode: real codec would go here (mapInPandas twin:
            // pandas batches of bytes → feature frames).
            val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian default
            val width = bb.getShort(0) & 0xFFFF
            val height = bb.getShort(2) & 0xFFFF
            val channels = (bytes(4) & 0xFF) % 4 + 1
            (id, width, height, channels, bytes.length)
          }
        }.toDF("doc_id", "width", "height", "channels", "n_bytes")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     ('0x'||SUBSTR(MD5(text),1,4))::INT AS width,
                     ('0x'||SUBSTR(MD5(text),5,4))::INT AS height,
                     ('0x'||SUBSTR(MD5(text),9,2))::INT % 4 + 1 AS channels,
                     16 AS n_bytes
              FROM documents ORDER BY doc_id""")),

    // The REAL byte path of the image tier: genuine BMP files (24-bit,
    // BITMAPFILEHEADER + BITMAPINFOHEADER + stride-padded rows — a pure
    // public struct layout, no codec needed) are encoded per doc with
    // dims derived from doc_id and pixels from an md5 chain, then
    // decoded by MediaCodecs.parseBmp reading the actual little-endian
    // header offsets and walking rows by the 4-byte-aligned stride
    // (padding skipped — arithmetic a fake header never exercises). The
    // oracle recomputes every field independently: dims from doc_id,
    // file size from the stride formula, pixel sum by slicing the same
    // md5 hex at the same stride positions. Encoder and parser are
    // independent layout implementations, so agreement is evidence, not
    // tautology. Same mapPartitions batch shape as multimodal_decode.
    QuerySpec(
      "multimodal_decode_bmp",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        docs(s, dir)
          .select(col("doc_id"),
            concat(md5(col("text")), md5(md5(col("text"))),
              md5(md5(md5(col("text"))))).as("hx"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, hx) =>
              val pix = hx.grouped(2).map(h => Integer.parseInt(h, 16).toByte)
              val bmp = graft.functions.MediaCodecs.encodeBmp24(
                (id % 4 + 2).toInt, (id % 3 + 1).toInt, pix)
              val hdr = graft.functions.MediaCodecs.parseBmp(bmp)
              (id, hdr.width, hdr.height, hdr.bpp, hdr.fileSize,
                graft.functions.MediaCodecs.bmpPixelSum(bmp))
            }
          }
          .toDF("doc_id", "width", "height", "bpp", "file_size", "px_sum")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id,
                       MD5(text)||MD5(MD5(text))||MD5(MD5(MD5(text))) AS hx,
                       CAST(doc_id % 4 + 2 AS INT) AS width,
                       CAST(doc_id % 3 + 1 AS INT) AS height
                FROM documents),
              g AS (
                SELECT doc_id, hx, width, height,
                       ((width*3 + 3)//4)*4 AS stride
                FROM d),
              p AS (
                SELECT doc_id, width, height, stride,
                       ('0x'||SUBSTR(hx, CAST((r*stride + c)*2 + 1 AS INT), 2))::BIGINT AS byte
                FROM g,
                     (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS r),
                     (SELECT UNNEST(GENERATE_SERIES(0, 14)) AS c)
                WHERE r < height AND c < width*3)
              SELECT doc_id, width, height, 24 AS bpp,
                     CAST(54 + stride*height AS INT) AS file_size,
                     CAST(SUM(byte) AS BIGINT) AS px_sum
              FROM p GROUP BY doc_id, width, height, stride
              ORDER BY doc_id""")),

    // The COMPRESSED-format class (BMP/WAV are raw struct layouts): real
    // PNG containers per doc — chunk framing with CRC32, zlib IDAT via
    // the JDK Inflater, and the five adaptive scanline filters rotated
    // across rows so EVERY reversal (Sub/Up/Average/Paeth) is on the
    // hash path. The decoder walks chunks, verifies CRCs, inflates, and
    // reverses filters back to the raw RGB bytes; the oracle recomputes
    // the pixel sum from the SAME md5 chain — filters + deflate must
    // round-trip exactly or the sum breaks. Dims sized so the 48-byte
    // chain covers the largest 4x4 RGB image. Same mapPartitions batch
    // shape as the other decode queries.
    QuerySpec(
      "multimodal_decode_png",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        docs(s, dir)
          .select(col("doc_id"),
            concat(md5(col("text")), md5(md5(col("text"))),
              md5(md5(md5(col("text"))))).as("hx"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, hx) =>
              val pix = hx.grouped(2).map(h => Integer.parseInt(h, 16).toByte)
              val png = graft.functions.MediaCodecs.encodePng(
                (id % 3 + 2).toInt, (id % 4 + 1).toInt, pix)
              val (hdr, raw) = graft.functions.MediaCodecs.decodePng(png)
              (id, hdr.width, hdr.height, hdr.bitDepth, hdr.colorType,
                graft.functions.MediaCodecs.pngPixelSum(raw))
            }
          }
          .toDF("doc_id", "width", "height", "bit_depth", "color_type", "px_sum")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id,
                       MD5(text)||MD5(MD5(text))||MD5(MD5(MD5(text))) AS hx,
                       CAST(doc_id % 3 + 2 AS INT) AS width,
                       CAST(doc_id % 4 + 1 AS INT) AS height
                FROM documents),
              p AS (
                SELECT doc_id, width, height,
                       ('0x'||SUBSTR(hx, i*2 + 1, 2))::BIGINT AS byte
                FROM d, (SELECT UNNEST(GENERATE_SERIES(0, 47)) AS i)
                WHERE i < width*3*height)
              SELECT doc_id, width, height, 8 AS bit_depth, 2 AS color_type,
                     CAST(SUM(byte) AS BIGINT) AS px_sum
              FROM p GROUP BY doc_id, width, height
              ORDER BY doc_id""")),

    // The REAL byte path of the audio tier: genuine RIFF/WAVE files
    // (mono 8-bit PCM) encoded per doc — sample rate from doc_id,
    // samples from an md5 chain, plus a deliberately ODD-sized LIST
    // junk chunk between fmt and data — then decoded by
    // MediaCodecs.parseWav, whose chunk WALK (id + size + word-align
    // pad) must skip the junk to find fmt/data; fixed-offset "parsing"
    // would read garbage. Output: format fields, duration, and the
    // integer-exact PCM energy the oracle recomputes from the same hex.
    QuerySpec(
      "multimodal_decode_wav",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        docs(s, dir)
          .select(col("doc_id"),
            concat(md5(col("text")), md5(md5(col("text")))).as("hx"))
          .as[(Long, String)]
          .mapPartitions { it =>
            it.map { case (id, hx) =>
              val samples = hx.grouped(2)
                .map(h => Integer.parseInt(h, 16).toByte).toArray
              val wav = graft.functions.MediaCodecs.encodeWavPcm8(
                8000 + (id % 3).toInt * 4000, samples, junkChunk = true)
              val (info, data) = graft.functions.MediaCodecs.parseWav(wav)
              (id, info.sampleRate, info.channels, info.bitsPerSample,
                info.nSamples, info.nSamples * 1000L / info.sampleRate,
                graft.functions.MediaCodecs.pcm8Energy(data))
            }
          }
          .toDF("doc_id", "sample_rate", "channels", "bits", "n_samples",
            "duration_ms", "energy")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, MD5(text)||MD5(MD5(text)) AS hx,
                       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate
                FROM documents),
              v AS (
                SELECT doc_id, sample_rate,
                       (('0x'||SUBSTR(hx, CAST(k*2+1 AS INT), 2))::BIGINT - 128) AS s
                FROM d, (SELECT UNNEST(GENERATE_SERIES(0, 31)) AS k))
              SELECT doc_id, sample_rate, 1 AS channels, 8 AS bits,
                     32 AS n_samples,
                     CAST(32000 // sample_rate AS BIGINT) AS duration_ms,
                     CAST(SUM(s*s) AS BIGINT) AS energy
              FROM v GROUP BY doc_id, sample_rate ORDER BY doc_id""")),

    // Frame sampling — the video path: media as a fixed-layout binary
    // column of 16 4-byte "frames" (STUB bytes: an md5 chain over the
    // text, since no codecs ship in this container), stride-4 sampled
    // down to 4 frames/doc, then a per-frame feature (the frame word as
    // uint32) + an 8-bit "luma" stub. The plumbing is the real shape:
    // binary slicing + generator explode inside codegen, one row per
    // sampled frame, no driver collect — swap the slice arithmetic for a
    // real frame decoder and the plan (scan → project → generate) is
    // unchanged at 100 TB. Resize would be one more per-frame kernel in
    // the same projection.
    QuerySpec(
      "multimodal_framesample",
      (s, dir) => {
        val media = unhex(concat(
          md5(col("text")),
          md5(concat(col("text"), lit("_1"))),
          md5(concat(col("text"), lit("_2"))),
          md5(concat(col("text"), lit("_3"))))) // 64 bytes = 16 frames x 4B
        docs(s, dir)
          .select(col("doc_id"), media.as("media"))
          .select(col("doc_id"),
            posexplode(expr("transform(sequence(0, 3), k -> substring(media, k*16+1, 4))"))
              .as(Seq("k", "frame")))
          .select(
            col("doc_id"),
            (col("k") * 4).cast("int").as("frame_no"),
            conv(hex(col("frame")), 16, 10).cast("long").as("feature"))
          .withColumn("luma", (col("feature") % 256).cast("int"))
          .orderBy("doc_id", "frame_no")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                       MD5(text)||MD5(text||'_1')||MD5(text||'_2')||MD5(text||'_3') AS hexmedia
                FROM documents),
              f AS (
                SELECT doc_id, k FROM m, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k)),
              s AS (
                SELECT f.doc_id, CAST(k * 4 AS INT) AS frame_no,
                       ('0x'||SUBSTR(m.hexmedia, k*32+1, 8))::BIGINT AS feature
                FROM f JOIN m ON f.doc_id = m.doc_id)
              SELECT doc_id, frame_no, feature, CAST(feature % 256 AS INT) AS luma
              FROM s ORDER BY doc_id, frame_no""")),

    // Resize planning — aspect-preserving fit into a 224×224 training
    // budget, computed from the stub-decoded header dims entirely inside
    // whole-stage codegen (a real resize swaps the arithmetic for a pixel
    // kernel over the binary column; the plan — scan → project — and the
    // integer-exact contract are what matter). floor() on an exact
    // integer-over-integer double ratio is deterministic on both engines;
    // GREATEST(..,1) guards the zero-dim degenerate stub values.
    QuerySpec(
      "multimodal_resize",
      (s, dir) => {
        val w = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int")
        val h = conv(substring(md5(col("text")), 5, 4), 16, 10).cast("int")
        val longest = greatest(col("width"), col("height"), lit(1))
        docs(s, dir)
          .select(col("doc_id"), w.as("width"), h.as("height"))
          .select(col("doc_id"), col("width"), col("height"),
            when(longest <= 224, col("width"))
              .otherwise(floor(col("width") * 224.0 / longest)).cast("int").as("out_w"),
            when(longest <= 224, col("height"))
              .otherwise(floor(col("height") * 224.0 / longest)).cast("int").as("out_h"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
                SELECT doc_id,
                       ('0x'||SUBSTR(MD5(text),1,4))::INT AS width,
                       ('0x'||SUBSTR(MD5(text),5,4))::INT AS height
                FROM documents),
              g AS (SELECT doc_id, width, height,
                           GREATEST(width, height, 1) AS longest FROM d)
              SELECT doc_id, width, height,
                     CAST(CASE WHEN longest <= 224 THEN width
                          ELSE FLOOR(width * 224.0 / longest) END AS INT) AS out_w,
                     CAST(CASE WHEN longest <= 224 THEN height
                          ELSE FLOOR(height * 224.0 / longest) END AS INT) AS out_h
              FROM g ORDER BY doc_id""")),

    // Perceptual-hash near-dup detection — the image-side twin of
    // dedup_simhash_pairs, closing cross-modality dedup: re-encoded /
    // slightly-edited copies of the same image land within a few bits of
    // each other under a perceptual hash (pHash/aHash family), so
    // near-dup image search IS hamming search over 64-bit fingerprints
    // — the exact machinery the text path already proves. The hash here
    // is the deterministic stand-in (md5 of the stubbed image bytes,
    // split into hi/lo 32-bit words — a real pHash is equally a pure
    // function of pixel content); re-encoding jitter is modeled by a
    // deterministic 2-bit perturbation of every 7th image's fingerprint.
    // Pairing is the proven Manku pigeonhole: 4×16-bit bands, any-band
    // equality finds EVERY pair within hamming ≤ 3 by construction, and
    // the exact popcount verifies. At 100 TB the band self-join is the
    // only corpus-sized shuffle and carries (img_id, 2-byte key) rows;
    // Σ|bucket|² stays bounded because random 16-bit bands spread
    // non-dup images uniformly.
    QuerySpec(
      "multimodal_phash_dedup",
      (s, dir) => {
        val base = docs(s, dir)
          .select(col("doc_id").as("img_id"), md5(col("text")).as("m"))
          .select(col("img_id"),
            conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hi"),
            conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("lo"))
        // re-encoded copies: every 7th image, 2 bits flipped in lo
        val jittered = base.filter(col("img_id") % 7 === 0)
          .select((col("img_id") + 1000000L).as("img_id"), col("hi"),
            col("lo").bitwiseXOR(lit(5L)).as("lo"))
        // barrier: both sides of the band self-join consume this tiny
        // (3 longs/img) relation — don't recompute the md5 pipeline twice
        val sigs = base.unionByName(jittered).localCheckpoint()
        val banded = sigs.select(col("img_id"), col("hi"), col("lo"),
          posexplode(array(
            col("lo").bitwiseAND(lit(65535L)),
            shiftright(col("lo"), 16).bitwiseAND(lit(65535L)),
            col("hi").bitwiseAND(lit(65535L)),
            shiftright(col("hi"), 16).bitwiseAND(lit(65535L)))).as(Seq("b", "k")))
        val l = banded.select(col("b"), col("k"), col("img_id").as("img_a"),
          col("hi").as("ha"), col("lo").as("la"))
        val r = banded.select(col("b"), col("k"), col("img_id").as("img_b"),
          col("hi").as("hb"), col("lo").as("lb"))
        l.join(r, Seq("b", "k"))
          .where(col("img_a") < col("img_b"))
          .select(col("img_a"), col("img_b"),
            (bit_count(col("ha").bitwiseXOR(col("hb"))) +
              bit_count(col("la").bitwiseXOR(col("lb")))).cast("int").as("hamming"))
          .where(col("hamming") <= 3)
          .distinct()
          .orderBy("img_a", "img_b")
      },
      Some("""WITH base AS (
                SELECT doc_id AS img_id,
                       ('0x'||SUBSTR(MD5(text),1,8))::BIGINT AS hi,
                       ('0x'||SUBSTR(MD5(text),9,8))::BIGINT AS lo
                FROM documents),
              all_imgs AS (
                SELECT img_id, hi, lo FROM base
                UNION ALL
                SELECT img_id + 1000000, hi, XOR(lo, 5) FROM base WHERE img_id % 7 = 0),
              banded AS (
                SELECT img_id, hi, lo, b,
                       CASE b WHEN 0 THEN lo & 65535
                              WHEN 1 THEN (lo >> 16) & 65535
                              WHEN 2 THEN hi & 65535
                              ELSE (hi >> 16) & 65535 END AS k
                FROM all_imgs, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS b))
              SELECT img_a, img_b, hamming FROM (
                SELECT DISTINCT l.img_id AS img_a, r.img_id AS img_b,
                       CAST(BIT_COUNT(XOR(l.hi, r.hi)) + BIT_COUNT(XOR(l.lo, r.lo)) AS INTEGER) AS hamming
                FROM banded l JOIN banded r ON l.b = r.b AND l.k = r.k
                WHERE l.img_id < r.img_id)
              WHERE hamming <= 3
              ORDER BY img_a, img_b""")),

    // Video path — SCENE-CUT detection, the segmentation primitive every
    // video curation pipeline runs before clip extraction/captioning: a
    // cut lands between consecutive frames whose 32-bit perceptual
    // features differ in ≥ 17 bits (hamming on the same integer-exact
    // xor+bit_count bridge the SimHash tier pins); scenes are the
    // gaps-and-islands between cuts. Frames are the STUB md5-chain words
    // (16 per doc — no codecs in this container; a real decoder slots
    // into the same column), the computation is the real one: per-frame
    // lag window, integer hamming, running cut-count scene ids, per-doc
    // scene stats — all doc_id-keyed exchanges, linear at any scale.
    QuerySpec(
      "multimodal_scene_detect",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("k")
        val hexmedia = concat(
          md5(col("text")), md5(concat(col("text"), lit("_1"))),
          md5(concat(col("text"), lit("_2"))), md5(concat(col("text"), lit("_3"))))
        docs(s, dir)
          .select(col("doc_id"), hexmedia.as("hx"))
          .select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, 15), k -> CAST(conv(substring(hx, k*8+1, 8), 16, 10) AS BIGINT))"))
            .as(Seq("k", "feature")))
          .withColumn("prev", lag(col("feature"), 1).over(w))
          .withColumn("cut",
            col("prev").isNotNull &&
              bit_count(col("feature").bitwiseXOR(col("prev"))) >= 17)
          .withColumn("sid", sum(when(col("cut"), 1L).otherwise(0L)).over(w))
          .groupBy("doc_id", "sid").agg(count(lit(1)).as("len"))
          .groupBy("doc_id")
          .agg((max(col("sid")) + 1).as("n_scenes"),
            max(col("len")).as("longest_scene"))
          .orderBy("doc_id")
      },
      Some("""WITH m AS (
                SELECT doc_id,
                       MD5(text)||MD5(text||'_1')||MD5(text||'_2')||MD5(text||'_3') AS hx
                FROM documents),
              f AS (
                SELECT doc_id, k,
                       ('0x'||SUBSTR(hx, CAST(k*8+1 AS INT), 8))::BIGINT AS feature
                FROM m, (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS k)),
              c AS (
                SELECT doc_id, k, feature,
                       CASE WHEN LAG(feature) OVER w IS NOT NULL
                             AND BIT_COUNT(XOR(feature, LAG(feature) OVER w)) >= 17
                            THEN 1 ELSE 0 END AS cut
                FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY k)),
              sid AS (
                SELECT doc_id,
                       SUM(cut) OVER (PARTITION BY doc_id ORDER BY k
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM c),
              sc AS (SELECT doc_id, sid, COUNT(*) AS len FROM sid GROUP BY 1, 2)
              SELECT doc_id, CAST(MAX(sid) + 1 AS BIGINT) AS n_scenes,
                     MAX(len) AS longest_scene
              FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // Audio path — voice-activity detection over windowed PCM energy,
    // the segmentation every speech-data pipeline runs before
    // transcription/embedding. The "waveform" is a STUB (64 8-bit
    // samples from an md5 chain over the text — no audio codecs ship in
    // this container; a real decoder slots into the same column), but
    // the VAD computation is the real one end-to-end: 8-sample energy
    // windows (sum of squared deviation from the 128 midpoint — integer
    // arithmetic, so both engines agree bit-for-bit), an
    // energy-threshold activity gate, then gaps-and-islands over the
    // active windows for the doc's LONGEST ACTIVE SEGMENT — the value a
    // clip-extraction job keys on. Per-row codegen builds the windows
    // (no shuffle); the only exchanges are the per-doc window
    // aggregation and the islands window, both keyed on doc_id —
    // embarrassingly parallel at any corpus size.
    QuerySpec(
      "multimodal_audio_vad",
      (s, dir) => {
        val pcm = docs(s, dir)
          .select(col("doc_id"), md5(col("text")).as("b0"))
          // one md5 per doc runs in the single scan task; the md5 chain +
          // per-window energy battery below is the CPU — spread the
          // (id, 32-char) rows across the session's cores first
          // (guide §2.5: repartition right after an unsplittable read)
          .repartition(s.sparkContext.defaultParallelism)
          .withColumn("hex",
            concat(col("b0"), md5(col("b0")), md5(md5(col("b0"))),
              md5(md5(md5(col("b0"))))))
        val wins = pcm.select(col("doc_id"), explode(expr(
          """transform(sequence(0, 7), w -> struct(
               CAST(w AS BIGINT) AS win,
               aggregate(sequence(0, 7), 0L, (acc, i) ->
                 acc + (CAST(conv(substring(hex, (w*8+i)*2+1, 2), 16, 10) AS BIGINT) - 128)
                     * (CAST(conv(substring(hex, (w*8+i)*2+1, 2), 16, 10) AS BIGINT) - 128)) AS energy))"""))
          .as("e"))
          .select(col("doc_id"), col("e.win").as("win"), col("e.energy").as("energy"))
          .withColumn("active", col("energy") > 43500L)
        val runs = wins.filter(col("active"))
          .withColumn("grp", col("win") - row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("win")))
          .groupBy("doc_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("doc_id").agg(max(col("len")).as("longest"))
        wins.groupBy("doc_id")
          .agg(
            sum(when(col("active"), 1L).otherwise(0L)).as("n_active"),
            max(col("energy")).as("max_energy"))
          .join(runs, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_active"), col("max_energy"),
            coalesce(col("longest"), lit(0L)).as("longest_run"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id, MD5(text) AS b0 FROM documents),
              h AS (SELECT doc_id,
                           b0||MD5(b0)||MD5(MD5(b0))||MD5(MD5(MD5(b0))) AS hex
                    FROM c),
              s AS (SELECT doc_id, hex, UNNEST(GENERATE_SERIES(0,63)) AS k FROM h),
              v AS (SELECT doc_id, CAST(k//8 AS BIGINT) AS win,
                           (('0x'||SUBSTR(hex, CAST(k*2+1 AS INT), 2))::BIGINT - 128) AS d
                    FROM s),
              e AS (SELECT doc_id, win, CAST(SUM(d*d) AS BIGINT) AS energy
                    FROM v GROUP BY 1, 2),
              a AS (SELECT doc_id, win, energy, energy > 43500 AS active FROM e),
              g AS (SELECT doc_id, win,
                           win - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY win) AS grp
                    FROM a WHERE active),
              r AS (SELECT doc_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2),
              l AS (SELECT doc_id, MAX(len) AS longest FROM r GROUP BY 1)
              SELECT a.doc_id,
                     CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
                     MAX(energy) AS max_energy,
                     COALESCE(MAX(l.longest), 0) AS longest_run
              FROM a LEFT JOIN l ON a.doc_id = l.doc_id
              GROUP BY a.doc_id ORDER BY a.doc_id""")),

    // The REAL byte path of the image tier's dominant format: genuine
    // baseline JPEG files (ITU-T T.81, functions/Jpeg — from-scratch
    // markers/DHT/DQT/huffman/dequant/IDCT/YCbCr, no codec library)
    // encoded per doc from a deterministic smooth test card, then
    // decoded in the SCAN TASK. JPEG is LOSSY, so the contract is a
    // TOLERANCE boolean (the t-digest stance): header fields are exact,
    // pixel error vs the pre-encode card must sit inside the Annex K
    // quantization bound. Cross-decoder ground truth (JDK ImageIO
    // parity at 4:2:0, malformed rejections) lives in JpegSpec.
    QuerySpec(
      "multimodal_decode_jpeg",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        docs(s, dir)
          .select(col("doc_id"))
          // the id scan is one task (single small parquet file) but the
          // encode+decode kernel below is ~1.4 s of CPU — repartition the
          // 8-byte ids to the session's parallelism so the kernel runs on
          // every core (guide §2.5: repartition right after an
          // unsplittable read; only ids move, never pixels)
          .repartition(s.sparkContext.defaultParallelism)
          .as[Long]
          .mapPartitions { it =>
            it.map { id =>
              val w = 16 + (id % 3).toInt * 8
              val h = 16 + (id % 2).toInt * 8
              val rgb = new Array[Byte](w * h * 3)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val o = (y * w + x) * 3
                  rgb(o) = (128 + 90 * StrictMath.sin(
                    (x + id % 17) * 2 * math.Pi / w)).toInt.toByte
                  rgb(o + 1) = (128 + 90 * StrictMath.cos(
                    (y + id % 11) * 2 * math.Pi / h)).toInt.toByte
                  rgb(o + 2) = (40 + (180 * (x + y)) / (w + h)).toByte
                  x += 1
                }
                y += 1
              }
              val jpeg = graft.functions.Jpeg.encodeRgb444(w, h, rgb)
              val (info, out) = graft.functions.Jpeg.decode(jpeg)
              var maxE = 0
              var sum = 0L
              var i = 0
              while (i < rgb.length) {
                val d = math.abs((rgb(i) & 0xff) - (out(i) & 0xff))
                if (d > maxE) maxE = d
                sum += d
                i += 1
              }
              (id, info.width, info.height, info.components,
                jpeg.length > 0 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
                maxE <= 32, sum.toDouble / rgb.length <= 6.0)
            }
          }
          .toDF("doc_id", "width", "height", "components",
            "is_jpeg", "max_err_ok", "mean_err_ok")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
                     CAST(16 + (doc_id % 3) * 8 AS INT) AS width,
                     CAST(16 + (doc_id % 2) * 8 AS INT) AS height,
                     3 AS components,
                     TRUE AS is_jpeg, TRUE AS max_err_ok, TRUE AS mean_err_ok
              FROM documents ORDER BY doc_id"""))
  )
}

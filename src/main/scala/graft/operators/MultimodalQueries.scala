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
              FROM g ORDER BY doc_id"""))
  )
}

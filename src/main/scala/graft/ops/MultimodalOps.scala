package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, decoded/feature-extracted inside the
  * executors via `mapPartitions` over a typed Dataset (the JVM analogue of
  * `mapInPandas`: batch-shaped, partition-preserving, schema declared
  * up-front).
  *
  * The codec itself is a clearly-marked STUB (no image/audio libraries in
  * this container): `FakeCodec.decode` derives deterministic
  * pseudo-metadata and features from the raw bytes. Everything around the
  * stub — binary column handling, partitioning, the typed row shape, the
  * downstream relational use of the extracted features — is real, which is
  * what the DuckDB oracle checks (the fixtures are ASCII, so byte values
  * equal character codes and the stub's arithmetic is SQL-replicable).
  */
object MultimodalOps {
  import Tables._

  /** STUB decoder: stands in for an image codec. Real integration point —
    * swap `decode` for an actual library; the Spark plumbing (binary in,
    * fixed-schema features out, executed per-partition) stays identical. */
  object FakeCodec {
    final case class Decoded(
        doc_id: Long, width: Int, height: Int, channels: Int,
        n_bytes: Long, head_sum: Long, mean_byte: Double, max_byte: Int)

    def decode(docId: Long, payload: Array[Byte]): Decoded = {
      val n = payload.length
      // ??? real codec goes here — deterministic fake below
      val head = payload.take(128)
      val sum = head.foldLeft(0L)((a, b) => a + (b & 0xFF))
      Decoded(
        doc_id = docId,
        width = 64 + n % 577,
        height = 64 + (n * 7) % 479,
        channels = 3,
        n_bytes = n.toLong,
        head_sum = sum,
        mean_byte = if (head.isEmpty) 0.0 else sum.toDouble / head.length,
        max_byte = if (head.isEmpty) 0 else head.map(_ & 0xFF).max)
    }
  }

  val all: Seq[Q] = Seq(

    // Binary ingest → per-partition decode → typed features → relational agg.
    Q("mm_image_features",
      """WITH dec AS (
        |  SELECT doc_id, source,
        |    64 + length(text) % 577 AS width,
        |    64 + (length(text) * 7) % 479 AS height,
        |    CAST(length(text) AS BIGINT) AS n_bytes,
        |    list_reduce(list_transform(string_split_regex(substr(text, 1, 128), ''),
        |        c -> CAST(ascii(c) AS BIGINT)), (a, b) -> a + b) AS head_sum,
        |    list_reduce(list_transform(string_split_regex(substr(text, 1, 128), ''),
        |        c -> CAST(ascii(c) AS BIGINT)), (a, b) -> greatest(a, b)) AS max_byte
        |  FROM documents)
        |SELECT source, count(*) AS n_images,
        |  CAST(sum(width * height) AS BIGINT) AS total_pixels,
        |  CAST(sum(head_sum * n_bytes) AS BIGINT) AS brightness_weight,
        |  max(max_byte) AS peak_byte
        |FROM dec GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      import s.implicits._
      val binary = Tables.fan(s, documents(s, d))
        .select(col("doc_id"), col("source"),
                encode(col("text"), "UTF-8").as("payload"))
      val decoded = binary
        .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) => FakeCodec.decode(id, bytes) })
        .toDF()
      decoded
        .join(documents(s, d).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_images"),
             sum(col("width").cast("long") * col("height")).as("total_pixels"),
             sum(col("head_sum") * col("n_bytes")).as("brightness_weight"),
             max(col("max_byte")).as("peak_byte"))
        .orderBy(col("source"))
    },

    // Video-style frame sampling: metadata → sampled frame index expansion
    // (sequence + explode — generation happens distributed, never on the
    // driver), one row per sampled frame with its timestamp.
    Q("mm_frame_sampling",
      """WITH meta AS (
        |  SELECT doc_id, 10 + doc_id % 110 AS duration_s, 30 AS fps
        |  FROM documents WHERE doc_id < 200),
        |frames AS (
        |  SELECT doc_id, duration_s, CAST(unnest(range(0, duration_s * 30, 60)) AS BIGINT) AS frame_idx
        |  FROM meta)
        |SELECT doc_id, frame_idx,
        |  CAST(frame_idx * 1000 / 30 AS BIGINT) AS ts_ms,
        |  CAST(duration_s * 30 AS BIGINT) AS total_frames
        |FROM frames ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      documents(s, d).where(col("doc_id") < 200)
        .select(col("doc_id"), (lit(10) + col("doc_id") % 110).as("duration_s"))
        .withColumn("total_frames", (col("duration_s") * 30).cast("long"))
        .select(col("doc_id"), col("total_frames"),
          explode(expr("sequence(0, duration_s * 30 - 1, 60)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          (col("frame_idx").cast("long") * 1000 / 30).cast("long").as("ts_ms"),
          col("total_frames"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Paired-dataset curation (the CLIP-style assembly step): join text
    // docs to their image embeddings by id, gate each pair on BOTH
    // modalities' quality signals (caption length, embedding norm inside
    // a sane band), and report per-label pair counts + checksums. At
    // scale this is one equi-join co-partitioned on the id (both sides
    // hash-shuffle once; with id-bucketed storage, zero exchanges) and
    // the gates are scan-level filters on each side BEFORE the join.
    Q("mm_paired_curation",
      """WITH txt AS (
        |  SELECT doc_id, length(text) AS n_chars FROM documents
        |  WHERE length(text) BETWEEN 100 AND 20000),
        |img AS (
        |  SELECT vec_id, label,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT t.doc_id, i.label, t.n_chars
        |  FROM txt t JOIN img i ON t.doc_id = i.vec_id
        |  WHERE i.nrm BETWEEN 0.5 AND 10)
        |SELECT label, count(*) AS n_pairs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS char_sum
        |FROM pairs GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      import graft.functions.VectorOps.dot_d
      val txt = documents(s, d)
        .where(length(col("text")).between(100, 20000))
        .select(col("doc_id"), length(col("text")).as("n_chars"))
      val v = expr("transform(embedding, x -> cast(x as double))")
      val img = Tables.fan(s, embeddings(s, d))
        .select(col("vec_id"), col("label"), sqrt(dot_d(v, v)).as("nrm"))
        .where(col("nrm").between(0.5, 10))
      txt.join(img, col("doc_id") === col("vec_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"),
             sum(col("doc_id")).cast("long").as("id_sum"),
             sum(col("n_chars")).cast("long").as("char_sum"))
        .orderBy(col("label"))
    },

    // Audio/video time alignment — the multimodal join every A/V training
    // pipeline needs: each sampled video frame is matched to the audio
    // window in effect at its timestamp. Runs through the REUSABLE as-of
    // operator (union + one doc_id shuffle + running last — no inequality
    // join) over the two derived streams; because these windows are
    // regular, the oracle can state the alignment in closed form
    // (min(ts//hop, n_windows-1)), so the gate proves the operator equals
    // the arithmetic ideal on 2.6k frame rows. At scale the same call
    // aligns irregular windows (VAD segments, shot boundaries) where no
    // closed form exists.
    Q("mm_av_alignment",
      """WITH meta AS (
        |  SELECT doc_id, 10 + doc_id % 110 AS duration_s,
        |         CAST(16000 * (1 + doc_id % 30) AS BIGINT) AS n_samples
        |  FROM documents WHERE doc_id < 50),
        |aw AS (
        |  SELECT doc_id,
        |    CAST((n_samples - 1024) // 512 + 1 AS BIGINT) AS n_windows
        |  FROM meta),
        |frames AS (
        |  SELECT doc_id, CAST(unnest(range(0, duration_s * 30, 60)) AS BIGINT) AS frame_idx
        |  FROM meta)
        |SELECT f.doc_id, f.frame_idx,
        |  CAST(f.frame_idx * 1000 / 30 AS BIGINT) AS ts_ms,
        |  CAST(least(CAST(f.frame_idx * 1000 / 30 AS BIGINT) // 32, a.n_windows - 1) AS BIGINT) AS audio_widx
        |FROM frames f JOIN aw a USING (doc_id)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      val meta = documents(s, d).where(col("doc_id") < 50)
        .select(col("doc_id"),
          (lit(10) + col("doc_id") % 110).as("duration_s"),
          (lit(16000) * (lit(1) + col("doc_id") % 30)).cast("long").as("n_samples"))
      val frames = meta
        .select(col("doc_id"),
          explode(expr("sequence(0, duration_s * 30 - 1, 60)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          (col("frame_idx").cast("long") * 1000 / 30).cast("long").as("ts_ms"))
        .withColumn("tb", col("frame_idx"))
      // 1024-sample windows, 512 hop at 16 kHz → one window start per 32 ms
      val windows = meta
        .select(col("doc_id"),
          explode(expr("sequence(0, (n_samples - 1024) div 512, 1)")).as("widx"))
        .select(col("doc_id"), col("widx").cast("long").as("widx"),
          (col("widx") * 32).cast("long").as("ts_ms"))
        .withColumn("tb", col("widx"))
      graft.operators.TemporalJoins
        .asof(frames, windows, keys = Seq("doc_id"), tsCol = "ts_ms",
              valueCols = Seq("widx"), tiebreak = "tb")
        .select(col("doc_id"), col("frame_idx"), col("ts_ms"),
                col("asof_widx").as("audio_widx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // Shot-boundary detection — the video-curation segmentation step: a
    // frame-feature delta above threshold starts a new shot (lag window),
    // shots are gaps-and-islands (running sum of breaks), and the per-video
    // summary reports shot count and the longest shot. The per-frame
    // feature is the decode STUB's deterministic arithmetic (swap in a real
    // frame histogram/embedding; the windowing topology is identical). Two
    // window passes + one aggregate, all partitioned on doc_id — per-video
    // work, embarrassingly parallel across the corpus.
    Q("mm_shot_boundaries",
      """WITH meta AS (
        |  SELECT doc_id, 10 + doc_id % 110 AS duration_s
        |  FROM documents WHERE doc_id < 200),
        |frames AS (
        |  SELECT doc_id, CAST(unnest(range(0, duration_s * 30, 60)) AS BIGINT) AS frame_idx
        |  FROM meta),
        |feat AS (
        |  SELECT doc_id, frame_idx,
        |    (doc_id * 131 + frame_idx * 7919) % 256 AS f
        |  FROM frames),
        |brk AS (
        |  SELECT doc_id, frame_idx, f,
        |    CASE WHEN abs(f - lag(f) OVER (PARTITION BY doc_id ORDER BY frame_idx)) > 128
        |         THEN 1 ELSE 0 END AS b
        |  FROM feat),
        |sid AS (
        |  SELECT doc_id, frame_idx,
        |    sum(b) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS shot
        |  FROM brk),
        |shots AS (
        |  SELECT doc_id, shot, count(*) AS shot_len FROM sid GROUP BY doc_id, shot)
        |SELECT doc_id, CAST(sum(shot_len) AS BIGINT) AS n_frames,
        |  count(*) AS n_shots, max(shot_len) AS longest_shot
        |FROM shots GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byFrame = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      documents(s, d).where(col("doc_id") < 200)
        .select(col("doc_id"), (lit(10) + col("doc_id") % 110).as("duration_s"))
        .select(col("doc_id"),
          explode(expr("sequence(0, duration_s * 30 - 1, 60)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"))
        .withColumn("f", (col("doc_id") * 131 + col("frame_idx") * 7919) % 256)
        .withColumn("b",
          when(abs(col("f") - lag(col("f"), 1).over(byFrame)) > 128, 1).otherwise(0))
        .withColumn("shot", sum(col("b")).over(
          byFrame.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("shot"))
        .agg(count(lit(1)).as("shot_len"))
        .groupBy(col("doc_id"))
        .agg(sum(col("shot_len")).cast("bigint").as("n_frames"),
             count(lit(1)).as("n_shots"), max(col("shot_len")).as("longest_shot"))
        .orderBy(col("doc_id"))
    },

    // Audio-style windowing: n_samples → 1024-sample frames with 512 hop;
    // per-doc window count and coverage (pure integer arithmetic).
    Q("mm_audio_windows",
      """SELECT doc_id,
        |  n_samples,
        |  CAST(CASE WHEN n_samples < 1024 THEN 0
        |       ELSE (n_samples - 1024) // 512 + 1 END AS BIGINT) AS n_windows,
        |  CAST(CASE WHEN n_samples < 1024 THEN 0
        |       ELSE ((n_samples - 1024) // 512) * 512 + 1024 END AS BIGINT) AS covered
        |FROM (SELECT doc_id, CAST(16000 * (1 + doc_id % 30) AS BIGINT) AS n_samples
        |      FROM documents WHERE doc_id < 500) t
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).where(col("doc_id") < 500)
        .select(col("doc_id"),
          (lit(16000) * (lit(1) + col("doc_id") % 30)).cast("long").as("n_samples"))
        .withColumn("n_windows",
          when(col("n_samples") < 1024, 0L)
            .otherwise(expr("(n_samples - 1024) div 512 + 1")).cast("long"))
        .withColumn("covered",
          when(col("n_samples") < 1024, 0L)
            .otherwise(expr("((n_samples - 1024) div 512) * 512 + 1024")).cast("long"))
        .orderBy(col("doc_id"))
    },
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), exact n-gram Jaccard (inverted-index join),
  * MinHash+LSH banding, SimHash (custom Catalyst expression), and
  * embedding-cosine near-dup.
  *
  * Scale design: every pair-generating path goes through an inverted index
  * (shingle / band / LSH bucket) so work is proportional to colliding
  * candidates, never all-pairs — the 100 TB path. The only all-pairs join in
  * the file (embedding near-dup) is the small-side baseline; its scale path
  * is the LSH variant in AnnOps.
  */
object DedupOps {
  import Tables._

  /** Word 5-gram shingles as a deduped array column (native single-pass
    * expression; contents mirror the DuckDB oracle's DISTINCT grams). */
  private def wordShingles(textCol: String): Column =
    graft.functions.VectorOps.word_ngrams(
      expr(s"regexp_extract_all($textCol, '\\\\S+', 0)"), 5)

  /** Exact-Jaccard near-dup pairs (d1 < d2, jac ≥ 0.5) via inverted-index
    * self-join on word 5-grams. Shuffles 8-byte gram hashes, not gram
    * strings (xxhash64 collisions are ~2⁻⁶⁵·n² — immaterial); each doc's
    * shingle-set size rides along with the exploded rows, so no separate
    * sizes relation or extra join. Work ∝ Σ df(gram)², never all-pairs. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val g = Tables.fan(s, documents(s, d))
      .select(col("doc_id"), wordShingles("text").as("sh"))
      .select(col("doc_id"), size(col("sh")).as("sz"),
              explode(col("sh")).as("gram"))
      .select(col("doc_id"), col("sz"), xxhash64(col("gram")).as("gh"))
    val a = g.as("a"); val b = g.as("b")
    a.join(b, col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
               col("a.sz").as("sz1"), col("b.sz").as("sz2"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jac",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .where(col("jac") >= 0.5)
      .select(col("d1"), col("d2"), col("inter"), col("jac"))
  }

  /** The pair CTEs of the jaccard oracle, shared by two queries' SQL. */
  private val jaccardPairsSql: String =
    """  g AS (
      |  SELECT DISTINCT doc_id,
      |    list_aggregate(w[CAST(u AS INT):CAST(u+4 AS INT)], 'string_agg', ' ') AS gram
      |  FROM (SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 2))) AS u
      |        FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS w FROM documents) t0)),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
      |rawpairs AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jpairs AS (
      |  SELECT d1, d2, inter,
      |    CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jac
      |  FROM rawpairs
      |  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
      |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5)""".stripMargin

  val all: Seq[Q] = Seq(

    // Exact dedup: group on content, keep the smallest doc_id per group.
    // Grouped per source so the result shape proves both the grouping and
    // the keep-first policy (sum of kept ids is the checksum).
    Q("dedup_exact",
      """SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
        |  CAST(sum(keep_id) AS BIGINT) AS kept_id_sum
        |FROM (SELECT source, text, min(doc_id) AS keep_id
        |      FROM documents GROUP BY source, text) t
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy(col("source"), col("text"))
        .agg(min(col("doc_id")).as("keep_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             count(lit(1)).as("n_unique_pre"),
             sum(col("keep_id")).as("kept_id_sum"))
        // after group-by-text, every row is one unique text
        .select(col("source"), col("n_docs"), col("n_unique_pre").as("n_unique"),
                col("kept_id_sum"))
        .orderBy(col("source"))
    },

    // Exact n-gram Jaccard near-dup via inverted-index self-join on word
    // 5-grams: work ∝ Σ df(gram)² (237k distinct grams over 5k docs at
    // sf0.1 → trivial), not all-pairs.
    Q("dedup_ngram_jaccard",
      s"""WITH
         |$jaccardPairsSql
         |SELECT d1, d2, inter, jac FROM jpairs ORDER BY d1, d2""".stripMargin) { (s, d) =>
      jaccardPairs(s, d).orderBy(col("d1"), col("d2"))
    },

    // Dedup clustering: near-dup pairs are only half the operator a real
    // pipeline needs — documents then have to be grouped into clusters and
    // one canonical representative kept. Connected components over the
    // jaccard pair graph (graft.operators.DedupClustering: driver-side
    // union-find for small graphs, distributed min-label propagation
    // beyond the threshold). Canonical = min doc_id of the component.
    Q("dedup_cluster_canonical",
      s"""WITH RECURSIVE
         |$jaccardPairsSql,
         |edges AS (
         |  SELECT d1 AS src, d2 AS dst FROM jpairs
         |  UNION ALL SELECT d2, d1 FROM jpairs),
         |walk(id, comp) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
         |comps AS (SELECT id, min(comp) AS canonical FROM walk GROUP BY id)
         |SELECT canonical AS canonical_id,
         |  count(*) AS n_members,
         |  CAST(sum(id) AS BIGINT) AS id_sum
         |FROM comps GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val pairs = jaccardPairs(s, d).select(col("d1"), col("d2"))
      graft.operators.DedupClustering.connectedComponents(pairs)
        .groupBy(col("comp").as("canonical_id"))
        .agg(count(lit(1)).as("n_members"), sum(col("id")).as("id_sum"))
        .orderBy(col("canonical_id"))
    },

    // MinHash + LSH banding: 32 minhash signatures over word shingles,
    // 8 bands × 4 rows; candidate pairs from band-bucket collisions; kept
    // when estimated Jaccard (signature agreement) ≥ 0.5. Engine-specific
    // hashing (xxhash64) → rows-only; DedupSpec pins precision/recall
    // against the exact-Jaccard op.
    Q.rowsOnly("dedup_minhash_lsh") { (s, d) =>
      val nHash = 32; val bands = 8; val rows = nHash / bands
      // fully-native signature: tokenize → per-token hash → rolling 5-gram
      // mix → Kirsch–Mitzenmacher minhash, one pass, no shingle strings
      val withSig = Tables.fan(s, documents(s, d))
        .select(col("doc_id"),
          graft.functions.VectorOps.minhash_shingled(
            expr("regexp_extract_all(text, '\\\\S+', 0)"), 5, nHash).as("sig"))
      val banded = withSig.select(col("doc_id"), col("sig"),
        posexplode(array((0 until bands).map(bd =>
          xxhash64(concat_ws(",",
            (0 until rows).map(r => col("sig").getItem(bd * rows + r)): _*))): _*))
          .as(Seq("band", "bucket")))
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") &&
              col("a.bucket") === col("b.bucket") &&
              col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
                col("a.sig").as("sig1"), col("b.sig").as("sig2"))
        .distinct()
        .withColumn("est_jac",
          expr(s"size(filter(zip_with(sig1, sig2, (x, y) -> x = y), v -> v)) / cast($nHash as double)"))
        .where(col("est_jac") >= 0.5)
        .select(col("d1"), col("d2"), col("est_jac"))
        .orderBy(col("d1"), col("d2"))
    },

    // SimHash near-dup: 64-bit signature via a custom Catalyst expression
    // (bit-vote over murmur-hashed tokens), candidates from 16-bit chunk
    // collisions (pigeonhole: hamming ≤ 3 ⇒ some chunk equal), kept when
    // hamming distance ≤ 6.
    Q.rowsOnly("dedup_simhash") { (s, d) =>
      val sigs = Tables.fan(s, documents(s, d))
        .select(col("doc_id"),
          SimHash64.simhash64(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("sig"))
      val chunked = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("chunk", "ckey")))
      val a = chunked.as("a"); val b = chunked.as("b")
      a.join(b, col("a.chunk") === col("b.chunk") &&
              col("a.ckey") === col("b.ckey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
                col("a.sig").as("s1"), col("b.sig").as("s2"))
        .distinct()
        .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
        .where(col("hamming") <= 6)
        .select(col("d1"), col("d2"), col("hamming"))
        .orderBy(col("d1"), col("d2"))
    },

    // Embedding-cosine near-dup (baseline all-pairs; LSH scale path in
    // AnnOps). Dot/norms are left folds in double → engine-identical; the
    // pair scoring runs through the native dot_d expression, norms are
    // precomputed once per vector.
    Q("dedup_embedding_cosine",
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
        |              (p, q) -> p + q) / (a.nrm * b.nrm) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]),
        |              (p, q) -> p + q) / (a.nrm * b.nrm) >= 0.4
        |ORDER BY v1, v2""".stripMargin) { (s, d) =>
      import graft.functions.VectorOps.dot_d
      val e = Tables.fan(s, embeddings(s, d)).select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", sqrt(dot_d(col("v"), col("v"))))
      val a = e.as("a"); val b = e.as("b")
      a.join(b, col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          (dot_d(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
        .where(col("cos") >= 0.4)
        .orderBy(col("v1"), col("v2"))
    },
  )
}

package graft.ops

import java.nio.file.Files
import java.security.MessageDigest

import graft.SparkSpec

/** Pins the Gopher-repetition pair (text_repetition_stats /
  * text_repetition_rewrite) against hand-computed values on planted
  * fixtures and against a Scala brute-force reference on randomized
  * repetitive word-streams. The DuckDB oracle is the cross-engine gate;
  * this spec is the semantic one (the numbers are derived by hand from
  * the published rule, not from the implementation).
  */
class RepetitionSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-repetition").toString
    import spark.implicits._
    Seq(
      // 30 words: blocks 0 and 2 are the same all-"a" block, block 1 all-"b";
      // the dominant 2-gram is "a a" (9 within each "a" run => 18 of 29)
      (0L, (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("a")).mkString(" ")),
      (1L, "solo"), // one word: one block, zero 2-grams
      (2L, (1 to 25).map(i => s"w$i").mkString(" "))) // 3 blocks, no repetition
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def q(name: String) = TextOps.all.find(_.name == name).get.fn

  test("repetition stats: planted duplicate block + dominant 2-gram") {
    val rows = q("text_repetition_stats")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    val d0 = rows(0L)
    assert(d0.getLong(1) == 59L)                 // n_char: 30 chars + 29 spaces
    assert(d0.getLong(2) == 3L && d0.getLong(3) == 2L) // n_blocks, dup_blocks
    assert(d0.getDouble(4) == 2.0 / 3.0)         // dup_block_frac
    assert(d0.getDouble(5) == 38.0 / 57.0)       // dup_char_frac (2x19 of 3x19)
    assert(d0.getString(6) == "a a" && d0.getLong(7) == 18L)
    assert(d0.getDouble(8) == 54.0 / 59.0)       // 18 * len("a a") / n_char
    assert(d0.getInt(9) == 0)                    // dup fraction over threshold

    val d1 = rows(1L)
    assert(d1.getLong(2) == 1L && d1.getLong(3) == 0L)
    assert(d1.getString(6) == "" && d1.getLong(7) == 0L)
    assert(d1.getDouble(8) == 0.0 && d1.getInt(9) == 1)

    val d2 = rows(2L)
    assert(d2.getLong(2) == 3L && d2.getLong(3) == 0L)
    // all 2-grams tie at n=1; the total order picks the lexicographic min
    assert(d2.getString(6) == "w1 w2" && d2.getLong(7) == 1L)
    assert(d2.getInt(9) == 1)
  }

  test("repetition rewrite: first occurrence kept in original order") {
    val rows = q("text_repetition_rewrite")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

    val aBlk = Seq.fill(10)("a").mkString(" ")
    val bBlk = Seq.fill(10)("b").mkString(" ")
    val d0 = rows(0L)
    assert(d0.getLong(1) == 59L)                       // len_before
    assert(d0.getLong(2) == 3L && d0.getLong(3) == 2L) // n_blocks, n_kept
    assert(d0.getLong(4) == 39L)                       // len_after
    assert(d0.getString(5) == md5hex(s"$aBlk $bBlk"))

    assert(rows(1L).getLong(3) == 1L)
    assert(rows(1L).getString(5) == md5hex("solo"))
    assert(rows(2L).getLong(3) == 3L)                  // nothing dropped
    assert(rows(2L).getLong(4) == rows(2L).getLong(1))
  }

  test("BlockRepStats kernel: degenerate inputs") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def kernel(toks: Seq[String]) =
      graft.functions.TextStats.blockRepStatsKernel(
        ArrayData.toArrayData(toks.map(t =>
          if (t == null) null else UTF8String.fromString(t)).toArray))
    // empty array: one empty block, zero grams
    val e = kernel(Seq.empty)
    assert(e.getLong(0) == 1L && e.getLong(1) == 0L && e.getLong(2) == 0L)
    assert(e.getUTF8String(4).toString == "" && e.getLong(5) == 0L)
    // single word: one block, no grams
    val s1 = kernel(Seq("a"))
    assert(s1.getLong(0) == 1L && s1.getLong(2) == 1L && s1.getLong(5) == 0L)
    // null elements count as empty strings (split never yields null, but
    // the kernel must not NPE on hand-built arrays)
    val withNull = kernel(Seq("a", null, "a"))
    assert(withNull.getLong(0) == 1L)
    // 2-gram count tie resolves to the lexicographic (binary UTF-8) min:
    // "a b" and "b a" both appear twice in a-b-a-b-a
    val tie = kernel(Seq("a", "b", "a", "b", "a"))
    assert(tie.getUTF8String(4).toString == "a b" && tie.getLong(5) == 2L)
    // 21 words of the same token: 3 blocks, the two full blocks repeat
    val rep = kernel(Seq.fill(21)("x"))
    assert(rep.getLong(0) == 3L && rep.getLong(1) == 2L)
    assert(rep.getLong(2) == 2 * 19L + 1L && rep.getLong(3) == 2 * 19L)
    // supplementary-plane chars count as ONE code point each (oracle
    // length(btext) semantics), not two UTF-16 units: 21 copies of a
    // 2-code-point token => full block = 10 tokens * 2 cp + 9 spaces = 29 cp
    val astral = kernel(Seq.fill(21)("🦊a")) // 🦊a
    assert(astral.getLong(0) == 3L && astral.getLong(1) == 2L)
    assert(astral.getLong(2) == 2 * 29L + 2L, "blk_chars must be code points")
    assert(astral.getLong(3) == 2 * 29L)
  }

  test("stats kernel equals the brute-force definition on randomized docs") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    // tiny: forces dup blocks + gram ties; 🦊 exercises code-point counting
    val vocab = Vector("a", "b", "cc", "d", "🦊")
    def reference(toks: Vector[String]) = {
      val blocks = (if (toks.isEmpty) Vector(Vector.empty[String])
                    else toks.grouped(10).toVector).map(_.mkString(" "))
      val bc = blocks.groupBy(identity).view.mapValues(_.size).toMap
      val dupB = bc.collect { case (_, c) if c >= 2 => c.toLong }.sum
      def cp(k: String) = k.codePointCount(0, k.length).toLong
      val blkChars = bc.map { case (k, c) => c.toLong * cp(k) }.sum
      val dupChars = bc.collect { case (k, c) if c >= 2 => c.toLong * cp(k) }.sum
      val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toVector
      val (tg, tn) =
        if (grams.isEmpty) ("", 0L)
        else {
          val gc = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val mx = gc.values.max
          (gc.collect { case (g, c) if c == mx => g }.min, mx)
        }
      (blocks.size.toLong, dupB, blkChars, dupChars, tg, tn)
    }
    (0 until 200).foreach { _ =>
      val toks = Vector.fill(rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
      val got = graft.functions.TextStats.blockRepStatsKernel(
        ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray))
      val (nb, db, bc, dc, tg, tn) = reference(toks)
      assert(got.getLong(0) == nb && got.getLong(1) == db, s"blocks: $toks")
      assert(got.getLong(2) == bc && got.getLong(3) == dc, s"chars: $toks")
      assert(got.getUTF8String(4).toString == tg && got.getLong(5) == tn,
        s"top gram: $toks")
    }
  }

  test("rewrite equals the brute-force definition on randomized docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("x", "y", "z", "q")
    // small vocab + short blocks => plenty of genuine intra-doc block repeats
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(70)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val d = Files.createTempDirectory("graft-repetition-rnd").toString
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    def reference(text: String): (Long, Long, String) = {
      val ws = text.split(" ", -1)
      val blocks = ws.grouped(10).map(_.mkString(" ")).toVector
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      blocks.foreach(seen += _)
      (blocks.size.toLong, seen.size.toLong, seen.mkString(" "))
    }

    val got = q("text_repetition_rewrite")(spark, d).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val (nb, nk, clean) = reference(docs(r.getLong(0).toInt)._2)
      assert(r.getLong(2) == nb, s"n_blocks doc ${r.getLong(0)}")
      assert(r.getLong(3) == nk, s"n_kept doc ${r.getLong(0)}")
      assert(r.getLong(4) == clean.length.toLong, s"len_after doc ${r.getLong(0)}")
      assert(r.getString(5) == md5hex(clean), s"md5 doc ${r.getLong(0)}")
    }
  }

  test("char_entropy_stats == the explode/groupBy decimal chain, bit-for-bit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val texts = Seq("", "a", "aa", "ab", "hello world", "\u00e9\u00e9x",
      "\ud83d\ude00\ud83d\ude00a", "the quick brown fox " * 20,
      "\t\n mixed 123 !?", "z" * 500)
    val df = texts.toDF("text")
    val kernel = df.select(col("text"),
        graft.functions.TextStats.char_entropy_stats(col("text")).as("es"))
      .select(col("text"), col("es.n_elems").as("kn"),
        col("es.n_distinct").as("kd"), col("es.s").as("ks"))
    val chain = df
      .select(col("text"), explode(expr("split(text, '')")).as("c"))
      .groupBy(col("text"), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("text"))
      .agg(sum(col("cnt")).as("rn"), count(lit(1)).as("rd"),
        sum((col("cnt").cast("double") * log(col("cnt").cast("double")))
          .cast("decimal(30,12)")).cast("double").as("rs"))
    val bad = kernel.join(chain, Seq("text"))
      .where(not(col("kn") <=> col("rn")) || not(col("kd") <=> col("rd")) ||
        not(col("ks") <=> col("rs"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }
}

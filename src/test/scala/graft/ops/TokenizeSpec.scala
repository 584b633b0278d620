package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Tokenize

/** The native tokenizers must be EXACTLY regexp_extract_all's output —
  * every dedup/text/curation kernel's oracle hash rides on that. Pinned
  * two ways: a fixed adversarial corpus (every Java-\s char, non-\s
  * Unicode whitespace, astral chars, empty/whitespace-only strings, runs
  * at both ends) and a ScalaCheck sweep over random Unicode strings.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",
    " ",
    "\t\n\u000B\f\r ",                       // all six Java-\s chars
    "a",
    " a ",
    "one two  three\tfour\nfive\rsix\fseven\u000Beight",
    " nbsp is not java ws",  // NBSP/LS are \S to Java
    "café naïve 你好世界",  // multi-byte chars
    "emoji 😀mid😀 token",        // astral (surrogate pair)
    "ABC xyz MiXeD09 a1b2c3",
    "trailing space ",
    " leading",
    "a\u0000b",                              // NUL is \S to Java
    "Ångström ärgern Ödipus",
    "the a of and to in is it that these its toe ant ii tt aa", // stopword edges
    ("wrap " * 200).trim                     // long doc
  )

  test("ws_tokens == regexp_extract_all(s, '\\S+', 0) on adversarial corpus") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        Tokenize.ws_tokens(col("t")).as("k"),
        expr("regexp_extract_all(t, '\\\\S+', 0)").as("r"))
    val bad = df.where(not(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("alpha_runs == regexp_extract_all(lower(s), '[a-z]+', 0) on adversarial corpus") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        Tokenize.alpha_runs(lower(col("t"))).as("k"),
        expr("regexp_extract_all(lower(t), '[a-z]+', 0)").as("r"))
    val bad = df.where(not(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("count_alpha == size(regexp_extract_all(s, '[A-Za-z]', 0))") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        Tokenize.count_alpha(col("t")).as("k"),
        size(expr("regexp_extract_all(t, '[A-Za-z]', 0)")).as("r"))
    val bad = df.where(not(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("null input returns null, like the regexp original") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("t")
      .select(Tokenize.ws_tokens(col("t")).as("k"),
        expr("regexp_extract_all(t, '\\\\S+', 0)").as("r"))
    val bad = df.where(not(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("quality_word_stats == the regexp+HOF classifier features") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        Tokenize.quality_word_stats(lower(col("t"))).as("qs"),
        expr("regexp_extract_all(lower(t), '[a-z]+', 0)").as("wa"))
      .select(
        col("qs.nw").as("knw"), size(col("wa")).as("rnw"),
        col("qs.n_stop").as("kst"),
        size(expr("""filter(wa, x -> array_contains(
                    |  array('the','a','of','and','to','in','is','it'), x))"""
          .stripMargin)).as("rst"),
        col("qs.sum_len").as("ksl"),
        expr("aggregate(wa, 0, (a, x) -> a + length(x))").as("rsl"))
    val bad = df.where(not(col("knw") <=> col("rnw")) ||
      not(col("kst") <=> col("rst")) || not(col("ksl") <=> col("rsl"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("ws_bigram_hashes == tokenize->transform->xxhash64 chain") {
    // positional comparison (collect_list order is not guaranteed):
    // pos-explode both forms and full-outer join on (string, position)
    val base = adversarial.distinct.toDF("t")
    val k = base.select(col("t"),
        posexplode_outer(Tokenize.ws_bigram_hashes(col("t"))))
      .toDF("t", "p", "kb")
    val r = base.select(col("t"), Tokenize.ws_tokens(col("t")).as("w"))
      .select(col("t"), posexplode_outer(expr(
        "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
          "u -> struct(w[u - 1] AS w1, w[u] AS w2)) " +
        "ELSE array() END")))
      .toDF("t", "p", "b")
      .select(col("t"), col("p"),
        when(col("b").isNotNull, struct(xxhash64(col("b.w1")).as("w1"),
          xxhash64(col("b.w2")).as("w2"))).as("rb"))
    val bad = k.join(r, Seq("t", "p"), "full_outer")
      .where(not(col("kb") <=> col("rb"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("gram_hashes == xxhash64 over word_ngrams, set-equal (dedup by hash)") {
    // the fused kernel dedups by hash where word_ngrams dedups by string;
    // absent an intra-doc 64-bit collision (none in any test corpus) the
    // SETS are equal — compare after sorting, and pin sizes too, over
    // every gram width the ops use plus edges (n < gram, empty, 1 token)
    for (g <- Seq(2, 3, 5)) {
      val df = adversarial.toDF("t")
        .select(col("t"),
          sort_array(graft.functions.VectorOps.gram_hashes(
            Tokenize.ws_tokens(col("t")), g)).as("k"),
          sort_array(transform(graft.functions.VectorOps.word_ngrams(
            Tokenize.ws_tokens(col("t")), g), x => xxhash64(x))).as("r"))
      val bad = df.where(not(col("k") <=> col("r"))).collect()
      assert(bad.isEmpty, s"gram=$g: " + bad.mkString("; "))
    }
  }

  test("poly_fingerprint == aggregate(split(text,''), 7, poly31 mod 1e9+7)") {
    val df = adversarial.toDF("t")
      .select(col("t"),
        Tokenize.poly_fingerprint(col("t")).as("k"),
        expr("""aggregate(split(t, ''), cast(7 as bigint),
               |          (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"""
          .stripMargin).as("r"))
    val bad = df.where(not(col("k") <=> col("r"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("alpha_pair_codes == the exploded substr pair chain, as multisets") {
    val corpus = adversarial ++ Seq("ab", "a", "", "abc def-gh", "aa aa")
    val kernel = corpus.toDF("t")
      .select(col("t"),
        explode(Tokenize.alpha_pair_codes(lower(col("t")))).as("pc"))
      .select(col("t"), expr("chr(pc div 256) || chr(pc % 256)").as("pair"))
      .groupBy(col("t"), col("pair")).agg(count(lit(1)).as("kn"))
    val ref = corpus.toDF("t")
      .select(col("t"),
        explode(Tokenize.alpha_runs(lower(col("t")))).as("wd"))
      .where(length(col("wd")) >= 2)
      .select(col("t"), explode(expr(
        "transform(sequence(1, length(wd) - 1), u -> substr(wd, u, 2))"))
        .as("pair"))
      .groupBy(col("t"), col("pair")).agg(count(lit(1)).as("rn"))
    val bad = kernel.join(ref, Seq("t", "pair"), "full_outer")
      .where(not(col("kn") <=> col("rn"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("bpe_counts == nested-replace aggregate chain") {
    // merge list exercising overlap ("aa" on runs), chaining ("ab" then a
    // pair over the residue), and markers never re-merging; compare the
    // kernel against the exact expression chain it replaces
    val merges = Seq("aa", "ab", "he", "in", "it", "of", "th", "to")
    val enc = graft.ops.TextOps.bpeEncodeSql(merges, "x")
    val corpus = adversarial ++ Seq(
      "aaa aaaa ababab abab", "the theme thine with it", "zzz")
    val df = corpus.toDF("t")
      .select(col("t"), Tokenize.alpha_runs(lower(col("t"))).as("wa"))
      .select(col("t"),
        Tokenize.bpe_counts(col("wa"), merges).as("bc"),
        expr("aggregate(wa, 0L, (a, x) -> a + length(x))").as("rc"),
        expr(s"aggregate(wa, 0L, (a, x) -> a + length($enc))").as("rt"))
    val bad = df.where(not(col("bc.n_chars") <=> col("rc")) ||
      not(col("bc.n_tokens") <=> col("rt"))).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("property: kernels equal regexp on random unicode strings") {
    // strings mixing ASCII whitespace, letters, digits, and arbitrary
    // Unicode (incl. astral); evaluated through the same Catalyst path
    val ch = Gen.frequency(
      4 -> Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'),
      6 -> Gen.alphaChar, 2 -> Gen.numChar,
      2 -> Gen.oneOf(' ', 'é', '你', ' '),
      1 -> Gen.oneOf("😀".toSeq))
    val str = Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
    val prop = Prop.forAllNoShrink(Gen.listOfN(40, str)) { ss =>
      val df = ss.toDF("t").select(
        Tokenize.ws_tokens(col("t")).as("kw"),
        expr("regexp_extract_all(t, '\\\\S+', 0)").as("rw"),
        Tokenize.alpha_runs(lower(col("t"))).as("ka"),
        expr("regexp_extract_all(lower(t), '[a-z]+', 0)").as("ra"),
        Tokenize.count_alpha(col("t")).as("kc"),
        size(expr("regexp_extract_all(t, '[A-Za-z]', 0)")).as("rc"))
      val bad = df.where(not(col("kw") <=> col("rw")) ||
        not(col("ka") <=> col("ra")) || not(col("kc") <=> col("rc"))).collect()
      Prop(bad.isEmpty) :| bad.mkString("; ")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

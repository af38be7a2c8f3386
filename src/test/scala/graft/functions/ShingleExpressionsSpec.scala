package graft.functions

import graft.SparkSpec
import graft.functions.ShingleFunctions._
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("shingle_hashes yields len-n+1 hashes, deterministic") {
    val df = Seq("abcdef").toDF("t")
    val h1 = df.select(shingle_hashes($"t", 3)).as[Seq[Long]].head()
    val h2 = df.select(shingle_hashes($"t", 3)).as[Seq[Long]].head()
    assert(h1.length == 4) // abc bcd cde def
    assert(h1 == h2)
    // equal shingles hash equal: "abcabc" windows 1 and 4 are both "abc"
    val h3 = Seq("abcabc").toDF("t").select(shingle_hashes($"t", 3)).as[Seq[Long]].head()
    assert(h3(0) == h3(3))
  }

  test("shingle_hashes handles multi-byte codepoints by codepoint count") {
    val h = Seq("héllo").toDF("t").select(shingle_hashes($"t", 2)).as[Seq[Long]].head()
    assert(h.length == 4) // hé él ll lo
  }

  test("short input gives empty array, null gives null") {
    val h = Seq("ab").toDF("t").select(shingle_hashes($"t", 3)).as[Seq[Long]].head()
    assert(h.isEmpty)
    val r = Seq(Option.empty[String]).toDF("t").select(shingle_hashes($"t", 3)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("md5_shingle_hashes matches the DuckDB hash contract") {
    // CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) — recompute with
    // MessageDigest hex and compare against the kernel's byte math.
    def ref(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val h = Seq("abcdef").toDF("t")
      .select(md5_shingle_hashes($"t", 3)).as[Seq[Long]].head()
    assert(h == Seq("abc", "bcd", "cde", "def").map(ref))
    // multi-byte codepoints: windows count codepoints, hash counts bytes
    val h2 = Seq("héllo").toDF("t")
      .select(md5_shingle_hashes($"t", 2)).as[Seq[Long]].head()
    assert(h2 == Seq("hé", "él", "ll", "lo").map(ref))
    assert(h.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("md5_simhash: exact dups equal, empty null, 60-bit range") {
    val df = Seq(
      (0L, Seq("a", "b", "a")), (1L, Seq("a", "b", "a")), (2L, Seq("z", "q", "w"))
    ).toDF("id", "ts")
    val sk = df.select($"id", md5_simhash($"ts").as("sk"))
      .as[(Long, Long)].collect().toMap
    assert(sk(0L) == sk(1L))
    assert(sk(0L) != sk(2L))
    assert(sk.values.forall(v => v >= 0L && v < (1L << 60)))
    val r = Seq(Seq.empty[String]).toDF("ts").select(md5_simhash($"ts")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("ngram_hashes is order-sensitive and counts m-n+1") {
    val df = Seq(Seq("a", "b", "c", "a", "b")).toDF("ts")
    val h = df.select(ngram_hashes($"ts", 2)).as[Seq[Long]].head()
    assert(h.length == 4) // ab bc ca ab
    assert(h(0) == h(3)) // same bigram "a b"
    assert(h(0) != h(1))
    // order matters: (a,b) != (b,a)
    val g = Seq(Seq("b", "a")).toDF("ts").select(ngram_hashes($"ts", 2)).as[Seq[Long]].head()
    assert(g(0) != h(0))
  }

  test("minhash_longs: k values, identical sets identical sigs, empty -> null") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(3L, 2L, 1L), Seq.empty[Long]))
      .toDF("a", "b", "e")
    val row = df.select(
      minhash_longs($"a", 32), minhash_longs($"b", 32), minhash_longs($"e", 32)).collect()(0)
    val sa = row.getSeq[Long](0); val sb = row.getSeq[Long](1)
    assert(sa.length == 32)
    assert(sa == sb) // set semantics: order-insensitive
    assert(row.isNullAt(2))
  }

  test("minhash signature similarity estimates jaccard") {
    // two 100-token sets sharing 80 tokens: j = 80/120 ~ 0.67
    val a = (1 to 100).map(_.toLong)
    val b = (21 to 120).map(_.toLong)
    val df = Seq((a, b)).toDF("a", "b")
    val est = df.select(
        zip_with(minhash_longs($"a", 256), minhash_longs($"b", 256),
          (x, y) => when(x === y, 1).otherwise(0)).as("eq"))
      .select(aggregate($"eq", lit(0), _ + _).cast("double") / 256)
      .as[Double].head()
    assert(math.abs(est - 80.0 / 120.0) < 0.1, s"est=$est")
  }

  test("sorted_jaccard matches set jaccard") {
    val df = Seq((Seq(1L, 2L, 3L, 5L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val j = df.select(sorted_jaccard($"a", $"b")).as[Double].head()
    assert(j == 2.0 / 5.0) // inter {2,3}, union {1,2,3,4,5}
    val e = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(sorted_jaccard($"a", $"b")).collect()(0)
    assert(e.isNullAt(0))
  }

  test("property: shingle count matches codepoint math on random unicode") {
    val rng = new scala.util.Random(42)
    val alphabet = "aé中𝄞 x".toCharArray // 1-, 2-, 3-byte, surrogate pair, space
    val samples = Seq.fill(150)(
      (0 until rng.nextInt(20)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = samples.toDF("t")
    val rows = df.select(shingle_hashes($"t", 3).as("h"), $"t").collect()
    rows.foreach { r =>
      val cp = r.getString(1).codePointCount(0, r.getString(1).length)
      val want = math.max(0, cp - 2)
      assert(r.getSeq[Long](0).length == want,
        s"'${r.getString(1)}' cp=$cp got=${r.getSeq[Long](0).length}")
    }
  }

  test("property: sorted_jaccard equals set-math jaccard on random sets") {
    val rng = new scala.util.Random(7)
    val samples = Seq.fill(100)((
      rng.shuffle((0L to 40L).toList).take(rng.nextInt(20) + 1).sorted,
      rng.shuffle((0L to 40L).toList).take(rng.nextInt(20) + 1).sorted))
    val df = samples.toDF("a", "b")
    val got = df.select(sorted_jaccard($"a", $"b")).as[Double].collect()
    samples.zip(got).foreach { case ((a, b), j) =>
      val want = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(j == want, s"a=$a b=$b got=$j want=$want")
    }
  }

  test("property: word_tokens equals the regex/HOF formulation on random unicode") {
    val rng = new scala.util.Random(99)
    val alphabet = "aé中𝄞 ,.!3Ⅷ²x-_".toCharArray
    val samples = Seq.fill(200)(
      (0 until rng.nextInt(30)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = samples.toDF("t")
    val bad = df.select(
        word_tokens($"t").as("native"),
        filter(split(lower($"t"), "[^\\p{L}\\p{N}]+"), s => length(s) > 0).as("hof"))
      .filter(!($"native" <=> $"hof"))
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("minhash_agreement counts equal slots; null on length mismatch") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L))).toDF("a", "b")
    assert(df.select(minhash_agreement($"a", $"b")).as[Int].head() == 2)
    val bad = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
      .select(minhash_agreement($"a", $"b")).collect()(0)
    assert(bad.isNullAt(0))
  }

  test("md5_ngram_hashes matches per-gram md5-60 of the joined string") {
    // gram "a b" → md5-60 of the literal joined bytes, same contract
    // as md5_shingle_hashes (first 15 hex chars as a 60-bit int)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xFFL)) >>> 4
    }
    val out = Seq(Seq("a", "b", "c")).toDF("w")
      .select(md5_ngram_hashes($"w", 2)).as[Seq[Long]].head()
    assert(out == Seq(h60("a b"), h60("b c")))
  }

  test("md5_ngram_minhash: slot = min salted hash; dup grams don't change it") {
    val sig = Seq(Seq("a", "b", "c")).toDF("w")
      .select(md5_ngram_minhash($"w", 2, 8)).as[Seq[Long]].head()
    assert(sig.length == 8)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xFFL)) >>> 4
    }
    val expect = (0 until 8).map(s => Seq("a b", "b c").map(g => h60(s"$s|$g")).min)
    assert(sig == expect)
    // duplicate gram occurrences ("a b" twice) change nothing: the min
    // ranges over the gram MULTISET {"a b","b c","c a","a b"} but
    // equals the min over its distinct set
    val dup = Seq(Seq("a", "b", "c", "a", "b")).toDF("w")
      .select(md5_ngram_minhash($"w", 2, 8)).as[Seq[Long]].head()
    val expectDup = (0 until 8).map(s =>
      Seq("a b", "b c", "c a").map(g => h60(s"$s|$g")).min)
    assert(dup == expectDup)
  }

  test("md5_ngram_minhash: null below n tokens") {
    val r = Seq(Seq("only")).toDF("w")
      .select(md5_ngram_minhash($"w", 3, 4)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("property: md5_ngram_hashes equals the per-gram md5-60 of joined strings") {
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "δδ", "汉", "x1")
    val cases = Seq.fill(40)(Seq.fill(rng.nextInt(8))(vocab(rng.nextInt(vocab.length))))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xFFL)) >>> 4
    }
    val got = cases.map(_.toArray).toSeq.toDF("w")
      .select(md5_ngram_hashes($"w", 2)).as[Seq[Long]].collect()
    val want = cases.map(c => c.sliding(2).filter(_.length == 2)
      .map(g => h60(g.mkString(" "))).toSeq)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"case $i: ${cases(i)}")
    }
  }

  test("fingerprint: equal normalized texts, equal fingerprints") {
    val df = Seq(
      ("the quick  brown fox", "The quick brown FOX"),
      ("totally different content here", "the quick brown fox")).toDF("a", "b")
    val rows = df.select(
      (fingerprint($"a") === fingerprint($"b")).as("eq")).as[Boolean].collect()
    assert(rows(0) && !rows(1))
  }

  test("winnow_minima: deque kernel equals the naive per-window minimum model " +
      "on random arrays; short and empty arrays degenerate correctly") {
    import graft.functions.ShingleFunctions.winnow_minima
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOf(Gen.choose(0L, 50L)) // small domain → dense ties
    val arrays = Gen.listOfN(150, gen)
      .apply(Gen.Parameters.default, Seed(21L)).getOrElse(Nil)
    assert(arrays.nonEmpty)
    for (w <- Seq(1, 3, 4, 7)) {
      def model(xs: List[Long]): Seq[Long] =
        if (xs.isEmpty) Seq.empty
        else if (xs.size <= w) Seq(xs.min)
        else xs.sliding(w).map(_.min).toSeq.distinct.sorted
      val got = arrays.zipWithIndex
        .map { case (xs, i) => (i.toLong, xs.toArray) }
        .toDF("id", "hs")
        .select($"id", winnow_minima($"hs", w).as("m"))
        .as[(Long, Seq[Long])].collect().sortBy(_._1)
      got.zip(arrays).foreach { case ((_, m), xs) =>
        assert(m.sorted == model(xs), s"w=$w xs=$xs")
      }
    }
  }

  test("luhn_valid_count: kernel agrees with Spark's own luhn_check on " +
      "every 13-19 digit candidate; known card fixtures pin both sides") {
    // deterministic pseudo-random digit runs + the classic fixtures
    val cands = (1 to 200).map { i =>
      val len = 13 + (i * 7) % 7
      (1 to len).map(j => ((i * 31 + j * 17) % 10)).mkString
    } ++ Seq("4111111111111111", "4111111111111112", "79927398713427")
    val df = Seq(cands).toDF("arr")
    val viaKernel = df.select(luhn_valid_count($"arr")).as[Long].head()
    val viaBuiltin = df.select(
      org.apache.spark.sql.functions.expr(
        "CAST(size(filter(arr, c -> luhn_check(c))) AS BIGINT)"))
      .as[Long].head()
    assert(viaKernel == viaBuiltin, s"$viaKernel vs $viaBuiltin")
    // and the empty/null contracts
    assert(Seq(Seq.empty[String]).toDF("arr")
      .select(luhn_valid_count($"arr")).as[Long].head() == 0L)
    assert(Seq((1, None: Option[Seq[String]])).toDF("i", "arr")
      .select(luhn_valid_count($"arr")).as[Option[Long]].head().isEmpty)
  }

  test("iban_valid_count: known-good GB82/DE89 pass, check-digit " +
      "mutations fail, rotation handles any length") {
    val df = Seq(Seq(
      "GB82WEST12345698765432", // valid
      "GB83WEST12345698765432", // mutated check digits
      "DE89370400440532013000", // valid
      "DE89370400440532013001", // mutated BBAN
      "FR1420041010050500013M02606" // valid (27 chars, letter in BBAN)
    )).toDF("arr")
    assert(df.select(iban_valid_count($"arr")).as[Long].head() == 3L)
  }

  test("min_full_period: KMP identity agrees with the brute-force " +
      "divisor definition on every small string over a 2-char alphabet") {
    import graft.functions.ShingleKernels
    def model(s: String): Long = {
      val n = s.length
      if (n == 0) 0L
      else (1 to n).find(p => n % p == 0 &&
        s == (s.take(p) * (n / p))).get.toLong
    }
    def kern(s: String): Long =
      ShingleKernels.minFullPeriod(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
    // exhaustive up to length 10 over {a, b} — 2046 strings
    for (len <- 0 to 10; bits <- 0 until (1 << len)) {
      val s = (0 until len).map(i => if (((bits >> i) & 1) == 0) 'a' else 'b').mkString
      assert(kern(s) == model(s), s"'$s'")
    }
    // multi-byte sanity: periods over non-ASCII text
    assert(kern("éé") == 1L)
    assert(kern("éxéx") == 2L)
    assert(kern("abcabcab") == 8L) // border 5 -> p=3, 8 % 3 != 0 -> aperiodic
    // and through the Catalyst expression (codegen path)
    val viaExpr = Seq("ababab", "abcab", "")
      .toDF("s").select(min_full_period($"s")).as[Long].collect().toSeq
    assert(viaExpr == Seq(2L, 5L, 0L), viaExpr.toString)
  }

  test("checksum kernels fail soft on arbitrary input (ADVICE r16): " +
      "short/empty/non-charset candidates count invalid, never crash") {
    // the regex-produced candidates in piiChecksums are always clean,
    // but these are PUBLIC expressions over arbitrary user arrays —
    // pin the built-in-matching fail-soft contract
    import graft.functions.ShingleKernels
    // Luhn: empty must NOT be valid (0 % 10 == 0 trap), non-digits invalid
    assert(!ShingleKernels.luhnValid(""))
    assert(!ShingleKernels.luhnValid("4111-1111"))
    assert(!ShingleKernels.luhnValid("abc"))
    assert(ShingleKernels.luhnValid("4111111111111111"))
    // IBAN: < 5 chars used to throw StringIndexOutOfBounds on the
    // rotated index; lowercase/punctuation must count invalid
    Seq("", "G", "GB", "GB8", "GB82").foreach(s =>
      assert(!ShingleKernels.ibanMod97Valid(s), s"'$s'"))
    assert(!ShingleKernels.ibanMod97Valid("gb82west12345698765432"))
    assert(!ShingleKernels.ibanMod97Valid("GB82 WEST 1234"))
    assert(ShingleKernels.ibanMod97Valid("GB82WEST12345698765432"))
    // and end-to-end through the Catalyst expressions (interpreted +
    // codegen paths both take the guarded kernel)
    val hostile = Seq(Seq("", "GB", "41x1", "GB82WEST12345698765432",
      "4111111111111111")).toDF("arr")
    assert(hostile.select(luhn_valid_count($"arr")).as[Long].head() == 1L)
    assert(hostile.select(iban_valid_count($"arr")).as[Long].head() == 1L)
  }
}

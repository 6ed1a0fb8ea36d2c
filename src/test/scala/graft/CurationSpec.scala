package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val docs = Seq(
    // 0: clean prose — passes every gate except the 20-word minimum
    (0L, "the quick brown fox jumps over the lazy dog"),
    // 1: pathological repetition — top word is half the mass
    (1L, ("spam " * 30).trim + " one two three four five six seven eight nine ten"),
    // 2: empty
    (2L, ""),
    // 3: 25 distinct words, mean length in range -> keep
    (3L, (1 to 25).map(i => s"word$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("gopherSignals: counts, fractions, and the keep verdict") {
    val got = Curation.gopherSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getLong(1) === 9) // n_words
    assert(!got(0L).getBoolean(5)) // too short to keep
    // doc 1: "spam" appears 30 times out of 40 words
    assert(got(1L).getLong(1) === 40)
    assert(got(1L).getDouble(3) === 30.0 / 40.0) // top_word_frac
    // 29 duplicate "spam spam" bigrams collapse: 39 total, 11 distinct
    assert(got(1L).getDouble(4) === 1.0 - 11.0 / 39.0)
    assert(!got(1L).getBoolean(5)) // repetition-gated
    // empty doc: zero words, null signals, keep=false (not null)
    assert(got(2L).getLong(1) === 0)
    assert(got(2L).isNullAt(2) && !got(2L).getBoolean(5))
    assert(got(3L).getBoolean(5)) // clean 25-word doc survives
  }

  test("tfidfTopTerms: rare terms outrank common ones, ties break on term") {
    val corpus = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma"),
      (3L, "alpha delta")
    ).toDF("doc_id", "text")
    val got = Curation.tfidfTopTerms(corpus, "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    // every doc's rarest term (df=1) wins over 'alpha' (df=3)
    assert(got.map(_.getString(1)).toSeq === Seq("beta", "gamma", "delta"))
    // doc 1: tf=2, dl=3, N=3, df=1 -> (2/3)*(3/1)
    assert(got(0).getDouble(4) === (2.0 / 3.0) * 3.0)
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val corpus = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val sampled = Curation.stratifiedSample(
      corpus, "doc_id", "lang", Map("en" -> 100), defaultPermille = 300)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    // md5 buckets are uniform-ish: en ~10% of 1000, fr ~30% of 1000
    assert(byLang("en") > 50 && byLang("en") < 150)
    assert(byLang("fr") > 230 && byLang("fr") < 370)
    // repartitioning must not change membership (hash of id, not of row order)
    val again = Curation.stratifiedSample(
      corpus.repartition(7), "doc_id", "lang", Map("en" -> 100), defaultPermille = 300)
    assert(again.select("doc_id").except(sampled.select("doc_id")).count() === 0)
    assert(sampled.select("doc_id").except(again.select("doc_id")).count() === 0)
  }

  test("contamination: containment fraction against the train gram index") {
    val train = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "one two three")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "alpha beta gamma delta epsilon"), // verbatim copy -> 1.0
      (2L, "alpha beta gamma nine ten"),      // 1 of 3 grams hit
      (3L, "x y z w"),                        // disjoint -> 0.0
      (4L, "too short")                       // < 3 tokens -> no grams
    ).toDF("doc_id", "text")
    val got = Curation.contamination(train, test, "doc_id", "text", nGram = 3, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(3) === 1.0 && got(1L).getBoolean(4))
    assert(got(2L).getLong(1) === 3 && got(2L).getLong(2) === 1)
    assert(got(2L).getDouble(3) === 1.0 / 3.0 && got(2L).getBoolean(4))
    assert(got(3L).getDouble(3) === 0.0 && !got(3L).getBoolean(4))
    assert(got(4L).getLong(1) === 0 && got(4L).isNullAt(3) && !got(4L).getBoolean(4))
  }

  test("chunkTokens: window/stride arithmetic, short tail kept, empty dropped") {
    val corpus = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0, 4
      (2L, "a b c"),                                  // one short chunk
      (3L, "")                                        // no chunks
    ).toDF("doc_id", "text")
    val got = Curation.chunkTokens(corpus, "doc_id", "text", chunkSize = 6, stride = 4)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc(1L).map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((0L, 6L), (1L, 6L)))
    assert(byDoc(1L).head.getString(3) === "t1 t2 t3 t4 t5 t6")
    assert(byDoc(1L)(1).getString(3) === "t5 t6 t7 t8 t9 t10") // 2-token overlap
    assert(byDoc(2L).map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((0L, 3L)))
    assert(!byDoc.contains(3L))
    // every token position is covered by at least one chunk
    val covered = byDoc(1L).flatMap(_.getString(3).split(" ")).toSet
    assert(covered === (1 to 10).map(i => s"t$i").toSet)
  }

  test("featureHashTf: sparse TF, stable buckets, per-doc weights sum to 1") {
    val corpus = Seq((1L, "a b a c"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = Curation.featureHashTf(corpus, "doc_id", "text", dims = 16).collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(2)).sum === 4) // tf mass = token count
    assert(math.abs(d1.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    // the repeated token collapses into ONE bucket row with tf 2
    assert(d1.count(_.getLong(2) == 2L) === 1)
    assert(!got.exists(_.getLong(0) == 2L)) // empty doc -> no rows
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("duplicateSpans + boilerplateRatio: shared footer flagged, unique prose not") {
    val footer = "subscribe to our newsletter for updates" // 6 tokens
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $footer"),
      (2L, s"one two three four five six seven $footer"),
      (3L, s"unique prose with no shared span at all here"),
      (4L, "short")
    ).toDF("doc_id", "text")
    val spans = Curation.duplicateSpans(corpus, "doc_id", "text", spanTokens = 3, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly the footer's four 3-gram spans repeat, each in docs {1, 2}
    assert(spans.length === 4)
    assert(spans.forall { case (s, n, first) =>
      n === 2L && first === 1L && footer.contains(s.split(" ").head) })
    assert(spans.map(_._1).contains("subscribe to our"))

    val ratios = Curation.boilerplateRatio(corpus, "doc_id", "text", spanTokens = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 10 distinct 3-gram spans (12 tokens), 4 boilerplate
    assert(ratios(1L).getLong(1) === 10L && ratios(1L).getLong(2) === 4L)
    assert(ratios(1L).getDouble(3) === 4.0 / 10.0)
    assert(ratios(3L).getLong(2) === 0L && ratios(3L).getDouble(3) === 0.0)
    // doc 4: shorter than the span -> zero spans, null ratio
    assert(ratios(4L).getLong(1) === 0L && ratios(4L).isNullAt(3))
  }

  test("exactSubstrSpans: variable-length repeats come out at maximal extents") {
    // a 12-token sentence shared by docs 1 and 2, at different offsets,
    // plus an 8-token within-doc repeat in doc 4 — L=5 grams must merge
    // into ONE 12-token extent (not 8 fixed spans) and TWO 8-token ones.
    val shared12 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val phrase8 = "p1 p2 p3 p4 p5 p6 p7 p8"
    val corpus = Seq(
      (1L, s"intro one two $shared12 tail three"),
      (2L, s"different start $shared12"),
      (3L, "completely unique prose with no repeated span anywhere at all today"),
      (4L, s"$phrase8 x y z $phrase8")
    ).toDF("doc_id", "text")
    val got = Curation.exactSubstrSpans(corpus, "doc_id", "text", minTokens = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got === Set(
      (1L, 3, 14, 12), // shared12 at tokens 3..14 — one maximal extent
      (2L, 2, 13, 12),
      (4L, 0, 7, 8), (4L, 11, 18, 8))) // within-doc repeats, gap 8 > 5 kept apart
  }

  test("exactSubstrStrip + boilerplateStrip: removal, reassembly, conventions") {
    val shared12 = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val phrase8 = "p1 p2 p3 p4 p5 p6 p7 p8"
    val corpus = Seq(
      (1L, s"intro one two $shared12 tail three"),
      (2L, s"different start $shared12"),
      (3L, "completely unique prose with no repeated span anywhere at all today"),
      (4L, s"$phrase8 x y z $phrase8"),
      (5L, "")
    ).toDF("doc_id", "text")
    val stripped = Curation.exactSubstrStrip(corpus, "doc_id", "text", minTokens = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stripped(1L) === (("intro one two tail three", 5L, 12L)))
    assert(stripped(2L) === (("different start", 2L, 12L)))
    assert(stripped(3L)._3 === 0L) // untouched
    assert(stripped(4L) === (("x y z", 3L, 16L))) // both in-doc copies removed
    assert(stripped(5L) === (("", 0L, 0L))) // empty doc survives as a row
    // boilerplate convention: DISTINCT docs — the within-doc repeat is NOT
    // chrome, so doc 4 keeps everything; the cross-doc sentence still goes
    val boiler = Curation.boilerplateStrip(corpus, "doc_id", "text", spanTokens = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(boiler(1L)._1 === "intro one two tail three")
    assert(boiler(4L) === ((s"$phrase8 x y z $phrase8", 19L, 0L)))
  }

  test("property: exactSubstrSpans equals a plain-Scala covered-extent replay") {
    val L = 3
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val corpus = (1L to 30L).map { id =>
      id -> Seq.fill(8 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def reference: Set[(Long, Int, Int, Int)] = {
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
      toks.foreach { case (_, ts) =>
        ts.sliding(L).filter(_.size == L).foreach(g =>
          counts(g) = counts.getOrElse(g, 0) + 1)
      }
      toks.flatMap { case (id, ts) =>
        val cov = ts.sliding(L).zipWithIndex
          .collect { case (g, p) if g.size == L && counts(g) >= 2 => p }.toSeq
        val groups = cov.foldLeft(List.empty[List[Int]]) {
          case (acc, p) if acc.nonEmpty && p - acc.head.head <= L =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        groups.map(g => (id, g.min, g.max + L - 1, g.max - g.min + L))
      }.toSet
    }
    val df = corpus.toDF("doc_id", "text").repartition(7)
    val got = Curation.exactSubstrSpans(df, "doc_id", "text", minTokens = L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got === reference)
    assert(got.nonEmpty) // the small vocab guarantees repeats
  }

  test("winnowFingerprints: window guarantee, short docs, and shared-text overlap") {
    val k = 3; val w = 4
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      // same text -> identical fingerprint set
      (2L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      // >= k tokens but fewer grams than one window -> exactly one fp (overall min)
      (3L, "tiny doc here now"),
      // < k tokens -> no fingerprints
      (4L, "too short")
    ).toDF("doc_id", "text")
    val got = Curation.winnowFingerprints(corpus, "doc_id", "text", k, w)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(got(1L) === got(2L), "identical docs must share all fingerprints")
    assert(got(3L).size === 1)
    assert(!got.contains(4L))

    // replay the SIGMOD'03 selection in plain Scala: every window of w
    // consecutive gram hashes must contain a selected fingerprint, and
    // every selected fingerprint must be some window's minimum
    def md5hex16(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val toks = "the quick brown fox jumps over the lazy dog and runs far away home".split(" ")
    val hashes = toks.sliding(k).map(g => md5hex16(g.mkString(" "))).toVector
    val windows = hashes.sliding(w).toVector
    val expected = windows.map(_.min).toSet
    assert(got(1L) === expected)
    assert(windows.forall(win => win.exists(got(1L))), "window coverage guarantee")
  }

  test("winnowMatches: duplicate pair found, boilerplate fingerprints suppressed") {
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val footer = "shared footer spans every document here"
    val corpus = Seq(
      (1L, s"$body $footer"),
      (2L, s"$body $footer"),                            // exact dup of 1
      (3L, s"totally different words one two three four $footer"),
      (4L, s"other unrelated prose with nothing shared at all $footer"),
      (5L, s"fifth doc again nothing in common beyond the tail $footer")
    ).toDF("doc_id", "text")
    val got = Curation.winnowMatches(corpus, "doc_id", "text",
      k = 3, w = 4, minShared = 2, maxDocFreq = 2)
      .as[(Long, Long, Long)].collect().toSet
    // footer fingerprints occur in all 5 docs (> maxDocFreq) -> suppressed;
    // only the duplicated body can produce >= 2 shared rare fingerprints
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))
    // and the pair shares ALL of doc 1's rare fingerprints
    val fps = Curation.winnowFingerprints(
      corpus.filter($"doc_id" === 1), "doc_id", "text", 3, 4).count()
    assert(got.head._3 >= 2 && got.head._3 <= fps)
  }

  test("packSequences: offsets, bin spans, shard isolation, empty docs dropped") {
    val corpus = Seq(
      (1L, "en", "a b c d"),           // 4 tokens: [0,4)  bins 0-0
      (2L, "en", "e f g h i"),         // 5 tokens: [4,9)  bins 0-0
      (3L, "en", "j k l"),             // 3 tokens: [9,12) bins 0-1 (crosses)
      (4L, "en", ""),                  // dropped
      (5L, "fr", "x y z")              // own shard: [0,3) bins 0-0
    ).toDF("doc_id", "lang", "text")
    val got = Curation.packSequences(corpus, "doc_id", "text", "lang", seqLen = 10)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(1L) === ((4L, 0L, 0L, 0L)))
    assert(got(2L) === ((5L, 4L, 0L, 0L)))
    assert(got(3L) === ((3L, 9L, 0L, 1L)))
    assert(!got.contains(4L))
    assert(got(5L) === ((3L, 0L, 0L, 0L)))
  }

  test("temperatureSample: sqrt-share rates from counts, smallest stratum kept whole") {
    val corpus = ((0L until 1600L).map(i => (i, "en")) ++
      (10000L until 10100L).map(i => (i, "fr"))).toDF("doc_id", "lang")
    val got = Curation.temperatureSample(corpus, "doc_id", "lang")
    val rates = got.select("lang", "rate_permille").distinct()
      .as[(String, Long)].collect().toMap
    // cnt_min=100: en floor(1000*sqrt(100/1600)) = 250, fr = 1000
    assert(rates("en") === 250L && rates("fr") === 1000L)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") === 100L) // rate 1000 keeps every row
    assert(byLang("en") > 320 && byLang("en") < 480) // ~25% of 1600
    // membership is a function of doc_id alone, not of partitioning
    val again = Curation.temperatureSample(corpus.repartition(7), "doc_id", "lang")
    assert(again.select("doc_id").except(got.select("doc_id")).count() === 0)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0)
  }

  test("bm25Retrieve: hand-computed Okapi scores, rational idf, topK cut") {
    val corpus = Seq(
      (1L, "join join scan x"), // dl=4
      (2L, "join y z"),         // dl=3
      (3L, "a b c d e")         // dl=5, no query terms -> absent
    ).toDF("doc_id", "text")
    val got = Curation.bm25Retrieve(
      corpus, "doc_id", "text", queryTerms = Seq("join", "scan"), topK = 10)
      .collect()
    // N=3 total_len=12 avgdl=4.0; df(join)=2 df(scan)=1
    // idf(join)=(3-2+0.5)/2.5  idf(scan)=(3-1+0.5)/1.5
    val d1 = ((3.0 - 2.0 + 0.5) / 2.5) * ((2.0 * 2.2) / (2.0 + (1.2 * (0.25 + 0.75 * (4.0 / 4.0))))) +
      ((3.0 - 1.0 + 0.5) / 1.5) * ((1.0 * 2.2) / (1.0 + (1.2 * (0.25 + 0.75 * (4.0 / 4.0)))))
    val d2 = ((3.0 - 2.0 + 0.5) / 2.5) * ((1.0 * 2.2) / (1.0 + (1.2 * (0.25 + (0.75 * (3.0 / 4.0))))))
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // doc 3 never matches
    assert(math.abs(got(0).getDouble(2) - d1) < 1e-12)
    assert(math.abs(got(1).getDouble(2) - d2) < 1e-12)
    val top1 = Curation.bm25Retrieve(
      corpus, "doc_id", "text", queryTerms = Seq("join", "scan"), topK = 1).collect()
    assert(top1.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("bpeTrain: hand-computed merges, overlapping-run case, tie order") {
    // word counts: abab x3, aab x2, ba x5
    // pairs r1: (a,b)=2*3+1*2=8  (b,a)=1*3+5=8  (a,a)=2 -> tie 8 breaks to (a,b)
    val corpus = Seq(
      (1L, "abab abab abab aab aab"),
      (2L, "ba ba ba ba ba")
    ).toDF("doc_id", "text")
    val got = Curation.bpeTrain(corpus, "text", rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got(0) === ((1, "a", "b", "ab", 8L)))
    // after merging ab EVERYWHERE (abab -> [ab, ab] — the overlapping run
    // must merge both occurrences): pairs are (ab,ab)=3, (a,ab)=2, (b,a)=5
    assert(got(1) === ((2, "b", "a", "ba", 5L)))
  }

  test("bpeEncode: segmentation after the hand-computed merges") {
    val corpus = Seq(
      (1L, "abab abab abab aab aab"),
      (2L, "ba ba ba ba ba")
    ).toDF("doc_id", "text")
    // merges: round 1 (a,b)->ab, round 2 (b,a)->ba (see bpeTrain spec)
    val got = Curation.bpeEncode(corpus, "text", rounds = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got("abab") === ((3L, "ab ab")))
    assert(got("aab") === ((2L, "a ab")))
    assert(got("ba") === ((5L, "ba")))
  }

  test("bpeTokenIds: corpus-grain subword ids from the trained segmentation") {
    val corpus = Seq(
      (1L, "abab abab abab aab aab"),
      (2L, "ba ba ba ba ba")
    ).toDF("doc_id", "text")
    // after 2 rounds (see bpeTrain spec): abab -> [ab ab], aab -> [a ab],
    // ba -> [ba]; subword corpus freqs ab=8, ba=5, a=2 -> ids 1, 2, 3
    val got = Curation.bpeTokenIds(corpus, "doc_id", "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    val doc1 = (0 to 2).flatMap(p => Seq((1L, p, 0, 1), (1L, p, 1, 1))) ++
      Seq((1L, 3, 0, 3), (1L, 3, 1, 1), (1L, 4, 0, 3), (1L, 4, 1, 1))
    val doc2 = (0 to 4).map(p => (2L, p, 0, 2))
    assert(got === (doc1 ++ doc2).toSet)
  }

  test("bpe merge: odd self-paired runs merge greedy left-to-right (advice r4)") {
    // 'aaaaa' under merge (a,a) must give 'aa aa a' — canonical greedy —
    // never 'aa a aa' (the old two-pass replace consumed the shared
    // delimiter). 'ababababab' hits the same case as a 5-run of 'ab'
    // after round 2's (a,b) merge.
    val corpus = Seq((1L, "aaaaa aaaaa aaaaa ababababab")).toDF("doc_id", "text")
    // r1: (a,a)=4*3=12 beats (a,b)=5,(b,a)=4; r2: (a,b)=5; r3: (ab,ab)=4
    val merges = Curation.bpeTrain(corpus, "text", rounds = 3).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(merges.toSeq === Seq((1, "aa", 12L), (2, "ab", 5L), (3, "abab", 4L)))
    val enc = Curation.bpeEncode(corpus, "text", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(enc("aaaaa") === "aa aa a")
    assert(enc("ababababab") === "abab abab ab")
  }

  test("bpeTrain: merge exhaustion stops emitting rows, keeps the vocab (advice r4)") {
    val corpus = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // round 1 merges (a,b); rounds 2-5 have no adjacent pair left — the
    // sentinel must neither emit rows nor empty the vocabulary.
    val merges = Curation.bpeTrain(corpus, "text", rounds = 5).collect()
    assert(merges.map(r => (r.getInt(0), r.getString(3), r.getLong(4))).toSeq ===
      Seq((1, "ab", 3L)))
    val enc = Curation.bpeEncode(corpus, "text", rounds = 5).collect()
    assert(enc.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq(("ab", 3L, "ab")))
    assert(Curation.bpeTrain(corpus, "text", rounds = 0).count() === 0L)
  }

  test("property: bpeTrain equals a sequential greedy-BPE replay") {
    def replay(words: Map[String, Long], rounds: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Seq[(Seq[String], Long)] =
        words.map { case (w, n) => (w.map(_.toString): Seq[String]) -> n }.toSeq
      (1 to rounds).map { round =>
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + n
          }
        }
        val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        vocab = vocab.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2 // greedy left-to-right, consume both
            } else { out += syms(i); i += 1 }
          }
          out.toSeq -> n
        }
        (round, l, r, cnt)
      }
    }
    // shared fixture (repetition-heavy + empty docs) AND an odd-run corpus
    // whose winning merges are self-paired / re-paired symbols with run
    // lengths 5 and 7 — the case the two-pass replace diverged on.
    val oddRuns = Seq(
      (90L, "aaaaa aaaaa aaaaa aaaaaaa ababababab"),
      (91L, "ccccc cc c ababab abab"),
      (92L, "aabaa aabaa baaab")
    ).toDF("doc_id", "text")
    for (corpus <- Seq(docs, oddRuns)) {
      val words = corpus.collect().flatMap(r =>
          Option(r.getString(1)).toSeq.flatMap(_.trim.split("\\s+").filter(_.nonEmpty)))
        .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      val expected = replay(words, rounds = 4)
      val got = Curation.bpeTrain(corpus.repartition(5), "text", rounds = 4)
        .orderBy("round").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got === expected)
    }
  }

  test("lmScore: hand-computed conditional-bigram means") {
    val corpus = Seq(
      (1L, "a b a b"), // bigrams: (a b) x2, (b a) x1
      (2L, "a b c"),   // bigrams: (a b), (b c)
      (3L, "x")        // no bigrams
    ).toDF("doc_id", "text")
    // model: c(a b)=3, c(b a)=1, c(b c)=1; prefixes: a->3, b->2
    // p(a b)=1.0, p(b a)=0.5, p(b c)=0.5
    val got = Curation.lmScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 3L)
    assert(got(1L).getDouble(2) === (2.0 * 1.0 + 1.0 * 0.5) / 3.0)
    assert(got(2L).getLong(1) === 2L)
    assert(got(2L).getDouble(2) === (1.0 + 0.5) / 2.0)
    assert(got(3L).getLong(1) === 0L && got(3L).isNullAt(2))
  }

  test("dsirSelect matches a plain-Scala replay (buckets, smoothing, ordered fold)") {
    val rows = Seq(
      (1L, "en", "spark query fast spark query"),
      (2L, "en", "table scan fast fast table"),
      (3L, "de", "langsam tabelle spark query"),
      (4L, "de", "tabelle zeile spalte wert"),
      (5L, "en", "spark query fast table scan"),
      (6L, "de", "x")) // 1 token -> no bigrams -> not selectable
    val docs = rows.toDF("doc_id", "lang", "text")
    val dims = 16
    val got = Curation.dsirSelect(
      docs, docs.filter($"lang" === "en"), "doc_id", "text", dims = dims, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    def bigrams(text: String): Seq[String] =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
    def bucket(g: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % dims
    }
    val rawB = rows.filter(_._3.trim.split("\\s+").count(_.nonEmpty) >= 2)
      .map { case (id, _, tx) => id -> bigrams(tx).map(bucket) }
    val ct = rows.filter(_._2 == "en").flatMap(r => bigrams(r._3).map(bucket))
      .groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val cr = rawB.flatMap(_._2).groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val ttb = ct.values.sum + dims
    val trb = cr.values.sum + dims
    val exp = rawB.map { case (id, bs) =>
      val tfs = bs.groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
      val terms = tfs.map { case (b, tf) =>
        (tf * (ct.getOrElse(b, 0L) + 1L) * trb).toDouble /
          ((cr(b) + 1L) * ttb).toDouble
      }.toArray
      java.util.Arrays.sort(terms)
      val ssum = terms.foldLeft(0.0)(_ + _)
      (id, bs.size.toLong, ssum / bs.size.toDouble)
    }.sortBy { case (id, _, s) => (-s, id) }.take(4)
    assert(got.toSeq === exp)
    assert(!got.exists(_._1 == 6L))
  }

  test("paragraphDedup: first occurrence survives, later copies drop") {
    val docs = Seq(
      (1L, "alpha beta\nshared footer\nunique one"),
      (2L, "shared footer\ngamma delta"),
      (3L, "alpha beta\nshared footer")
    ).toDF("doc_id", "text")
    val got = Curation.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 is first for "alpha beta" and "shared footer": keeps all 3
    assert(got(1L) === (("alpha beta\nshared footer\nunique one", 3L, 0L)))
    // doc 2: footer already seen at (1,1) -> dropped; keeps "gamma delta"
    assert(got(2L) === (("gamma delta", 1L, 1L)))
    // doc 3: both paragraphs seen -> empty
    assert(got(3L) === (("", 0L, 2L)))
  }

  test("property: paragraphDedup equals a plain-Scala first-occurrence replay") {
    val rnd = new scala.util.Random(41)
    // small paragraph pool -> guaranteed cross-document duplicates
    val pool = Vector("alpha beta", "gamma", "delta eps zeta", "eta", "theta iota")
    val rows = (0L until 80L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(5))(pool(rnd.nextInt(pool.size))).mkString("\n"))
    }
    val got = Curation.paragraphDedup(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val seen = scala.collection.mutable.Set.empty[String]
    rows.foreach { case (id, text) =>
      val paras = text.split("\n+").map(_.trim).filter(_.nonEmpty)
      val kept = paras.filter(p => seen.add(p)) // global (doc, idx) order
      assert(got(id) === ((kept.mkString("\n"), kept.length.toLong,
        (paras.length - kept.length).toLong)), s"doc $id")
    }
  }

  test("paragraphDedup: blank paragraphs ignored, delimiter runs collapse") {
    val docs = Seq((7L, "  \n\n a b \n\n\n a b \n  ")).toDF("doc_id", "text")
    val got = Curation.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).head
    // two "a b" paragraphs -> within-doc dedup also applies (first kept)
    assert(got === (("a b", 1L, 1L)))
  }

  test("c4Filter: every line rule and every document verdict fires") {
    val docs = Seq(
      // all three line rules in one doc; survives the doc gates
      (1L, "one two three four five.\nsix seven eight nine ten!\n" +
        "alpha beta gamma delta eps?\nno terminal punctuation here at all\n" +
        "short line.\nplease enable javascript to continue browsing."),
      // kept lines pass, but the page mentions lorem ipsum (case-insensitive)
      (2L, "a b c d e.\nf g h i j.\nk l m n o.\nLorem Ipsum dolor sit amet."),
      // curly brace anywhere in the page drops it
      (3L, "a b c d e.\nf g h i j.\nk l m n o.\nfunction() { return; }"),
      // blocklist term inside a perfectly well-formed line
      (4L, "a b c d e.\nf g h i j.\nk l m n o p BADWORD.\n"),
      // fewer than minLinesPerDoc survivors
      (5L, "only one good line here today.\nnope"),
      // closing-quote terminal punctuation counts
      (6L, "he said \"fine words indeed today\"\nx y z w v.\nq r s t u!"),
      (7L, "")
    ).toDF("doc_id", "text")
    val got = Curation.c4Filter(docs, "doc_id", "text", blocklist = Seq("badword"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) === (("one two three four five.\nsix seven eight nine ten!\n" +
      "alpha beta gamma delta eps?", 6L, 3L, true)))
    assert(got(2L) === (("a b c d e.\nf g h i j.\nk l m n o.\n" +
      "Lorem Ipsum dolor sit amet.", 4L, 4L, false)))
    assert(got(3L) === (("a b c d e.\nf g h i j.\nk l m n o.", 4L, 3L, false)))
    assert(got(4L) === (("a b c d e.\nf g h i j.\nk l m n o p BADWORD.", 3L, 3L, false)))
    assert(got(5L) === (("only one good line here today.", 2L, 1L, false)))
    assert(got(6L) === (("he said \"fine words indeed today\"\nx y z w v.\nq r s t u!",
      3L, 3L, true)))
    assert(got(7L) === (("", 0L, 0L, false)))
    // map-only: the filter must not introduce any exchange
    val plan = Curation.c4Filter(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4Filter must be map-only:\n$plan")
  }

  test("htmlExtract: scripts vanish, nav dropped by link density, article survives") {
    val docs = Seq(
      (1L, "<html><head><style>p { color: red }</style>" +
        "<script>var x = 'hello world tracker';</script></head>" +
        "<body><nav><a href=\"/\">home</a> <a href=\"/a\">about</a> " +
        "<a href=\"/c\">contact</a></nav>" +
        "<p>the quick brown fox jumps</p>" +
        "<p>see <a href=\"/l\">this link</a> for more details here</p>" +
        "<div>ok</div><!-- hidden comment words --></body></html>"),
      (2L, "plain text with no tags at all"),
      (3L, "<p></p><script>only junk</script>"),
      // malformed nesting degrades to over-splitting, not failure
      (4L, "<p>alpha beta gamma <div>delta eps zeta</p>")
    ).toDF("doc_id", "html")
    val got = Curation.htmlExtract(docs, "doc_id", "html")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // blocks: nav (3 words, all anchored -> density 1 -> dropped), two
    // paras (kept; anchor text itself survives in the clean text), 'ok'
    // (short -> dropped); script/style/comment content appears nowhere
    assert(got(1L) === (("the quick brown fox jumps\n" +
      "see this link for more details here", 4L, 2L)))
    assert(got(2L) === (("plain text with no tags at all", 1L, 1L)))
    assert(got(3L) === (("", 0L, 0L)))
    assert(got(4L) === (("alpha beta gamma\ndelta eps zeta", 2L, 2L)))
    val plan = Curation.htmlExtract(docs, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"htmlExtract must be map-only:\n$plan")
  }

  test("corpusShuffle: dense per-shard ranks, hash-ordered, salt re-shuffles") {
    val df = (0L until 200L).toDF("doc_id")
    def run(salt: String) = Curation.corpusShuffle(df, "doc_id", salt, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val a = run("e0")
    assert(a.length === 200 && a.map(_._2).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    for ((_, rows) <- a.groupBy(_._2)) {
      // positions are dense 0..n-1 and follow the hex order of the salted key
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
      assert(rows.sortBy(_._3).map(_._4).toSeq === rows.map(_._4).sorted.toSeq)
    }
    // reproducible run-to-run; a new salt is a genuinely different epoch order
    assert(run("e0").toSet === a.toSet)
    assert(run("e1").map(r => r._1 -> r._3).toMap !== a.map(r => r._1 -> r._3).toMap)
  }

  test("urlCanonicalize: every normalization rule, identity preservation, dedup") {
    val urls = Seq(
      // all-noise variant: case, userinfo, default port, www, trailing
      // slash, tracking params (unsorted), fragment
      (1L, "HTTPS://u:p@WWW.News.Example.COM:443/World/story1/?utm_source=x&id=7&fbclid=F#top"),
      // the clean twin — must collapse onto the same canonical form
      (2L, "https://news.example.com/World/story1?id=7"),
      // http default port; param order must not matter (sorted output)
      (3L, "http://site.org:80/a?b=2&a=1"),
      (4L, "http://site.org/a?a=1&b=2"),
      // NON-identity must be preserved: nonstandard port, https:80, path case
      (5L, "https://site.org:8080/a"),
      (6L, "https://site.org:80/a"),
      (7L, "http://site.org/A"),
      // single-label host: domain = host; root path with only tracking params
      (8L, "http://localhost/?utm_campaign=z")
    ).toDF("doc_id", "url")
    val got = Curation.urlCanonicalize(urls, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap
    assert(got(1L) === (("https://news.example.com/World/story1?id=7", "example.com")))
    assert(got(1L)._1 === got(2L)._1)
    assert(got(3L) === (("http://site.org/a?a=1&b=2", "site.org")))
    assert(got(3L)._1 === got(4L)._1)
    assert(got(5L)._1 === "https://site.org:8080/a")
    assert(got(6L)._1 === "https://site.org:80/a") // :80 is not https' default
    assert(got(7L)._1 === "http://site.org/A")     // path case IS identity
    assert(got(8L) === (("http://localhost", "localhost")))
    // dedup: canonical grain, earliest id survives
    val dd = Curation.urlDedup(urls, "doc_id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(dd("https://news.example.com/World/story1?id=7") === ((1L, 2L)))
    assert(dd("http://site.org/a?a=1&b=2") === ((3L, 2L)))
    assert(dd.size === 6)
    // canonicalization itself is map-only
    val plan = Curation.urlCanonicalize(urls, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"urlCanonicalize must be map-only:\n$plan")
  }

  test("linkGraph: absolute-href filter, multiplicity, self-links, host parity") {
    val pages = Seq(
      // two absolute links to the same host through DIFFERENT messy forms
      // (case, www, :80 default port) — both must normalize to
      // b.example.com, and multiplicity must count (n_links = 2); the
      // relative and mailto hrefs must be dropped
      (1L, "https://u:p@WWW.A.Example.COM:443/x",
        "<a href=\"https://B.example.com/p\">t</a><a href=\"/rel\">r</a>" +
        "<a href=\"mailto:x@example.com\">m</a>" +
        "<a href=\"HTTP://www.b.EXAMPLE.com:80/q?z=1\">t2</a>"),
      // self-link survives (intra-site mass is signal); javascript: dropped
      (2L, "https://a.example.com/y",
        "<a href=\"https://a.example.com/self\">s</a>" +
        "<a href=\"javascript:void(0)\">j</a>"),
      // page with no absolute links contributes no edges at all
      (3L, "https://c.example.com/z", "<p>no links</p>")
    ).toDF("doc_id", "url", "html")
    val got = Curation.linkGraph(pages, "doc_id", "html", "url")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("a.example.com", "b.example.com") -> 2L,
      ("a.example.com", "a.example.com") -> 1L))
    // host normalization parity: the src key is the same host
    // urlCanonicalize's domain chain produces for the same messy URL
    val canonHost = Curation.urlCanonicalize(
        Seq((1L, "https://u:p@WWW.A.Example.COM:443/x")).toDF("doc_id", "url"),
        "doc_id", "url")
      .select(regexp_extract(col("canon_url"), "^https?://([^/:?#]*)", 1))
      .head().getString(0)
    assert(canonHost === "a.example.com")
    assert(got.keys.map(_._1).toSet === Set("a.example.com"))
  }

  test("q_web_pipeline: five-stage cascade is monotone and every stage bites") {
    val rows = graft.queries.CorpusQueries.all.find(_.name == "q_web_pipeline").get
      .fn(TestSpark.spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    assert(rows.map(_._2._1).toSeq ===
      Seq("html_extract", "c4_filter", "url_dedup", "paragraph_dedup", "exact_substr_strip"))
    val docs = rows.map(_._2._2)
    val toks = rows.map(_._2._3)
    // token mass can only shrink along the pipeline, and never to zero
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a }, toks.toSeq)
    assert(toks.last > 0 && docs.last > 0)
    // doc count shrinks from c4 onward (stage 4/5 rewrite, never drop, docs
    // — paragraphDedup and exactSubstrStrip emit every input doc, so equality
    // holds there; c4 and url dedup must genuinely drop at sf0.001)
    assert(docs(1) < docs(0), s"c4 must drop documents: ${docs.toSeq}")
    assert(docs(2) < docs(1), s"url dedup must drop documents: ${docs.toSeq}")
    assert(docs(3) <= docs(2) && docs(4) <= docs(3))
    // stage 4 and 5 must actually strip tokens (shared footers + repeated
    // 5-grams exist at sf0.001 by construction)
    assert(toks(3) < toks(2), s"paragraph dedup must strip: ${toks.toSeq}")
    assert(toks(4) < toks(3), s"exact-substr must strip: ${toks.toSeq}")
  }
}

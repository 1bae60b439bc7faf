package graft

import graft.operators.{Bpe, BpeCodec}
import org.apache.spark.sql.functions._

/** BPE tokenizer induction ([[graft.operators.Bpe]]).
  *
  * The load-bearing law: the DISTRIBUTED learner (vocab aggregate +
  * per-round pair-count argmax + fold rewrite) produces EXACTLY the
  * merge table of the sequential reference learner — same pairs, same
  * order, same winning counts, including tie-breaks — on the fixture
  * corpus and on randomized corpora engineered for count collisions.
  */
class BpeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def docsDf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def asWords(texts: Seq[String]): Seq[(String, Long)] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty).map((_, 1L))

  test("learnMerges == sequential reference on the fixture corpus (exact, 16 rounds)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dist = Bpe.learnMerges(docs, numMerges = 16)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ref = Bpe.referenceLearn(words, numMerges = 16)
    assert(dist == ref)
    assert(dist.length == 16) // the fixture has ≥16 productive merges
    assert(dist.map(_.rank) == (0 until 16))
  }

  test("learnMerges == reference on randomized small-alphabet corpora (ties included)") {
    // alphabet of 3 chars and short words force repeated pair-count
    // collisions, so the (cnt desc, lhs, rhs) tie-break is exercised
    val rnd = new scala.util.Random(0xb9e5eed)
    for (trial <- 0 until 4) {
      val texts = Seq.fill(30) {
        Seq.fill(1 + rnd.nextInt(8)) {
          (0 until 1 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        }.mkString(" ")
      }
      val dist = Bpe.learnMerges(docsDf(texts), numMerges = 10, minPairFreq = 1L)
      val ref = Bpe.referenceLearn(asWords(texts), numMerges = 10, minPairFreq = 1L)
      assert(dist == ref, s"trial $trial: $dist vs $ref")
    }
  }

  test("learnMerges stops early below minPairFreq and on exhausted corpora") {
    // every word distinct and length 1: only (char, </w>) pairs, each
    // with freq 1 — minPairFreq=2 learns nothing
    val dist = Bpe.learnMerges(docsDf(Seq("a b c")), numMerges = 8, minPairFreq = 2L)
    assert(dist.isEmpty)
    // freq-1 pairs admitted: "ab ab" has (a,b) freq 2 first
    val one = Bpe.learnMerges(docsDf(Seq("ab ab")), numMerges = 1, minPairFreq = 2L)
    assert(one == Seq(Bpe.Merge(0, "a", "b", 2L)))
  }

  test("distributed encode expression == driver codec, and tokens reconstruct the text") {
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(120)
    val merges = Bpe.learnMerges(docs, numMerges = 12)
    Bpe.register(spark)
    val rows = docs
      .select(col("doc_id"), col("text"), Bpe.encode(col("text"), merges).as("toks"))
      .orderBy("doc_id").collect()
    val codec = new BpeCodec(merges.map(m => (m.lhs, m.rhs)).toArray)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(1)
      val toks = r.getSeq[String](2)
      val expected = text.split(" ").filter(_.nonEmpty).toSeq.flatMap(codec.encodeWord)
      assert(toks == expected, s"doc ${r.getLong(0)}")
      // lossless: stripping markers and re-joining reproduces the words
      val rebuilt = toks.mkString("").split(java.util.regex.Pattern.quote(Bpe.EndOfWord))
        .filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == text.split(" ").filter(_.nonEmpty).mkString(" "), s"doc ${r.getLong(0)}")
    }
  }

  test("rank-order encode (codec) == replaying the training folds in merge order") {
    // the classic equivalence BPE encode relies on: merging the
    // lowest-rank-present pair repeatedly == applying the learned
    // merges once each, in rank order (greedy leftmost both ways)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = Bpe.learnMerges(docs, numMerges = 16)
    val codec = new BpeCodec(merges.map(m => (m.lhs, m.rhs)).toArray)
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val replay = merges.foldLeft(Bpe.splitChars(w) :+ Bpe.EndOfWord) {
        (syms, m) => Bpe.mergeOnce(syms, m.lhs, m.rhs)
      }
      assert(codec.encodeWord(w) == replay, s"word '$w'")
    }
  }

  test("merges strictly compress the training corpus (token totals shrink per round)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = Bpe.learnMerges(docs, numMerges = 8)
    Bpe.register(spark)
    val agg = docs.select(
      size(Bpe.encode(col("text"), merges)).cast("long").as("n_bpe"),
      // initial symbols = non-space chars + one </w> marker per word
      (length(translate(col("text"), " ", ""))
        + graft.functions.TextFunctions.wsTokenCount(col("text"))).as("n_init"))
      .agg(sum(col("n_bpe")).as("bpe"), sum(col("n_init")).as("init")).head()
    // initial symbols per word = chars + marker; every learned merge
    // had corpus count ≥ 2, so totals must strictly drop
    assert(agg.getLong(0) < agg.getLong(1))
    // and each round's winning count bounds the next (argmax is
    // non-increasing as pairs get consumed... not strictly — but every
    // count must be ≥ minPairFreq and positive)
    assert(merges.forall(_.cnt >= 2L))
  }

  test("packing by BPE counts conserves tokens and fills every non-final sequence") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = Bpe.learnMerges(docs, numMerges = 8)
    Bpe.register(spark)
    val bpeCount = size(Bpe.encode(col("text"), merges)).cast("long")
    val cap = 512L
    val seqs = graft.operators.Pack.packSequencesBy(docs, bpeCount, cap).collect()
    val total = docs.select(sum(bpeCount)).head().getLong(0)
    assert(seqs.map(_.getAs[Long]("n_tokens")).sum == total) // conservation
    // every sequence but the last is exactly full
    seqs.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tokens") == cap))
    assert(seqs.last.getAs[Long]("n_tokens") <= cap)
  }

  test("mergeOnce is greedy leftmost non-overlapping ('aaaa' under (a,a) → [aa, aa])") {
    assert(Bpe.mergeOnce(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(Bpe.mergeOnce(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergeOnce(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.mergeOnce(Vector.empty, "a", "b") == Vector.empty)
  }

  test("applyMerge (distributed fold) == mergeOnce on arbitrary symbol arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed1)
    val arrays = Seq.fill(60)(
      Vector.fill(rnd.nextInt(9))(('a' + rnd.nextInt(2)).toChar.toString))
    val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("id", "syms")
    val got = df.select(col("id"),
        graft.operators.Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .orderBy("id").collect().map(_.getSeq[String](1).toVector)
    assert(got.toSeq == arrays.map(a => Bpe.mergeOnce(a, "a", "a")))
  }
}

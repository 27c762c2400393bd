package graft

import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Loader-shape coverage (SURVEY.md §2.1): fixtures synthesized under a
  * temp dir (FIXTURES.md §4 load-or-build pattern).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }
  private lazy val dir = Files.createTempDirectory("graft_sources")

  test("S1 TSV corpus: doc + tab-separated sentences") {
    val p = write(dir, "corpus.tsv",
      "doc one\tfirst sentence\tsecond sentence\ndoc two\tonly one\n")
    val rows = Sources.tsvCorpus(spark, p).collect()
    assert(rows.length == 2)
    val d1 = rows.find(_.getString(0) == "doc one").get
    assert(d1.getSeq[String](1) == Seq("first sentence", "second sentence"))
  }

  test("S2 STS pairs: score/5 normalization + split filter") {
    val p = write(dir, "sts.csv",
      "split,score,sent1,sent2\ntrain,4.0,a,b\ndev,2.5,c,d\ntrain,0.0,e,f\n")
    val rows = Sources.stsPairs(spark, p, "train")
      .collect().map(r => (r.getString(0), r.getDouble(2))).sorted
    assert(rows.toSeq == Seq(("a", 0.8), ("e", 0.0)))
  }

  test("S3 CoNLL: blank-line sentence boundaries, parallel token/tag arrays") {
    val p = write(dir, "ner.conll",
      "alice B-PER\nuses O\nspark B-SYS\n\nbob B-PER\nsleeps O\n")
    val rows = Sources.conll(spark, p).collect()
      .map(r => (r.getSeq[String](1), r.getSeq[String](2)))
      .sortBy(_._1.head)
    assert(rows.length == 2)
    assert(rows(0) == (Seq("alice", "uses", "spark"),
      Seq("B-PER", "O", "B-SYS")))
    assert(rows(1) == (Seq("bob", "sleeps"), Seq("B-PER", "O")))
  }

  test("S4 gzip TSV parallel pairs with limit (codec transparent)") {
    import java.util.zip.GZIPOutputStream
    val p = dir.resolve("pairs.tsv.gz")
    val os = new GZIPOutputStream(Files.newOutputStream(p))
    os.write("hello\thallo\nworld\twelt\nspark\tfunke\n".getBytes("UTF-8"))
    os.close()
    val rows = Sources.parallelPairs(spark, p.toString, 2).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getString(0).nonEmpty && r.getString(1).nonEmpty))
  }

  test("S5 nested JSON articles: explode + url dedup + empty filter") {
    val p = write(dir, "articles.json",
      """{"articles": [
        {"title": "t1", "text": "body one", "url": "u1"},
        {"title": "t1dup", "text": "body dup", "url": "u1"},
        {"title": "t2", "text": "", "url": "u2"},
        {"title": "t3", "text": "body three", "url": "u3"}]}""")
    val rows = Sources.jsonArticles(spark, p).collect()
    assert(rows.map(_.getString(2)).sorted.toSeq == Seq("u1", "u3"))
  }

  test("S6 JSON-lines + broadcast allowlist semi-join") {
    val p = write(dir, "wiki.jsonl",
      """{"id": "1", "title": "A", "text": "aa"}
        |{"id": "2", "title": "B", "text": "bb"}
        |{"id": "3", "title": "C", "text": "cc"}""".stripMargin)
    val rows = Sources.jsonLinesAllowlist(spark, p, Seq("1", "3")).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
  }

  test("S9 embedding-file scan -> broadcast map") {
    val p = write(dir, "emb.txt", "key_a 0.5 0.5\nkey_b 1.0 0.0\n")
    val m = Sources.embeddingMap(spark, p)
    assert(m.keySet == Set("key_a", "key_b"))
    assert(m("key_b").toSeq == Seq(1.0f, 0.0f))
  }

  test("WiC TSV span loader: token indexes, lowercased POS, positional " +
    "gold-label zip") {
    val data = write(dir, "wic.data.txt",
      "bank\tN\t1-3\tthe bank closed\tsat on the bank of the river\n" +
        "run\tV\t0-2\trun fast\tshe will run\n")
    val gold = write(dir, "wic.gold.txt", "F\nT\n")
    val rows = Sources.wicPairs(spark, data, gold)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getString(4), r.getInt(6))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("bank", "n", 1, 3, "the bank closed", 0),
      ("run", "v", 0, 2, "run fast", 1)))
  }

  test("WiC TSV loader drops malformed-index lines instead of aborting " +
    "the read under ANSI mode") {
    val data = write(dir, "wic.bad.txt",
      "bank\tN\t1-3\tthe bank closed\ton the bank\n" +
        "run\tV\tnot-an-index\trun fast\tshe will run\n" + // non-numeric
        "walk\tV\t2\twalk home\tthey walk\n") // no dash
    val gold = write(dir, "wic.bad.gold.txt", "T\nF\nT\n")
    val rows = Sources.wicPairs(spark, data, gold).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "bank")
  }

  test("WiC JSON char-offset span loader") {
    val p = write(dir, "wic.jsonl",
      """{"word":"board","sentence1":"room and board","sentence2":"he sat on the board","label":false,"start1":9,"end1":14,"start2":14,"end2":19}""" + "\n")
    val r = Sources.wicJson(spark, p).collect()(0)
    assert(r.getString(0) == "board")
    assert(r.getInt(3) == 9 && r.getInt(4) == 14)
    assert(r.getInt(5) == 14 && r.getInt(6) == 19)
    assert(r.getInt(7) == 0)
    // offsets address the target word in the raw sentence
    assert(r.getString(1).substring(9, 14) == "board")
  }

  test("GWSC span loader: HTML strip + punctuation padding, 0-based " +
    "first-match token indexes counting empty tokens") {
    // reference semantics: pad_punctuation leaves double spaces and
    // split(" ") keeps the empty tokens: "big, deep river" pads to
    // "big ,  deep river" = [big, ",", "", deep, river]
    val p = write(dir, "gwsc.tsv",
      "word1\tword2\tcontext1\tcontext2\tword1_context1\tword2_context1" +
        "\tword1_context2\tword2_context2\n" +
        "river\tdepth\t<b>big</b>, deep river\tthe depth of it\t" +
        "river\tdeep\tit\tdepth\n")
    val r = Sources.gwscPairs(spark, p).collect()(0)
    assert(r.getString(2) == "big ,  deep river") // stripped + padded + trimmed
    assert(r.getAs[Int]("word1_context1_idx") == 4) // river
    assert(r.getAs[Int]("word2_context1_idx") == 3) // deep (after empty tok)
    assert(r.getAs[Int]("word1_context2_idx") == 3) // [the,depth,of,it] -> it
    assert(r.getAs[Int]("word2_context2_idx") == 1) // depth
  }
}

package graft

import graft.score.Embed
import org.scalatest.funsuite.AnyFunSuite

class EmbedSpec extends AnyFunSuite {

  test("embedding is deterministic and L2-normalized") {
    val a = Embed.embed("apache spark")
    val b = Embed.embed("apache spark")
    assert(a.toSeq == b.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("cosine is symmetric, bounded, and 1.0 on self") {
    val a = Embed.embed("kafka broker")
    val b = Embed.embed("postgres database")
    assert(math.abs(Embed.cosine(a, b) - Embed.cosine(b, a)) < 1e-12)
    assert(Embed.cosine(a, b) >= -1.0001 && Embed.cosine(a, b) <= 1.0001)
    assert(math.abs(Embed.cosine(a, a) - 1.0) < 1e-5)
  }

  test("top1 breaks ties by ascending entity id") {
    val v = Embed.embed("x")
    val index = IndexedSeq("ent_b" -> v, "ent_a" -> v)
    val Some((id, _)) = Embed.top1("x", index, 0.0)
    assert(id == "ent_a")
  }

  test("similar surfaces score higher than dissimilar ones") {
    val spark = Embed.embed("apache spark")
    assert(Embed.cosine(spark, Embed.embed("apache spark runtime")) >
      Embed.cosine(spark, Embed.embed("postgres database")))
  }
}

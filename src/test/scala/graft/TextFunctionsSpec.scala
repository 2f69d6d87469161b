package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("token counts: whitespace vs BPE-ish runs") {
    val out = df("t STRING", Row("Hello world42, ok!"))
      .select(tokenCountWs(col("t")).as("ws"), tokenCountBpe(col("t")).as("bpe"))
      .head()
    assert(out.getInt(0) == 3)
    // Hello|world|42|,|ok|! → H,ello / w..? "Hello" = [A-Z]+ "H" + [a-z]+ "ello"
    // → H, ello, world, 42, ",", ok, "!" = 7
    assert(out.getInt(1) == 7)
  }

  test("normalizeText lowercases, strips symbols, collapses spaces") {
    val out = df("t STRING", Row("  Hello,   WORLD!! 42 "))
      .select(normalizeText(col("t"))).head().getString(0)
    assert(out == "hello world 42")
  }

  test("wordHits counts vocabulary membership") {
    val out = df("t STRING", Row("the cat and the hat"))
      .select(wordHits(col("t"), Seq("the", "and"))).head().getInt(0)
    assert(out == 3)
  }

  test("minhash is the minimum seeded digest over shingles and varies by seed") {
    val d = df("t STRING", Row("a b c d e"))
    val r = d.select(
      minhash(wordShingles(col("t"), 3), 0).as("h0"),
      minhash(wordShingles(col("t"), 3), 1).as("h1")).head()
    val (h0, h1) = (r.getString(0), r.getString(1))
    assert(h0.length == 16 && h1.length == 16 && h0 != h1)
  }
}

package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws of training-sequence packing: the two-pass prefix sum is
  * bit-identical to the one-window reference at ANY bucket width and
  * partitioning (associativity), and the resulting chunks are
  * contiguous, capacity-bounded intervals of the document order. */
class SequencePackSpec extends SparkSuite {

  private def docs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i.toLong * 7) % 13 + 1)).toDF("id", "tok")
  }

  test("assignChunks ≡ the one-window reference, invariant to bucket " +
    "width and input partitioning") {
    val d = docs(500)
    val cap = 32L
    val ref = d.withColumn("cum", sum("tok").over(Window.orderBy("id")))
      .withColumn("chunk", {
        val start = col("cum") - col("tok")
        ((start - start % cap) / cap).cast("long")
      })
      .select("id", "chunk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (bw <- Seq(8L, 64L, 4096L); parts <- Seq(1, 7)) {
      val got = SequencePack
        .assignChunks(d.repartition(parts), "id", "tok", cap, bucketWidth = bw)
        .select("id", "chunk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ref, s"bucketWidth=$bw parts=$parts drifted")
    }
  }

  test("chunks are contiguous order-intervals with token mass within " +
    "one straddling document of capacity") {
    val cap = 32L
    val a = SequencePack.assignChunks(docs(500), "id", "tok", cap)
    val maxTok = 13L
    val perChunk = a.groupBy("chunk")
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"),
        sum("tok").as("mass"))
      .collect()
    val lastChunk = perChunk.map(_.getLong(0)).max
    perChunk.foreach { r =>
      val (chunk, n, lo, hi, mass) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hi - lo + 1 == n, s"chunk $chunk is not contiguous")
      assert(mass <= cap + maxTok - 1, s"chunk $chunk mass $mass")
      if (chunk != lastChunk)
        assert(mass >= cap - maxTok + 1, s"chunk $chunk underfull: $mass")
    }
  }

  test("tokenCount counts single-spaced whitespace tokens") {
    import spark.implicits._
    val got = Seq("one", "a b c", "x y").toDF("text")
      .select(SequencePack.tokenCount(col("text"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(1L, 3L, 2L))
  }
}

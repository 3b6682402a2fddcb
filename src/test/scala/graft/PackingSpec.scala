package graft

import graft.operators.{Checkpoints, Packing}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: one pass in corpus (id) order. */
  private def brute(data: Seq[(Long, Long)], seqLen: Long): Seq[(Long, Long, Long, Long, Long, Long)] = {
    var off = 0L
    data.sortBy(_._1).map { case (id, n) =>
      val start = off; off += n
      val seqId = start / seqLen
      val endSeq = if (n == 0) seqId else (start + n - 1) / seqLen
      val nSeqs = if (n == 0) 0L else endSeq - seqId + 1
      (id, n, start, seqId, endSeq, nSeqs)
    }
  }

  private def run(data: Seq[(Long, Long)], seqLen: Long, parts: Int) = {
    val got = Packing.packAssignments(
      data.toDF("doc_id", "n"), "doc_id", "n", seqLen, numParts = parts)
    val rows = got.orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_offset", "seq_id", "end_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    Checkpoints.free(got)
    rows
  }

  test("packAssignments matches the sequential prefix sum at numParts = 7") {
    val rnd = new scala.util.Random(7)
    val data = (1L to 500L).map(id => id -> (1L + rnd.nextInt(200)))
    assert(run(data, 512, 7) == brute(data, 512))
  }

  test("boundary-crossing and empty docs") {
    val data = Seq((1L, 500L), (2L, 20L), (3L, 5L), (4L, 1000L), (5L, 0L))
    val rows = run(data, 512, 3)
    assert(rows == brute(data, 512))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(2L)._6 == 2L, "doc 2 (offsets 500..519) spans the 512 boundary")
    assert(byId(3L)._6 == 1L)
    assert(byId(4L)._6 == 2L, "1000 tokens from offset 525 cover seqs 1..2")
    assert(byId(5L)._6 == 0L, "empty doc occupies no sequence")
  }

  test("partition count does not change the assignment") {
    val data = (1L to 300L).map(id => id -> (id % 37)) // includes n = 0 docs
    assert(run(data, 128, 1) == run(data, 128, 13))
  }
}

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

  test("packAssignments shuffles the corpus exactly once") {
    // the scale claim behind the mapPartitions cumsum: a partition-id-
    // keyed window would hash-exchange the corpus a SECOND time after the
    // range exchange. Audit actual shuffle-write records for this test's
    // job group (suites may run concurrently in the shared session).
    val n = 20000L
    val rec = shuffleRecords {
      val data = spark.range(1, n + 1)
        .selectExpr("id as doc_id", "id % 37 as n")
      val got = Packing.packAssignments(data, "doc_id", "n", 512, numParts = 8)
      got.count()
      Checkpoints.free(got)
    }
    assert(rec >= n, s"expected one corpus pass ($n rows) through the shuffle, saw $rec")
    assert(rec <= n + 500,
      s"$rec shuffle records for $n rows — the corpus shuffled more than once")
  }

  test("packManifest: slices tile sequences and reconstruct documents") {
    val rnd = new scala.util.Random(11)
    val data = (1L to 400L).map(id => id -> rnd.nextInt(300).toLong) // incl. n = 0
    val seqLen = 128L
    val m = Packing.packManifest(
      data.toDF("doc_id", "n"), "doc_id", "n", seqLen, numParts = 5)
    val rows = m.select("seq_id", "doc_id", "doc_from", "doc_to", "seq_from", "seq_to", "slice_tokens")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    Checkpoints.free(m)
    // per-doc: slices are contiguous 1..n and sum to n_tokens
    val byDoc = rows.groupBy(_._2)
    data.filter(_._2 > 0).foreach { case (id, n) =>
      val s = byDoc(id).sortBy(_._3)
      assert(s.head._3 == 1L && s.last._4 == n, s"doc $id span ends")
      assert(s.map(_._7).sum == n, s"doc $id token sum")
      s.sliding(2).foreach {
        case Seq(a, b) => assert(b._3 == a._4 + 1, s"doc $id contiguity")
        case _ =>
      }
    }
    assert(data.filter(_._2 == 0).forall(d => !byDoc.contains(d._1)), "empty docs absent")
    // per-sequence: slices tile [1, seqLen] exactly (except the tail seq)
    val total = data.map(_._2).sum
    val lastSeq = (total - 1) / seqLen
    rows.groupBy(_._1).foreach { case (seq, s) =>
      val sorted = s.sortBy(_._5)
      assert(sorted.head._5 == 1L, s"seq $seq starts at 1")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._5 == a._6 + 1, s"seq $seq contiguity")
        case _ =>
      }
      if (seq < lastSeq) assert(sorted.last._6 == seqLen, s"seq $seq full")
      assert(sorted.map(_._7).sum == sorted.last._6, s"seq $seq token sum")
    }
  }
}

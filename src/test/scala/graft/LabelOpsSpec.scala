package graft

import graft.ext.LabelOps

class LabelOpsSpec extends SparkSpec {

  private val Fx = 1073741824.0

  // labelers: A mostly-right, B = ¬A (anti-correlated), C right + abstains
  private def votes = {
    import spark.implicits._
    Seq(
      (1L, "A", 1), (1L, "B", -1), (1L, "C", 1),
      (2L, "A", 1), (2L, "B", -1), (2L, "C", 0),  // tied majority
      (3L, "A", -1), (3L, "B", 1), (3L, "C", -1),
      (4L, "A", -1), (4L, "B", 1), (4L, "C", 1),  // A wrong here
      (9L, "C", 0)                                 // all-abstain doc
    ).toDF("doc_id", "labeler", "vote")
  }

  test("majorityVote: signs, tie, abstain-only doc") {
    val m = LabelOps.majorityVote(votes, "doc_id", "vote")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(m(1L) == ((3L, 1L, 1)))
    assert(m(2L) == ((2L, 0L, 0))) // +1 −1 abstain → tie
    assert(m(3L) == ((3L, -1L, -1)))
    assert(m(4L) == ((3L, 1L, 1)))
    assert(m(9L) == ((0L, 0L, 0)))
  }

  test("labelerReliability: smoothed agreement + log-odds, negative " +
    "weight for the anti-correlated labeler") {
    val r = LabelOps.labelerReliability(votes, "doc_id", "labeler", "vote")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    // scored docs = {1,3,4} (doc 2 tied, doc 9 abstain-only)
    assert(r("A") == ((3L, 2L, 600000L,
      math.floor(math.log(3.0 / 2.0) * Fx).toLong)))
    assert(r("B") == ((3L, 1L, 400000L,
      math.floor(math.log(2.0 / 3.0) * Fx).toLong)))
    assert(r("C") == ((3L, 3L, 800000L,
      math.floor(math.log(4.0 / 1.0) * Fx).toLong)))
    assert(r("B")._4 < 0L && r("C")._4 > r("A")._4)
  }

  test("aggregateLabels: weighted re-vote resolves the tie, inverts the " +
    "anti-correlated labeler, overrides A via C, abstain doc at 0") {
    val wA = math.floor(math.log(3.0 / 2.0) * Fx).toLong
    val wB = math.floor(math.log(2.0 / 3.0) * Fx).toLong
    val wC = math.floor(math.log(4.0) * Fx).toLong
    val out = LabelOps.aggregateLabels(votes, "doc_id", "labeler", "vote")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out(1L) == ((3L, 1, wA - wB + wC, 1)))
    // tie at majority, but B's vote inverts (negative weight) → positive
    assert(out(2L) == ((2L, 0, wA - wB, 1)))
    assert(out(3L) == ((3L, -1, -wA + wB - wC, -1)))
    // A says −1 but C (heavier) says +1 and B's +1 inverts: net +1
    assert(out(4L) == ((3L, 1, -wA + wB + wC, 1)))
    assert(out(4L)._3 > 0L)
    assert(out(9L) == ((0L, 0, 0L, 0)))
  }
}

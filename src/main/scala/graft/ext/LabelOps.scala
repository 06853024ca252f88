package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weak-supervision label aggregation — turning several cheap, noisy
  * labeling functions (heuristic rules, keyword matches, distant
  * supervision) into one training label per document, the
  * Snorkel-style programmatic-labeling step of a training-data
  * pipeline (Ratner et al. 2017, VLDB; Dawid & Skene 1979). The
  * pipeline: unweighted majority vote initializes the latent label,
  * per-labeler reliability is estimated as smoothed agreement with
  * that majority, and a reliability-weighted re-vote (log-odds
  * weights — one Dawid–Skene EM half-step with majority
  * initialization) produces the final label. An anti-correlated
  * labeler gets a NEGATIVE weight and is inverted rather than
  * discarded.
  *
  * Vote convention: +1 (positive), −1 (negative), 0 (abstain) — a
  * labeling function that doesn't fire abstains and costs nothing.
  *
  * Engine-exact: votes and counts are integers; the only float is the
  * per-labeler log-odds `ln((agree+1)/(disagree+1))`, one
  * correctly-rounded IEEE division into one `graft_ln` (platform-libm
  * parity), floored to fixed-point 2³⁰ BEFORE any cross-row use — so
  * per-doc weighted scores are exact BIGINT sums and hash identically
  * on any engine/layout.
  *
  * Scale shape: majority = ONE grouped agg on the doc id (map-side
  * partials); reliability = one id-keyed join of votes to the
  * majority relation + ONE grouped agg down to the labeler grain
  * (labelers are few — the result broadcasts); weighted re-vote = one
  * broadcast join + ONE grouped agg on the doc id. No window, no
  * driver state, nothing all-pairs.
  */
object LabelOps {

  private val Fx = 1073741824.0 // 2^30

  /** Per-doc majority over a votes relation `(id, labeler, vote)`:
    * `id`, `n_votes` (non-abstain), `vote_sum`, `maj` (sign of the
    * sum; 0 = tied or all-abstain). */
  def majorityVote(votes: DataFrame, idCol: String,
                   voteCol: String): DataFrame =
    votes.groupBy(col(idCol))
      .agg(sum(when(col(voteCol) =!= 0, 1L).otherwise(0L)).as("n_votes"),
        sum(col(voteCol).cast("long")).as("vote_sum"))
      .withColumn("maj", signum(col("vote_sum")).cast("int"))

  /** Per-labeler reliability against the majority: counts only
    * non-abstain votes on docs with an untied majority. Output:
    * `labeler`, `n_scored`, `n_agree`, `acc_ppm` (add-one smoothed,
    * exact integer), `weight_fx` (smoothed log-odds, fixed-point 2³⁰
    * — negative for an anti-correlated labeler). */
  def labelerReliability(votes: DataFrame, idCol: String,
                         labelerCol: String, voteCol: String): DataFrame =
    reliabilityFrom(votes,
      majorityVote(votes, idCol, voteCol).select(col(idCol), col("maj")),
      idCol, labelerCol, voteCol)

  private def reliabilityFrom(votes: DataFrame, maj: DataFrame,
                              idCol: String, labelerCol: String,
                              voteCol: String): DataFrame =
    votes.filter(col(voteCol) =!= 0)
      .join(maj, Seq(idCol))
      .filter(col("maj") =!= 0)
      .groupBy(col(labelerCol).as("labeler"))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col(voteCol) === col("maj"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("acc_ppm",
        expr("cast(cast(n_agree + 1 as decimal(38,0)) * 1000000" +
          " div (n_scored + 2) as bigint)"))
      .withColumn("weight_fx",
        floor(call_function("graft_ln",
          (col("n_agree") + lit(1L)).cast("double") /
            (col("n_scored") - col("n_agree") + lit(1L)).cast("double"))
          * lit(Fx)).cast("long"))

  /** The composed aggregation: majority init → reliability weights →
    * weighted re-vote. One row per doc: `id`, `n_votes`, `maj`,
    * `score_fx` (Σ vote·weight_fx, exact BIGINT), `label` (sign of
    * the weighted score). Docs where every labeler abstained stay
    * visible at maj = label = 0. */
  def aggregateLabels(votes: DataFrame, idCol: String,
                      labelerCol: String, voteCol: String): DataFrame = {
    // the doc-grain majority feeds BOTH the reliability estimate and
    // the output frame — materialize it once instead of re-evaluating
    // the corpus-sized votes subtree per consumer (plan-shape-pinned:
    // the whole aggregation reads the corpus three times — majority,
    // reliability, weighted sum — never four)
    val maj = graft.engine.Engine.materialize(
      majorityVote(votes, idCol, voteCol))
    val w = reliabilityFrom(votes, maj.select(col(idCol), col("maj")),
        idCol, labelerCol, voteCol)
      .select(col("labeler").as(labelerCol), col("weight_fx"))
    val scored = votes.join(broadcast(w), Seq(labelerCol))
      .groupBy(col(idCol))
      .agg(sum(col(voteCol).cast("long") * col("weight_fx"))
        .as("score_fx"))
    // left join: a doc whose only votes came from never-scored labelers
    // (all-abstain or tied-docs-only voters) stays visible at score 0
    maj.join(scored, Seq(idCol), "left")
      .select(col(idCol), col("n_votes"), col("maj"),
        coalesce(col("score_fx"), lit(0L)).as("score_fx"),
        signum(coalesce(col("score_fx"), lit(0L))).cast("int").as("label"))
  }
}

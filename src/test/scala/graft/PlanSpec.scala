package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions (SURVEY §7.1 "100 TB stance"): the
  * correctness gate proves the right rows come back; these prove the
  * *plans* are the ones that survive a 1000-executor scale-up — filters
  * pushed to the parquet scan, projections pruned, aggregates partial
  * before the exchange, small sides broadcast, and no cartesian products
  * outside explicitly-broadcast ANN re-ranks.
  */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0001)

  test("filter_eq pushes the predicate into the parquet scan") {
    val p = physical(q("filter_eq"))
    assert(p.contains("PushedFilters") && p.contains("EqualTo(l_returnflag,R)"),
      s"predicate not pushed:\n$p")
  }

  test("project_col prunes the scan to one column") {
    val p = physical(q("project_col"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint>"),
      s"scan not pruned:\n$p")
  }

  test("groupby_sum aggregates partially before the shuffle (map-side combine)") {
    val p = physical(q("groupby_sum"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(p.contains("Exchange hashpartitioning"), s"no hash exchange:\n$p")
  }

  test("q1_flagship is one scan, partial+final agg, one hash exchange") {
    val p = physical(q("q1_flagship"))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly one hash exchange:\n$p")
  }

  test("sim_topk broadcasts the query side (no shuffle of the corpus)") {
    val p = physical(q("sim_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("sim_topk_filtered pushes the metadata predicate into the corpus scan") {
    val p = physical(q("sim_topk_filtered"))
    assert(p.contains("EqualTo(label,1)"),
      s"corpus predicate not pushed to the scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("semdedup_pairs compares only within a cell (equi-join, no cross product)") {
    val p = physical(q("semdedup_pairs"))
    assert(p.contains("_cell"), s"no cell key in the join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pairwise comparison not pruned by the cell key:\n$p")
  }

  test("funnel stage tables are filtered at the scan and joined on the user key") {
    val p = physical(q("funnel_conv"))
    assert(p.contains("EqualTo(event_type,view)") || p.contains("isnotnull(event_type"),
      s"stage filter not pushed:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"stage join degenerated:\n$p")
  }

  test("token_ids prunes the documents scan to (doc_id, text)") {
    val p = physical(q("token_ids"))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned:\n$p")
  }

  test("ann_lsh_recall candidate generation is a broadcast hash join on (table,bucket)") {
    val p = physical(q("ann_lsh_recall"))
    assert(p.contains("BroadcastHashJoin"), s"no hash join for candidates:\n$p")
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
  }

  test("decontaminate broadcasts the bench shingles, aggregates once on doc_id") {
    val p = physical(q("decontaminate"))
    assert(p.contains("BroadcastHashJoin"), s"bench side not broadcast:\n$p")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size >= 1,
      s"no doc_id aggregate exchange:\n$p")
    // exactly ONE shingle exchange is allowed: the bench-side distinct
    // inside the broadcast subtree (an eval suite, tiny). The corpus side
    // must reach the join straight from its scan — a second shingle
    // exchange would mean the training corpus is being shuffled by shingle.
    assert("Exchange hashpartitioning\\(shingle".r.findAllIn(p).size <= 1,
      s"corpus shuffled by shingle:\n$p")
  }

  test("repetition_score has no aggregation shuffle (per-row fold)") {
    val p = physical(q("repetition_score"))
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-row repetition must not hash-shuffle:\n$p")
  }

  test("join_salted shuffles on (key, salt), not the bare skewed key") {
    val p = physical(q("join_salted"))
    assert(p.contains("_salt"), s"salt column absent from the plan:\n$p")
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("dedup_ngram joins on the shingle key, never cross-product") {
    val p = physical(q("dedup_ngram"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup should be an equality join:\n$p")
  }

  test("q1_flagship runs inside whole-stage codegen") {
    val df = q("q1_flagship")
    df.collect() // AQE finalizes the physical plan only on execution
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("*("), s"no codegen span in final plan:\n$p")
  }

  test("join_broadcast broadcasts the dimension side") {
    val p = physical(q("join_broadcast"))
    assert(p.contains("BroadcastHashJoin"), s"dimension not broadcast:\n$p")
  }

  test("q5 5-table join broadcasts the dimension chain, facts shuffle once") {
    val p = physical(q("q5_local_supplier"))
    // supplier/nation/region are broadcast-hash-joined (3 dimension hops)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dimension chain not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q5:\n$p")
    // the region filter is pushed into its scan, pruning before broadcast
    assert(p.contains("EqualTo(r_name,ASIA)"), s"region filter not pushed:\n$p")
  }

  test("q17 aggregate-join-back: per-part averages shuffle on the join key") {
    val p = physical(q("q17_small_qty"))
    assert(!p.contains("CartesianProduct"))
    // decorrelated: a plain aggregate + equi-join, no per-row subquery
    assert(p.contains("HashAggregate"), s"no aggregate side:\n$p")
  }

  test("vocab_sketch never shuffles on the token key (capacity-bounded state)") {
    val p = physical(q("vocab_sketch"))
    // the exact vocab count would hash-exchange on token; the sketch's
    // whole point is that only ≤capacity-entry partial states move
    assert(!p.contains("hashpartitioning(token"),
      s"sketch shuffled the token stream:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"no imperative aggregate for the sketch:\n$p")
  }

  test("embed_centroid aggregates partially before one label exchange") {
    val p = physical(q("embed_centroid"))
    assert("hashpartitioning\\(label".r.findAllIn(p).size >= 1, p.take(1500))
    // no posexplode before the aggregate: the dim-fold row inflation is
    // exactly what the custom aggregate avoids (the flatten for the
    // driver compare runs AFTER the agg, on nLabels rows)
    val aggIdx = p.indexOf("ObjectHashAggregate")
    val genIdx = p.indexOf("Generate")
    assert(aggIdx >= 0, s"no ObjectHashAggregate:\n${p.take(1500)}")
    assert(genIdx == -1 || genIdx < aggIdx,
      s"explode runs before the aggregate:\n${p.take(2000)}")
  }

  test("join_range bands the inequality into an equi-join, no nested loop") {
    val p = physical(q("join_range"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in join_range:\n$p")
    // the band key is a real equi-join: hash or sort-merge on _band
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), s"no equi-join on the band:\n$p")
  }

  test("join_anti plans as an anti join, not a subquery re-scan") {
    val p = physical(q("join_anti"))
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
  }

  test("q21 decorrelates EXISTS/NOT EXISTS to semi/anti joins, no subquery loop") {
    val p = physical(q("q21_waiting"))
    assert(p.contains("LeftSemi"), s"no semi join for EXISTS:\n$p")
    assert(p.contains("LeftAnti"), s"no anti join for NOT EXISTS:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q21:\n$p")
  }

  test("q13 plans a left outer join preserving zero-order customers") {
    val p = physical(q("q13_order_dist"))
    assert(p.contains("LeftOuter"), s"no outer join:\n$p")
    // the priority predicate prunes orders BEFORE the join (pushed to scan)
    assert(p.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"priority filter not pushed into the orders scan:\n$p")
  }

  test("q19 pushes the prunable side of the disjunction to the part scan") {
    val p = physical(q("q19_disjunctive"))
    // the part-side disjunction (brand=X AND size<=s, OR'd) is implied by
    // the OR-of-ANDs and must reach the part scan's pushed filters
    // (plan toString elides long PushedFilters lists — the Filter node's
    // `= Brand#12` and the pushed `EqualTo(p_brand` prefix are both stable)
    assert(p.contains("EqualTo(p_brand") || p.contains("= Brand#12)"),
      s"no brand pruning at the part scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part not broadcast:\n$p")
  }

  test("q7 broadcasts both nation hops and supplier; facts shuffle on orderkey") {
    val p = physical(q("q7_nation_volume"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"dimension hops not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in q7:\n$p")
  }

  test("q22 broadcasts the 1-row average and anti-joins urgent orders") {
    val p = physical(q("q22_opportunity"))
    assert(p.contains("LeftAnti"), s"no anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"scalar-average side not broadcast:\n$p")
  }

  test("sessionize reuses one exchange for both windows and the aggregate") {
    val p = physical(q("sessionize"))
    // both window passes and the groupBy hash on user_id; a single
    // hashpartitioning(user_id) exchange must serve them all
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"sessionize should shuffle once:\n$p")
  }
}

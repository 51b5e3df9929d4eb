"""Plan-hygiene invariants, pinned per query class (VERDICT r3 #6):
a shuffle/join-strategy regression should fail pytest in-round, not
wait for an ad-hoc tools/explain_audit.py run.

All numbers read the pre-execution physical plan (AdaptiveSparkPlan's
initial plan): AQE may further improve strategies at runtime (e.g.
convert a stats-less SortMergeJoin to broadcast), never worsen them,
so upper bounds asserted here hold for the executed plan too.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import audit  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Queries whose whole pipeline is per-row/per-doc: any Exchange here
# means a shuffle crept into a narrow op.
NARROW_ZERO_EXCHANGE = {
    "ts_langid", "ts_text_profile", "hm1_main_content",
    "m2_frame_sample", "m4_audio_chunks", "x11_f3_cleanup",
    "s1_binary_decode", "s34_page_scans", "s6_lines_source",
    "s7_json_source", "x19_html_tables", "s1_stream_extract",
}

# The one BroadcastNestedLoopJoin by design: J6's keyword->prompt
# containment join is a theta join on a ~10-row broadcast dimension.
BNLJ_ALLOWED = {"j6_keyword_hits": 1}

# SortMergeJoin allowance: td_curation's survivors frame is a
# localCheckpoint scan (no stats), so the pre-AQE plan picks SMJ for
# its doc_id joins; AQE converts to broadcast at runtime when small,
# and SMJ IS the right 100 TB shape for survivor-sized sides.
# dd_components: same class — the converged label frame is a
# checkpoint scan joined to its own size aggregate.
SMJ_ALLOWED = {
    "td_curation": 2, "dd_components": 2,
    # round 5: the W3 TOC-conditional rewrite joins the per-doc
    # matched-offset sets back onto the span stream on doc_id — the
    # same key the fill-down window partitions by, so the big side is
    # exchanged once for both; the match-set side is doc-count-sized
    # (not broadcastable at scale; AQE converts to broadcast when
    # small). One SMJ per query consuming with_current_section.
    "x1_w3_classify_flags": 1, "a8_sections": 1, "j1_heading_lookup": 1,
}

# Filter pushdown must reach the parquet scan for every query whose
# first move is a selective scan (kind=..., page ranges, margins).
PUSHDOWN_REQUIRED = {
    "x11_f3_cleanup", "s34_page_scans", "w1_reading_order",
    "j4_toc_skeleton", "ep1_extract_spans", "ep1_extract_sections",
    "ep1_extract_spans_sql", "a1_header_footer", "f10_f12_margins",
    "j7_tabular_pairs", "j6_keyword_hits", "ep3_tables_sql",
    "j3_tables_merged", "j1_heading_lookup", "j2_table_titles",
    "a5_table_stats", "x1_w3_classify_flags", "a8_sections",
}

# Exchange-count ceilings per query (today's audited values; lower is
# always fine). A new Exchange beyond the ceiling = a regression the
# round must explain or revert.
MAX_EXCHANGES = {
    "dd_exact_dups": 1, "dd_minhash_pairs": 5, "dd_minhash_verified": 11,
    # dd_simhash_pairs 5 -> 6 (round 5): the dual-config row (fixture
    # 4x8 + production 64-bit/4x16/h<=3) shares ONE bigram explode +
    # signature groupBy (32-bit sig = 64-bit prefix); the one extra
    # exchange is the second config's band/group stage, vs +3 for an
    # unshared union
    "dd_simhash_pairs": 6, "dd_components": 4, "ts_langid": 0,
    "ts_text_profile": 0, "hm1_main_content": 0, "td_curation": 3,
    "sim_ann_topk": 1, "sim_ivf_topk": 2, "j5_topk_euclidean": 1,
    # sim_neardup_lsh 4 -> 5 (round 4): the star-candidate rewrite
    # adds the bucket-representative min-aggregate — one extra
    # exchange bought O(m)-per-bucket candidates instead of C(m,2)
    "sim_ivf_euclidean": 2, "sim_neardup_lsh": 5, "a6_max_score": 1,
    "j6_keyword_hits": 2, "s11_fill_down": 1, "j7_tabular_pairs": 3,
    "a9_sessionize": 1, "m1_m3_media_features": 1, "m2_frame_sample": 0,
    "m4_audio_chunks": 0, "x11_f3_cleanup": 0, "s1_binary_decode": 0,
    "s34_page_scans": 0, "s13_embeddings_upsert": 1, "s6_lines_source": 0,
    "s7_json_source": 0, "x19_html_tables": 0, "s15_collated_tables": 1,
    "s1_stream_extract": 0, "ep1_extract_spans": 5,
    "ep1_extract_spans_sql": 3, "ep1_extract_sections": 5,
    # w1 1 -> 2 (round 5): the dual-variant row unions the ref window
    # (one exchange) with the XY-cut applyInPandas grouping (one
    # exchange on the same (doc_id, page_id) keys)
    "lineage_metrics": 5, "w1_reading_order": 2, "a1_header_footer": 5,
    "f10_f12_margins": 4, "a5_table_stats": 5, "ep3_tables_sql": 5,
    "ep3_tables_doc_scope": 6, "j3_tables_merged": 14,
    "ep3_tables_exact": 5, "j2_table_titles": 14, "j4_toc_skeleton": 1,
    # x1/a8 5 -> 13, j1 11 -> 13 (round 5): the W3 TOC-conditional
    # rewrite adds the heading->TOC whole-word semi join and the
    # per-doc matched-set join (audited 11-12 incl. broadcast
    # exchanges; AQE flips the tiny sides between BHJ and SMJ, so the
    # ceiling carries one unit of slack). The RUNTIME shuffle story
    # is one big-side exchange — the match-set join keys on doc_id,
    # which the fill-down window reuses.
    "j1_heading_lookup": 13, "x1_w3_classify_flags": 13, "a8_sections": 13,
}


@pytest.fixture(scope="module")
def plans(spark):
    # frames cached by earlier test modules would be substituted into
    # matching plan subtrees (CacheManager reuse), changing exchange
    # counts run-order-dependently — audit a cold catalog
    spark.catalog.clearCache()
    return audit(spark, SF_DIR)


def test_all_plans_build(plans):
    broken = {n: s for n, s in plans.items() if isinstance(s, str)}
    assert not broken, broken


def test_no_stray_nested_loop_joins(plans):
    bad = {
        n: s["bnlj"] for n, s in plans.items()
        if not isinstance(s, str) and s["bnlj"] > BNLJ_ALLOWED.get(n, 0)
    }
    assert not bad, f"unexpected BroadcastNestedLoopJoin: {bad}"


def test_no_stray_sort_merge_joins(plans):
    bad = {
        n: s["smj"] for n, s in plans.items()
        if not isinstance(s, str) and s["smj"] > SMJ_ALLOWED.get(n, 0)
    }
    assert not bad, f"unexpected SortMergeJoin: {bad}"


def test_narrow_ops_have_zero_exchanges(plans):
    bad = {
        n: plans[n]["exch"] for n in NARROW_ZERO_EXCHANGE
        if n in plans and not isinstance(plans[n], str)
        and plans[n]["exch"] != 0
    }
    assert not bad, f"shuffle crept into narrow ops: {bad}"


def test_filter_pushdown_reaches_scans(plans):
    bad = {
        n: plans[n]["pushed"] for n in PUSHDOWN_REQUIRED
        if n in plans and not isinstance(plans[n], str)
        and plans[n]["pushed"] == 0
    }
    assert not bad, f"pushdown missing at the scan: {bad}"


def test_exchange_counts_bounded(plans):
    bad = {
        n: (s["exch"], MAX_EXCHANGES[n]) for n, s in plans.items()
        if not isinstance(s, str) and n in MAX_EXCHANGES
        and s["exch"] > MAX_EXCHANGES[n]
    }
    assert not bad, f"exchange count regressed (got, ceiling): {bad}"
    unknown = [n for n in plans if n not in MAX_EXCHANGES
               and not isinstance(plans[n], str)]
    assert not unknown, f"new queries missing an exchange ceiling: {unknown}"

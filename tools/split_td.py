"""One-shot AST splitter for ``driver_queries_td.py`` (VERDICT r03 task 2).

Splits the 29k-line module into domain modules (graph / IR / ANN+media /
TPC-H / events / text / stats) plus a shared-constants module, preserving
statement order and the import-time-baked oracle SQL byte-for-byte:

- every top-level statement travels with the name it defines;
- a name used (transitively) by pairs in more than one domain lands in
  ``driver_queries_td_shared.py``; single-domain names land in that
  domain's module — so each module's constant namespace is exactly the
  grep surface CLAUDE.md invariant 8 asks for;
- ``driver_queries_td.py`` becomes an explicit re-export aggregator, so
  every existing ``from ...driver_queries_td import X`` keeps working and
  ``QUERIES_TD``/``ORACLES_TD`` are merged from the per-module dicts.

Run from the repo root: ``python tools/split_td.py`` (idempotent only on
the ORIGINAL monolith; do not re-run after the split has been committed).
"""

from __future__ import annotations

import ast
import sys
from collections import defaultdict

SRC = "search_engine_spark/driver_queries_td.py"

DOMAINS = {
    "graph": """
        pagerank pagerank_convergence degree_counts hits_scores
        triangle_counts cocitation_coupling graph_mixing degree_correlation
        personalized_pagerank label_propagation k_core link_distance
        katz_centrality link_prediction link_reciprocity edge_support
        anchor_text harmonic_centrality host_authority salsa_scores
        hub_knockout global_transitivity bowtie_structure rich_club
        label_modularity edge_percolation degree_ccdf butterfly_counts
        friendship_paradox degree_age_corr markov_stationary
        textrank_keywords
    """,
    "ir": """
        bm25_topk bm25f_topk bm25_b_sweep k1_sweep pl2_topk pivoted_topk
        smart_ltc_topk ql_topk rsj_weights idf_variants residual_idf
        search_snippets rank_fusion hybrid_rrf
        rocchio_expansion prf_expansion expansion_agreement query_clarity
        nqc_predictor exposure_bias mrr_eval map_eval ndcg_eval err_eval
        success_at_k first_position rank_overlap proximity_rank phrase_match
        mmr_rerank cascade_overlap novelty_curve
        next_word term_association
        threshold_algorithm ltr_features hard_negatives
        negative_sampling topk_churn rank_correlation kendall_w
    """,
    "index": """
        impact_quantization block_max_scores tiered_index postings_bytes
        codec_compare ef_vs_varint rice_param shannon_code dict_frontcoding
        gap_histogram prefix_complete selectivity_estimates vocab_pruning
        oov_rate query_cache_model crawl_schedule spellcheck_candidates
        standing_alerts word_source_merge shard_balance shard_rebalance
        hash_ring stack_distance
    """,
    "ann": """
        minhash_lsh_pairs embedding_diversity ngram_jaccard_pairs
        containment_pairs boilerplate_shingles simhash_fingerprints
        simhash_near_dup simhash_bit_balance embedding_knn
        embedding_near_dup embedding_nmi semantic_dedup ann_lsh_topk
        ann_ivf_topk ann_ivf_trained ann_recall srp_distortion
        sq8_quantization pq_audit sparse_cosine_pairs lsh_transitivity
        minhash_calibration dedup_eval dedup_roc dedup_ap dedup_components
        canonical_docs winnow_fingerprints cdc_chunking weighted_jaccard
        source_similarity label_centroids pca_power cluster_quality
        hll_distinct cms_heavy_hitters binary_meta media_resize
        media_frame_sample media_features
    """,
    "tpch": """
        pricing_summary ship_priority nation_revenue returns_report
        promo_share top_supplier order_priority_check shipmode_priority
        cust_order_dist small_qty_revenue volume_shipping market_share
        disjunctive_revenue forecast_revenue supplier_relation_count
        region_top_nations large_orders cust_balance late_supplier
        perfect_orders ship_lag_deciles price_indices leadtime_icc
        order_gini order_backlog abc_analysis abc_xyz brand_concentration
        discount_elasticity safety_stock newsvendor croston_demand
        segment_migration rollup_report pivot_report churn_hazard
        market_basket rfm_segments value_at_risk skyline_frontier
        theil_sen conversion_lag
    """,
    "events": """
        event_sessions events_rollup events_anomaly event_gaps
        event_transitions event_funnel session_gap_sweep session_burstiness
        lognormal_sessions bounce_rate behavior_entropy cohort_retention
        cohort_overlap rolling_active weekly_profile user_streaks
        user_accumulation circadian_profile asof_join interval_join
        touch_attribution max_concurrency traffic_autocorr traffic_bursts
        monthly_seasonality pacf_daily daily_mix_anomaly periodogram
        haar_energy hurst_exponent ewma_control cusum_changepoint
        pettitt_test mann_kendall anova_dow purchase_regularity
        reorder_interval offered_load erlang_b kingman_wait allan_variance
        value_histogram props_extract fano_factor
    """,
    "text": """
        language_id token_counts char_entropy entropy_rate
        unigram_perplexity good_turing brown_smoothing witten_bell yule_k
        hapax_profile term_gini term_burstiness keyness_llr
        lexical_diversity fightin_words stylometry chao1_vocab
        length_moments lang_divergence naive_bayes_lang encoding_audit
        path_trigrams corpus_delta length_bias length_quantiles
        mutual_information
    """,
    "stats": """
        contingency_chi2 kendall_tau ks_two_sample runs_test
        hill_tail_index cohen_kappa gumbel_maxima lorenz_deciles
        mann_whitney trimmed_stats anderson_darling
        pearson_residuals brown_forsythe kruskal_wallis jarque_bera
        durbin_watson grubbs_test friedman_test median_ci jackknife_se
        capture_recapture
        coupon_collector inspection_paradox odds_ratio nb_dispersion
        benford_audit powerlaw_fit theil_decomposition
        simpson_diversity
        feature_correlation mad_outliers equidepth_histogram
        group_percentiles weighted_sample pvm_bridge
    """,
    "exp": """
        power_analysis bh_fdr mase_backtest rmst diff_in_diff
        decision_stump gains_table ranking_auc calibration_ece sprt_stop
        eb_shrinkage neyman_allocation kish_ess logrank_test ipf_raking
        cuped_adjustment ab_test_z ipw_estimate aipw_estimate
        logistic_step shapley_attribution k_anonymity l_diversity
        ucb_scores
    """,
}

DOCSTRINGS = {
    "shared": "Shared constants and helpers for the driver_queries_td_* "
    "domain modules.\n\nEvery name here is used (transitively) by pairs in "
    "more than one domain\nmodule; single-domain names live next to their "
    "pairs. Oracle SQL strings\nbake these constants at import time "
    "(CLAUDE.md invariant 8) — never\nrebind one.",
    "graph": "Link-graph pairs: PageRank family, centralities, components, "
    "structure.",
    "ir": "IR pairs: BM25 scoring family, query expansion, rank eval, "
    "reranking.",
    "index": "Physical-index pairs: postings codecs, impact/tier layout, "
    "sharding, caches, vocab.",
    "ann": "Similarity/dedup/embedding/media pairs: MinHash, SimHash, ANN, "
    "sketches, multimodal.",
    "tpch": "TPC-H-style business analytics pairs over "
    "orders/lineitem/customer/part.",
    "events": "Event-stream pairs: sessions, funnels, time series, "
    "queueing.",
    "text": "Corpus/text-statistics and language-model pairs.",
    "stats": "Classical statistical tests and estimator pairs.",
    "exp": "Experimentation, causal-inference and ML-eval pairs.",
}


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = tree.body

    pair_domain = {}
    for dom, blob in DOMAINS.items():
        for name in blob.split():
            if name in pair_domain and pair_domain[name] != dom:
                # later assignment wins only if explicit; treat as error
                raise SystemExit(f"{name} in both {pair_domain[name]} and {dom}")
            pair_domain[name] = dom

    # --- statement metadata -------------------------------------------
    provides = defaultdict(list)  # name -> [stmt idx]
    stmt_provides = {}
    header_idx = []
    docstring_idx = None
    for i, s in enumerate(stmts):
        if isinstance(s, (ast.Import, ast.ImportFrom)):
            header_idx.append(i)
            continue
        if (
            docstring_idx is None
            and isinstance(s, ast.Expr)
            and isinstance(s.value, ast.Constant)
        ):
            docstring_idx = i
            continue
        if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            provides[s.name].append(i)
            stmt_provides[i] = (s.name,)
        elif isinstance(s, ast.Assign) and isinstance(s.targets[0], ast.Name):
            provides[s.targets[0].id].append(i)
            stmt_provides[i] = (s.targets[0].id,)
        elif isinstance(s, ast.Assign) and isinstance(s.targets[0], ast.Tuple):
            names = tuple(e.id for e in s.targets[0].elts)
            for nm in names:
                provides[nm].append(i)
            stmt_provides[i] = names
        elif isinstance(s, (ast.For, ast.While, ast.If, ast.Expr)) and i - 1 in stmt_provides:
            # mutates the name(s) defined just above (e.g. the _FACTORIALS
            # builder loop) — glue it to that unit so they travel together
            names = stmt_provides[i - 1]
            for nm in names:
                provides[nm].append(i)
            stmt_provides[i] = names
        else:
            raise SystemExit(f"unhandled stmt at line {s.lineno}: {type(s)}")

    top_names = set(provides)

    requires = {}
    for i, s in enumerate(stmts):
        used = {
            n.id
            for n in ast.walk(s)
            if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        }
        requires[i] = (used & top_names) - set(stmt_provides.get(i, ()))
    # the two-step .format statements reference their own name: keep that
    for i, s in enumerate(stmts):
        if i in stmt_provides and isinstance(s, ast.Assign):
            used = {
                n.id
                for n in ast.walk(s.value)
                if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
            }
            requires[i] = requires[i] | (used & set(stmt_provides[i]))

    # --- pair roots from the dicts ------------------------------------
    dict_stmts = {}
    for i, s in enumerate(stmts):
        for nm in stmt_provides.get(i, ()):
            if nm in ("QUERIES_TD", "ORACLES_TD"):
                dict_stmts[nm] = i
    qmap = {
        k.value: v.id
        for k, v in zip(
            stmts[dict_stmts["QUERIES_TD"]].value.keys,
            stmts[dict_stmts["QUERIES_TD"]].value.values,
        )
    }
    omap = {
        k.value: v.id
        for k, v in zip(
            stmts[dict_stmts["ORACLES_TD"]].value.keys,
            stmts[dict_stmts["ORACLES_TD"]].value.values,
        )
    }
    missing = set(qmap) - set(pair_domain)
    extra = set(pair_domain) - set(qmap)
    if missing or extra:
        raise SystemExit(f"unassigned pairs: {sorted(missing)}\nnot pairs: {sorted(extra)}")

    # --- name ownership via closure -----------------------------------
    owners = defaultdict(set)  # name -> set of domains
    for pair, dom in pair_domain.items():
        seen, frontier = set(), [qmap[pair], omap[pair]]
        while frontier:
            nm = frontier.pop()
            if nm in seen:
                continue
            seen.add(nm)
            owners[nm].add(dom)
            for si in provides[nm]:
                frontier.extend(requires[si] - seen)

    def loc(name: str) -> str:
        ds = owners.get(name, set())
        return ds.copy().pop() if len(ds) == 1 else "shared"

    # --- source segments (comments travel with the next stmt) ---------
    seg_start = {}
    prev_end = 0
    for i, s in enumerate(stmts):
        seg_start[i] = prev_end  # 0-based line index
        prev_end = s.end_lineno
    seg = {
        i: "".join(lines[seg_start[i]: stmts[i].end_lineno]) for i in range(len(stmts))
    }

    header_src = "".join(ast.get_source_segment(src, stmts[i]) + "\n" for i in header_idx)

    # --- emit ----------------------------------------------------------
    module_stmts = defaultdict(list)  # 'shared' | domain -> [stmt idx]
    emitted_text = set()
    for i in range(len(stmts)):
        if i in header_idx or i == docstring_idx or i in dict_stmts.values():
            continue
        names = stmt_provides[i]
        key = (names, ast.get_source_segment(src, stmts[i]))
        if key in emitted_text:  # duplicate identical constant (US_PER_HOUR_DIV)
            continue
        emitted_text.add(key)
        locs = {loc(nm) for nm in names}
        module_stmts[locs.pop() if len(locs) == 1 else "shared"].append(i)

    shared_names = {
        nm for i in module_stmts["shared"] for nm in stmt_provides[i]
    }

    files = {}
    shared_body = (
        f'"""{DOCSTRINGS["shared"]}\n"""\n\n' + header_src
        + "".join(seg[i].lstrip("\n") if k == 0 else seg[i]
                  for k, i in enumerate(module_stmts["shared"]))
    )
    files["search_engine_spark/driver_queries_td_shared.py"] = shared_body

    for dom in DOMAINS:
        idxs = module_stmts[dom]
        needed = set()
        for i in idxs:
            needed |= requires[i] & shared_names
        pairs = sorted(p for p, d in pair_domain.items() if d == dom)
        for p in pairs:
            for nm in (qmap[p], omap[p]):
                if nm in shared_names:
                    needed.add(nm)
        imp = ""
        if needed:
            imp = (
                "from .driver_queries_td_shared import (\n"
                + "".join(f"    {n},\n" for n in sorted(needed))
                + ")\n\n"
            )
        qd = "QUERIES = {\n" + "".join(
            f'    "{p}": {qmap[p]},\n' for p in pairs
        ) + "}\n"
        od = "ORACLES = {\n" + "".join(
            f'    "{p}": {omap[p]},\n' for p in pairs
        ) + "}\n"
        body = (
            f'"""{DOCSTRINGS[dom]}\n\nSplit out of driver_queries_td.py '
            '(see that module for the shared pair\ncontract). Constants '
            "used only by this domain's pairs are defined here —\nthe "
            "per-module grep surface CLAUDE.md invariant 8 asks for."
            '\n"""\n\n'
            + header_src
            + imp
            + "".join(seg[i].lstrip("\n") if k == 0 else seg[i]
                      for k, i in enumerate(idxs))
            + "\n\n" + qd + "\n" + od
        )
        files[f"search_engine_spark/driver_queries_td_{dom}.py"] = body

    # aggregator
    doc = ast.get_source_segment(src, stmts[docstring_idx])
    agg = doc + "\n\n"
    agg += (
        "# Split into domain modules in r04 (VERDICT r03 task 2): each\n"
        "# pair and its import-baked oracle SQL live in exactly one\n"
        "# driver_queries_td_* module; cross-domain constants live in\n"
        "# driver_queries_td_shared. This module re-exports every name so\n"
        "# existing imports keep working, and merges the per-module\n"
        "# QUERIES/ORACLES dicts into QUERIES_TD/ORACLES_TD.\n\n"
    )
    mods = {"shared": sorted(set(shared_names))}
    for dom in DOMAINS:
        mods[dom] = sorted(
            {nm for i in module_stmts[dom] for nm in stmt_provides[i]}
        )
    for mod, names in mods.items():
        if not names:
            continue
        agg += (
            f"from .driver_queries_td_{mod} import (  # noqa: F401\n"
            + "".join(f"    {n},\n" for n in names)
            + ")\n"
        )
    agg += "\n"
    for dom in DOMAINS:
        agg += (
            f"from . import driver_queries_td_{dom} as _td_{dom}  # noqa: E402\n"
        )
    merge_q = " | ".join(f"dict(_td_{d}.QUERIES)" for d in DOMAINS)
    merge_o = " | ".join(f"dict(_td_{d}.ORACLES)" for d in DOMAINS)
    agg += (
        "\nQUERIES_TD = " + merge_q + "\n"
        "ORACLES_TD = " + merge_o + "\n"
    )
    files[SRC] = agg

    for path, body in files.items():
        with open(path, "w") as f:
            f.write(body)
        print(f"{path}: {body.count(chr(10))} lines")


if __name__ == "__main__":
    main()

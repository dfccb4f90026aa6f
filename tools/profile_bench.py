#!/usr/bin/env python
"""Per-query profiling for the optimization rounds (guide §1).

For every DataFrame-shaped bench query: capture ``explain("formatted")``
to ``plans/<tag>/<name>_<suffix>.txt`` and time the bare computation via
the noop sink (guide §1.4) on a warm session, N repetitions, reporting
the min (the least-noise estimator on a shared host).

Usage:
  python tools/profile_bench.py [--plans-only] [--only a,b] [--reps 3]
      [--tag r12] [--suffix before]

The timed span is the noop write of the query's DataFrame — identical
computation to the bench's count()/collect() minus the driver-side
result pull, so numbers here are comparable but NOT substitutes for
bench.py's (the driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def builders(spark, sf_dir):
    """name -> zero-arg DataFrame builder, mirroring bench.py's timed
    set (DataFrame-shaped members only; scalar ops like fast_count and
    the point-get loop have no single plan to capture)."""
    from hbasewd_spark import queries as Q
    from hbasewd_spark.operators import dedup as DD, relational as R, similarity as SIM

    reg = {
        "q1_pricing": lambda: R.q1_pricing_summary(spark, sf_dir),
        "q5_star_join": lambda: R.join_multiway_region_revenue(spark, sf_dir),
        "window_running": lambda: R.window_running_total(spark, sf_dir),
        "sessionization": lambda: R.sessionize(spark, sf_dir),
        "dedup_minhash": lambda: DD.minhash_dedup_pairs(spark, sf_dir),
        "dedup_simhash": lambda: DD.simhash_df(spark, sf_dir),
        "sim_brute_topk": lambda: SIM.brute_topk(spark, sf_dir),
        "sim_ivf_topk": lambda: SIM.ivf_topk(spark, sf_dir),
    }
    for bench_name, reg_name in BENCH_TO_REGISTRY.items():
        reg[bench_name] = (
            lambda rn=reg_name: Q.REGISTRY[rn].fn(spark, sf_dir)
        )
    return reg


BENCH_TO_REGISTRY = {
    "text_stats": "ext_text_stats",
    "corpus_curation": "ext_pipeline_corpus_curation",
    "regression_agg": "rel_regression_agg",
    "stream_window_agg": "stream_windowed_agg",
    "asof_join": "rel_asof_join",
    "time_rollup": "rel_time_rollup",
    "dedup_clusters": "ext_dedup_clusters",
    "contamination": "ext_text_contamination",
    "ts_gapfill": "rel_ts_gapfill_locf",
    "chunking": "ext_text_chunking",
    "packing": "ext_pack_sequences",
    "bm25": "ext_text_bm25",
    "audio_segments": "ext_multimodal_audio_segments",
    "tpch_q21": "rel_q21_waiting_suppliers",
    "passage_dedup": "ext_passage_dedup",
    "semdedup": "ext_semdedup",
    "temperature_mixture": "ext_temperature_mixture",
    "embed_outliers": "ext_embed_outliers",
    "incremental_dedup": "ext_dedup_incremental",
    "quality_calibration": "ext_quality_calibration",
    "url_host_stats": "ext_url_host_stats",
    "tpch_q5": "rel_q5_local_supplier",
    "tpch_q9": "rel_q9_product_profit",
    "tpch_q12": "rel_q12_priority_shipping",
    "token_budget": "ext_token_budget_sample",
    "shard_plan": "ext_shard_plan",
    "unigram_familiarity": "ext_unigram_familiarity",
    "centroid_drift": "ext_centroid_drift",
    "passage_scrub": "ext_passage_scrub",
    "code_detect": "ext_code_detect",
    "dedup_substring": "ext_dedup_substring",
    "dedup_winnow": "ext_dedup_winnow",
    "pagerank": "ext_graph_pagerank",
    "dedup_spans": "ext_dedup_substring_spans",
    "dedup_rewrite": "ext_dedup_substring_rewrite",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=SF_DIR)
    args = ap.parse_args()

    from hbasewd_spark.session import get_spark
    from hbasewd_spark.operators.dedup import clear_dedup_caches
    from hbasewd_spark.operators.graph import clear_graph_caches

    spark = get_spark(app_name="hbasewd_profile")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plandir = os.path.join(repo, "plans", args.tag)
    os.makedirs(plandir, exist_ok=True)

    # warm like bench.py: JVM, parquet footers, python daemons
    from hbasewd_spark.sources.loaders import load_table

    load_table(spark, args.sf, "events").count()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    reg = builders(spark, args.sf)
    only = set(args.only.split(",")) if args.only else None
    results = {}
    for name, build in reg.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"{name}: BUILD FAILED {e}", file=sys.stderr)
            results[name] = {"err": str(e)[:200]}
            continue
        with open(os.path.join(plandir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(plan)
        row = {
            "exchanges": plan.count("Exchange"),
            "bev_python": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        }
        if not args.plans_only:
            times = []
            for i in range(args.reps):
                # per-rep cache hygiene: the dedup/graph session caches
                # would make rep 2+ measure a .persist() hit, not the query
                clear_dedup_caches()
                clear_graph_caches()
                df = build()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 3))
            row.update({"noop_min_s": min(times), "noop_all": times})
        results[name] = row
        print(f"{name}: {row}", flush=True)
        spark.sparkContext.setJobDescription(None)
    out = os.path.join(repo, "plans", args.tag, f"_profile_{args.suffix}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"profile -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Benchmark harness.

Headline: inverted-index build throughput (docs/s) over the synthetic
source-code corpus (the north-rule input shape) + BM25 query p50, plus
per-pipeline timings for the operator suite over $GRAFT_SF_DIR tables.

Prints ONE JSON line:
  {"metric": "corpus_index_build_sec", "value": <headline build sec>,
   "unit": "sec", "queries": {...per-stage sec...}, "sf": ...,
   "num_cpus": N, "docs_per_s": ..., "query_p50_ms": ...}

``--scaling`` runs the same workload at two parallelism levels
(GRAFT_SCALING_LO/HI, default 2 vs 8 — the 4x pair this host's
effective cores honor) in fresh processes, median of 3 per level in
alternating order, and reports both throughputs + scaling efficiency
(the sandbox stand-in for the N vs 4N node criterion — see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_CORPUS_DOCS = int(os.environ.get("GRAFT_CORPUS_DOCS", "40000"))
SEED = 42


def _sf_tag() -> str:
    return os.path.basename(SF_DIR.rstrip("/")) or "sf"


def ensure_corpus(path: str, n_docs: int) -> None:
    """Generate (once, cached) the synthetic code corpus parquet."""
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return
    from typesense_ray.corpus import generate_corpus

    shutil.rmtree(path, ignore_errors=True)
    generate_corpus(path, n_docs, seed=SEED, num_blocks=64)
    with open(marker, "w") as f:
        f.write(str(n_docs))


def timed(fn, *args, **kwargs):
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    return out, time.perf_counter() - t0


def cpu_probe_ms() -> float:
    """Single-core speed probe: a fixed 10^7-iteration Python loop. This
    host's delivered CPU fluctuates 2-6x between windows (co-tenant
    hypervisor; see BASELINE.md) — recording the probe next to every
    bench result lets cross-run comparisons separate code changes from
    host-speed changes (~450-500 ms in a quiet window)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10**7):
        x += i
    return round((time.perf_counter() - t0) * 1000, 1)


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np

    from typesense_ray.corpus import PLANTED_TERMS
    from typesense_ray.index_build import IndexConfig, build_index
    from typesense_ray.query import LocalIndexSearcher, search_index

    results: dict[str, float] = {}
    probe_ms = cpu_probe_ms()
    try:
        load1 = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        load1 = -1.0

    # -- worker warm-up --------------------------------------------------
    # Ray starts worker processes lazily and each one pays a cold
    # typesense_ray/pandas import on its first task; without this, the
    # first few timed stages measure process spawn + import, not the
    # operator (observed 12 s cold vs 2.7 s warm for the same op). One
    # throwaway map_batches over the sf dir spins up the pool.
    import ray.data as rd

    def _warm(b):
        import typesense_ray.functions.text  # noqa: F401 — warm the import
        return b

    rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"]) \
        .map_batches(_warm, batch_format="pyarrow").count()

    # ... and the sort-shuffle machinery: the first groupby exchange of a
    # session pays its own spin-up (sort workers, reduce-task pool) —
    # observed 8.3 s vs 3.1 s warm for the same op. One 1-row-per-block
    # groupby absorbs that outside any timed window.
    def _tag(b):
        import numpy as _np
        import pyarrow as _pa

        return b.append_column(
            "g", _pa.array(_np.zeros(b.num_rows, _np.int64))
        )

    rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"]) \
        .map_batches(_tag, batch_format="pyarrow") \
        .groupby("g").count().materialize()

    # -- headline: corpus index build -----------------------------------
    corpus_dir = f"/tmp/tsray_bench/corpus-{N_CORPUS_DOCS}-{SEED}"
    ensure_corpus(corpus_dir, N_CORPUS_DOCS)
    # warm the page cache so both scaling levels measure compute+shuffle
    import pyarrow.dataset as pads

    pads.dataset(corpus_dir).to_table(columns=["content", "sha256"])

    idx_dir = f"/tmp/tsray_bench/idx-{os.getpid()}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    # Writer CPU hint: keep the concurrent-writer count near the host's
    # EFFECTIVE core throughput (this sandbox advertises 32 CPUs but
    # delivers ~11 cores; see BASELINE.md). ~num_cpus/10 slots/task caps
    # the pool at ~10 heavy writers regardless of the advertised count.
    # Per-task reservation = advertised/effective, so the concurrent writer
    # count lands on the effective cores whether advertised is 2 or 32
    # (at 8 CPUs the old //10 heuristic reserved 2 → only 4 writers on a
    # host that can run 8).
    writer_cpus = float(
        os.environ.get("GRAFT_WRITER_CPUS", max(1, round(NUM_CPUS / 8)))
    )
    cfg = IndexConfig(
        # 2048-doc segments: A/B'd against 4096/8192 — the 8-CPU level
        # (the scale story) measures best with ~200 tasks at 400k docs
        # (finer grain → better slot balance; scaling run 0.864 vs 0.484)
        batch_docs=int(os.environ.get("GRAFT_BATCH_DOCS", "2048")),
        meta_fields=("repo", "path", "lang"),
        writer_num_cpus=writer_cpus,
    )
    stats, t_build = timed(build_index, corpus_dir, idx_dir, cfg)
    results["corpus_index_build"] = round(t_build, 3)
    docs_per_s = round(stats["n_docs"] / t_build, 1)

    if os.environ.get("GRAFT_BENCH_SKIP_QUERY"):
        # scaling protocol: the efficiency metric is build docs/s only —
        # skip the query phases so each level is one clean measurement
        out = {
            "metric": "corpus_index_build_sec",
            "value": results["corpus_index_build"],
            "unit": "sec",
            "queries": results,
            "sf": _sf_tag(),
            "num_cpus": NUM_CPUS,
            "cpu_probe_ms": probe_ms,
            "load_avg_start": load1,
            "n_corpus_docs": stats["n_docs"],
            "docs_per_s": docs_per_s,
        }
        shutil.rmtree(idx_dir, ignore_errors=True)
        ray.shutdown()
        print(json.dumps(out))
        return

    # -- query latency over the built index ------------------------------
    searcher = LocalIndexSearcher(idx_dir, preload=True)
    rng = np.random.default_rng(7)
    queries = []
    for _ in range(60):
        k = int(rng.integers(1, 4))
        terms = [PLANTED_TERMS[int(rng.zipf(1.4)) % len(PLANTED_TERMS)] for _ in range(k)]
        queries.append(" ".join(terms))
    lat = []
    for q in queries:
        t0 = time.perf_counter()
        searcher.search(q, k=10, mode="bm25")
        lat.append(time.perf_counter() - t0)
    p50 = statistics.median(lat) * 1000
    results["query_60x_local"] = round(sum(lat), 3)
    _, t_dist = timed(search_index, idx_dir, "quasar pulsar", 10)
    results["query_distributed_fanout"] = round(t_dist, 3)

    if os.environ.get("GRAFT_BENCH_BUILD_ONLY"):
        out = {
            "metric": "corpus_index_build_sec",
            "value": results["corpus_index_build"],
            "unit": "sec",
            "queries": results,
            "sf": _sf_tag(),
            "num_cpus": NUM_CPUS,
            "cpu_probe_ms": probe_ms,
            "load_avg_start": load1,
            "n_corpus_docs": stats["n_docs"],
            "docs_per_s": docs_per_s,
            "query_p50_ms": round(p50, 2),
        }
        shutil.rmtree(idx_dir, ignore_errors=True)
        ray.shutdown()
        print(json.dumps(out))
        return

    # -- concurrent serving throughput (reference headline: 250 q/s on a
    # 3-node cluster, README.md:170-173): persistent actor pool, all
    # query fan-outs in flight at once
    from typesense_ray.query import IndexServer

    srv = IndexServer(idx_dir)  # actors = min(segments, CPUs // 2)
    srv.warmup()
    _, t_serve = timed(srv.search_many, queries, 10)
    srv.shutdown()
    results["serving_60q"] = round(t_serve, 3)
    serving_qps = round(len(queries) / t_serve, 1)

    # -- operator pipelines over $GRAFT_SF_DIR ---------------------------
    # GRAFT_BENCH_OPS (comma-separated) restricts the suite to a subset —
    # used for the larger-scale bench points where only the throughput-
    # relevant ops (dedup family, ANN, text) run over a tools/make_sf.py
    # corpus; the tpch/events ops have no scaled-up input there
    import __ray_entry__ as entrymod

    only = {
        s.strip() for s in os.environ.get("GRAFT_BENCH_OPS", "").split(",")
        if s.strip()
    }
    qs = entrymod.queries()
    for name in [
        "term_df_top50",
        "bm25_topk",
        "facet_stats_by_lang",
        "exact_dedup",
        "minhash_dup_pairs",
        "ngram_jaccard_pairs",
        "simhash_groups",
        "embedding_dup_pairs",
        "knn_cosine",
        "ann_ivf",
        "langid",
        "quality",
        "token_counts",
        "fingerprints",
        "tpch_q1ish",
        "tpch_q5ish",
        "join_priority",
        "sessionize",
        "events_tumbling",
        "events_hopping",
        "seq_packing",
        "stratified_sample",
        "dup_clusters",
        "clean_corpus",
        "tfidf_topk",
        "asof_join",
        "redact_pii",
        "decontaminate",
        "dup_spans",
        "rep_filter",
        "chunk_docs",
        "global_shuffle",
        "value_quantiles",
        "char_lm_score",
        "more_like_this",
        "top_terms_per_lang",
        "source_mix",
        "event_histogram",
        "knn_filtered",
        "distinct_users",
        "hll_users",
        "cms_terms",
        "props_stats",
        "hybrid_search",
        "near_dedup",
        "bloom_decontaminate",
        "kmeans_clusters",
        "prepare_corpus",
        "zscore_events",
        "label_centroids",
        "user_deltas",
        "rolling_events",
        "customers_without_orders",
        "orders_rollup",
        "oov_rate",
        "bigram_top30",
        "trim_outliers",
        "lang_pivot",
        "synonym_search",
        "override_search",
        "facet_query_counts",
        "audio_features",
        "image_decode_real",
    ]:
        if only and name not in only:
            continue
        _, dt = timed(qs[name], SF_DIR)
        results[name] = round(dt, 3)

    out = {
        "metric": "corpus_index_build_sec",
        "value": results["corpus_index_build"],
        "unit": "sec",
        "queries": results,
        "sf": _sf_tag(),
        "num_cpus": NUM_CPUS,
            "cpu_probe_ms": probe_ms,
            "load_avg_start": load1,
        "n_corpus_docs": stats["n_docs"],
        "docs_per_s": docs_per_s,
        "query_p50_ms": round(p50, 2),
        "serving_qps": serving_qps,
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(out))


def scaling() -> None:
    # N vs 4N parallelism in fresh processes (the sandbox stand-in for the
    # two-cluster-size criterion). This host's effective cores fluctuate
    # (~11 to ~16 of 32 advertised; see BASELINE.md), so the honest 4x
    # pair is 2 vs 8 — both levels backed by hardware in every window.
    # Host CPU delivery is ±20-35% run-to-run (co-tenant hypervisor), and
    # almost all of the noise lands on the hi level, so each level is
    # measured GRAFT_SCALING_REPS times in ALTERNATING order (hi,lo ×
    # reps) and the efficiency is computed over per-level medians — one
    # --scaling invocation is then a robust measurement on its own.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", str(4 * lo)))
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    # >=800k docs so fixed init/ramp (~2 s) stays noise at the hi level
    n_docs = int(os.environ.get("GRAFT_SCALING_DOCS", "800000"))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_BUILD_ONLY="1",
            GRAFT_BENCH_SKIP_QUERY="1",
            GRAFT_CORPUS_DOCS=str(n_docs),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    hi_runs, lo_runs = [], []
    for _ in range(reps):
        hi_runs.append(run(hi))  # hi first also generates/warms the corpus
        lo_runs.append(run(lo))
    dps_hi = statistics.median(r["docs_per_s"] for r in hi_runs)
    dps_lo = statistics.median(r["docs_per_s"] for r in lo_runs)
    eff = (dps_hi / dps_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "cpus": [lo, hi],
                "build_sec": [
                    statistics.median(r["value"] for r in lo_runs),
                    statistics.median(r["value"] for r in hi_runs),
                ],
                "docs_per_s": [dps_lo, dps_hi],
                "docs_per_s_all": {
                    "lo": [r["docs_per_s"] for r in lo_runs],
                    "hi": [r["docs_per_s"] for r in hi_runs],
                },
                "reps_per_level": reps,
                "scaling_efficiency": round(eff, 3),
                "sf": _sf_tag(),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()

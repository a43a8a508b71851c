"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect) K times
(default 3, $SPARK_GRAFT_BENCH_K) and reported as the MEDIAN — single
shots on a shared host swing ~2x with external load, and medians keep
round-over-round comparisons meaningful. A warm-up pass of one tiny
query keeps JVM/session startup out of the first query's time. Value =
sum of per-query median wall seconds.

The sustained-ingest phase appends $SPARK_GRAFT_SUSTAINED_BATCHES
(default 50) consecutive micro-batches into one growing store WITH
periodic compaction engaged, reporting per-batch ev/s and the
last-half/first-half trend ratio — flat ev/s through compactions and
heads-log folds is the "write cost independent of table size" claim,
measured.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sierradb_spark.operators import REGISTRY  # noqa: E402
from sierradb_spark.session import get_spark  # noqa: E402


def _load_probe() -> dict:
    """Host-weather sample recorded at every phase boundary: the 1-min
    system load average plus a fixed single-thread GEMM timing. The
    container shares its host; an external load episode moves every
    timing in lockstep (measured r6: suite 14.4 -> 17.8 s with zero
    repo changes while host load hit 15). The GEMM alone under-detects
    contention on a many-core host (one thread still finds a free core
    while 32-wide Spark stages queue), so loadavg — the direct signal —
    is recorded alongside it. Interpretation notes in docs/SCALE.md."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        (a @ a).sum()
        runs.append(time.perf_counter() - t0)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    return {"gemm": round(statistics.median(runs), 4), "load1": load1}


def _settle_wait(gate: float, settle_max: float) -> dict:
    """Bounded wait for the 1-min load average to decay below ``gate``
    before a timed section starts — the gate the iterative section has
    had since r8, shared so the headline/ingest sections can use it
    too (r11 VERDICT item 2: a burst at t=0 poisoned the 17 PERF rows
    because only the iterative section gated)."""
    t0 = time.time()
    settled = None
    while True:
        try:
            settled = os.getloadavg()[0]
        except OSError:
            break
        if settled <= gate or time.time() - t0 >= settle_max:
            break
        time.sleep(5)
    return {
        "gate_load1": gate,
        "settle_seconds": round(time.time() - t0, 1),
        "settled_load1": round(settled, 2) if settled is not None else None,
        "gated": settled is not None and settled <= gate,
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    probe_pre = _load_probe()
    spark = get_spark(app_name="bench")

    headline = {n: q for n, q in REGISTRY.queries.items() if q.headline}

    # Warm up: session init, parquet footer reads, codegen caches. The
    # events/documents tables are warmed too — the first headline
    # queries scan them, and paying their footer reads + the events
    # nanos→µs conversion codegen inside a timed run inflated
    # esver/watermark medians by ~0.2 s per round (profiled r6: first
    # rep 2.4 s vs 0.5 s steady-state). That cost is session startup,
    # not query work, same as the ingest warm-append below.
    from sierradb_spark.registry import load as load_table

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    load_table(spark, sf_dir, "events").limit(1).count()
    load_table(spark, sf_dir, "documents").limit(1).count()

    # Per-phase probe samples: an external load burst confined to the
    # middle of the run is invisible to endpoint-only sampling (observed
    # r6: clean pre/post probes around a burst that hit only the query
    # phase). One sample after each phase localizes which numbers a
    # burst touched.
    probes = {"pre": probe_pre}

    k = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K", "3")))
    timings: dict[str, float] = {}
    # Fixed canonical order (sorted by name), NOT registry order: the
    # registry front-50 rotates every round for the driver's
    # correctness window, and whichever headline query happened to run
    # first absorbed the remaining first-query warm-up (r9:
    # user_state_projection 0.333 -> 0.795 s purely because the
    # rotation moved it to slot 1). Sorting freezes each query's
    # position across rounds, and the untimed warm-up rep below
    # removes the first-slot penalty from the one query that still
    # pays it.
    headline_order = sorted(headline)
    first = headline[headline_order[0]]
    first.spark(spark, sf_dir).collect()

    def run_headline(tag: str) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in headline_order:
            q = headline[name]
            runs: list[float] = []
            n = 0
            for _ in range(k):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                n = len(df.collect())
                runs.append(time.perf_counter() - t0)
            out[name] = round(statistics.median(runs), 3)
            print(
                f"# {name}{tag}: median={out[name]}s "
                f"runs={[round(r, 3) for r in runs]} rows={n}",
                file=sys.stderr,
            )
        return out

    # Quiet gate for the HEADLINE section (r11 VERDICT item 2; additions
    # only — same 17 queries, same timed action, same medians-of-k). The
    # section's boundary GEMM probes are compared against a quiet floor
    # (min of the canonical quiet figure and every probe observed this
    # run: a uniformly slower host raises its own floor, a burst does
    # not lower it). A section whose boundary probes exceed ~3x the
    # floor was run under an external host burst — the r11 record's
    # failure mode (pre-run GEMM 57x the floor poisoned all 17 PERF
    # rows) — so it is re-run ONCE after a bounded load-settle wait and
    # the attempt with the cleaner boundary probes is reported; both
    # attempts and the decision land in the detail line.
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "6"))
    settle_max = float(os.environ.get("SPARK_GRAFT_SETTLE_S", "120"))
    gemm_floor_env = float(os.environ.get("SPARK_GRAFT_GEMM_FLOOR", "0.0014"))
    retry_factor = float(os.environ.get("SPARK_GRAFT_RETRY_FACTOR", "3"))

    def _contaminated(boundary: list[dict]) -> tuple[bool, float]:
        floor = min(
            [gemm_floor_env]
            + [p["gemm"] for p in probes.values()]
            + [p["gemm"] for p in boundary]
        )
        worst = max(p["gemm"] for p in boundary)
        return worst > retry_factor * floor, floor

    hl_settle = _settle_wait(gate, settle_max)
    probe_hl0 = _load_probe()
    timings_try1 = run_headline("")
    probe_hl1 = _load_probe()
    dirty1, floor1 = _contaminated([probe_hl0, probe_hl1])
    headline_retry: dict = {
        "attempt1_probes": {"before": probe_hl0, "after": probe_hl1},
        "settle": hl_settle,
        "quiet_floor": floor1,
        "retry_factor": retry_factor,
        "retried": bool(dirty1),
    }
    if dirty1:
        print(
            f"# headline section contaminated (boundary gemm "
            f"{max(probe_hl0['gemm'], probe_hl1['gemm'])} > "
            f"{retry_factor}x floor {floor1}); retrying once",
            file=sys.stderr,
        )
        headline_retry["settle2"] = _settle_wait(gate, settle_max)
        probe_hl2 = _load_probe()
        timings_try2 = run_headline(" [retry]")
        probe_hl3 = _load_probe()
        headline_retry["attempt2_probes"] = {
            "before": probe_hl2,
            "after": probe_hl3,
        }
        headline_retry["attempt1_timings"] = timings_try1
        headline_retry["attempt2_timings"] = timings_try2
        # Report the attempt whose boundary probes are cleaner.
        if max(probe_hl2["gemm"], probe_hl3["gemm"]) <= max(
            probe_hl0["gemm"], probe_hl1["gemm"]
        ):
            headline_retry["used"] = "attempt2"
            timings.update(timings_try2)
        else:
            headline_retry["used"] = "attempt1"
            timings.update(timings_try1)
    else:
        timings.update(timings_try1)

    probes["after_queries"] = _load_probe()

    # Iterative/heavy operators (multi-round fixpoints: label
    # propagation, k-core peeling, BPE merge learning, Markov power
    # iteration, the quality-vs-dup calibration sweep). Reported in
    # their OWN section, not the 17-row headline sum — the headline set
    # is frozen for round-over-round comparability, and these
    # 10-40 s-class queries would drown it. Their purpose here is a
    # recorded regression baseline, so this phase runs HERE — right
    # after the headline queries, BEFORE the ingest/subscription/corpus
    # phases — because those phases measurably heat the process and
    # host: the r8 driver run's single-thread GEMM probe read 0.0014 s
    # at start, 0.0015 s after the queries, but 0.0025 s after the
    # corpus phase, and the iterative section (then positioned last)
    # recorded label_prop at ~4x its quiet-host figure while the
    # settle gate read only moderate loadavg. Position is the fix the
    # probes support; the gate below still guards against EXTERNAL
    # load episodes: (1) wait (bounded) for the 1-min load average to
    # decay below a gate before starting; (2) report BEST-of-k per
    # query (the noise floor under residual load; medians of 2 reps
    # were just as contaminated); (3) attach per-rep (seconds, pre-rep
    # load1) samples in `iterative_runs` so a contaminated recording
    # is self-evident rather than silently inflated.
    iterative_probe = _settle_wait(gate, settle_max)
    print(f"# iterative settle: {iterative_probe}", file=sys.stderr)
    # best-of-3: at this (early) position rep 1 pays the session's
    # memo builds and fan-out codegen, rep 2 still carries JIT residue
    # (measured: label_prop 9.2 -> 1.6 -> 1.4 s on a fresh session);
    # the third rep costs ~10 s of wall across the five queries and is
    # what makes the recorded best a code property, not a warm-up one.
    k_iter = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_K_ITER", "3")))
    iter_names = [
        "label_prop_communities",
        "kcore_near_dup",
        "quality_dup_calibration",
        "bpe_learn_merges",
        "markov_stationary_distribution",
    ]
    iterative: dict[str, float] = {}
    iterative_runs: dict[str, list] = {}
    for name in iter_names:
        q = REGISTRY.queries[name]
        runs_i: list[tuple[float, float]] = []
        for _ in range(k_iter):
            try:
                pre_l1 = round(os.getloadavg()[0], 2)
            except OSError:
                pre_l1 = None
            t0 = time.perf_counter()
            n = len(q.spark(spark, sf_dir).collect())
            runs_i.append((time.perf_counter() - t0, pre_l1))
        iterative[name] = round(min(r for r, _ in runs_i), 3)
        iterative_runs[name] = [
            [round(r, 3), l1] for r, l1 in runs_i
        ]
        print(
            f"# iterative {name}: best={iterative[name]}s "
            f"runs={iterative_runs[name]} rows={n}",
            file=sys.stderr,
        )
    probes["after_iterative"] = _load_probe()

    # Ingest throughput: 20k-event append batch (validate + assign gapless
    # sequences + commit) into a scratch store — the reference's headline
    # write-path concern (group commit, writer_thread_pool.rs:687-699).
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from sierradb_spark.eventstore import EventStore

    scratch = tempfile.mkdtemp(prefix="bench_store_")
    try:
        n_ev = 20_000
        reqs = spark.range(n_ev).select(
            F.concat(F.lit("bench-"), (F.col("id") % 200).cast("string")).alias(
                "stream_id"
            ),
            F.lit("BenchEvent").alias("event_name"),
            F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
        )
        # One tiny untimed append first: the write path's one-time
        # Arrow/codegen/schema warm-up costs ~20 s and belongs to the
        # session, not the operation — paying it inside trial 0 only
        # wastes wall-clock the median throws away anyway.
        warm = EventStore(spark, os.path.join(scratch, "warm"))
        warm.append_df(reqs.limit(10)).where("accepted").count()
        # Median of k trials, each on a FRESH store: the measured op is
        # "20k-event batch append into an empty table". Quiet-gated and
        # retried once exactly like the headline section — this row is
        # one of the 17 PERF rows, and the r11 burst inflated it 3x.
        def run_ingest_trials(tag: str, prefix: str) -> tuple[float, list]:
            runs_g: list[float] = []
            n_acc = 0
            for trial in range(k):
                tdir = os.path.join(scratch, f"{prefix}{trial}")
                store_t = EventStore(spark, tdir)
                t0 = time.perf_counter()
                n_acc = store_t.append_df(reqs).where("accepted").count()
                runs_g.append(time.perf_counter() - t0)
            med = round(statistics.median(runs_g), 3)
            print(
                f"# ingest_20k_events{tag}: median={med}s "
                f"runs={[round(r, 3) for r in runs_g]} accepted={n_acc} "
                f"({int(n_acc / med)} ev/s)",
                file=sys.stderr,
            )
            return med, runs_g

        ing_settle = _settle_wait(gate, settle_max)
        probe_ing0 = _load_probe()
        ing_med1, _ing_runs1 = run_ingest_trials("", "t")
        probe_ing1 = _load_probe()
        ing_dirty, ing_floor = _contaminated([probe_ing0, probe_ing1])
        ingest_retry: dict = {
            "attempt1_probes": {"before": probe_ing0, "after": probe_ing1},
            "settle": ing_settle,
            "quiet_floor": ing_floor,
            "retried": bool(ing_dirty),
        }
        timings["ingest_20k_events"] = ing_med1
        if ing_dirty:
            print(
                "# ingest_20k section contaminated; retrying once",
                file=sys.stderr,
            )
            ingest_retry["settle2"] = _settle_wait(gate, settle_max)
            probe_ing2 = _load_probe()
            ing_med2, _ing_runs2 = run_ingest_trials(" [retry]", "r")
            probe_ing3 = _load_probe()
            ingest_retry["attempt2_probes"] = {
                "before": probe_ing2,
                "after": probe_ing3,
            }
            ingest_retry["attempt1_median"] = ing_med1
            ingest_retry["attempt2_median"] = ing_med2
            if max(probe_ing2["gemm"], probe_ing3["gemm"]) <= max(
                probe_ing0["gemm"], probe_ing1["gemm"]
            ):
                ingest_retry["used"] = "attempt2"
                timings["ingest_20k_events"] = ing_med2
            else:
                ingest_retry["used"] = "attempt1"
        store = EventStore(spark, os.path.join(scratch, "sustained"))
        # Sustained ingest: consecutive micro-batches into the SAME growing
        # table — the reference's headline claim is write performance
        # independent of database size (README.md:96-99). Flat ev/s across
        # batches is that claim, measured: per-batch cost must stay
        # O(batch) because heads recovery reads the heads log (not the
        # events table) and sequences come from the manifest watermarks.
        # Compaction runs every compact_each batches (like a production
        # ingest loop would), so the trend is measured THROUGH segment
        # rollovers and heads-log folds, not just between them.
        n_batches = max(
            1, int(os.environ.get("SPARK_GRAFT_SUSTAINED_BATCHES", "50"))
        )  # clamp: 0 would leave evps empty and crash the summary print
        per_batch, compact_each = 2_000, 10
        evps: list[float] = []
        compact_secs: list[float] = []
        for b in range(n_batches):
            reqs_b = spark.range(per_batch).select(
                F.concat(
                    F.lit(f"sust-{b}-"), (F.col("id") % 200).cast("string")
                ).alias("stream_id"),
                F.lit("SustainedEvent").alias("event_name"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
            )
            tb = time.perf_counter()
            nb = store.append_df(reqs_b).where("accepted").count()
            dt = time.perf_counter() - tb
            evps.append(round(nb / dt, 1))
            if (b + 1) % compact_each == 0 and b + 1 < n_batches:
                tc = time.perf_counter()
                store.compact()
                compact_secs.append(round(time.perf_counter() - tc, 3))
        # Size-degradation signal: a table-size-dependent write path shows
        # a monotonic decline; single-batch GC/JIT noise does not move the
        # half-means. Flat == ratio near (or above) 1. Mean over the
        # actual slice sizes (odd batch counts split unevenly); a single
        # batch has no trend to report.
        half = len(evps) // 2
        trend = (
            round(statistics.mean(evps[half:]) / statistics.mean(evps[:half]), 3)
            if half >= 1
            else 1.0
        )
        # Median companion: a multi-batch stretch of external host load
        # drags the half-MEAN down and masquerades as table-size
        # degradation; the half-median ignores it. Real O(table) growth
        # moves both — divergence between the two ratios reads as
        # "noisy host", agreement as "trust the trend".
        trend_med = (
            round(
                statistics.median(evps[half:]) / statistics.median(evps[:half]),
                3,
            )
            if half >= 1
            else 1.0
        )
        probes["after_ingest"] = _load_probe()
        # Reported in its own JSON section, NOT in the headline timings:
        # the headline value is compared round-over-round on a stable
        # query set, and this phase is a throughput probe, not a query.
        sustained = {
            "total_seconds": round(sum(per_batch / r for r in evps), 3),
            "batches_evps": evps,
            "trend_ratio_last_half_over_first_half": trend,
            "trend_ratio_median_halves": trend_med,
            "events_per_batch": per_batch,
            "compact_every_batches": compact_each,
            "compact_seconds": compact_secs,
        }
        print(
            f"# ingest_sustained: {n_batches}x{per_batch} ev "
            f"first={evps[0]} last={evps[-1]} ev/s "
            f"(last-half/first-half={trend}); "
            f"compactions={compact_secs}",
            file=sys.stderr,
        )
        # Subscription catch-up throughput (EPSUB * over the store the
        # sustained phase just filled): one availableNow pass through
        # the manifest-log source -> matcher -> executor-side sink
        # append, delivering every committed event exactly once. This
        # is S1-S6's perf story measured end to end — catch-up cost is
        # proportional to undelivered data (the manifest log names
        # exactly the committed files), so delivered ev/s here is the
        # number a re-subscribing consumer sees at any table size. Own
        # JSON section: a throughput probe, not a headline query.
        from sierradb_spark.streaming.subscribe import (
            PartitionMatcher,
            Subscription,
            read_subscription_sink,
        )

        sub = Subscription(store, PartitionMatcher())
        sink = os.path.join(scratch, "sub_sink")
        t0 = time.perf_counter()
        sub.catchup_to_sink(sink, os.path.join(scratch, "sub_ckpt"))
        sub_wall = round(time.perf_counter() - t0, 3)
        n_delivered = read_subscription_sink(spark, sink).count()
        subscription = {
            "events_delivered": n_delivered,
            # auditability: delivered must equal what sustained ingest
            # committed — exactly-once across the compacted manifest
            # history, visible in the JSON, not just in tests.
            "events_expected": n_batches * per_batch,
            "catchup_seconds": sub_wall,
            "events_per_second": round(n_delivered / sub_wall, 1),
        }
        print(
            f"# subscription_catchup: {n_delivered} events in {sub_wall}s "
            f"({subscription['events_per_second']} ev/s)",
            file=sys.stderr,
        )
        # Streaming corpus dedup throughput: fold the documents table
        # through StreamingCorpusDedup in deterministic micro-batches
        # (doc_id % n), compacting the band index midway — the
        # incremental near-dup-free corpus build measured end to end
        # (band signatures + index anti-join + CC + idempotent writes).
        # Own JSON section, like sustained ingest: a throughput probe,
        # not a headline query.
        from sierradb_spark.registry import load as load_table
        from sierradb_spark.streaming.corpus import StreamingCorpusDedup

        n_cbatches = max(
            2, int(os.environ.get("SPARK_GRAFT_CORPUS_BATCHES", "6"))
        )
        docs_all = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        dd = StreamingCorpusDedup(spark, os.path.join(scratch, "corpus"))
        batch_secs: list[float] = []
        fold_secs = 0.0
        n_docs_total = 0
        for b in range(n_cbatches):
            batch = docs_all.where(F.col("doc_id") % n_cbatches == b)
            n_docs_total += batch.count()
            tb = time.perf_counter()
            dd.process_batch(batch, b)
            batch_secs.append(round(time.perf_counter() - tb, 3))
            if b == n_cbatches // 2:
                # Timed SEPARATELY (like compact_seconds for sustained
                # ingest): the index fold is maintenance amortized over
                # many batches, and folding its cost into a batch line
                # would read as dedup-throughput noise.
                tf = time.perf_counter()
                dd.compact_index()
                fold_secs = round(time.perf_counter() - tf, 3)
        accepted = dd.corpus().count()
        corpus_total = round(sum(batch_secs), 3)
        corpus_dedup = {
            "batches": n_cbatches,
            "docs_total": n_docs_total,
            "accepted": accepted,
            "batch_seconds": batch_secs,
            "fold_seconds": fold_secs,
            "total_seconds": corpus_total,
            "docs_per_second": round(n_docs_total / corpus_total, 1),
        }
        print(
            f"# corpus_dedup: {n_docs_total} docs in {n_cbatches} batches "
            f"-> {accepted} accepted, {corpus_total}s "
            f"({corpus_dedup['docs_per_second']} docs/s) "
            f"batches={batch_secs}",
            file=sys.stderr,
        )
        # Live-tail subscription latency (S3's second half): the catch-up
        # probe above measures throughput over history; this measures the
        # LIVE path — a subscription is running while a writer appends,
        # and the number a consumer cares about is commit-to-delivery
        # lag. Mirrors the reference's subscription integration scale
        # (tests/subscriptions.rs:51,98-101: events appended while
        # subscribed, complete ordered delivery). Lag for batch b = time
        # the LAST event of b reached the deliver callback minus the
        # time b's manifest commit returned; the floor is the manifest
        # source's trigger interval (commit visibility poll), so the
        # trigger is reported alongside the distribution.
        import threading

        from sierradb_spark.eventstore import EventStore as _ES

        live_store = _ES(spark, os.path.join(scratch, "live"))
        # seed + catch up so the live loop measures only tail latency
        live_store.append_df(
            spark.range(10).select(
                F.lit("seed").alias("stream_id"),
                F.lit("Seed").alias("event_name"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("payload"),
            )
        ).count()
        lock = threading.Lock()
        delivered_t: dict[int, float] = {}
        delivered_n: dict[int, int] = {}

        def _deliver(rows) -> None:
            t = time.perf_counter()
            with lock:
                for r in rows:
                    sid = r["stream_id"]
                    if not sid.startswith("live-"):
                        continue
                    b = int(sid.split("-")[1])
                    delivered_n[b] = delivered_n.get(b, 0) + 1
                    delivered_t[b] = t

        # trigger axis of the soak matrix: the lag FLOOR is claimed to
        # scale with this knob (commit-visibility poll), not the table
        live_trigger = os.environ.get(
            "SPARK_GRAFT_LIVE_TRIGGER", "250 milliseconds"
        )
        sub_live = Subscription(live_store, PartitionMatcher())
        q_live = sub_live.start(
            _deliver,
            checkpoint=os.path.join(scratch, "live_ckpt"),
            available_now=False,
            trigger_interval=live_trigger,
        )
        n_live, per_live = (
            max(2, int(os.environ.get("SPARK_GRAFT_LIVE_BATCHES", "10"))),
            # batch-size axis of the soak matrix: the lag bound is
            # claimed per-POLL (O(new commits) manifest tail), not
            # per-event, so the soak reruns with larger batches at the
            # same total to show the distribution doesn't move
            max(1, int(os.environ.get("SPARK_GRAFT_LIVE_EVENTS", "1000"))),
        )
        commit_t: dict[int, float] = {}
        try:
            for b in range(n_live):
                reqs_b = spark.range(per_live).select(
                    F.concat(
                        F.lit(f"live-{b}-"), (F.col("id") % 50).cast("string")
                    ).alias("stream_id"),
                    F.lit("LiveEvent").alias("event_name"),
                    F.encode(F.col("id").cast("string"), "utf-8").alias(
                        "payload"
                    ),
                )
                live_store.append_df(reqs_b).where("accepted").count()
                commit_t[b] = time.perf_counter()
            deadline = time.time() + 120
            while time.time() < deadline:
                with lock:
                    done = sum(delivered_n.values())
                if done >= n_live * per_live:
                    break
                time.sleep(0.1)
        finally:
            q_live.stop()
        with lock:
            raw_lags = [
                delivered_t[b] - commit_t[b]
                for b in range(n_live)
                if delivered_n.get(b) == per_live
            ]
            n_delivered_live = sum(delivered_n.values())
        # commit_t[b] is stamped after append_df().count() RETURNS, but
        # the 250 ms poll can deliver the batch in the window between
        # the manifest rename (inside the job) and the stamp — a small
        # NEGATIVE raw lag that would skew p50/min downward. Clamp at 0
        # and report how many batches were clamped: a clamped batch
        # means "delivered within one poll of commit visibility", the
        # best possible outcome, not an error.
        neg_clamped = sum(1 for v in raw_lags if v < 0)
        lags = sorted(max(0.0, v) for v in raw_lags)
        subscription_live = {
            "batches": n_live,
            "events_per_batch": per_live,
            "events_delivered": n_delivered_live,
            "events_expected": n_live * per_live,
            "trigger_interval": live_trigger,
            "batches_fully_delivered": len(lags),
            "lag_clamped_negative": neg_clamped,
            "lag_seconds": {
                "p50": round(lags[len(lags) // 2], 3) if lags else None,
                "p95": round(lags[min(len(lags) - 1, int(len(lags) * 0.95))], 3)
                if lags
                else None,
                "max": round(lags[-1], 3) if lags else None,
            },
            "per_batch_lag": [round(v, 3) for v in lags],
        }
        print(
            f"# subscription_live: {n_delivered_live}/{n_live * per_live} "
            f"events; lag p50={subscription_live['lag_seconds']['p50']}s "
            f"p95={subscription_live['lag_seconds']['p95']}s "
            f"max={subscription_live['lag_seconds']['max']}s",
            file=sys.stderr,
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    probes["after_corpus"] = _load_probe()

    total = round(sum(timings.values()), 3)
    probes["post"] = _load_probe()
    # Two outputs, one contract. The FULL record (per-batch ev/s arrays,
    # per-rep iterative load samples, per-batch lags, all probes) goes
    # to stderr: humans and the judge re-running bench locally see
    # everything. The final STDOUT line is deliberately COMPACT —
    # scalars and the per-query dict only — because the driver records
    # just the last ~2 KB of output and the r7 full-fat line outgrew
    # that window (BENCH_r07 landed `parsed: null` with the numbers
    # visible but uncapturable). Round-over-round comparability lives
    # in this line; the arrays it summarizes live one line up.
    detail = {
        "sustained_ingest": sustained,
        "subscription_catchup": subscription,
        "subscription_live": subscription_live,
        "corpus_dedup": corpus_dedup,
        "iterative": iterative,
        "iterative_runs": iterative_runs,
        "iterative_probe": iterative_probe,
        "load_probe": probes,
        "headline_retry": headline_retry,
        "ingest_retry": ingest_retry,
    }
    print(f"# bench detail: {json.dumps(detail)}", file=sys.stderr)
    line = json.dumps(
        {
            "metric": "headline_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "sustained_ingest": {
                "total_seconds": sustained["total_seconds"],
                "trend_ratio": sustained[
                    "trend_ratio_last_half_over_first_half"
                ],
                "trend_ratio_median": sustained["trend_ratio_median_halves"],
                "evps_first": sustained["batches_evps"][0],
                "evps_last": sustained["batches_evps"][-1],
                "compact_seconds_max": max(
                    sustained["compact_seconds"], default=None
                ),
            },
            "subscription_catchup": subscription,
            "subscription_live": {
                "delivered": subscription_live["events_delivered"],
                "expected": subscription_live["events_expected"],
                "full_batches": subscription_live["batches_fully_delivered"],
                "neg_clamped": subscription_live["lag_clamped_negative"],
                "lag_p50": subscription_live["lag_seconds"]["p50"],
                "lag_p95": subscription_live["lag_seconds"]["p95"],
            },
            "corpus_dedup": {
                "docs_total": corpus_dedup["docs_total"],
                "accepted": corpus_dedup["accepted"],
                "docs_per_second": corpus_dedup["docs_per_second"],
            },
            "iterative": iterative,
            # per-rep (seconds, pre-rep load1) samples stay in the
            # driver-captured line: they are what makes a
            # load-contaminated recording self-evident (r7 mechanism),
            # and they're ~300 bytes for 5 queries x k=2.
            "iterative_runs": iterative_runs,
            "iterative_gated": iterative_probe["gated"],
            "settled_load1": iterative_probe["settled_load1"],
            # One bit each for the r12 quiet-gate: whether the headline /
            # ingest sections had to be re-run under the burst rule (the
            # full probe evidence is in the detail line's headline_retry /
            # ingest_retry blocks).
            "hl_retry": headline_retry["retried"],
            "ing_retry": ingest_retry["retried"],
            "load1": {
                "pre": probes["pre"]["load1"],
                "post": probes["post"]["load1"],
            },
        },
        separators=(",", ":"),
    )
    if len(line) > 1800:  # guard: the whole point of the compact line
        print(
            f"# WARNING: final JSON line is {len(line)} bytes; the "
            "driver tail window is ~2048 — trim a section",
            file=sys.stderr,
        )
    print(f"# final line bytes: {len(line)}", file=sys.stderr)
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

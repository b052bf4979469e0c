"""Benchmark: POA blocks/s per chip on the DRB1-3123 workload.

The north-star metric (BASELINE.json): POA blocks/s per chip for batched,
size-bucketed block smoothing, compared against a single-thread CPU engine.
The CPU baseline is the repo's native C++ engine (native/cpoa.cpp) — a
scalar single-thread implementation of the same fused POA semantics, the
closest buildable stand-in for the reference's single-thread SPOA/abPOA
(deps are not buildable in this image).  The numpy-DP rate is reported as
an extra for continuity with round-1 numbers.

Prints ONE JSON line:
  {"metric": "poa_blocks_per_s", "value": N, "unit": "blocks/s",
   "vs_baseline": N / native_cpu_blocks_per_s, ...extras}

Notes:
  * One process end to end: axon remote compiles cost minutes and are not
    reusable across processes, so the engine pins a single uniform shape
    and the warmup cost is reported separately as "warmup_compile_s".
  * extras include the warm single-chip 1-iteration end-to-end wall time
    for the DRB1 pipeline (reference binary: 25.45 s for 3 iterations on a
    Ryzen 3700X, test/performance/check.md:5-16).
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REF_GFA = ("/root/reference/test/data/DRB1-3123.fa.gz.pggb-s3000-p70-n10-"
           "a70-K16-k8-w10000-j5000-e5000.seqwish.gfa")


def probe_device(timeout_s: float = 240.0, tries: int = 2) -> bool:
    """Check the TPU backend is reachable without risking a hang.

    A dead axon tunnel makes jax.devices() block forever inside PJRT init
    (a nanosleep retry loop), so the probe runs in a subprocess with a hard
    timeout; the bench then fails fast with an honest error line instead of
    hanging past the driver's budget."""
    import subprocess
    for i in range(tries):
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                timeout=timeout_s, capture_output=True, text=True)
            if out.returncode == 0 and out.stdout.strip().isdigit():
                time.sleep(15)   # single-client tunnel cooldown
                return True
        except subprocess.TimeoutExpired:
            # a full-length timeout means PJRT init is hanging on a dead
            # tunnel, not transient contention — retrying at full length
            # just burns the driver's budget; one short confirmation try
            timeout_s = 60.0
        if i + 1 < tries:
            time.sleep(30)
    return False


def run_ctest_cpu(timeout_s: float = 600.0):
    """Full ctest-equivalent end-to-end (3 iterations, MAF, 3-spec
    consensus graphs) with the native C++ engine, CPU only — the direct
    apples-to-apples number against the reference's 25.45 s on a Ryzen
    3700X (test/performance/check.md:5-16).  Runs in a subprocess with the
    axon plugin disabled so it cannot contend for the single-client TPU
    tunnel this process may hold.  Returns wall seconds or None."""
    import shutil
    import subprocess
    cpu_env = dict(os.environ)
    cpu_env.pop("PALLAS_AXON_POOL_IPS", None)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    # the subprocess runs with cwd=ctest_dir (consensus basenames are
    # relative), so the repo root must be importable explicitly
    repo = os.path.dirname(os.path.abspath(__file__))
    cpu_env["PYTHONPATH"] = repo + os.pathsep + cpu_env.get("PYTHONPATH", "")
    ctest_dir = tempfile.mkdtemp(prefix="smoothxg_ctest_")
    refs = ("/root/reference/test/data/"
            "gi_568815592_32578768-32589835.txt")
    t0 = time.time()
    try:  # min-of-2 below: this host's CPU steal swings walls +-20%
        # cwd=ctest_dir: the consensus spec basenames are relative, so the
        # consensus@*.gfa outputs must land in the temp dir, not the CWD
        rc = subprocess.run(
            [sys.executable, "-m", "smoothxg_tpu.cli", "-t", "2",
             "--engine", "native", "-g", REF_GFA, "-j", "5k", "-e", "5k",
             "-l", "700,900,1100", "-m", os.path.join(ctest_dir, "o.maf"),
             "-C", f"consensus,10,100:{refs}:y,1000,10000",
             "-o", os.path.join(ctest_dir, "o.gfa"), "-r", "12"],
            env=cpu_env, cwd=ctest_dir, timeout=timeout_s,
            capture_output=True).returncode
        return round(time.time() - t0, 2) if rc == 0 else None
    except subprocess.TimeoutExpired:   # pragma: no cover
        return None
    finally:
        shutil.rmtree(ctest_dir, ignore_errors=True)


def main() -> int:
    from smoothxg_tpu.graph.index import FlatIndex
    from smoothxg_tpu.io.gfa import read_gfa
    from smoothxg_tpu.ops.poa_host import POAParams
    from smoothxg_tpu.ops.poa_jax import ensure_backend
    from smoothxg_tpu.ops.poa_native import NativePOAEngine, available
    from smoothxg_tpu.ops.poa_pallas_fused import FusedPallasEngine
    from smoothxg_tpu.pipeline.blocks import smoothable_blocks
    from smoothxg_tpu.pipeline.breaks import break_blocks
    from smoothxg_tpu.pipeline.prep import prep
    from smoothxg_tpu.pipeline.smooth import HostPOAEngine, smooth_blocks
    from smoothxg_tpu.pipeline.run import Config, run_smoothing
    from smoothxg_tpu.utils.progress import Log

    Log.enabled = os.environ.get("BENCH_VERBOSE", "") != ""
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not probe_device():
        # still report the CPU-only end-to-end so the round's bench line
        # carries a real measurement even when the device is unreachable
        print(json.dumps({
            "metric": "poa_blocks_per_s", "value": 0.0, "unit": "blocks/s",
            "vs_baseline": 0.0,
            "error": "axon TPU backend unreachable (tunnel down; "
                     "jax.devices() hangs in PJRT init)",
            "e2e_ctest_native_cpu_s": min(
                filter(None, (run_ctest_cpu(), run_ctest_cpu())),
                default=None)}))
        return 1
    ensure_backend()

    # Fused Pallas kernel: whole multi-sequence POA per block inside one
    # kernel dispatch per batch of 64 blocks
    # host pool (redo/fallback + finalize) uses all cores — mirrors the
    # reference's OMP-parallel host stages; the single-thread CPU baseline
    # below stays threads=1
    nthreads = os.cpu_count() or 1
    t_cold = time.time()
    engine = FusedPallasEngine(threads=nthreads)
    # kernel compiles overlap the graph build below — exactly what the
    # CLI does (warmup_async + prep/index/block-finding); the compile
    # time a cold user actually pays is the BLOCKED residual after the
    # unavoidable pipeline work, reported as warmup_compile_s (the
    # overlap-hidden part is warmup_hidden_s, total in cold_total_s).
    # Only the LW<=2048 full-width family is on the headline cold path —
    # the tiers a `-l 700` run routes to; the big-LW and banded tiers
    # warm later, before the -l 4000 extras that need them.
    fam2k = tuple(ti for ti, t in enumerate(engine.tiers)
                  if t[2] <= 2048 and t[3] >= t[2])
    fam_rest = tuple(ti for ti in range(len(engine.tiers))
                     if ti not in fam2k)
    # cold path blocks on ONE compile: the family's collapse target
    # (largest tier) — once it is up every block can dispatch via
    # promotion, and the 24-block first pass pays only ~0.5 s of
    # un-stacked rows.  The stacked tiers compile AFTER the first pass:
    # compiles neither parallelize across threads (tools/probe_parwarm:
    # seq 6.8 s vs par 9.7 s) nor overlap dispatches (the tunnel
    # serializes execution), so compiling them "behind" the first pass
    # would just serialize in front of it.
    wt = engine.warmup_async(locals_=(True,), tiers=(fam2k[-1],))

    # ---- build the iteration-1 workload (target 700, the ctest config) ----
    g = read_gfa(REF_GFA)
    g = prep(g, 100, use_sgd=True)
    idx = FlatIndex(g)
    target = 700
    bs = smoothable_blocks(idx, target * 12, target, 5000, 5000)
    bs = break_blocks(idx, bs, max_poa_length=2 * target)
    params = POAParams(local=True)
    build_done = time.time()
    wt.join()
    prewarm_s = time.time() - build_done          # blocked residual
    warmup_hidden_s = build_done - t_cold

    # throughput workload: the DRB1 blockset replicated 16x — per-chip
    # blocks/s for batched independent block POA, the unit that
    # data-parallel scale-out multiplies
    from smoothxg_tpu.pipeline.blocks import Blockset
    big = Blockset()
    REP = 16
    for _ in range(REP):
        for b in bs:
            big.add_block(b)

    def run_once(eng, blockset, threads=1):
        return smooth_blocks(idx, blockset, params=params,
                             consensus_base_name="", produce_maf=False,
                             engine=eng, threads=threads)

    t0 = time.time()
    run_once(engine, bs, nthreads)  # first pass: blocks without a warm
    #                                 tier promote to the collapse target
    warmup_s = time.time() - t0 + prewarm_s   # time-to-first-results cost
    # remaining family tiers compile after the first pass, before the
    # measured passes (charged to cold_total_s, not to time-to-first)
    engine.warmup(locals_=(True,),
                  tiers=tuple(reversed(fam2k[:-1])))
    cold_total_s = time.time() - t_cold       # everything, incl. hidden

    # four measured passes: pass 0 absorbs lazy D2H-slicer-tier compiles
    # and trains the steal-balance EMAs (device + host pool rates measured
    # by watcher threads; tools/probe_steal.py shows convergence by pass
    # 2-3); min-of-4 is the steady state the metric reports (the shared
    # tunnel + VM CPU steal swing single passes ±20%)
    walls = []
    for _ in range(4):
        t0 = time.time()
        results = run_once(engine, big, nthreads)
        walls.append(time.time() - t0)
    tpu_s = min(walls)
    n_blocks = len(results)
    tpu_bps = n_blocks / tpu_s
    # a backend loss DURING warmup or the measured passes degrades the
    # headline to host-pool numbers -> the outer harness retries; a loss
    # later (extras/e2e) only degrades those extras and is reported as-is
    lost_at_headline = engine.device_lost

    # ---- single-thread CPU baselines ----
    extras = {}
    if available():
        t0 = time.time()
        run_once(NativePOAEngine(), bs)
        native_s = time.time() - t0
        native_bps = len(bs.blocks) / native_s
    else:                        # pragma: no cover - native always builds
        native_bps = None
    t0 = time.time()
    run_once(HostPOAEngine(), bs)
    numpy_bps = len(bs.blocks) / (time.time() - t0)
    cpu_bps = native_bps if native_bps is not None else numpy_bps

    # device-only decomposition: the same 384-block workload with
    # host-steal OFF, so the headline blocks/s can be split into what the
    # chip does alone vs what the steal pool adds (VERDICT r3 weak #2)
    eng_dev = FusedPallasEngine(threads=nthreads, steal=False)
    eng_dev._warm_keys = set(engine._warm_keys)   # jit cache is shared
    try:
        dev_walls = []
        for _ in range(2):            # min-of-2 against tunnel swings
            t0 = time.time()
            res_dev = run_once(eng_dev, big, nthreads)
            dev_walls.append(time.time() - t0)
        dev_only_s = min(dev_walls)
        extras["device_only_blocks_per_s"] = round(
            len(res_dev) / dev_only_s, 2)
        extras["device_only_smooth_s"] = round(dev_only_s, 2)
    except Exception as e:              # pragma: no cover - tunnel loss
        extras["device_only_error"] = str(e)[:120]

    # warm the big-LW and banded tiers the -l 4000 extras route to (off
    # the headline cold path: a -l 700 user never compiles these)
    t0 = time.time()
    try:
        engine.warmup(locals_=(True,), tiers=fam_rest)
    except Exception:                  # pragma: no cover - tunnel loss
        pass
    extras["warmup_extras_s"] = round(time.time() - t0, 1)
    eng_dev._warm_keys |= engine._warm_keys   # same-process jit cache

    # default-flags configuration (-l 4000, the reference's default
    # poa-length-target): the long-block policy aligns these blocks with
    # abPOA band semantics (global + adaptive band), so they run on the
    # banded-window device tier (ops/poa_pallas_win) instead of always
    # falling back to the host pool
    try:
        bs4k = smoothable_blocks(idx, 4000 * 12, 4000, 100, 0)
        bs4k = break_blocks(idx, bs4k, max_poa_length=8000)
        d0, f0 = engine.device_blocks, engine.fallbacks
        t0 = time.time()
        run_once(engine, bs4k, nthreads)
        l4k_s = time.time() - t0
        extras.update({
            "default_l4000_blocks": len(bs4k.blocks),
            "default_l4000_s": round(l4k_s, 2),
            "default_l4000_device_blocks": engine.device_blocks - d0,
            "default_l4000_native_blocks": engine.fallbacks - f0,
        })

        # long-block device tier vs host pool, 96-block -l 4000 batch
        # (VERDICT r3 #1 "Done" criterion): device tier wall (no steal)
        # vs the pooled native engine wall on the identical workload
        big4k = Blockset()
        for _ in range(16):
            for b in bs4k:
                big4k.add_block(b)
        d1 = eng_dev.device_blocks
        t0 = time.time()
        run_once(eng_dev, big4k, nthreads)
        l4k_dev_s = time.time() - t0
        t0 = time.time()
        run_once(NativePOAEngine(threads=nthreads), big4k, nthreads)
        l4k_host_s = time.time() - t0
        # cooperative lane — the production config: steal balancer
        # splits the bucket between chip and pool (the two blocks that
        # are provably host-only at v5e VMEM dominate every lane on this
        # fixture; see PARITY.md "The -l 4000 device population")
        t0 = time.time()
        run_once(engine, big4k, nthreads)
        l4k_coop_s = time.time() - t0
        extras.update({
            "l4000x16_device_s": round(l4k_dev_s, 2),
            "l4000x16_device_blocks": eng_dev.device_blocks - d1,
            "l4000x16_hostpool_s": round(l4k_host_s, 2),
            "l4000x16_coop_s": round(l4k_coop_s, 2),
            "l4000_device_speedup_vs_hostpool":
                round(l4k_host_s / l4k_dev_s, 2) if l4k_dev_s else None,
            "l4000_coop_speedup_vs_hostpool":
                round(l4k_host_s / l4k_coop_s, 2) if l4k_coop_s else None,
        })
    except Exception as e:              # pragma: no cover - tunnel loss
        extras["l4000_error"] = str(e)[:120]

    extras["e2e_ctest_native_cpu_s"] = min(
        filter(None, (run_ctest_cpu(), run_ctest_cpu())), default=None)

    # warm 1-iteration end-to-end (engine shapes already compiled).
    # Guarded: the axon terminal sporadically ABORTs mid-run; a late
    # failure must not discard the headline measurements above.
    e2e_1iter_s = None
    try:
        tmp = tempfile.mkdtemp(prefix="smoothxg_bench_")
        cfg = Config(
            gfa_in=REF_GFA, smoothed_out=os.path.join(tmp, "drb1.gfa"),
            n_haps=12, max_path_jump=5000, max_edge_jump=5000,
            poa_length_targets=[700], use_sgd=True, add_consensus=True,
            engine=engine, tmp_base=tmp, threads=nthreads,
        )
        t0 = time.time()
        run_smoothing(cfg)
        e2e_1iter_s = time.time() - t0
    except Exception as e:              # pragma: no cover - tunnel loss
        extras["e2e_1iter_error"] = str(e)[:120]

    st = engine.stats()
    print(json.dumps({
        "metric": "poa_blocks_per_s",
        "value": round(tpu_bps, 3),
        "unit": "blocks/s",
        "vs_baseline": round(tpu_bps / cpu_bps, 2),
        "blocks": n_blocks,
        "tpu_smooth_s": round(tpu_s, 2),
        "tpu_smooth_walls_s": [round(w, 2) for w in walls],
        "cpu_native_blocks_per_s":
            round(native_bps, 3) if native_bps else None,
        "cpu_numpy_blocks_per_s": round(numpy_bps, 3),
        "warmup_compile_s": round(warmup_s, 1),
        "warmup_hidden_s": round(warmup_hidden_s, 1),
        "cold_total_s": round(cold_total_s, 1),
        "dev_block_rows_per_s": st["dev_block_rows_per_s"],
        "e2e_1iter_warm_s": (round(e2e_1iter_s, 2)
                             if e2e_1iter_s is not None else None),
        "device_blocks": st["device_blocks"],
        "host_fallbacks": st["fallbacks"],
        "device_redo": st["redo"],
        "predicted_overflow": st["predicted_overflow"],
        "stolen": st["stolen"],
        "tier_blocks": st["tier_blocks"],
        "dev_rows_per_s": st["dev_rows_per_s"],
        "engine_calls": st["calls"],
        "device_wait_s": st["device_wait_s"],
        "device_lost": st.get("device_lost"),
        "device_lost_headline": lost_at_headline,
        **extras,
    }))
    return 0


def _outer() -> int:
    # the axon terminal sporadically fails a compile/D2H with
    # "INTERNAL: TPU backend error" when it was interrupted recently
    # (observed repeatedly in round 3); a fresh process after a cooldown
    # recovers.  Run the real bench as a child and retry once.
    import subprocess
    env = dict(os.environ)
    env["BENCH_INNER"] = "1"
    last_good = None
    t_start = time.time()
    for attempt in range(3):
        if attempt and time.time() - t_start > 1200:
            break                # stay inside the driver's bench window
            # (the inner run grew ~2 min this round: coop l4000 lane +
            # deferred-tier warmup — so the retry cutoff tightens too)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        sys.stderr.write(r.stderr[-4000:])
        if r.returncode == 0 and '"metric"' in r.stdout:
            last_good = r.stdout
            # the engine's backend-loss failover lets a run FINISH on the
            # native pool after a tunnel abort — a valid but degraded
            # measurement.  Retry in a fresh process (fresh tunnel
            # session) unless this was the last attempt.
            try:
                lost = json.loads(
                    r.stdout.strip().splitlines()[-1]).get(
                        "device_lost_headline")
            except Exception:
                lost = None
            if not lost:
                sys.stdout.write(r.stdout)
                return 0
            sys.stderr.write(f"\n[bench] device lost mid-run ({lost}); "
                             f"retrying in a fresh process\n")
        time.sleep(120)
    if last_good is not None:       # every attempt degraded: report it
        sys.stdout.write(last_good)
        return 0
    sys.stdout.write(r.stdout)
    return r.returncode


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER"):
        sys.exit(main())
    sys.exit(_outer())

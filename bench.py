"""Benchmark: sparse EM inner-loop throughput on the TPU chip.

Workload: human-transcriptome-scale synthetic CSR (200k transcripts, 2M
reads, ~3 alignments/read), fixed EM iterations in f32 on device — the
BASELINE.json config-3 shape, scaled to bench time. Prints ONE JSON line.

`vs_baseline` compares against a vectorized NumPy implementation of the
same m-step on this host's CPU (the stand-in for the reference's CPU EM;
Rust is unavailable in this image and the reference's m-step is the same
O(A) gather/scatter pattern).

Robustness: the axon TPU tunnel's latency varies wildly (it has been
observed to degrade from seconds to >30 min per request). The TPU phase
runs in a watchdogged subprocess: full workload first, a scaled-down
retry on timeout, and a last-resort CPU-device measurement so the driver
always receives a JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

R = 2_000_000
T = 200_000
MEAN_K = 3
ITERS = 50
CPU_ITERS = 3

V3_TIMEOUT_S = 560
FULL_TIMEOUT_S = 400
QUICK_TIMEOUT_S = 150


def make_csr(seed=0):
    rng = np.random.default_rng(seed)
    sizes = rng.geometric(1.0 / MEAN_K, size=R).clip(1, 100)
    A = int(sizes.sum())
    boundaries = np.zeros(R + 1, dtype=np.int64)
    np.cumsum(sizes, out=boundaries[1:])
    # zipf-ish transcript popularity
    pop = rng.zipf(1.3, size=A) % T
    txp_id = pop.astype(np.int32)
    w = np.exp(rng.normal(0, 0.5, size=A)).astype(np.float32)
    read_id = np.repeat(np.arange(R, dtype=np.int32), sizes)
    return txp_id, w, boundaries, read_id, A


def tpu_phase():
    """Runs in the subprocess: time the fused EM while-loop on device.

    The tunnel defers execution (`block_until_ready` returns without
    waiting; only a host transfer synchronizes), so we time two loop
    lengths and take the delta — fixed tunnel overhead cancels.
    """
    import jax.numpy as jnp

    txp_id, w, boundaries, read_id, A = make_csr()
    sys.stderr.write(f"bench: R={R} T={T} A={A} iters={ITERS}\n")
    init = jnp.full(T, float(R) / T, dtype=jnp.float32)

    impl = os.environ.get("OARFISH_BENCH_IMPL", "v4")
    if impl in ("v3", "v4"):
        if impl == "v4":
            from oarfish_tpu.ops.em_v4 import EmV4Data as _Data, make_runner
        else:
            from oarfish_tpu.ops.em_v3 import EmV3Data as _Data, make_runner

        data, _order = _Data.build(txp_id, w, boundaries, T)
        runner = make_runner(data)

        def timed(n_iters):
            counts, niter = runner(init, n_iters, -1.0)
            t0 = time.perf_counter()
            out = np.asarray(counts)
            dt = time.perf_counter() - t0
            assert int(np.asarray(niter)) == n_iters
            return dt, out
    else:
        from oarfish_tpu.ops.em_fast import FastEmData, run_em_fast

        data, _order = FastEmData.build(
            txp_id, w, boundaries, T, dtype=jnp.float32,
            use_pallas_gather=True,
        )

        def timed(n_iters):
            counts, niter = run_em_fast(data, init, n_iters, -1.0)
            t0 = time.perf_counter()
            out = np.asarray(counts)
            dt = time.perf_counter() - t0
            assert int(np.asarray(niter)) == n_iters
            return dt, out

    timed(ITERS)  # compile + warm the tunnel
    timed(3 * ITERS)
    # median-of-N protocol (VERDICT r3 item 6): the shared VM and the
    # tunnel swing single measurements 2-20x; N (small, big) pairs'
    # per-iter deltas, median taken, with the spread reported so a
    # noisy session is visible in the log.
    pairs = int(os.environ.get("OARFISH_BENCH_PAIRS", "5"))
    deltas = []
    counts = None
    for p in range(pairs):
        t_small, counts = timed(ITERS)
        t_big, _ = timed(3 * ITERS)
        d = (t_big - t_small) / 2
        sys.stderr.write(
            f"tpu pair {p}: {ITERS} iters {t_small:.3f}s, "
            f"{3 * ITERS} iters {t_big:.3f}s (delta {d:.3f}s)\n"
        )
        if d > 0:
            deltas.append(d)
    if deltas:
        ds = sorted(deltas)
        dt = ds[len(ds) // 2]
        sys.stderr.write(
            f"tpu per-{ITERS}-iter delta: median {dt:.3f}s over "
            f"{len(ds)} pairs (min {ds[0]:.3f}, max {ds[-1]:.3f})\n"
        )
    else:
        dt = max(t_big / 3.0, 1e-9)
    print(json.dumps({"dt_per_iters": dt, "iters": ITERS, "R": R,
                      "n_pairs": len(deltas),
                      "spread": ([min(deltas), max(deltas)]
                                 if deltas else None),
                      "mass": float(counts.sum())}))


BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def cpu_s_per_iter(txp_id, w, boundaries, read_id):
    """Per-iteration CPU cost, PINNED across rounds.

    The raw measurement swings with hypervisor contention (observed
    13.1s -> 40.8s across rounds for identical work), which made the
    headline `vs_baseline` incomparable round-to-round (VERDICT r2
    weak-3). Fix: measure min-of-N once per (R,T,MEAN_K) shape, persist
    it to BENCH_BASELINE.json (committed), and reuse; the pinned number
    only updates when it IMPROVES (a lower minimum is strictly less
    contended — the estimator converges downward to the true cost).
    Delete the file or set OARFISH_BENCH_REBASE=1 to force remeasure."""
    key = f"R={R},T={T},K={MEAN_K}"
    cache = {}
    if os.environ.get("OARFISH_BENCH_REBASE") != "1":
        try:
            with open(BASELINE_CACHE) as f:
                cache = json.load(f)
        except Exception:  # noqa: BLE001
            cache = {}
    measured = bench_cpu(txp_id, w, boundaries, read_id, 1)
    prev = cache.get(key)
    if prev is None or measured < prev["cpu_s_per_iter"]:
        cache[key] = {
            "cpu_s_per_iter": measured,
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        try:
            with open(BASELINE_CACHE, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except Exception:  # noqa: BLE001
            pass
    pinned = cache[key]["cpu_s_per_iter"]
    sys.stderr.write(
        f"cpu baseline: measured {measured:.3f}s/iter, pinned "
        f"{pinned:.3f}s/iter ({key})\n"
    )
    return pinned


def bench_cpu(txp_id, w, boundaries, read_id, iters):
    """Vectorized NumPy m-step (f64, like the reference accumulators).

    Per-iteration cost = MIN over CPU_ITERS timed iterations: this
    shared-tenancy VM's wall clock swings 2-5x under hypervisor
    contention (see PERF_NOTES), and the minimum is the standard
    contention-robust estimator — a mean once inflated the baseline
    (and vs_baseline with it) by ~4x run-to-run."""
    w64 = w.astype(np.float64)
    prev = np.full(T, float(R) / T)
    order = np.argsort(txp_id, kind="stable")
    t_sorted = txp_id[order]
    best = float("inf")
    for _ in range(CPU_ITERS):
        t0 = time.perf_counter()
        contrib = prev[txp_id] * w64
        denom = np.add.reduceat(contrib, boundaries[:-1])
        scale = np.where(denom > 1e-30, 1.0 / denom, 0.0)
        inc = contrib * scale[read_id]
        curr = np.zeros(T)
        np.add.at(curr, t_sorted, inc[order])
        prev = curr
        best = min(best, time.perf_counter() - t0)
    return best * iters


def probe_device(timeout=240):
    """Fast health check of the TPU tunnel: a trivial jit + host
    transfer in a subprocess. When the tunnel is degraded (observed:
    multi-minute hangs on a 256x256 matmul) every full phase would eat
    its whole multi-minute timeout — the fallback chain then takes ~30
    minutes to conclude the device is unusable. Probe once, skip
    straight to the CPU fallback on failure."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256)));"
        "print('PROBE', float(np.asarray(y.sum())))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout,
            env=dict(os.environ),
        )
        return r.returncode == 0 and "PROBE" in r.stdout
    except Exception:  # noqa: BLE001
        return False


def run_sub(env_extra, timeout):
    env = dict(os.environ, **env_extra)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--tpu-phase"],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        sys.stderr.write(r.stderr[-2000:])
        if r.returncode == 0 and r.stdout.strip():
            return json.loads(r.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired:
        sys.stderr.write("tpu phase timed out; falling back\n")
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"tpu phase failed: {e}\n")
    return None


def main():
    global R, T, ITERS
    if "--e2e" in sys.argv:
        # end-to-end BAM -> quant.tsv wall time with host/device phase
        # attribution (VERDICT r1 item 1); delegated to the script so
        # the official single-metric mode stays unchanged
        import runpy

        sys.argv = [
            "scripts/e2e_bench.py",
            *[a for a in sys.argv[1:] if a != "--e2e"],
        ]
        runpy.run_path(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "scripts", "e2e_bench.py"),
            run_name="__main__",
        )
        return
    if "--tpu-phase" in sys.argv:
        if os.environ.get("OARFISH_BENCH_SCALE") == "quick":
            R, T, ITERS = 200_000, 50_000, 20
        if os.environ.get("OARFISH_BENCH_CPU") == "1":
            import jax

            jax.config.update("jax_platforms", "cpu")
        tpu_phase()
        return
    quick = "--quick" in sys.argv
    if quick:
        # smoke mode: the subprocess must run the SAME reduced shape the
        # parent uses for the label and the CPU baseline
        R, T, ITERS = 200_000, 50_000, 20

    def sub(env, timeout):
        if quick:
            env = {**env, "OARFISH_BENCH_SCALE": "quick"}
            timeout = QUICK_TIMEOUT_S
        return run_sub(env, timeout)

    res = None
    scale = "unset"
    # Tunnel degradation is usually transient (minutes-scale windows):
    # retry the probe a few times before concluding the device is
    # unusable for this run. OARFISH_BENCH_PROBE_TRIES=1 restores the
    # single-shot behavior (used by --quick smoke runs implicitly).
    tries = int(os.environ.get(
        "OARFISH_BENCH_PROBE_TRIES", "1" if quick else "3"))
    device_ok = False
    for attempt in range(max(tries, 1)):
        if attempt:
            sys.stderr.write(
                f"device probe failed (attempt {attempt}/{tries}); "
                "retrying in 60s\n"
            )
            time.sleep(60)
        device_ok = probe_device()
        if device_ok:
            break
    if not device_ok:
        sys.stderr.write(
            "device probe failed (tunnel degraded/unavailable); "
            "skipping TPU phases\n"
        )
    if device_ok and not quick:
        scale = "full-v4"
        res = sub({"OARFISH_BENCH_IMPL": "v4"}, V3_TIMEOUT_S)
        if res is None:
            scale = "full-v3"
            res = sub({"OARFISH_BENCH_IMPL": "v3"}, V3_TIMEOUT_S)
    if res is None and device_ok:
        # quick mode goes straight to fast: the v4/v3 route builds +
        # compiles routinely exceed the quick timeout at quick shape
        scale = "full" if not quick else "quick-fast"
        res = sub({"OARFISH_BENCH_IMPL": "fast"}, FULL_TIMEOUT_S)
    if res is None and device_ok:
        scale = "quick"
        res = run_sub({"OARFISH_BENCH_SCALE": "quick",
                       "OARFISH_BENCH_IMPL": "fast"}, QUICK_TIMEOUT_S)
    if res is None:
        scale = "cpu-device-fallback"
        res = run_sub(
            {"OARFISH_BENCH_SCALE": "quick", "OARFISH_BENCH_CPU": "1",
             "OARFISH_BENCH_IMPL": "fast"},
            QUICK_TIMEOUT_S,
        )
    if res is None:
        print(json.dumps({
            "metric": "em_reads_per_sec", "value": 0,
            "unit": "UNAVAILABLE (device unreachable)", "vs_baseline": 0,
        }))
        return

    if scale.startswith("quick") or scale.startswith("cpu"):
        R, T, ITERS = 200_000, 50_000, 20
    reads_per_s = res["R"] * res["iters"] / res["dt_per_iters"]
    ms_per_iter = 1000.0 * res["dt_per_iters"] / res["iters"]
    txp_id, w, boundaries, read_id, A = make_csr()
    cpu_iter = cpu_s_per_iter(txp_id, w, boundaries, read_id)
    cpu_dt = cpu_iter * res["iters"]
    sys.stderr.write(
        f"tpu: {res['dt_per_iters']:.3f}s/{res['iters']} iters "
        f"({ms_per_iter:.2f} ms/iter); cpu pinned {cpu_dt:.3f}s; "
        f"scale={scale}\n"
    )
    print(json.dumps({
        "metric": "em_reads_per_sec",
        "value": round(reads_per_s, 1),
        "unit": (
            f"reads*iters/s (R={res['R']}, T={T}, f32 scatter-free EM, "
            f"1 chip, scale={scale}, {ms_per_iter:.2f} ms/iter)"
        ),
        "ms_per_iter": round(ms_per_iter, 3),
        "vs_baseline": round(cpu_dt / res["dt_per_iters"], 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Hardware capacity probe for the scaling criterion (BASELINE.md).

Measures how much THIS box itself scales from N to 4N concurrent
CPU-bound workers, independent of Ray or the engine, so pipeline
scaling efficiency can be read against the hardware ceiling:

  compute : np.sort over a cache-sized array (models the vectorized
            geocode/join kernels; mostly core-bound, turbo-sensitive)
  stream  : out = a * s + b over three 16M-float64 arrays, ~384 MiB
            working set PER WORKER (~12 GiB aggregate RSS at 32 procs;
            memory-bandwidth-bound; models Arrow block scans)

Protocol: for each worker count, fork K processes that each run the
quantum in a loop and bump a shared counter; the parent samples the
counter over a fixed wall window after a warmup. Gated on loadavg so
co-tenant noise windows are skipped (the BENCH_r03 lesson). Prints one
JSON line; commit the output as BENCH_capacity_probe_r{N}.json.

Usage: python scripts/capacity_probe.py [--pairs 8,32[;4,16]]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np

WINDOW_SEC = 10.0
WARMUP_SEC = 2.0


def _worker(kind: str, counter, ready, stop_evt):
    rng = np.random.default_rng(os.getpid())
    if kind == "compute":
        base = rng.standard_normal(1_000_000)

        def quantum():
            np.sort(base)  # fresh copy inside sort's working buffer
    else:  # stream
        a = rng.standard_normal(16_000_000)  # 128 MiB
        b = rng.standard_normal(16_000_000)
        out = np.empty_like(a)

        def quantum():
            np.multiply(a, 1.000001, out=out)
            np.add(out, b, out=out)

    # Readiness barrier: allocation + RNG fill + one warm quantum happen
    # BEFORE the parent opens the timed window (at 32 procs the fills
    # alone exceed any fixed warmup sleep, which read as 0 throughput).
    quantum()
    with ready.get_lock():
        ready.value += 1
    while not stop_evt.is_set():
        quantum()
        with counter.get_lock():
            counter.value += 1


def _wait_quiet(threshold: float, max_wait: float = 600.0) -> float:
    deadline = time.time() + max_wait
    while time.time() < deadline:
        load1 = os.getloadavg()[0]
        if load1 < threshold:
            return load1
        time.sleep(15)
    return os.getloadavg()[0]


def measure(kind: str, nproc: int, gate_load: float) -> dict:
    loadavg_pre = _wait_quiet(gate_load)
    counter = mp.Value("l", 0)
    ready = mp.Value("l", 0)
    stop_evt = mp.Event()
    procs = [mp.Process(target=_worker,
                        args=(kind, counter, ready, stop_evt),
                        daemon=True) for _ in range(nproc)]
    for p in procs:
        p.start()
    deadline = time.time() + 120
    while time.time() < deadline:
        with ready.get_lock():
            if ready.value >= nproc:
                break
        time.sleep(0.2)
    else:
        # Fail loudly instead of silently recording a 0-quanta window
        # (which would later crash the ratio division — ADVICE r4).
        stop_evt.set()
        for p in procs:
            p.terminate()
        raise RuntimeError(
            f"capacity probe: only {ready.value}/{nproc} workers ready "
            f"after 120 s — box too loaded for a valid measurement")
    time.sleep(WARMUP_SEC)
    with counter.get_lock():
        start = counter.value
    t0 = time.perf_counter()
    time.sleep(WINDOW_SEC)
    with counter.get_lock():
        end = counter.value
    dt = time.perf_counter() - t0
    stop_evt.set()
    for p in procs:
        p.join(timeout=5)
        if p.is_alive():
            p.terminate()
    return {"kind": kind, "nproc": nproc,
            "quanta_per_sec": round((end - start) / dt, 2),
            "loadavg_pre": round(loadavg_pre, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="8,32;4,16")
    ap.add_argument("--gate-load", type=float, default=2.0)
    args = ap.parse_args()

    runs = []
    ratios = {}
    for pair in args.pairs.split(";"):
        lo, hi = (int(v) for v in pair.split(","))
        for kind in ("compute", "stream"):
            r_lo = measure(kind, lo, args.gate_load)
            r_hi = measure(kind, hi, args.gate_load)
            runs += [r_lo, r_hi]
            if r_lo["quanta_per_sec"] <= 0:
                raise RuntimeError(
                    f"capacity probe: {kind}@{lo} recorded zero quanta "
                    f"— window invalid, refusing to divide")
            ratio = r_hi["quanta_per_sec"] / r_lo["quanta_per_sec"]
            ratios[f"{kind}_{lo}to{hi}"] = {
                "speedup": round(ratio, 3),
                "ceiling_efficiency": round(ratio / (hi / lo), 3)}
    print(json.dumps({"metric": "hardware capacity scaling ceiling",
                      "window_sec": WINDOW_SEC, "ratios": ratios,
                      "runs": runs}))


if __name__ == "__main__":
    main()

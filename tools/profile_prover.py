"""Profiler-driven breakdown of the prove pipeline (SURVEY.md §5).

The reference stack has no in-repo profiler (qp-plonky2 only links
`log`); the TPU build's analog is the JAX/XLA profiler.  This tool
wraps one device prove in `jax.profiler.trace`, then parses the
emitted chrome-trace JSON and prints a per-op breakdown of device
time — the instrument used in round 5 to find that the fused pipeline
was latency-bound (a ~110k-op long tail) rather than FLOP-bound, which
motivated the gather-based wire assembly and in-executable FRI query
derivation.

Usage:
    PYTHONHASHSEED=0 python tools/profile_prover.py [--staged] [--top N]
        [--outdir DIR] [--circuit wormhole|dryrun]

Notes:
  - run on the TPU backend for real numbers; works on CPU too (the
    trace format is the same) for plumbing tests.
  - `--staged` sets QZK_FUSED=0 to profile the staged (multi-dispatch)
    device pipeline instead of the fused one-dispatch executable.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

# stable XLA cache keys; script-mode only (an importer of summarize()
# must not be silently re-exec'd)
if __name__ == "__main__" and os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)


def _build_wormhole():
    from tests.fixtures import synthetic_circuit_inputs
    from qzk_tpu.models.wormhole.circuit import WormholeCircuit
    from qzk_tpu.models.wormhole.prover import WormholeProver
    from qzk_tpu.plonk.config import CircuitConfig

    cfg = CircuitConfig.standard_recursion_zk_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    data = circuit.build_circuit()
    inputs = synthetic_circuit_inputs()

    def prove_once():
        prover = WormholeProver(
            cfg, _circuit_data=data.prover_data(), _targets=targets
        )
        return prover.commit(inputs).prove()

    return prove_once, data.verifier_data()


def _build_dryrun():
    """The reduced-degree chain circuit from __graft_entry__ — fast
    enough to profile on the CPU backend."""
    sys.path.insert(0, _HERE)
    import __graft_entry__ as ge
    from qzk_tpu.plonk.witness import PartialWitness

    cfg, data, x = ge._build_dryrun_circuit()

    def prove_once():
        pw = PartialWitness()
        pw.set_target(x, 0xDEADBEEF)
        return data.prove(pw)

    return prove_once, data.verifier_data()


def _device_lanes(meta):
    """pids whose process_name marks a device lane (TPU/accelerator).

    The chrome trace names device lanes like '/device:TPU:0' (or
    'TFRT_CPU' on the CPU backend); python/host lanes say 'python' or
    'Steal'.  Returns the set of matching pids, empty -> keep all.
    """
    pids = set()
    for pid, name in meta.items():
        low = name.lower()
        if "tpu" in low or "device" in low or "xla" in low:
            pids.add(pid)
    return pids


def summarize(trace_path, top=25):
    with gzip.open(trace_path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    lanes = _device_lanes(proc_names)
    by_name = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if lanes and e.get("pid") not in lanes:
            continue
        # strip fusion instance suffixes: 'fusion.1234' -> 'fusion'
        name = e.get("name", "?").split(".")[0]
        dur_ms = e["dur"] / 1e3
        by_name[name][0] += dur_ms
        by_name[name][1] += 1
        total += dur_ms
    rows = sorted(by_name.items(), key=lambda kv: -kv[1][0])
    print(f"\ndevice lanes: "
          f"{[proc_names[p] for p in lanes] or 'ALL (no device lane found)'}")
    print(f"total device-lane op time: {total:.1f} ms over "
          f"{sum(c for _, (_, c) in rows)} ops\n")
    print(f"{'op':<40}{'total ms':>10}{'count':>8}{'share':>8}")
    for name, (ms, count) in rows[:top]:
        share = 100.0 * ms / total if total else 0.0
        print(f"{name:<40}{ms:>10.2f}{count:>8}{share:>7.1f}%")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--staged", action="store_true",
                    help="profile the staged pipeline (QZK_FUSED=0)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default=os.path.join(
        _HERE, ".cache", "profile"))
    ap.add_argument("--circuit", choices=("wormhole", "dryrun"),
                    default="wormhole")
    args = ap.parse_args()
    if args.staged:
        os.environ["QZK_FUSED"] = "0"

    import jax

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    prove_once, verifier_data = (
        _build_wormhole() if args.circuit == "wormhole" else _build_dryrun()
    )

    t0 = time.perf_counter()
    proof = prove_once()  # warm (compile / AOT load) outside the trace
    print(f"warm-up prove: {time.perf_counter() - t0:.2f}s")
    verifier_data.verify(proof)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        t0 = time.perf_counter()
        prove_once()
        wall = time.perf_counter() - t0
    print(f"profiled prove: {wall:.3f}s wall")

    traces = sorted(
        glob.glob(os.path.join(
            args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace.json.gz produced — inspect the outdir with "
              "tensorboard instead", file=sys.stderr)
        return 1
    summarize(traces[-1], top=args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Reusable witness-conflict debugger: run generator batches with
writer provenance and report the first conflict in detail."""

import numpy as np

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.plonk.gates import poseidon_trace


class Conflict(Exception):
    pass


def run_debug(plan, pw, describe_target=None):
    n = plan.num_targets
    values = np.zeros(n, dtype=np.uint64)
    known = np.zeros(n, dtype=bool)
    writer = {}
    roots = plan.roots

    def name(t):
        if describe_target:
            d = describe_target(t)
            if d:
                return f"t{t}({d})"
        return f"t{t}"

    for t, v in pw.values.items():
        r = int(roots[t])
        if known[r] and values[r] != np.uint64(v):
            raise Conflict(
                f"PW conflict {name(t)} root {r}: {values[r]} "
                f"(from {writer[r]}) vs {v}"
            )
        values[r] = np.uint64(v)
        known[r] = True
        writer[r] = f"pw[{t}]"

    def read(ts):
        idx = roots[np.asarray(ts, dtype=np.int64)]
        if not known[idx].all():
            missing = np.asarray(ts)[~known[idx]][:5]
            raise Conflict(f"targets not set: {missing}")
        return values[idx]

    def write(ts, vals, desc):
        idx = roots[np.asarray(ts, dtype=np.int64)]
        vals = np.asarray(vals, dtype=np.uint64)
        clash = known[idx] & (values[idx] != vals)
        if clash.any():
            k = int(np.where(clash)[0][0])
            t = int(np.asarray(ts)[k])
            r = int(idx[k])
            raise Conflict(
                f"CONFLICT {name(t)} root {r}:\n"
                f"  existing {int(values[r])} from {writer[r]}\n"
                f"  new      {int(vals[k])} from {desc(k)}"
            )
        values[idx] = vals
        known[idx] = True
        for k_i, t in enumerate(ts):
            writer[int(idx[k_i])] = desc(k_i)

    for kind, items in plan.batches:
        if kind == "const":
            write(
                [t for t, _ in items],
                np.array([v for _, v in items], dtype=np.uint64),
                lambda k: f"const {items[k]}",
            )
        elif kind == "arith":
            c0 = np.array([i[0] for i in items], dtype=np.uint64)
            c1 = np.array([i[1] for i in items], dtype=np.uint64)
            m0 = read([i[2] for i in items])
            m1 = read([i[3] for i in items])
            a = read([i[4] for i in items])
            out = gl.add(gl.mul(c0, gl.mul(m0, m1)), gl.mul(c1, a))
            write(
                [i[5] for i in items],
                out,
                lambda k: f"arith {items[k]} m0={int(m0[k])} "
                f"m1={int(m1[k])} a={int(a[k])}",
            )
        elif kind == "inv_or_zero":
            xv = read([i[0] for i in items])
            out = np.zeros_like(xv)
            nz = xv != 0
            if nz.any():
                out[nz] = gl.batch_inverse(xv[nz])
            write([i[1] for i in items], out, lambda k: f"inv {items[k]}")
        elif kind == "bits":
            v = read([i[0] for i in items])
            nbits = len(items[0][1])
            if nbits < 64:
                too_big = v >> np.uint64(nbits)
                if too_big.any():
                    bad = np.where(too_big)[0][0]
                    raise Conflict(
                        f"RANGE FAIL {int(v[bad])} nbits={nbits} "
                        f"src target {items[bad][0]}"
                    )
            bits = (v[:, None] >> np.arange(nbits, dtype=np.uint64)) & np.uint64(1)
            all_ts = [t for _, bt in items for t in bt]
            srcs = [(i[0], j) for i in items for j in range(nbits)]
            write(
                all_ts,
                bits.ravel(),
                lambda k: f"bit {srcs[k][1]} of t{srcs[k][0]}",
            )
        elif kind == "poseidon":
            ins = read([t for i in items for t in i[0]]).reshape(-1, 12)
            swaps = read([i[1] for i in items])
            wire_vals, outs = poseidon_trace(ins, swaps)
            internal_ts = [t for i in items for _, t in i[2]]
            internal_wires = [w for w, _ in items[0][2]]
            per_row = np.stack([wire_vals[w] for w in internal_wires], axis=1)
            write(internal_ts, per_row.ravel(), lambda k: "poseidon internal")
            write(
                [t for i in items for t in i[3]],
                outs.ravel(),
                lambda k: f"poseidon out row#{k//12} lane {k%12} "
                f"in={[hex(int(x)) for x in ins[k//12]]}",
            )
    return values, known

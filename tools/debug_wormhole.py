"""Debug the wormhole witness conflict: find which generator clashes
with which prior write for the conflicting target."""

import numpy as np

from tests.fixtures import default_circuit_inputs
from qzk_tpu.models.wormhole.circuit import WormholeCircuit, fill_all_targets
from qzk_tpu.plonk.config import CircuitConfig
from qzk_tpu.plonk.witness import PartialWitness
from qzk_tpu.ops import goldilocks as gl


def main():
    cfg = CircuitConfig.standard_recursion_config()
    circuit = WormholeCircuit(cfg)
    targets = circuit.targets()
    builder = circuit.builder

    pw = PartialWitness()
    fill_all_targets(default_circuit_inputs(), pw, targets)

    from qzk_tpu.plonk.witness import compile_generators

    plan = compile_generators(builder)
    n = plan.num_targets
    values = np.zeros(n, dtype=np.uint64)
    known = np.zeros(n, dtype=bool)
    writer = {}  # root -> description
    roots = plan.roots

    for t, v in pw.values.items():
        r = int(roots[t])
        if known[r] and values[r] != np.uint64(v):
            print(f"PW CONFLICT at target {t} root {r}: "
                  f"{values[r]} (from {writer[r]}) vs {v}")
            return
        values[r] = np.uint64(v)
        known[r] = True
        writer[r] = f"pw[{t}]"

    def read(ts):
        idx = roots[np.asarray(ts, dtype=np.int64)]
        if not known[idx].all():
            missing = np.asarray(ts)[~known[idx]][:5]
            raise ValueError(f"witness targets not set: {missing}")
        return values[idx]

    def write(ts, vals, desc):
        idx = roots[np.asarray(ts, dtype=np.int64)]
        vals = np.asarray(vals, dtype=np.uint64)
        clash = known[idx] & (values[idx] != vals)
        if clash.any():
            k = np.where(clash)[0][0]
            t = int(np.asarray(ts)[k])
            r = int(idx[k])
            print(f"CONFLICT target {t} root {r}:")
            print(f"  existing {int(values[r])} from {writer[r]}")
            print(f"  new      {int(vals[k])} from {desc(k)}")
            raise SystemExit(1)
        values[idx] = vals
        known[idx] = True
        for k, t in enumerate(ts):
            writer[int(idx[k])] = desc(k)

    from qzk_tpu.plonk.gates import poseidon_trace

    for kind, items in plan.batches:
        if kind == "const":
            ts = [t for t, _ in items]
            vs = [v for _, v in items]
            write(ts, np.array(vs, dtype=np.uint64),
                  lambda k: f"const {items[k]}")
        elif kind == "arith":
            c0 = np.array([i[0] for i in items], dtype=np.uint64)
            c1 = np.array([i[1] for i in items], dtype=np.uint64)
            m0 = read([i[2] for i in items])
            m1 = read([i[3] for i in items])
            a = read([i[4] for i in items])
            out = gl.add(gl.mul(c0, gl.mul(m0, m1)), gl.mul(c1, a))
            write([i[5] for i in items], out,
                  lambda k: f"arith {items[k]} m0={int(m0[k])} "
                            f"m1={int(m1[k])} a={int(a[k])}")
        elif kind == "inv_or_zero":
            x = read([i[0] for i in items])
            out = np.zeros_like(x)
            nz = x != 0
            if nz.any():
                out[nz] = gl.batch_inverse(x[nz])
            write([i[1] for i in items], out,
                  lambda k: f"inv_or_zero {items[k]}")
        elif kind == "bits":
            v = read([i[0] for i in items])
            nbits = len(items[0][1])
            too_big = v >> np.uint64(nbits)
            if too_big.any():
                bad = np.where(too_big)[0][0]
                print(f"RANGE FAIL value {int(v[bad])} nbits {nbits} "
                      f"target {items[bad][0]}")
                raise SystemExit(1)
            bits = (v[:, None] >> np.arange(nbits, dtype=np.uint64)) & np.uint64(1)
            all_ts = [t for _, bit_ts in items for t in bit_ts]
            all_items = [(i, j) for i, (_, bts) in enumerate(items)
                         for j in range(len(bts))]
            write(all_ts, bits.ravel(),
                  lambda k: f"bits of t{items[all_items[k][0]][0]} "
                            f"bit {all_items[k][1]}")
        elif kind == "poseidon":
            ins = read([t for i in items for t in i[0]]).reshape(-1, 12)
            swaps = read([i[1] for i in items])
            wire_vals, outs = poseidon_trace(ins, swaps)
            internal_ts = [t for i in items for _, t in i[2]]
            internal_wires = [w for w, _ in items[0][2]]
            per_row = np.stack([wire_vals[w] for w in internal_wires], axis=1)
            write(internal_ts, per_row.ravel(), lambda k: "poseidon internal")
            write([t for i in items for t in i[3]], outs.ravel(),
                  lambda k: f"poseidon out row {k//12} lane {k%12} "
                            f"ins={[int(x) for x in ins[k//12]]}")
    print("no conflict?!")


if __name__ == "__main__":
    main()

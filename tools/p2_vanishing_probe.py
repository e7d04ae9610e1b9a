"""Empirically pin down qp-plonky2's vanishing-identity conventions
against the real proof.bin: per-gate constraint sign conventions, term
order, and reduction direction.  One combination must satisfy
vanishing(zeta) == Z_H(zeta) * quotient(zeta) for BOTH challenges —
that's a 256-bit accidental-collision-proof oracle."""

import itertools
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import poseidon as pos
from qzk_tpu.ops.transcript import Challenger
from qzk_tpu.plonk.gates import ExtAlgebra
from qzk_tpu.utils import plonky2_compat as pc

common = pc.read_common(
    open("/root/reference/wormhole/bench-data/common.bin", "rb").read()
)
vo, _ = pc.read_verifier_only(
    open("/root/reference/wormhole/bench-data/verifier.bin", "rb").read()
)
p = pc.read_proof(
    open("/root/reference/wormhole/bench-data/proof.bin", "rb").read(), common
)
cfg = common.config
nc = cfg.num_challenges

# -- transcript (validated by the PoW check) --------------------------------
pi_hash = pos.hash_no_pad(p.public_inputs)
ch = Challenger()
ch.observe_elements(vo.circuit_digest)
ch.observe_elements(pi_hash)
ch.observe_cap(p.wires_cap)
betas = ch.get_n_challenges(nc)
gammas = ch.get_n_challenges(nc)
ch.observe_cap(p.zs_partial_cap)
alphas = ch.get_n_challenges(nc)
ch.observe_cap(p.quotient_cap)
zeta = ch.get_extension_challenge()

alg = ExtAlgebra()
o = p.openings
ext = lambda a: np.asarray(a, dtype=np.uint64)
wires = [ext(w) for w in o.wires]
sels = [ext(c) for c in o.constants[: common.num_selectors]]
consts = [ext(c) for c in o.constants[common.num_selectors :]]
sigmas = [ext(s) for s in o.sigmas]
pih = [np.array([h, 0], dtype=np.uint64) for h in pi_hash]

# -- per-gate constraint vectors (our sign convention) ----------------------
from qzk_tpu.plonk.gates import (
    ArithmeticGate,
    ConstantGate,
    NoopGate,
    PoseidonGate,
    PublicInputGate,
)

UNUSED = (1 << 32) - 1


def filter_for(gate_idx):
    si = common.selector_indices[gate_idx]
    s = sels[si]
    lo, hi = common.selector_groups[si]
    f = alg.one()
    for k in range(lo, hi):
        if k != gate_idx:
            f = alg.mul(f, alg.sub(alg.const(k), s))
    if common.num_selectors > 1:
        f = alg.mul(f, alg.sub(alg.const(UNUSED), s))
    return f


def basesum_constraints(num_limbs):
    """BaseSumGate<2>: wire 0 = sum, wires 1..1+limbs = limbs (LE).
    Returns ([sum_constraint], [limb constraints]) unsigned parts:
    sum_c = computed_sum - sum; limb_c = limb*(limb-1)."""
    s = wires[0]
    limbs = [wires[1 + i] for i in range(num_limbs)]
    acc = alg.zero()
    for b in reversed(range(num_limbs)):
        acc = alg.add(alg.add(acc, acc), limbs[b])
    sum_c = alg.sub(acc, s)
    limb_cs = [alg.mul(l, alg.sub(l, alg.one())) for l in limbs]
    return [sum_c] + limb_cs


# groups of (slot_index, value) with a sign toggle per group
groups = {}


def add_group(name, slot_vals):
    groups[name] = slot_vals


for gi, g in enumerate(common.gates):
    f = filter_for(gi)
    mul_f = lambda cs: [alg.mul(f, c) for c in cs]
    if g.tag == 9:
        continue
    elif g.tag == 3:  # ConstantGate
        cs = ConstantGate(num_consts=g.params[0]).eval_constraints(
            alg, wires, consts, pih
        )
        add_group("const", list(enumerate(mul_f(cs))))
    elif g.tag == 12:  # PublicInputGate
        cs = PublicInputGate().eval_constraints(alg, wires, consts, pih)
        add_group("pi", list(enumerate(mul_f(cs))))
    elif g.tag == 2:  # BaseSumGate<2>
        cs = basesum_constraints(g.params[0])
        fcs = mul_f(cs)
        add_group("bsum_sum", [(0, fcs[0])])
        add_group("bsum_limb", list(enumerate(fcs[1:], start=1)))
    elif g.tag == 0:  # ArithmeticGate
        cs = ArithmeticGate(num_ops=g.params[0]).eval_constraints(
            alg, wires, consts, pih
        )
        add_group("arith", list(enumerate(mul_f(cs))))
    elif g.tag == 11:  # PoseidonGate
        cs = PoseidonGate().eval_constraints(alg, wires, consts, pih)
        fcs = mul_f(cs)
        add_group("pos_swap", [(0, fcs[0])])
        add_group("pos_delta", list(enumerate(fcs[1:5], start=1)))
        add_group("pos_full0", list(enumerate(fcs[5:41], start=5)))
        add_group("pos_part", list(enumerate(fcs[41:63], start=41)))
        add_group("pos_full1", list(enumerate(fcs[63:111], start=63)))
        add_group("pos_out", list(enumerate(fcs[111:123], start=111)))

NEG = lambda v: gl.ext_sub(np.zeros(2, dtype=np.uint64), v)

# -- permutation terms ------------------------------------------------------
N = common.degree
zeta_pow_n = gl.ext_exp(zeta, N)
one = alg.one()
z_h = gl.ext_sub(zeta_pow_n, one)
denom = gl.ext_mul(
    np.array([N % gl.P, 0], dtype=np.uint64), gl.ext_sub(zeta, one)
)
from qzk_tpu.plonk.fri import ext_inverse_vec

l0 = gl.ext_mul(z_h, ext_inverse_vec(denom[None])[0])

npp = common.num_partial_products
qdf = common.quotient_degree_factor
num_routed = cfg.num_routed_wires
n_chunks = (num_routed + qdf - 1) // qdf

z1_terms = []
pp_terms_per_c = []
for c in range(nc):
    beta = alg.lift(betas[c])
    gamma = alg.lift(gammas[c])
    z_x = ext(o.zs[c])
    z_gx = ext(o.zs_next[c])
    z1_terms.append(alg.mul(l0, alg.sub(z_x, one)))
    nums, dens = [], []
    for j in range(num_routed):
        kx = alg.mul(alg.const(int(common.k_is[j])), zeta)
        nums.append(alg.add(alg.add(wires[j], alg.mul(beta, kx)), gamma))
        dens.append(
            alg.add(alg.add(wires[j], alg.mul(beta, sigmas[j])), gamma)
        )
    accs = [z_x] + [
        ext(o.partial_products[c * npp + k]) for k in range(npp)
    ] + [z_gx]
    terms = []
    for k in range(n_chunks):
        lo_, hi_ = k * qdf, min((k + 1) * qdf, num_routed)
        np_ = nums[lo_]
        dp_ = dens[lo_]
        for j in range(lo_ + 1, hi_):
            np_ = alg.mul(np_, nums[j])
            dp_ = alg.mul(dp_, dens[j])
        terms.append(
            alg.sub(alg.mul(accs[k + 1], dp_), alg.mul(accs[k], np_))
        )
    pp_terms_per_c.append(terms)

# quotient recombination (fixed, matches both engines)
expected = []
for c in range(nc):
    acc = np.zeros(2, dtype=np.uint64)
    for t in reversed(range(qdf)):
        acc = gl.ext_mul(acc, zeta_pow_n)
        acc = gl.ext_add(acc, ext(o.quotient[c * qdf + t]))
    expected.append(gl.ext_mul(z_h, acc))

# -- search -----------------------------------------------------------------
ngc = common.num_gate_constraints
gnames = sorted(groups)


def gate_slots(signs):
    slots = [np.zeros(2, dtype=np.uint64) for _ in range(ngc)]
    for name in gnames:
        flip = signs[name]
        for i, v in groups[name]:
            vv = NEG(v) if flip else v
            slots[i] = gl.ext_add(slots[i], vv)
    return slots


def combine(terms, alpha):
    acc = np.zeros(2, dtype=np.uint64)
    for t in reversed(terms):
        acc = gl.ext_add(gl.ext_mul(acc, alpha), t)
    return acc


found = []
for bits in itertools.product([0, 1], repeat=len(gnames) + 2):
    signs = dict(zip(gnames, bits))
    z1_flip, pp_flip = bits[-2], bits[-1]
    slots = gate_slots(signs)
    z1 = [NEG(t) if z1_flip else t for t in z1_terms]
    pps = [
        [NEG(t) if pp_flip else t for t in terms]
        for terms in pp_terms_per_c
    ]
    ok = True
    for c in range(nc):
        terms = z1 + [t for ts in pps for t in ts] + slots
        v = combine(terms, alg.lift(alphas[c]))
        if not np.array_equal(v, expected[c]):
            ok = False
            break
    if ok:
        found.append(dict(signs=signs, z1=z1_flip, pp=pp_flip))
        print("FOUND:", found[-1])

if not found:
    print("no sign combination matched with term order [z1|pp|gates]")
    # try other orders cheaply for the all-zero / common sign guesses?
    print("will need order search — rerun with variants")

"""Solve for the FRI fold evaluation point of qp-plonky2's last layer.

For each query, interp_q(z) is the degree-15 interpolant of the
layer-2 coset evals over points {g16^k} (unit coset, sigma variants);
the final check must read interp_q(z_q) == RHS_q for some evaluation
point z_q.  We find ALL roots z of interp_q(z) - RHS_q over F_{p^2}
by gcd with z^{p^2} - z + equal-degree splitting, then look for a
relation z_q = f(beta, coset) that holds across queries."""

import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from qzk_tpu.ops import goldilocks as gl
from qzk_tpu.ops import ntt as ntt_mod
from qzk_tpu.ops import poseidon as pos
from qzk_tpu.ops.transcript import Challenger
from qzk_tpu.plonk.fri import ext_inverse_vec
from qzk_tpu.utils import plonky2_compat as pc
from qzk_tpu.utils.plonky2_verify import P2_COSET_SHIFT, _rev_bits

ZERO = np.zeros(2, dtype=np.uint64)
ONE = np.array([1, 0], dtype=np.uint64)


def einv(v):
    return ext_inverse_vec(np.asarray(v)[None])[0]


def pneg(a):
    return [gl.ext_sub(ZERO, c) for c in a]


def ptrim(a):
    while len(a) > 1 and (a[-1] == 0).all():
        a = a[:-1]
    return a


def padd(a, b):
    n = max(len(a), len(b))
    out = []
    for i in range(n):
        x = a[i] if i < len(a) else ZERO
        y = b[i] if i < len(b) else ZERO
        out.append(gl.ext_add(x, y))
    return out


def psub(a, b):
    return padd(a, pneg(b))


def pmulc(a, c):
    return [gl.ext_mul(x, c) for x in a]


def pmul(a, b):
    out = [ZERO] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        if (x == 0).all():
            continue
        for j, y in enumerate(b):
            out[i + j] = gl.ext_add(out[i + j], gl.ext_mul(x, y))
    return out


def pmod(a, b):
    a = ptrim(list(a))
    b = ptrim(list(b))
    binv = einv(b[-1])
    while len(a) >= len(b) and not (len(a) == 1 and (a[0] == 0).all()):
        f = gl.ext_mul(a[-1], binv)
        shift = len(a) - len(b)
        sub = [ZERO] * shift + pmulc(b, f)
        a = ptrim(psub(a, sub))
        if len(a) < len(b):
            break
    return a


def pgcd(a, b):
    a, b = ptrim(a), ptrim(b)
    while not (len(b) == 1 and (b[0] == 0).all()):
        a, b = b, pmod(a, b)
    return pmulc(a, einv(a[-1]))  # monic


def pmodmul(a, b, m):
    return pmod(pmul(a, b), m)


def pmodexp(base, e: int, m):
    result = [ONE]
    base = pmod(base, m)
    while e:
        if e & 1:
            result = pmodmul(result, base, m)
        base = pmodmul(base, base, m)
        e >>= 1
    return result


def roots_of(poly, rng):
    """All roots in F_{p^2} of poly (list of ext coeffs)."""
    poly = ptrim(list(poly))
    if len(poly) <= 1:
        return []
    # z^{p^2} - z mod poly
    q = gl.P * gl.P
    zq = pmodexp([ZERO, ONE], q, poly)
    lin = pgcd(poly, psub(zq, [ZERO, ONE]))
    out = []

    def split(f):
        f = ptrim(f)
        d = len(f) - 1
        if d == 0:
            return
        if d == 1:
            out.append(gl.ext_mul(gl.ext_sub(ZERO, f[0]), einv(f[1])))
            return
        while True:
            r = np.array(
                [rng.integers(0, 1 << 63), rng.integers(0, 1 << 63)],
                dtype=np.uint64,
            )
            t = pmodexp([r, ONE], (q - 1) // 2, f)
            g = pgcd(f, psub(t, [ONE]))
            if 0 < len(g) - 1 < d:
                split(g)
                # f / g
                quot = _pdiv(f, g)
                split(quot)
                return


def _pdiv(a, b):
    a = ptrim(list(a))
    b = ptrim(list(b))
    binv = einv(b[-1])
    quot = [ZERO] * (len(a) - len(b) + 1)
    while len(a) >= len(b) and not (len(a) == 1 and (a[0] == 0).all()):
        f = gl.ext_mul(a[-1], binv)
        shift = len(a) - len(b)
        quot[shift] = f
        a = ptrim(psub(a, [ZERO] * shift + pmulc(b, f)))
        if len(a) < len(b):
            break
    return ptrim(quot)


def main():
    common = pc.read_common(
        open("/root/reference/wormhole/bench-data/common.bin", "rb").read()
    )
    vo, _ = pc.read_verifier_only(
        open("/root/reference/wormhole/bench-data/verifier.bin", "rb").read()
    )
    p = pc.read_proof(
        open("/root/reference/wormhole/bench-data/proof.bin", "rb").read(),
        common,
    )
    cfg = common.config
    nc = cfg.num_challenges
    pi_hash = pos.hash_no_pad(p.public_inputs)
    ch = Challenger()
    ch.observe_elements(vo.circuit_digest)
    ch.observe_elements(pi_hash)
    ch.observe_cap(p.wires_cap)
    ch.get_n_challenges(nc)
    ch.get_n_challenges(nc)
    ch.observe_cap(p.zs_partial_cap)
    ch.get_n_challenges(nc)
    ch.observe_cap(p.quotient_cap)
    ch.get_extension_challenge()
    zb, gzb = p.openings.fri_batches()
    ch.observe_elements(zb.ravel())
    ch.observe_elements(gzb.ravel())
    fri_alpha = ch.get_extension_challenge()
    layer_betas = []
    for cap in p.fri.commit_phase_caps:
        ch.observe_cap(cap)
        layer_betas.append(ch.get_extension_challenge())
    ch.observe_elements(p.fri.final_poly.ravel())
    ch.observe_element(p.fri.pow_witness)
    ch.get_challenge()
    idx = np.array(
        ch.get_indices(cfg.fri.num_query_rounds, common.lde_bits),
        dtype=np.int64,
    )
    rounds = p.fri.query_rounds
    ev2 = np.stack([q.step_evals[2] for q in rounds])
    chunk2 = (idx >> 12).astype(np.int64)
    w9 = int(ntt_mod.root_of_unity(9))
    gA = int(ntt_mod.root_of_unity(4))
    rev4 = _rev_bits(np.arange(16, dtype=np.uint64), 4).astype(np.int64)
    fp = p.fri.final_poly
    sh2 = pow(P2_COSET_SHIFT % gl.P, 256, gl.P)
    rng = np.random.default_rng(7)

    # interpolation basis over unit coset points g^k (fixed): Lagrange
    pts = [np.array([pow(gA, k, gl.P), 0], dtype=np.uint64) for k in range(16)]
    lag = []
    for k in range(16):
        num = [ONE]
        den = ONE
        for j in range(16):
            if j == k:
                continue
            num = pmul(num, [gl.ext_sub(ZERO, pts[j]), ONE])
            den = gl.ext_mul(den, gl.ext_sub(pts[k], pts[j]))
        lag.append(pmulc(num, einv(den)))

    beta = layer_betas[2]
    for q in range(2):
        c = int(chunk2[q])
        r5 = int(_rev_bits(np.array([c], dtype=np.uint64), 5)[0])
        cs = sh2 * pow(w9, r5, gl.P) % gl.P
        y = np.array([pow(cs, 16, gl.P), 0], dtype=np.uint64)
        rhs = ZERO
        for cf in fp[::-1]:
            rhs = gl.ext_add(gl.ext_mul(rhs, y), cf)
        for sname, sigma in (("rev", rev4), ("id", np.arange(16))):
            vals = ev2[q][sigma]
            poly = [ZERO]
            for k in range(16):
                poly = padd(poly, pmulc(lag[k], vals[k]))
            poly = ptrim(psub(poly, [rhs]))
            rts = []
            out_holder = roots_of  # find roots
            # roots_of appends to out in closure; restructure:
            global_out = []
            # quick inline: reimplement root extraction
            qq = gl.P * gl.P
            zq = pmodexp([ZERO, ONE], qq, poly)
            lin = pgcd(poly, psub(zq, [ZERO, ONE]))
            stack = [lin]
            while stack:
                f = ptrim(stack.pop())
                d = len(f) - 1
                if d == 0:
                    continue
                if d == 1:
                    global_out.append(
                        gl.ext_mul(gl.ext_sub(ZERO, f[0]), einv(f[1]))
                    )
                    continue
                while True:
                    r = np.array(
                        [rng.integers(0, 1 << 63), rng.integers(0, 1 << 63)],
                        dtype=np.uint64,
                    )
                    t = pmodexp([r, ONE], (qq - 1) // 2, f)
                    gg = pgcd(f, psub(t, [ONE]))
                    if 0 < len(gg) - 1 < d:
                        stack.append(gg)
                        stack.append(_pdiv(f, gg))
                        break
            print(f"query {q} sigma={sname}: {len(global_out)} roots")
            csinv = pow(cs, gl.P - 2, gl.P)
            for z in global_out:
                # candidate relations
                rel1 = gl.ext_mul(z, np.array([cs % gl.P, 0], dtype=np.uint64))
                rel2 = gl.ext_mul(z, np.array([csinv, 0], dtype=np.uint64))
                print(
                    "  z=", [hex(int(v)) for v in z],
                    " z*cs=", [hex(int(v)) for v in rel1],
                    " z/cs=", [hex(int(v)) for v in rel2],
                )
            print("  beta =", [hex(int(v)) for v in beta])


main()

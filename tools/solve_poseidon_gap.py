"""Solve for the 12 missing qp-plonky2 Poseidon round constants at an
ARBITRARY flat offset k (not just round-aligned), given one full
permutation IO pair.

Math: the 12 unknown constants span at most two consecutive rounds
r0 = k//12 and r0+1 (when m = k%12 != 0).  Forward-run the known prefix
to the state entering round r0; backward-run the known suffix to the
state leaving round r0+1.  Inverting round r0+1 gives its pre-constant
state u1 exactly.  Writing w for round r0's sbox-layer output,
MDS @ w = y with y[j] = u1[j] - c1[j]: lanes j >= m of y are known, so
the square subsystem MDS[m:, m:] solves the unknown w lanes linearly;
the unknown constants then fall out lane by lane.

Every candidate table is accepted only if it reproduces all five
reference golden secret->address digests (a 320-bit oracle), so wrong
IO-pair recollections cannot produce a false positive.
"""

from __future__ import annotations

from poseidon_recovery import (
    MDS,
    MDS_INV,
    P,
    RECALLED_CONSTANTS,
    _bwd_round,
    _fwd_round,
    _is_full,
    _sbox,
    _sbox_inv,
    check_table,
)


def _mat_solve(M, rhs):
    """Solve M x = rhs mod P (square, small)."""
    n = len(rhs)
    A = [list(map(int, M[i])) + [int(rhs[i])] for i in range(n)]
    for col in range(n):
        piv = None
        for r in range(col, n):
            if A[r][col] % P != 0:
                piv = r
                break
        if piv is None:
            raise ZeroDivisionError("singular")
        A[col], A[piv] = A[piv], A[col]
        inv = pow(A[col][col], P - 2, P)
        A[col] = [x * inv % P for x in A[col]]
        for r in range(n):
            if r != col and A[r][col] % P != 0:
                f = A[r][col]
                A[r] = [(A[r][c] - f * A[col][c]) % P for c in range(n + 1)]
    return [A[i][n] for i in range(n)]


def _sbox_layer_inv(v, r):
    return [
        _sbox_inv(x) if (_is_full(r) or i == 0) else x
        for i, x in enumerate(v)
    ]


def solve_at(k: int, inp, out):
    """Return the full 360-entry table with the 12 solved constants
    inserted at offset k, or raise on inconsistency."""
    known = RECALLED_CONSTANTS

    def true_rc(i):  # known entries of the hypothesized true table
        assert not (k <= i < k + 12)
        return known[i] if i < k else known[i - 12]

    r0, m = divmod(k, 12)
    # forward to the state entering round r0
    s0 = list(inp)
    for r in range(r0):
        s0 = _fwd_round(s0, [true_rc(r * 12 + j) for j in range(12)], r)

    if m == 0:
        # unknowns are exactly round r0's constants
        bt = list(out)
        for r in range(29, r0, -1):
            bt = _bwd_round(bt, [true_rc(r * 12 + j) for j in range(12)], r)
        v = [sum(MDS_INV[a][b] * bt[b] for b in range(12)) % P
             for a in range(12)]
        u = _sbox_layer_inv(v, r0)
        gap = [(a - b) % P for a, b in zip(u, s0)]
    else:
        r1 = r0 + 1
        if r1 > 29:
            raise ValueError("gap spills past the final round")
        # backward to the state leaving round r1
        bt = list(out)
        for r in range(29, r1, -1):
            bt = _bwd_round(bt, [true_rc(r * 12 + j) for j in range(12)], r)
        # invert round r1's MDS+sbox: pre-constant state u1
        v1 = [sum(MDS_INV[a][b] * bt[b] for b in range(12)) % P
              for a in range(12)]
        u1 = _sbox_layer_inv(v1, r1)
        # round r0 constants: lanes < m known
        c0_known = [true_rc(r0 * 12 + j) for j in range(m)]
        # round r1 constants: lanes >= m known
        c1_known = {j: true_rc(k + 12 + (j - m)) if False else None
                    for j in range(12)}
        # careful: true table round r1 lane j (j >= m) sits at flat index
        # r1*12 + j = k + (12 - m) + j ... easier: flat index r1*12 + j,
        # known iff not in [k, k+12) -> j >= m.
        c1_known = {
            j: true_rc(r1 * 12 + j) for j in range(m, 12)
        }
        # w = sbox output of round r0; lanes < m computable
        w = [None] * 12
        for j in range(m):
            u0j = (s0[j] + c0_known[j]) % P
            w[j] = _sbox(u0j) if (_is_full(r0) or j == 0) else u0j
        # y = MDS @ w; lanes >= m known: y[j] = u1[j] - c1[j]
        y_known = {j: (u1[j] - c1_known[j]) % P for j in range(m, 12)}
        # solve MDS[m:, m:] @ w[m:] = y_known - MDS[m:, :m] @ w[:m]
        rows = list(range(m, 12))
        M = [[MDS[a][b] for b in range(m, 12)] for a in rows]
        rhs = [
            (y_known[a] - sum(MDS[a][b] * w[b] for b in range(m))) % P
            for a in rows
        ]
        w_tail = _mat_solve(M, rhs)
        for j, val in zip(range(m, 12), w_tail):
            w[j] = val
        # recover unknown c0 lanes (j >= m)
        gap0 = []
        for j in range(m, 12):
            if _is_full(r0) or j == 0:
                u0j = _sbox_inv(w[j])
            else:
                u0j = w[j]
            gap0.append((u0j - s0[j]) % P)
        # recover unknown c1 lanes (j < m) from y = MDS @ w
        gap1 = []
        for j in range(m):
            yj = sum(MDS[j][b] * w[b] for b in range(12)) % P
            gap1.append((u1[j] - yj) % P)
        gap = gap0 + gap1

    table = known[:k] + gap + known[k:]
    assert len(table) == 360
    return table


# Recalled plonky2 permutation test vector (poseidon_goldilocks.rs
# test_vectors, all-zeros input).  Wrong recollection cannot cause a
# false positive: candidate tables must reproduce the 5 golden digests.
CANDIDATE_IO = [
    (
        [0] * 12,
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4,
         0xC71603F33A1144CA, 0xD7709673896996DC, 0x46A84E87642F44ED,
         0xD032648251EE0B3C, 0x1C687363B207DF62, 0xDF8565563E8045FE,
         0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7],
    ),
]


def main():
    for inp, out in CANDIDATE_IO:
        for k in range(0, 349):
            try:
                table = solve_at(k, inp, out)
            except (ZeroDivisionError, ValueError):
                continue
            if check_table(table):
                print(f"FOUND at offset {k}")
                print("gap constants:")
                for c in table[k : k + 12]:
                    print(f"  0x{c:016x}")
                with open("recovered_table.txt", "w") as f:
                    for c in table:
                        f.write(f"0x{c:016x}\n")
                return table
    print("no offset validated")
    return None


if __name__ == "__main__":
    main()

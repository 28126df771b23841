"""Generate random DP problem fixtures for extend/global/align oracle modes.

Problems are written as text consumed by tests/oracle/oracle_main.c and the
python tests; both sides parse the same committed files, the oracle's outputs
are committed as goldens.
"""

import sys

import numpy as np

BASES = "ACGTN"


def mutate(rng, seq, sub=0.05, ind=0.03, n_rate=0.01):
    out = []
    i = 0
    while i < len(seq):
        r = rng.random()
        if r < ind / 2:  # deletion
            i += 1
            continue
        if r < ind:  # insertion
            out.append(int(rng.integers(4)))
            continue
        b = seq[i]
        if rng.random() < sub:
            b = int(rng.integers(4))
        if rng.random() < n_rate:
            b = 4
        out.append(b)
        i += 1
    return out


def to_s(seq):
    return "".join(BASES[b] for b in seq) or "A"


def main(outdir):
    rng = np.random.default_rng(20260817)
    with open(f"{outdir}/dp_extend.txt", "w") as f:
        for _ in range(400):
            qlen = int(rng.integers(1, 180))
            q = [int(x) for x in rng.integers(0, 4, qlen)]
            t = mutate(rng, q, sub=float(rng.choice([0.02, 0.1, 0.3])))
            # extend/truncate target
            extra = int(rng.integers(0, 60))
            t = t + [int(x) for x in rng.integers(0, 4, extra)]
            t = t[: max(1, int(rng.integers(1, len(t) + 40)))]
            w = int(rng.choice([5, 19, 50, 100]))
            eb = int(rng.choice([0, 5]))
            zd = int(rng.choice([0, 100]))
            h0 = int(rng.integers(1, 60))
            f.write(f"{w} {eb} {zd} {h0} {to_s(q)} {to_s(t)}\n")
    with open(f"{outdir}/dp_global.txt", "w") as f:
        for _ in range(400):
            qlen = int(rng.integers(1, 180))
            q = [int(x) for x in rng.integers(0, 4, qlen)]
            t = mutate(rng, q, sub=float(rng.choice([0.02, 0.1])), ind=0.04)
            if not t:
                t = [0]
            w = max(abs(len(t) - len(q)) + 3, int(rng.choice([5, 20, 100])))
            f.write(f"{w} {to_s(q)} {to_s(t)}\n")
    with open(f"{outdir}/dp_align.txt", "w") as f:
        XBYTE, XSTOP, XSUBO, XSTART = 0x10000, 0x20000, 0x40000, 0x80000
        for _ in range(300):
            qlen = int(rng.integers(10, 160))
            q = [int(x) for x in rng.integers(0, 4, qlen)]
            pre = [int(x) for x in rng.integers(0, 4, int(rng.integers(0, 200)))]
            post = [int(x) for x in rng.integers(0, 4, int(rng.integers(0, 200)))]
            t = pre + mutate(rng, q, sub=0.06, ind=0.02, n_rate=0) + post
            minsc = 19
            if qlen < 250:  # mem_matesw picks XBYTE when l_ms * a < 250
                xtra = XSUBO | XSTART | XBYTE | minsc
            else:
                xtra = XSUBO | XSTART | minsc
            if rng.random() < 0.3:
                xtra = XSUBO | XSTART | minsc  # force i16 path sometimes
            f.write(f"{xtra} {to_s(q)} {to_s(t)}\n")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/golden")

"""DP kernels (ksw_extend2 / ksw_global2 / ksw_align2) vs oracle goldens."""

import numpy as np
import pytest

from mpibwa_tpu.core import extend as X
from mpibwa_tpu.core.opts import fill_scmat
from mpibwa_tpu.index.format import NT4_TABLE

MAT = fill_scmat(1, 4)


def nt4(s):
    return NT4_TABLE[np.frombuffer(s.encode(), dtype=np.uint8)]


def cigar_str(cig):
    return "".join(f"{ln}{'MIDSH'[op]}" for ln, op in cig)


def load_pairs(golden_dir, name):
    probs = (golden_dir / f"{name}.txt").read_text().splitlines()
    outs = (golden_dir / f"{name}.out").read_text().splitlines()
    assert len(probs) == len(outs)
    return list(zip(probs, outs))


def test_ksw_extend2(golden_dir):
    for prob, out in load_pairs(golden_dir, "dp_extend"):
        w, eb, zd, h0, qs, ts = prob.split()
        got = X.ksw_extend2(nt4(qs), nt4(ts), MAT, 6, 1, 6, 1,
                            int(w), int(eb), int(zd), int(h0))
        want = tuple(int(v) for v in out.split())
        assert got == want, f"extend mismatch: {prob} -> {got} want {want}"


def test_ksw_global2(golden_dir):
    for prob, out in load_pairs(golden_dir, "dp_global"):
        w, qs, ts = prob.split()
        score, cig = X.ksw_global2(nt4(qs), nt4(ts), MAT, 6, 1, 6, 1, int(w))
        want_score, _, want_cig = out.partition(" ")
        assert score == int(want_score), f"global score: {prob}: {score} != {want_score}"
        assert cigar_str(cig) == want_cig.strip(), (
            f"global cigar: {prob}: {cigar_str(cig)} != {want_cig}")


def test_ksw_align2(golden_dir):
    for prob, out in load_pairs(golden_dir, "dp_align"):
        xtra, qs, ts = prob.split()
        r = X.ksw_align2(nt4(qs), nt4(ts), MAT, 6, 1, 6, 1, int(xtra))
        want = tuple(int(v) for v in out.split())
        got = (r.score, r.te, r.qe, r.score2, r.te2, r.tb, r.qb)
        assert got == want, f"align mismatch: xtra={xtra} -> {got} want {want}"

"""Whole banded-extension DP (ksw_extend2, ksw.c:380-479) in ONE Pallas
kernel: the row loop runs INSIDE the kernel, so a batch of extension
problems costs one kernel launch instead of ~max(tlen) dependent XLA
dispatches.

Round-2 profiling showed this environment's per-dispatch/per-op-chain
latency (~0.25-0.5 ms per dependent kernel link) dominates the XLA
while-loop formulation (ops/extend_batch.py): ~250 rows x ~6 ms/row ~= 1.5 s
per 2048-read microbatch while the actual DP arithmetic is microseconds.
Here the grid tiles problems into lane-blocks; each block runs its own
lax.while_loop over target rows with every eh/score array resident in VMEM,
and exits as soon as all its problems are broken (z-drop / zero row / end
of target).

Layout: problems on LANES, query positions on SUBLANES — every state array
is (W, P) with W = padded Q+1, per-problem scalars are (1, P), and the
target row at i is a (1, P) dynamic sublane slice of the (T, P) block; no
in-kernel transposes at all.

Semantics mirror ops/extend_batch.extend_batch step by step (which is
differentially tested against the scalar core/extend.py ksw_extend2):
first-row fill ksw.c:395-397, band clamp :399-407, F max-plus scan
:424-448, boundary writes, gscore-at-qlen :450-453, z-drop :458-463, band
trimming :466-469. Only the standard bwa scoring matrix (match a, mismatch
-b, N row/col -1 — bwa_fill_scmat) is supported; callers with a
nonstandard matrix use the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extend_batch import ExtendOut

NEG = -(1 << 28)
P_BLK = 128  # problems per grid block (one lane tile)
ROW_STEPS = 4  # target rows per while_loop iteration: the row recurrence
#              is ~0.5 us of VPU work but a Mosaic while iteration costs
#              ~25 us (cond reduce + branch), so multi-stepping amortizes
#              it; a row-step past tlen or on a broken lane is a masked
#              no-op, so over-stepping is exact


def _maxscan_decay_roll(t, e_ins, Q, row):
    """out[j, :] = max_{k<=j} (t[k, :] - (j-k)*e_ins) via log2 sublane-roll
    steps (in-kernel analog of extend_batch._maxscan_decay)."""
    out = t
    shift = 1
    while shift < Q:
        sh = pltpu.roll(out, np.int32(shift), axis=0)
        sh = jnp.where(row >= np.int32(shift), sh, np.int32(NEG))
        out = jnp.maximum(out, sh - np.int32(shift) * e_ins)
        shift <<= 1
    return out


def _mk_kernel(Q: int, T: int, o_del: int, e_del: int, o_ins: int,
               e_ins: int, W: int):
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins

    # np.int32 scalars throughout: python-int operands recurse in
    # promote_dtypes inside the Mosaic kernel trace (round-1 gotcha)
    Z = np.int32(0)
    ONE = np.int32(1)
    TWO = np.int32(2)
    FOUR = np.int32(4)
    NEGI = np.int32(NEG)

    def kernel(qs_ref, tst_ref, par_ref, out_ref, ehh_ref, ehe_ref):
        a = par_ref[6:7, :]      # (1, P) broadcast rows: grid+SMEM inputs
        b_pen = par_ref[7:8, :]  # hit a Mosaic miscompile, so a/b ride par
        P = out_ref.shape[1]
        qlens = par_ref[0:1, :]  # (1, P)
        tlens = par_ref[1:2, :]
        w_in = par_ref[2:3, :]
        end_bonus = par_ref[3:4, :]
        zdrop = par_ref[4:5, :]
        h0 = par_ref[5:6, :]

        row = lax.broadcasted_iota(jnp.int32, (W, P), 0)  # cell index j
        qs = qs_ref[...]  # (W, P) int32 base codes (4 = pad/N)

        # ---- first-row fill (ksw.c:395-397; extend_batch:67-77) ------------
        # eh_h[0] = h0; eh_h[j>=1] = max(ehh1 - (j-1)*e_ins, 0) while the
        # previous chain value > e_ins and j <= qlen. chain_val is monotone
        # decreasing in j, so the cumprod collapses to a direct compare.
        ehh1 = jnp.maximum(h0 - np.int32(oe_ins), Z)
        chain_val = ehh1 - (row - ONE) * np.int32(e_ins)
        prev_ok = (row <= ONE) | (ehh1 - (row - TWO) * np.int32(e_ins)
                                  > np.int32(e_ins))
        first_row = jnp.where((row >= ONE) & prev_ok & (row <= qlens),
                              jnp.maximum(chain_val, Z), Z)
        ehh_ref[...] = jnp.where(row == Z, h0,
                                 jnp.where(row <= np.int32(Q), first_row, Z))
        ehe_ref[...] = jnp.zeros((W, P), jnp.int32)

        # ---- band clamp (ksw.c:399-407) ------------------------------------
        # lax.div = C trunc division; == the reference's float64-then-(int)
        # here because any negative numerator clamps to 1 either way
        max_ins = jnp.maximum(
            lax.div(qlens * a + end_bonus - np.int32(o_ins), np.int32(e_ins))
            + ONE, ONE)
        max_del = jnp.maximum(
            lax.div(qlens * a + end_bonus - np.int32(o_del), np.int32(e_del))
            + ONE, ONE)
        w = jnp.minimum(jnp.minimum(w_in, max_ins), max_del)

        zero1 = jnp.zeros((1, P), jnp.int32)
        neg1 = jnp.full((1, P), -1, jnp.int32)
        # broken is carried as an int32 mask: bool while-carries hit an
        # unsupported i8->i1 truncation in Mosaic
        state0 = (jnp.int32(0), zero1, qlens, h0, neg1, neg1, neg1, neg1,
                  zero1, (tlens <= Z).astype(jnp.int32))

        def cond(c):
            i = c[0]
            tl_broken = c[9]
            # bool-array any() lowers through a float64 squeeze in Mosaic;
            # reduce in int32 instead
            alive = jnp.max(jnp.where((tl_broken == Z) & (i < tlens),
                                      ONE, Z))
            return alive > Z

        def body(c):
            (i, beg_s, end_s, maxv, max_i, max_j, max_ie, gscore, max_off,
             broken) = c
            act = (broken == Z) & (i < tlens)
            beg = jnp.maximum(beg_s, i - w)
            end = jnp.minimum(jnp.minimum(end_s, i + w + ONE), qlens)
            empty = beg >= end
            act2 = act & ~empty

            tb = tst_ref[pl.ds(i, 1), :]  # (1, P) target base at row i
            srow = jnp.where((tb < FOUR) & (qs < FOUR),
                             jnp.where(tb == qs, a, -b_pen), np.int32(-1))
            live = (row >= beg) & (row < end)

            h1_first = jnp.where(
                beg == Z,
                jnp.maximum(h0 - np.int32(o_del)
                            - np.int32(e_del) * (i + ONE), Z), Z)
            ehh = ehh_ref[...]
            ehe = ehe_ref[...]
            M = jnp.where(ehh != Z, ehh + srow, Z)  # H(i-1,j-1) at col j
            Tm = jnp.where(live, jnp.maximum(M - np.int32(oe_ins), Z), NEGI)
            scan = _maxscan_decay_roll(Tm, np.int32(e_ins), Q, row)
            Fs = pltpu.roll(scan, np.int32(1), axis=0)
            Fs = jnp.where(row >= ONE, Fs, NEGI)
            F = jnp.where(row == beg, Z, Fs)
            H = jnp.maximum(jnp.maximum(M, ehe), F)
            H = jnp.where(live, H, Z)
            m = jnp.max(jnp.where(live, H, np.int32(-1)), axis=0,
                        keepdims=True)
            m = jnp.where(end > beg, jnp.maximum(m, Z), Z)
            is_max = live & (H == m) & (m > Z)
            mj = jnp.max(jnp.where(is_max, row, np.int32(-1)), axis=0,
                         keepdims=True)
            newE = jnp.maximum(jnp.maximum(M - np.int32(oe_del), Z),
                               ehe - np.int32(e_del))

            upd = act2
            # eh_h[j] for j in [beg+1, end] <- H[j-1]; eh_h[beg] <- h1_first
            H_sh = pltpu.roll(H, np.int32(1), axis=0)
            H_sh = jnp.where(row >= ONE, H_sh, Z)
            write_h = (row > beg) & (row <= end)
            new_ehh = jnp.where(write_h & upd, H_sh, ehh)
            new_ehh = jnp.where((row == beg) & upd, h1_first, new_ehh)
            write_e = (row >= beg) & (row < end)
            new_ehe = jnp.where(write_e & upd, newE, ehe)
            new_ehe = jnp.where((row == end) & upd, Z, new_ehe)
            ehh_ref[...] = new_ehh
            ehe_ref[...] = new_ehe

            endm1 = jnp.maximum(end - ONE, Z)
            h1_last_v = jnp.max(jnp.where(row == endm1, H, NEGI), axis=0,
                                keepdims=True)
            h1_last = jnp.where(end > beg, h1_last_v, h1_first)
            at_q = act2 & (end == qlens)
            upd_ie = at_q & ~(gscore > h1_last)
            new_max_ie = jnp.where(upd_ie, i, max_ie)
            new_gscore = jnp.where(at_q, jnp.maximum(gscore, h1_last), gscore)

            zero_m = act2 & (m == Z)
            better = act2 & ~zero_m & (m > maxv)
            new_maxv = jnp.where(better, m, maxv)
            new_max_i = jnp.where(better, i, max_i)
            new_max_j = jnp.where(better, mj, max_j)
            new_max_off = jnp.where(
                better, jnp.maximum(max_off, jnp.abs(mj - i)), max_off)
            di = i - max_i
            dj = mj - max_j
            zd1 = maxv - m - (di - dj) * np.int32(e_del) > zdrop
            zd2 = maxv - m - (dj - di) * np.int32(e_ins) > zdrop
            # select between bool vectors via logic ops (a bool-valued
            # where lowers to an unsupported i8->i1 trunc in Mosaic)
            dgt = di > dj
            zbreak = act2 & ~zero_m & ~better & (zdrop > Z) & \
                ((dgt & zd1) | (~dgt & zd2))

            # band trimming over the UPDATED eh arrays (ksw.c:466-469)
            nz = (new_ehh != Z) | (new_ehe != Z)
            in_range = (row >= beg) & (row < end)
            first_nz = jnp.min(jnp.where(in_range & nz, row, np.int32(Q + 1)),
                               axis=0, keepdims=True)
            new_beg = jnp.minimum(first_nz, end)
            in_range2 = (row >= new_beg) & (row <= end)
            last_nz = jnp.max(jnp.where(in_range2 & nz, row, new_beg - ONE),
                              axis=0, keepdims=True)
            new_end = jnp.minimum(last_nz + TWO, qlens)

            brk = ((broken != Z) | zero_m | zbreak
                   | (act & empty)).astype(jnp.int32)
            keep = act2
            return (i + ONE,
                    jnp.where(keep, new_beg, beg_s),
                    jnp.where(keep, new_end, end_s),
                    jnp.where(keep, new_maxv, maxv),
                    jnp.where(keep, new_max_i, max_i),
                    jnp.where(keep, new_max_j, max_j),
                    jnp.where(keep, new_max_ie, max_ie),
                    jnp.where(keep, new_gscore, gscore),
                    jnp.where(keep, new_max_off, max_off),
                    brk)

        def multi_body(c):
            for _ in range(ROW_STEPS):
                c = body(c)
            return c

        st = lax.while_loop(cond, multi_body, state0)
        (_, _, _, maxv, max_i, max_j, max_ie, gscore, max_off, _) = st
        out = jnp.concatenate(
            [maxv, max_j + ONE, max_i + ONE, max_ie + ONE, gscore, max_off,
             jnp.zeros((2, P), jnp.int32)], axis=0)
        out_ref[...] = out

    return kernel


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def extend_batch_pallas(qst, tst, par, Q: int, T: int, o_del: int,
                        e_del: int, o_ins: int, e_ins: int,
                        interpret: bool = False):
    """qst: (W, B) int32 queries, column-major (W = 128-padded Q+1, pad 4);
    tst: (T8, B) int32 targets (T8 = 8-padded T, pad 4); par: (8, B) int32
    rows (qlen, tlen, w, end_bonus, zdrop, h0, a, b).
    B must be a multiple of P_BLK. Returns (8, B) int32 rows
    (score, qle, tle, gtle, gscore, max_off, 0, 0)."""
    W, B = qst.shape
    T8 = tst.shape[0]
    assert B % P_BLK == 0
    kernel = _mk_kernel(Q, T, o_del, e_del, o_ins, e_ins, W)
    grid = (B // P_BLK,)
    z = np.int32(0)  # python-int 0 in an index map traces as i64 under x64
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        in_specs=[
            pl.BlockSpec((W, P_BLK), lambda i: (z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T8, P_BLK), lambda i: (z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, P_BLK), lambda i: (z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, P_BLK), lambda i: (z, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W, P_BLK), jnp.int32),
            pltpu.VMEM((W, P_BLK), jnp.int32),
        ],
        interpret=interpret,
    )(qst, tst, par)


def standard_mat_ab(mat) -> "tuple[int, int] | None":
    """If mat is the bwa_fill_scmat(a, b) shape, return (a, b); else None."""
    m = np.asarray(mat).reshape(5, 5).astype(np.int64)
    a = int(m[0, 0])
    b = int(-m[0, 1])
    want = np.full((5, 5), -1, np.int64)
    for i in range(4):
        for j in range(4):
            want[i, j] = a if i == j else -b
    if np.array_equal(m, want):
        return a, b
    return None


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _stage_and_run(qs, ts, qlens, tlens, params, ab, Q: int, T: int,
                   od_ed_oi_ei: tuple, B: int, interpret: bool = False):
    o_del, e_del, o_ins, e_ins = od_ed_oi_ei
    Bp = ((B + P_BLK - 1) // P_BLK) * P_BLK
    # W is the SUBLANE dim of every (W, P) state array: it only needs the
    # int32 tile multiple of 8, not 128 — 101bp reads run W=104 instead
    # of 128 (19% less row compute; lanes are the P problems)
    W = ((Q + 1 + 7) // 8) * 8
    T8 = ((T + 7) // 8) * 8
    qst = jnp.full((W, Bp), 4, jnp.int32)
    qst = qst.at[:Q, :B].set(jnp.transpose(qs.astype(jnp.int32)))
    tstp = jnp.full((T8, Bp), 4, jnp.int32)
    tstp = tstp.at[:T, :B].set(jnp.transpose(ts.astype(jnp.int32)))
    par = jnp.zeros((8, Bp), jnp.int32)
    par = par.at[0, :B].set(qlens.astype(jnp.int32))
    par = par.at[1, :B].set(tlens.astype(jnp.int32))
    par = par.at[2:6, :B].set(jnp.transpose(params[:, :4]).astype(jnp.int32))
    par = par.at[0, B:].set(1)
    par = par.at[5, B:].set(1)
    par = par.at[6, :].set(ab[0])
    par = par.at[7, :].set(ab[1])
    res = extend_batch_pallas(qst, tstp, par, Q, T,
                              o_del, e_del, o_ins, e_ins, interpret)
    return res[:, :B]


def extend_batch_via_pallas_ab(qs, ts, qlens, tlens, params, ab,
                               o_del, e_del, o_ins, e_ins,
                               interpret: bool = False) -> ExtendOut:
    """Jit-friendly front-end: ab = (a, b) static tuple (the caller checked
    the matrix shape on host via standard_mat_ab)."""
    B, Q = qs.shape
    T = ts.shape[1]
    abd = jnp.asarray(np.array(ab, np.int32))
    res = _stage_and_run(qs, ts, qlens, tlens, params, abd, Q, T,
                         (o_del, e_del, o_ins, e_ins), B, interpret)
    return ExtendOut(res[0], res[1], res[2], res[3], res[4], res[5])


def extend_batch_via_pallas(qs, ts, qlens, tlens, params, mat,
                            o_del, e_del, o_ins, e_ins,
                            interpret: bool = False) -> ExtendOut:
    """Drop-in front-end matching extend_batch's signature and outputs."""
    B, Q = qs.shape
    T = ts.shape[1]
    ab_ = standard_mat_ab(mat)
    assert ab_ is not None, "nonstandard matrix must use the XLA path"
    ab = jnp.asarray(np.array(ab_, np.int32))
    res = _stage_and_run(qs, ts, qlens, tlens, params, ab, Q, T,
                         (o_del, e_del, o_ins, e_ins), B, interpret)
    return ExtendOut(res[0], res[1], res[2], res[3], res[4], res[5])

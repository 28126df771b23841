"""Batched banded global alignment (ksw_global2 semantics) on device.

Computes scores and the full direction matrix for a batch of problems; the
caller backtracks on host (the z matrix is tiny: B x T x Q bytes). Same
row-parallel formulation as the extension kernel; direction encoding matches
ksw.c:546-565 (bits 0-1 h-source, bit 2 e-extend, bit 5 f-extend).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MINUS_INF = -0x40000000


def _maxscan_decay(t: jnp.ndarray, decay: int) -> jnp.ndarray:
    n = t.shape[-1]
    out = t
    shift = 1
    while shift < n:
        shifted = jnp.pad(out[..., :-shift],
                          [(0, 0)] * (out.ndim - 1) + [(shift, 0)],
                          constant_values=MINUS_INF)
        out = jnp.maximum(out, shifted - shift * decay)
        shift <<= 1
    return out


class GlobalOut(NamedTuple):
    score: jnp.ndarray  # (B,)
    z: jnp.ndarray  # (B, T, Q) uint8 direction matrix


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def global_batch(qs: jnp.ndarray, ts: jnp.ndarray, qlens: jnp.ndarray,
                 tlens: jnp.ndarray, ws: jnp.ndarray, mat: jnp.ndarray,
                 o_del: int, e_del: int, o_ins: int, e_ins: int,
                 ab=None) -> GlobalOut:
    """qs: (B, Q) uint8; ts: (B, T) uint8; ws: (B,) int32 bands;
    mat: (5,5) int32 scoring matrix. ab: optional static (a, b) for the
    standard bwa_fill_scmat matrix — replaces the per-row mat[tb, qs]
    gather (the dominant per-round cost on this hardware) with fused
    elementwise selects."""
    B, Q = qs.shape
    T = ts.shape[1]
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jidx = jnp.arange(Q, dtype=jnp.int32)
    rows = jnp.arange(B)

    # first row (ksw.c:522-525)
    jj = jnp.arange(1, Q + 1, dtype=jnp.int32)
    fill = -(o_ins + e_ins * jj)
    in_band = (jj[None, :] <= jnp.minimum(qlens, ws)[:, None])
    eh_h0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32),
         jnp.where(in_band, fill[None, :], MINUS_INF)], axis=1)
    eh_e0 = jnp.full((B, Q + 1), MINUS_INF, jnp.int32)

    state = dict(
        eh_h=eh_h0, eh_e=eh_e0,
        z=jnp.zeros((B, T, Q), jnp.uint8),
    )

    def body(i, st):
        act = i < tlens
        beg = jnp.maximum(i - ws, 0)
        end = jnp.minimum(i + ws + 1, qlens)
        tb = ts[rows, jnp.minimum(i, T - 1)].astype(jnp.int32)
        if ab is not None:
            qs32 = qs.astype(jnp.int32)
            srow = jnp.where((tb[:, None] < 4) & (qs32 < 4),
                             jnp.where(tb[:, None] == qs32,
                                       jnp.int32(ab[0]), jnp.int32(-ab[1])),
                             jnp.int32(-1))
        else:
            srow = mat[tb[:, None], qs.astype(jnp.int32)]  # (B, Q)
        live = (jidx[None, :] >= beg[:, None]) & (jidx[None, :] < end[:, None])
        h1_first = jnp.where(beg == 0, -(o_del + e_del * (i + 1)),
                             MINUS_INF)
        M = st["eh_h"][:, :Q] + srow
        E = st["eh_e"][:, :Q]
        Mm = jnp.where(live, M, MINUS_INF)
        scan = _maxscan_decay(Mm - oe_ins, e_ins)
        F = jnp.concatenate(
            [jnp.full((B, 1), MINUS_INF, jnp.int32), scan[:, :-1]], axis=1)
        F = jnp.where(jidx[None, :] == beg[:, None], MINUS_INF, F)
        d = jnp.where(M >= E, 0, 1).astype(jnp.uint8)
        H = jnp.maximum(M, E)
        d = jnp.where(H >= F, d, 2).astype(jnp.uint8)
        H = jnp.maximum(H, F)
        e_ext = ((E - e_del) > (M - oe_del)).astype(jnp.uint8) << 2
        f_ext = ((F - e_ins) > (M - oe_ins)).astype(jnp.uint8) * 0x20
        d = d | e_ext | f_ext
        d = jnp.where(live, d, 0)
        newE = jnp.maximum(M - oe_del, E - e_del)

        H_sh = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H], axis=1)
        jr = jnp.arange(Q + 1)[None, :]
        write_h = (jr > beg[:, None]) & (jr <= end[:, None]) & act[:, None]
        new_eh_h = jnp.where(write_h, H_sh, st["eh_h"])
        new_eh_h = jnp.where((jr == beg[:, None]) & act[:, None],
                             h1_first[:, None], new_eh_h)
        write_e = (jr >= beg[:, None]) & (jr < end[:, None]) & act[:, None]
        newE_pad = jnp.concatenate([newE, jnp.zeros((B, 1), jnp.int32)], axis=1)
        new_eh_e = jnp.where(write_e, newE_pad, st["eh_e"])
        new_eh_e = jnp.where((jr == end[:, None]) & act[:, None],
                             MINUS_INF, new_eh_e)
        z = st["z"].at[:, jnp.minimum(i, T - 1), :].set(
            jnp.where(act[:, None], d, st["z"][:, jnp.minimum(i, T - 1), :]))
        return dict(eh_h=new_eh_h, eh_e=new_eh_e, z=z)

    state = jax.lax.fori_loop(0, jnp.max(tlens), body, state)
    score = state["eh_h"][rows, qlens]
    return GlobalOut(score, state["z"])


def traceback(z: np.ndarray, qlen: int, tlen: int, w: int
              ) -> List[Tuple[int, int]]:
    """ksw_global2 traceback (ksw.c:588-602) over a full-width z matrix.
    Returns cigar [(len, op)] with op 0=M,1=I,2=D."""
    cigar: List[List[int]] = []

    def push(op, ln):
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += ln
        else:
            cigar.append([op, ln])

    i = tlen - 1
    k = (i + w + 1 if i + w + 1 < qlen else qlen) - 1
    which = 0
    while i >= 0 and k >= 0:
        which = (int(z[i, k]) >> (which << 1)) & 3
        if which == 0:
            push(0, 1)
            i -= 1
            k -= 1
        elif which == 1:
            push(2, 1)
            i -= 1
        else:
            push(1, 1)
            k -= 1
    if i >= 0:
        push(2, i + 1)
    if k >= 0:
        push(1, k + 1)
    cigar.reverse()
    return [(ln, op) for op, ln in cigar]


@jax.jit
def traceback_batch(z: jnp.ndarray, qlens: jnp.ndarray, tlens: jnp.ndarray,
                    ws: jnp.ndarray):
    """Device traceback of the whole batch in lockstep (ksw.c:588-602).

    Returns (ops (B, T+Q) uint8 in walk order with 255 padding, i_rem,
    k_rem): the host run-length-encodes ops and appends the leftover-D/I
    tails, avoiding the (B, T, Q) direction-matrix pull."""
    B, T, Q = z.shape
    rows = jnp.arange(B)
    i = tlens - 1
    k = jnp.minimum(i + ws + 1, qlens) - 1
    which = jnp.zeros(B, jnp.int32)
    ops = jnp.full((B, T + Q), 255, jnp.uint8)

    def body(s, st):
        i, k, which, ops = st
        alive = (i >= 0) & (k >= 0)
        zval = z[rows, jnp.clip(i, 0, T - 1),
                 jnp.clip(k, 0, Q - 1)].astype(jnp.int32)
        w2 = (zval >> (which << 1)) & 3
        # op codes as the host push(): 0=M, 2=D (i-1), 1=I (k-1)
        op = jnp.where(w2 == 0, 0, jnp.where(w2 == 1, 2, 1)).astype(jnp.uint8)
        ops = ops.at[:, s].set(jnp.where(alive, op, jnp.uint8(255)))
        di = jnp.where(w2 == 2, 0, 1)
        dk = jnp.where(w2 == 1, 0, 1)
        i = jnp.where(alive, i - di, i)
        k = jnp.where(alive, k - dk, k)
        which = jnp.where(alive, w2, which)
        return (i, k, which, ops)

    i, k, which, ops = jax.lax.fori_loop(0, T + Q, body, (i, k, which, ops))
    return ops, i, k


def cigar_from_ops(ops_row: np.ndarray, i_rem: int, k_rem: int
                   ) -> List[Tuple[int, int]]:
    """Host run-length encoding of a device traceback row; replicates the
    push/merge + tail pushes + reversal of `traceback` (vectorized: the
    per-element python loop was ~40% of the cigar stage)."""
    n = int(np.argmax(ops_row == 255)) if (ops_row == 255).any() \
        else len(ops_row)
    cigar: List[List[int]] = []
    if n:
        row = ops_row[:n].astype(np.int64)
        brk = np.nonzero(np.diff(row))[0]
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk + 1, [n]])
        cigar = [[int(row[s]), int(e - s)] for s, e in zip(starts, ends)]

    def push(op, ln):
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += ln
        else:
            cigar.append([op, ln])

    if i_rem >= 0:
        push(2, i_rem + 1)
    if k_rem >= 0:
        push(1, k_rem + 1)
    cigar.reverse()
    return [(ln, op) for op, ln in cigar]


@functools.partial(jax.jit, static_argnums=(3, 4, 6, 7, 8, 9, 10))
def global_from_coords(fm, qd: jnp.ndarray, coords: jnp.ndarray, Q: int,
                       T: int, ws: jnp.ndarray, o_del: int, e_del: int,
                       o_ins: int, e_ins: int, ab=None,
                       mat: jnp.ndarray = None) -> GlobalOut:
    """Device-side problem construction for the global DP; coords as in
    extend_from_coords: (row, q_off, q_len, q_rev, r_start, t_len) with the
    reverse-strand case walking down from r_start (= re), which reproduces
    gen_cigar's double reversal (bwa.c:135-140)."""
    row = coords[:, 0].astype(jnp.int32)
    q_off = coords[:, 1].astype(jnp.int32)
    q_len = coords[:, 2].astype(jnp.int32)
    q_rev = coords[:, 3] != 0
    r_start = coords[:, 4].astype(jnp.int64)  # doubled coord: needs int64
    t_len = coords[:, 5].astype(jnp.int32)
    L = qd.shape[1]
    jq = jnp.arange(Q, dtype=jnp.int32)[None, :]
    qpos = jnp.where(q_rev[:, None], q_off[:, None] + q_len[:, None] - 1 - jq,
                     q_off[:, None] + jq)
    qs = jnp.where(jq < q_len[:, None],
                   qd[row[:, None], jnp.clip(qpos, 0, L - 1)], jnp.uint8(4))
    jt = jnp.arange(T, dtype=jnp.int32)[None, :]
    tpos = jnp.where(q_rev[:, None],
                     r_start[:, None] - 1 - jt, r_start[:, None] + jt)
    ts = jnp.where(jt < t_len[:, None],
                   fm.ref_base(jnp.clip(tpos, 0, 2 * fm.l_pac - 1))
                   .astype(jnp.uint8), jnp.uint8(4))
    return global_batch(qs, ts, q_len, t_len, ws, mat,
                        o_del, e_del, o_ins, e_ins, ab)

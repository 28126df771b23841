"""Fused Pallas backward-SMEM round: the whole bwt.c:326-345 round body in
one TPU kernel.

Round-1 profiling (DESIGN.md, /tmp probes) showed the XLA flat-queue backward
(ops/seeding_flat.py) pays ~2.7 ms PER ROUND in scatters (segment_sum, mem
buffer .at[].set) and log-depth associative scans materialized through HBM,
plus ~3.2 ms per jit dispatch through this environment's device tunnel. This
module replaces the round body with ONE Pallas kernel that keeps all
per-entry state in VMEM vregs and does the segmented keep/dedup/emit scans
with lane/sublane rolls, and runs the whole backward pass as ONE jitted
device while_loop (no host round trips, no scatters at all: a mem emission is
recorded in the dying entry's own slot).

Semantics are identical to seeding_flat.flat_rounds (differentially tested),
i.e. to the scalar engine (core/fm.py) and bwt_smem1a (bwt.c:289-351):
  - entries = (read, call)-lane interval lists, longest-match-first, flat
    and lane-contiguous;
  - per round each live entry is backward-extended (bwt_extend, bwt.c:262);
  - a lane's FIRST live entry failing emits a mem unless contained
    (bwt.c:331-337); keepers with consecutive duplicate interval sizes are
    dropped (bwt.c:338); survivors replace the entry in place.

Layout: entries live in (8, W) int32 arrays with flat order n = s*W + w
(sublane-major), so vregs are dense and the segmented scans are
(log2 W lane-roll + 3 sublane-roll) steps.

int32 interval path only (doubled genome < 2^31); the int64 path keeps the
XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SWAR popcount masks (plain ints: jnp module-level constants are rejected
# as captured tracers inside Mosaic kernels)
M55 = 0x55555555
M33 = 0x33333333
M0F = 0x0F0F0F0F
BIG = np.int32(1 << 30)  # last_start "no mem yet" sentinel
E_MAX = 32768  # entries per kernel call (VMEM budget: ~6 MB at 32K)


def _u32(x):
    return pltpu.bitcast(x, jnp.uint32)


def _i32(x):
    return pltpu.bitcast(x, jnp.int32)


# ---------------------------------------------------------------------------
# segmented scans over (8, W) arrays in flat order n = s*W + w
# ---------------------------------------------------------------------------


def _seg_scan(vals, combine, identity, W):
    """Inclusive segmented scan. vals: tuple of (8, W) int32 (the reset flag
    must be part of the tuple and ORed by `combine`). identity: python ints.
    Returns the scanned tuple."""
    col = lax.broadcasted_iota(jnp.int32, (8, W), 1)
    cur = vals
    k = 1
    while k < W:
        sh = tuple(pltpu.roll(v, np.int32(k), axis=1) for v in cur)
        sh = tuple(jnp.where(col >= np.int32(k), s, np.int32(i))
                   for s, i in zip(sh, identity))
        cur = combine(sh, cur)
        k <<= 1
    # row aggregates (value of last lane) -> exclusive sublane scan -> carry
    aggs = tuple(lax.slice_in_dim(v, W - 1, W, axis=1) for v in cur)  # (8,1)
    row1 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    ex = tuple(pltpu.roll(a, np.int32(1), axis=0) for a in aggs)
    ex = tuple(jnp.where(row1 >= np.int32(1), e, np.int32(i))
               for e, i in zip(ex, identity))
    k = 1
    while k < 8:
        sh = tuple(pltpu.roll(v, np.int32(k), axis=0) for v in ex)
        sh = tuple(jnp.where(row1 >= np.int32(k + 1), s, np.int32(i))
                   for s, i in zip(sh, identity))
        ex = combine(sh, ex)
        k <<= 1
    return combine(ex, cur)  # (8,1) broadcasts along lanes


def _comb_sum(a, b):
    av, ar = a
    bv, br = b
    return jnp.where(br != 0, bv, av + bv), ar | br


def _comb_or(a, b):
    av, ar = a
    bv, br = b
    return jnp.where(br != 0, bv, av | bv), ar | br


def _comb_last(a, b):
    """(val-of-last-keeper, has-keeper, reset)."""
    av, ah, ar = a
    bv, bh, br = b
    v = jnp.where(bh != 0, bv, jnp.where(br != 0, np.int32(0), av))
    h = bh | (ah & (1 - br))
    return v, h, ar | br


def _flat_shift1(x, fill, W):
    """Previous element in flat order (prev of (s,0) is (s-1, W-1))."""
    col = lax.broadcasted_iota(jnp.int32, (8, W), 1)
    row = lax.broadcasted_iota(jnp.int32, (8, W), 0)
    z = pltpu.roll(x, np.int32(1), axis=1)
    zc = pltpu.roll(z, np.int32(1), axis=0)
    out = jnp.where(col == np.int32(0), zc, z)
    return jnp.where((col == np.int32(0)) & (row == np.int32(0)),
                     np.int32(fill), out)


# ---------------------------------------------------------------------------
# the fused round kernel
# ---------------------------------------------------------------------------


def _occ4_counts(data_rows, within):
    """data_rows: list of 8 (8, W) uint32 words; within: (8, W) i32.
    Returns (4 counts (8, W) i32, base-0 overcount corr) — the bwt_occ4 SWAR
    counting (bwt.c:98-105, 165-186) for the first within+1 bases."""
    cnts = [None] * 4
    corr = None
    for j in range(8):
        nv = lax.min(lax.max(within + 1 - np.int32(16 * j), np.int32(0)),
                     np.int32(16))
        half = _u32(np.int32(16) - nv)
        v = lax.shift_left(np.uint32(1), half)
        mask = ~(v * v - np.uint32(1))
        w = data_rows[j] & mask
        nw = ~w
        c16 = np.int32(16) - nv
        corr = c16 if corr is None else corr + c16
        for c in range(4):
            a = (w if c & 2 else nw) >> 1
            b = w if c & 1 else nw
            m = a & b & np.uint32(M55)
            x = (m & np.uint32(M33)) + ((m >> 2) & np.uint32(M33))
            x = (x + (x >> 4)) & np.uint32(M0F)
            cnt = _i32((x * np.uint32(0x01010101)) >> 24)
            cnts[c] = cnt if cnts[c] is None else cnts[c] + cnt
    return cnts, corr


def _round_kernel(l2p_ref,
                  occ_k_ref, dat_k_ref, win_k_ref, sent_k_ref,
                  occ_l_ref, dat_l_ref, win_l_ref, sent_l_ref,
                  qi_ref, lane_start_ref,
                  ik0_ref, ik1_ref, ik2_ref, live_ref, i_ref, minv_ref,
                  last_ref, emitted_ref,
                  o_ik0, o_ik1, o_ik2, o_live, o_i, o_last, o_emitted):
    W = qi_ref.shape[1]
    l2 = [l2p_ref[c] for c in range(4)]
    primary = l2p_ref[4]

    ik0 = ik0_ref[...]
    ik1 = ik1_ref[...]
    ik2 = ik2_ref[...]
    live = live_ref[...]
    i_e = i_ref[...]
    qi = qi_ref[...]
    lane_start = lane_start_ref[...]

    # --- bwt_extend (backward): occ4 at k-1 and k-1+x2 ---------------------
    ck, corr_k = _occ4_counts([_u32(dat_k_ref[j]) for j in range(8)],
                              win_k_ref[...])
    cl, corr_l = _occ4_counts([_u32(dat_l_ref[j]) for j in range(8)],
                              win_l_ref[...])
    sent_k = sent_k_ref[...]
    sent_l = sent_l_ref[...]
    tk = [jnp.where(sent_k != 0, np.int32(0),
                    occ_k_ref[c] + (ck[c] - corr_k if c == 0 else ck[c]))
          for c in range(4)]
    tl = [jnp.where(sent_l != 0, np.int32(0),
                    occ_l_ref[c] + (cl[c] - corr_l if c == 0 else cl[c]))
          for c in range(4)]
    okx2 = [tl[c] - tk[c] for c in range(4)]
    ok_main = [l2[c] + np.int32(1) + tk[c] for c in range(4)]
    add = ((ik0 <= primary) & (ik0 + ik2 - np.int32(1) >= primary))
    ok3 = ik1 + add.astype(jnp.int32)
    okb2 = ok3 + okx2[3]
    okb1 = okb2 + okx2[2]
    okb0 = okb1 + okx2[1]
    ok_oth = [okb0, okb1, okb2, ok3]

    def sel(vs):
        r = vs[3]
        for c in (2, 1, 0):
            r = jnp.where(qi == np.int32(c), vs[c], r)
        return r

    okc0 = sel(ok_main)
    okc1 = sel(ok_oth)
    okc2 = sel(okx2)

    # --- round logic (bwt.c:326-345 == seeding_flat round body) ------------
    has_c = ((i_e >= np.int32(0)) & (qi < np.int32(4))).astype(jnp.int32)
    keeper = live & has_c & (okc2 >= minv_ref[...]).astype(jnp.int32)

    # first live entry of each lane: segmented exclusive count of live == 0
    incl, _ = _seg_scan((live, lane_start), _comb_sum, (0, 0), W)
    first_live = live * ((incl - live) == 0).astype(jnp.int32)

    # emission (bwt.c:331-337): first live entry fails and is not contained
    last_e = last_ref[...]
    not_contained = ((i_e + np.int32(1)) < last_e).astype(jnp.int32)
    emit = first_live * (1 - keeper) * not_contained
    # broadcast the new last_start to the rest of the lane (only entries
    # AFTER the emitter can still be live, so a forward scan suffices)
    seen, _ = _seg_scan((emit, lane_start), _comb_or, (0, 0), W)
    o_last[...] = jnp.where(seen != 0, i_e + np.int32(1), last_e)
    o_emitted[...] = emitted_ref[...] | emit

    # dedup (bwt.c:338): drop keepers whose previous keeper kept the same x2
    kv, kh, _ = _seg_scan((jnp.where(keeper != 0, okc2, np.int32(0)), keeper,
                           lane_start), _comb_last, (0, 0, 0), W)
    ph = _flat_shift1(kh, 0, W)
    pv = _flat_shift1(kv, 0, W)
    ph = jnp.where(lane_start != 0, np.int32(0), ph)
    append = keeper * ((ph == 0) | (okc2 != pv)).astype(jnp.int32)

    app = append != 0
    o_ik0[...] = jnp.where(app, okc0, ik0)
    o_ik1[...] = jnp.where(app, okc1, ik1)
    o_ik2[...] = jnp.where(app, okc2, ik2)
    o_live[...] = append
    o_i[...] = jnp.where(app, i_e - np.int32(1), i_e)


def _round_call(l2p, occ_k, dat_k, win_k, sent_k, occ_l, dat_l, win_l, sent_l,
                qi, lane_start, ik0, ik1, ik2, live, i_e, minv, last_e,
                emitted, *, interpret=False):
    S, W = qi.shape
    shp = jax.ShapeDtypeStruct((S, W), jnp.int32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 19
    return pl.pallas_call(
        _round_kernel,
        out_shape=(shp,) * 7,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * (n_in - 1),
        out_specs=(vspec,) * 7,
        input_output_aliases={11: 0, 12: 1, 13: 2, 14: 3, 15: 4, 17: 5,
                              18: 6},
        interpret=interpret,
    )(l2p, occ_k, dat_k, win_k, sent_k, occ_l, dat_l, win_l, sent_l, qi,
      lane_start, ik0, ik1, ik2, live, i_e, minv, last_e, emitted)


# ---------------------------------------------------------------------------
# the single-shot jitted driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(7, 8))
def backward_full(blocks, l2p, qflat, lane_e, lane_start, state, minv_e,
                  L: int, interpret: bool = False):
    """Run the whole backward pass on device: while(any live) do one fused
    round. blocks: (n_blocks, 12) int32 fused occ+data rows; l2p: (8,) int32
    [L2[0..3], primary, seq_len, 0, 0]; qflat: (NL*L,) int32 base codes;
    lane_e: (E,) int32 entry->lane; lane_start: (8, W) int32;
    state = (ik0, ik1, ik2, live, i_e, last_e, emitted) each (8, W) int32.
    Returns the final state tuple."""
    S, W = lane_start.shape
    E = S * W
    primary = l2p[4]
    n_blocks = blocks.shape[0]

    def gather_pos(pos_flat):
        """pos (E,) -> (occ (4,8,W) i32, data (8,8,W) i32, within, sent)."""
        sent = pos_flat < 0
        p = jnp.where(sent, 0, pos_flat)
        p = p - (p >= primary).astype(jnp.int32)
        blk = jnp.clip(p >> 7, 0, n_blocks - 1)
        within = p & 127
        rows = blocks[blk]  # (E, 12)
        rt = rows.T  # (12, E)
        occ = rt[:4].reshape(4, S, W)
        dat = rt[4:].reshape(8, S, W)
        return (occ, dat, within.reshape(S, W),
                sent.astype(jnp.int32).reshape(S, W))

    def cond(carry):
        r, (ik0, ik1, ik2, live, i_e, last_e, emitted) = carry
        return (r < L + 2) & jnp.any(live != 0)

    def body(carry):
        r, (ik0, ik1, ik2, live, i_e, last_e, emitted) = carry
        i_flat = i_e.reshape(E)
        valid = (i_flat >= 0) & (i_flat < L)
        qoff = lane_e * L + jnp.clip(i_flat, 0, L - 1)
        qi = jnp.where(valid, qflat[qoff], 4).reshape(S, W)
        ik0f = ik0.reshape(E)
        ik2f = ik2.reshape(E)
        kq = ik0f - 1
        occ_k, dat_k, win_k, sent_k = gather_pos(kq)
        occ_l, dat_l, win_l, sent_l = gather_pos(kq + ik2f)
        st = _round_call(l2p, occ_k, dat_k, win_k, sent_k, occ_l, dat_l,
                         win_l, sent_l, qi, lane_start, ik0, ik1, ik2, live,
                         i_e, minv_e, last_e, emitted, interpret=interpret)
        return r + 1, st

    _, st = lax.while_loop(cond, body, (jnp.int32(0), state))
    return st


@functools.partial(jax.jit, static_argnums=(3,))
def pack_emitted(state, info_end, lane_e, E: int):
    """Compact emitted entries to the front: (E, 6) i32 rows
    (ik0, ik1, ik2, start, end, lane) plus the emitted count. Flat entry
    order is lane-contiguous and, within a lane, emission order (the first-
    live slot index is non-decreasing over rounds), so the packed rows are
    exactly run_backward_flat's per-lane emission lists."""
    ik0, ik1, ik2, live, i_e, last_e, emitted = state
    em = emitted.reshape(E)
    order = jnp.argsort(1 - em, stable=True)
    n = jnp.sum(em)
    cols = jnp.stack([ik0.reshape(E), ik1.reshape(E), ik2.reshape(E),
                      i_e.reshape(E) + 1, info_end, lane_e], axis=1)
    return cols[order], n


def run_backward_pallas(fm, qrows_dev, entry_dev, n_lanes, x0_np, minv_np,
                        lane_np, interpret=False):
    """Driver matching seeding_flat.run_backward_flat's contract.

    qrows_dev: (NL, L) uint8; entry_dev: (ik (E,3) i32, info (E,) i32/i64,
    lane (E,) i32, live (E,) bool); lane_np: host copy of the lane array.
    Returns (per-lane mem lists [(x0,x1,x2,info)], overflow (NL,) bool)."""
    import numpy as _np

    ik_d, info_d, lane_d, live_d = entry_dev
    E = int(ik_d.shape[0])
    NL, L = int(qrows_dev.shape[0]), int(qrows_dev.shape[1])
    S = 8
    assert E % S == 0, "capacity must be a multiple of 8"
    W = E // S

    blocks = fm.fused_blocks()
    l2p = jnp.asarray(_np.concatenate(
        [_np.asarray(fm.L2)[:4].astype(_np.int64),
         [fm.primary, fm.seq_len, 0, 0]]).astype(_np.int32))
    qflat = qrows_dev.reshape(-1).astype(jnp.int32)

    lane_start_np = _np.zeros(E, _np.int32)
    lane_start_np[0] = 1
    lane_start_np[1:] = (lane_np[1:] != lane_np[:-1]).astype(_np.int32)
    x0 = x0_np.astype(_np.int32)
    minv = minv_np.astype(_np.int32)

    ik = ik_d.astype(jnp.int32)
    state = (
        ik[:, 0].reshape(S, W), ik[:, 1].reshape(S, W),
        ik[:, 2].reshape(S, W),
        live_d.astype(jnp.int32).reshape(S, W),
        (jnp.asarray(x0)[lane_d] - 1).reshape(S, W),
        jnp.full((S, W), BIG, jnp.int32),
        jnp.zeros((S, W), jnp.int32),
    )
    minv_e = jnp.asarray(minv)[lane_d].reshape(S, W)
    lane_i32 = lane_d.astype(jnp.int32)
    st = backward_full(blocks, l2p, qflat, lane_i32,
                       jnp.asarray(lane_start_np).reshape(S, W), state,
                       minv_e, L, interpret)
    cols, n_d = pack_emitted(st, info_d.astype(jnp.int32), lane_i32, E)
    n = int(n_d)
    out_mems = [[] for _ in range(n_lanes)]
    if n:
        rows = _np.asarray(cols[:n])
        for j in range(n):
            ln = int(rows[j, 5])
            out_mems[ln].append((int(rows[j, 0]), int(rows[j, 1]),
                                 int(rows[j, 2]),
                                 (int(rows[j, 3]) << 32) | int(rows[j, 4])))
    overflow = _np.zeros(n_lanes, bool)
    return out_mems, overflow

"""Scatter-free flat backward SMEM pass.

The flat-queue backward in seeding_flat.py spends most of its per-round time
in TPU scatters (segment_sum for per-lane counts, .at[].set into per-lane
mem buffers, last_start updates). This reformulation keeps ONLY per-entry
state in the loop, eliminating every scatter:

- all active lanes decrement i in lockstep, so a live entry's query position
  is x0[lane] - round (no per-lane i array);
- a lane is active iff it has a live entry (no per-lane active array);
- at most one entry per lane dies as the first-live entry per round; such
  emission CANDIDATES are recorded per-entry with elementwise writes (the
  entry's interval is frozen at death, and its query position i+1 is stored);
  emission order equals position order within the lane, so the sequential
  containment filter (bwt.c:326-345's s != i+1 check via last_start) and the
  mem list reconstruction run on the host over the few pulled candidates.

Differentially tested against the scalar engine via the same contract as
seeding_flat.run_backward_flat.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fmd import DeviceFMIndex
from .seeding_flat import _seg_incl_cumsum, _seg_last_keeper_x2


class FreeState(NamedTuple):
    r: jnp.ndarray  # scalar int32 global round (i = x0e - r)
    ik: jnp.ndarray  # (E, 3)
    info: jnp.ndarray  # (E,) int64
    lane: jnp.ndarray  # (E,) int32 ascending
    live: jnp.ndarray  # (E,) bool
    cand: jnp.ndarray  # (E,) bool — died as first-live (emission candidate)
    cand_i: jnp.ndarray  # (E,) int32 — i+1 at death
    x0e: jnp.ndarray  # (E,) int32 — per-entry copy of the lane's x0
    minve: jnp.ndarray  # (E,) interval dtype


def _round_body(fm: DeviceFMIndex, qrows: jnp.ndarray,
                lane_start: jnp.ndarray, st: FreeState) -> FreeState:
    E = st.ik.shape[0]
    NL, L = qrows.shape
    pos = jnp.arange(E, dtype=jnp.int32)
    i_e = st.x0e - st.r  # query position this round, per entry
    live = st.live
    safe_i = jnp.clip(i_e, 0, L - 1)
    qi = jnp.where((i_e >= 0) & (i_e < L), qrows[st.lane, safe_i],
                   jnp.uint8(4))
    has_c = (i_e >= 0) & (qi < 4)
    c = jnp.clip(qi, 0, 3).astype(jnp.int32)

    ok = fm.extend(st.ik, 1)  # (E, 4, 3)
    okc = ok[pos, c, :]
    keeper = live & has_c & (okc[:, 2] >= st.minve)

    excl_live = _seg_incl_cumsum(live.astype(jnp.int32), lane_start) \
        - live.astype(jnp.int32)
    first_live = live & (excl_live == 0)

    died_first = first_live & ~keeper
    cand = st.cand | died_first
    cand_i = jnp.where(died_first, i_e + 1, st.cand_i)

    # dedup (bwt.c:338): drop a keeper whose previous keeper this round has
    # the same interval size
    ph, pv = _seg_last_keeper_x2(okc[:, 2], keeper, lane_start)
    append = keeper & (~ph | (okc[:, 2] != pv))

    new_ik = jnp.where(append[:, None], okc, st.ik)
    return FreeState(st.r + 1, new_ik, st.info, st.lane, append, cand,
                     cand_i, st.x0e, st.minve)


@functools.partial(jax.jit, static_argnums=(3,))
def free_rounds(fm: DeviceFMIndex, st: FreeState, qrows: jnp.ndarray,
                n_rounds: int) -> FreeState:
    lane_start = jnp.concatenate(
        [jnp.ones(1, bool), st.lane[1:] != st.lane[:-1]])
    return jax.lax.fori_loop(
        0, n_rounds, lambda _, s: _round_body(fm, qrows, lane_start, s), st)


@functools.partial(jax.jit, static_argnums=(3,))
def free_rounds_while(fm: DeviceFMIndex, st: FreeState, qrows: jnp.ndarray,
                      max_rounds: int) -> FreeState:
    lane_start = jnp.concatenate(
        [jnp.ones(1, bool), st.lane[1:] != st.lane[:-1]])
    r0 = st.r

    def cond(s):
        return (s.r - r0 < max_rounds) & jnp.any(s.live)

    return jax.lax.while_loop(
        cond, lambda s: _round_body(fm, qrows, lane_start, s), st)


@functools.partial(jax.jit, static_argnums=(1,))
def compact_free(st: FreeState, newE: int, pad_lane) -> FreeState:
    """Stable compaction keeping live entries AND emission candidates."""
    keep = st.live | st.cand
    order = jnp.argsort(~keep, stable=True)[:newE]
    kept = keep[order]
    lane = jnp.where(kept, st.lane[order], pad_lane).astype(jnp.int32)
    return FreeState(st.r, st.ik[order], st.info[order], lane,
                     st.live[order] & kept, st.cand[order] & kept,
                     st.cand_i[order], st.x0e[order], st.minve[order])


@jax.jit
def _n_keep(st: FreeState):
    return (jnp.sum((st.live | st.cand).astype(jnp.int32)),
            jnp.any(st.live))


def run_backward_free(fm: DeviceFMIndex, qrows_dev, entry_dev, n_lanes: int,
                      x0_np, minv_np):
    """Device-resident scatter-free driver; same contract as
    seeding_flat.run_backward_flat (per-lane mem lists, overflow mask).
    With no per-lane mem buffer there is no M_CAP overflow: the overflow
    mask is all-False."""
    import os

    NL = n_lanes
    idt = fm.np_idt
    ik_d, info_d, lane_d, live_d = entry_dev
    L = qrows_dev.shape[1]

    x0_dev = jnp.asarray(x0_np.astype(np.int32))
    minv_dev = jnp.asarray(minv_np.astype(idt))
    x0e = x0_dev[lane_d]
    minve = minv_dev[lane_d]
    E0 = int(ik_d.shape[0])
    st = FreeState(jnp.int32(1), ik_d, info_d, lane_d, live_d,
                   jnp.zeros(E0, bool), jnp.zeros(E0, jnp.int32), x0e, minve)

    def pad_cap(n):
        c = 256
        while c < n:
            c <<= 2
        return c

    finish_cap = int(os.environ.get("MPIBWA_BWD_FINISH_CAP", "4096"))
    schedule = (2, 2, 4, 8, 16, 32)
    seg_i = 0
    while st.ik.shape[0] > finish_cap:
        st = free_rounds(fm, st, qrows_dev,
                         schedule[min(seg_i, len(schedule) - 1)])
        seg_i += 1
        nk_d, alive_d = _n_keep(st)
        n_keep, alive = int(nk_d), bool(alive_d)  # one sync per segment
        if not alive:
            break
        newE = pad_cap(n_keep)
        if newE < st.ik.shape[0]:
            st = compact_free(st, newE, NL - 1)
    else:
        alive = bool(np.asarray(jnp.any(st.live)))
    if alive:
        st = free_rounds_while(fm, st, qrows_dev, L + 2)

    # pull candidates and reconstruct per-lane mem lists on the host
    cand_np = np.asarray(st.cand)
    sel = np.nonzero(cand_np)[0]
    out_mems = [[] for _ in range(NL)]
    overflow = np.zeros(NL, bool)
    if sel.size:
        lane_np = np.asarray(st.lane[jnp.asarray(sel)])
        ik_np = np.asarray(st.ik[jnp.asarray(sel)])
        info_np = np.asarray(st.info[jnp.asarray(sel)])
        ci_np = np.asarray(st.cand_i[jnp.asarray(sel)])
        last_start = {}
        # sel is position-ascending = per-lane emission order
        for k in range(sel.size):
            ln = int(lane_np[k])
            start = int(ci_np[k])
            if start < last_start.get(ln, 1 << 62):
                last_start[ln] = start
                info_val = int(info_np[k]) | (start << 32)
                out_mems[ln].append((int(ik_np[k, 0]), int(ik_np[k, 1]),
                                     int(ik_np[k, 2]), info_val))
    return out_mems, overflow

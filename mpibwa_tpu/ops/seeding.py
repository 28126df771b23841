"""Batched SMEM seeding automata (device, JAX).

Re-expression of mem_collect_intv's three passes (bwamem.c:114-162) as
lockstep batched automata:

- Forward pass (bwt_smem1a forward loop, bwt.c:304-321, max_intv==0): one
  interval-extension step per iteration for a whole batch of reads. Because
  bwt_smem1's return value (the next start position) is the info of the LAST
  interval pushed by the forward loop, the chained sequence of per-read
  smem1 calls is determined by forward extension alone — the backward phase
  never feeds back into it. This is what makes the two-phase batching exact.
- Backward pass (bwt.c:326-345): lanes are (read, call) pairs; each step
  extends the whole surviving interval list of every lane at once. The C
  inner j-loop collapses to vector ops: a mem is emitted iff the FIRST
  (longest-match) entry fails extension, and the surviving list is the
  extension results with consecutive duplicate sizes collapsed.
- Pass 3 (bwt_seed_strategy1, bwt.c:358-379): forward-only automaton.

Fixed-capacity buffers with overflow flags; overflowing reads fall back to
the scalar host path (exactness preserved, rare in practice).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .fmd import DeviceFMIndex

F_CAP = 192  # max forward-pushed intervals per read (all calls)
C_CAP = 48  # max smem1 calls per read
P_CAP = 16  # fast-tier interval width for the backward step (99%+ of calls)
P_BIG = 48  # wide tier for repeat-rich calls; beyond this -> host fallback
M_CAP = 64  # max mems per (read, call)
S3_CAP = 24  # max pass-3 seeds per read


class FwdOut(NamedTuple):
    ivals: jnp.ndarray  # (B, F_CAP, 3) int64 pushed intervals
    infos: jnp.ndarray  # (B, F_CAP) int32 pushed info (end position)
    call_of: jnp.ndarray  # (B, F_CAP) int32 which call pushed it
    n_pushed: jnp.ndarray  # (B,) int32
    call_x: jnp.ndarray  # (B, C_CAP) int32 start of each call
    call_start: jnp.ndarray  # (B, C_CAP) int32 index of first push
    call_len: jnp.ndarray  # (B, C_CAP) int32 number of pushes
    n_calls: jnp.ndarray  # (B,) int32
    overflow: jnp.ndarray  # (B,) bool


@functools.partial(jax.jit, static_argnums=(4,))
def forward_pass(fm: DeviceFMIndex, q: jnp.ndarray, lens: jnp.ndarray,
                 min_intv: jnp.ndarray, chain: bool = True,
                 starts: jnp.ndarray = None) -> FwdOut:
    """Run chained (pass 1) or single (pass 2) smem1 forward loops.

    q: (B, L) uint8 nt4 codes (pad >= 4); lens: (B,) int32;
    min_intv: (B,) int64; starts: (B,) int32 initial x (default 0).
    chain=True: after each call, continue from the returned position
    (mem_collect_intv pass-1 loop); chain=False: exactly one call per lane.

    Internals run in (8, W) layout — the v8 backward lesson: (B,)
    elementwise maps to one VPU sublane row while (8, W) uses all eight —
    with the push buffers FLAT (Bp*F_CAP) and every update a pure
    drop-mode scatter so XLA mutates the donated loop buffers in place.
    The returned FwdOut is reshaped to the documented (B, ...) contract.
    """
    B, L = q.shape
    if starts is None:
        starts = jnp.zeros(B, dtype=jnp.int32)

    SEEK, EXT, DONE = 0, 1, 2
    S = 8
    Bp = ((B + S - 1) // S) * S
    W = Bp // S
    pad = Bp - B

    def pad1(x, fill=0):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(S, W)

    qflat = q.reshape(-1).astype(jnp.int32)
    lens2 = pad1(lens.astype(jnp.int32))  # pad lanes: len 0 -> DONE round 1
    minv2 = pad1(min_intv.astype(fm.idt), 1)
    row2d = jnp.arange(Bp, dtype=jnp.int32).reshape(S, W)
    OUT_F = np.int32(Bp * F_CAP)  # drop sentinel for flat push scatters
    OUT_C = np.int32(Bp * C_CAP)

    state = dict(
        x=pad1(starts.astype(jnp.int32)),
        kind=jnp.full((S, W), SEEK, jnp.int32),
        ik0=jnp.zeros((S, W), fm.idt),
        ik1=jnp.zeros((S, W), fm.idt),
        ik2=jnp.zeros((S, W), fm.idt),
        info=jnp.zeros((S, W), jnp.int32),
        i=jnp.zeros((S, W), jnp.int32),
        ivals=jnp.zeros((Bp * F_CAP, 3), fm.idt),
        infos=jnp.zeros(Bp * F_CAP, jnp.int32),
        call_of=jnp.full(Bp * F_CAP, -1, jnp.int32),
        n_pushed=jnp.zeros((S, W), jnp.int32),
        call_x=jnp.zeros(Bp * C_CAP, jnp.int32),
        call_start=jnp.zeros(Bp * C_CAP, jnp.int32),
        call_len=jnp.zeros(Bp * C_CAP, jnp.int32),
        n_calls=jnp.zeros((S, W), jnp.int32),
        overflow=jnp.zeros((S, W), bool),
    )

    def qat(pos):
        safe = jnp.clip(pos, 0, L - 1)
        idx = jnp.minimum(row2d * np.int32(L) + safe, np.int32(B * L - 1))
        ok = (pos >= 0) & (pos < L) & (row2d < np.int32(B))
        return jnp.where(ok, qflat[idx], np.int32(4))

    def push(st, do):
        """Append current ik/info for lanes where do is True (pure
        drop-mode scatters; an overflowing push is dropped — the lane is
        overflow-flagged and falls back to the exact scalar engine)."""
        can = do & (st["n_pushed"] < F_CAP)
        ov = do & (st["n_pushed"] >= F_CAP)
        fidx = jnp.where(can, row2d * np.int32(F_CAP) + st["n_pushed"],
                         OUT_F).reshape(-1)
        vals = jnp.stack([st["ik0"], st["ik1"], st["ik2"]],
                         axis=-1).reshape(-1, 3)
        st = dict(
            st,
            ivals=st["ivals"].at[fidx].set(vals, mode="drop"),
            infos=st["infos"].at[fidx].set(st["info"].reshape(-1),
                                           mode="drop"),
            call_of=st["call_of"].at[fidx].set(
                (st["n_calls"] - 1).reshape(-1), mode="drop"),
            n_pushed=st["n_pushed"] + do.astype(jnp.int32),
            overflow=st["overflow"] | ov,
        )
        cidx = jnp.where(
            do,
            row2d * np.int32(C_CAP)
            + jnp.minimum(st["n_calls"] - 1, C_CAP - 1),
            OUT_C).reshape(-1)
        st["call_len"] = st["call_len"].at[cidx].add(np.int32(1),
                                                     mode="drop")
        return st

    def end_call(st, do):
        """Call finished: last pushed info is the return; chain or stop."""
        last = jnp.maximum(st["n_pushed"] - 1, 0)
        gidx = row2d * np.int32(F_CAP) + jnp.minimum(last, F_CAP - 1)
        ret = st["infos"][gidx]
        if chain:
            new_x = jnp.where(do, ret, st["x"])
            new_kind = jnp.where(do, SEEK, st["kind"])
        else:
            new_x = st["x"]
            new_kind = jnp.where(do, DONE, st["kind"])
        return dict(st, x=new_x, kind=new_kind)

    def body(st):
        kind, x = st["kind"], st["x"]
        seek = kind == SEEK

        # --- seek step ---
        qx = qat(x)
        fin = seek & (x >= lens2)
        amb = seek & ~fin & (qx > 3)
        beg = seek & ~fin & ~amb
        call_ov = beg & (st["n_calls"] >= C_CAP)
        beg = beg & ~call_ov
        if not chain:
            # single-call mode: an ambiguous start yields no mems (bwt.c:296)
            fin = fin | amb
            amb = amb & False
        st = dict(st, overflow=st["overflow"] | call_ov,
                  kind=jnp.where(fin | call_ov, DONE, st["kind"]),
                  x=jnp.where(amb, x + 1, st["x"]))
        # begin call (beg excludes n_calls >= C_CAP: in-range iff beg)
        cidx = jnp.where(
            beg, row2d * np.int32(C_CAP) + jnp.minimum(st["n_calls"],
                                                       C_CAP - 1),
            OUT_C).reshape(-1)
        st["call_x"] = st["call_x"].at[cidx].set(x.reshape(-1), mode="drop")
        st["call_start"] = st["call_start"].at[cidx].set(
            st["n_pushed"].reshape(-1), mode="drop")
        st["n_calls"] = st["n_calls"] + beg.astype(jnp.int32)
        ik0n = fm.set_intv(jnp.clip(qx, 0, 3))  # (8, W, 3)
        st["ik0"] = jnp.where(beg, ik0n[..., 0], st["ik0"])
        st["ik1"] = jnp.where(beg, ik0n[..., 1], st["ik1"])
        st["ik2"] = jnp.where(beg, ik0n[..., 2], st["ik2"])
        st["info"] = jnp.where(beg, x + 1, st["info"])
        st["i"] = jnp.where(beg, x + 1, st["i"])
        st["kind"] = jnp.where(beg, EXT, st["kind"])

        # --- extend step (one forward base for lanes in EXT) ---
        kind, i = st["kind"], st["i"]
        ext = kind == EXT
        at_end = ext & (i >= lens2)
        qi = qat(i)
        amb_i = ext & ~at_end & (qi > 3)
        do_ext = ext & ~at_end & ~amb_i
        # known-base extension: ONLY the consumed bwt_extend row
        # (extend1_fwd) — one 4-wide O2 row gather per step instead of
        # extend()'s two 8-word OCC16 rows + the (…, 4, 3) select
        cb = (3 - jnp.clip(qi, 0, 3)).astype(jnp.int32)
        nk0, nk1, ns = fm.extend1_fwd(st["ik0"], st["ik1"], st["ik2"], cb)
        changed = ns != st["ik2"]
        too_small = ns < minv2
        # pushes: end-of-read, ambiguous, or size change
        push_now = at_end | amb_i | (do_ext & changed)
        st = push(st, push_now)
        # call terminations
        term = at_end | amb_i | (do_ext & changed & too_small)
        st = end_call(st, term)
        # advance for continuing lanes
        go_on = do_ext & ~(changed & too_small)
        st["ik0"] = jnp.where(go_on, nk0, st["ik0"])
        st["ik1"] = jnp.where(go_on, nk1, st["ik1"])
        st["ik2"] = jnp.where(go_on, ns, st["ik2"])
        st["info"] = jnp.where(go_on, i + 1, st["info"])
        st["i"] = jnp.where(go_on, i + 1, st["i"])
        return st

    def cond(st):
        return jnp.any(st["kind"] != DONE)

    state = jax.lax.while_loop(cond, body, state)
    return FwdOut(state["ivals"].reshape(Bp, F_CAP, 3)[:B],
                  state["infos"].reshape(Bp, F_CAP)[:B],
                  state["call_of"].reshape(Bp, F_CAP)[:B],
                  state["n_pushed"].reshape(Bp)[:B],
                  state["call_x"].reshape(Bp, C_CAP)[:B],
                  state["call_start"].reshape(Bp, C_CAP)[:B],
                  state["call_len"].reshape(Bp, C_CAP)[:B],
                  state["n_calls"].reshape(Bp)[:B],
                  state["overflow"].reshape(Bp)[:B])


class BwdOut(NamedTuple):
    mems: jnp.ndarray  # (N, M_CAP, 3) idt — mems emitted THIS segment
    mem_infos: jnp.ndarray  # (N, M_CAP) int64 (start<<32 | end)
    n_mems: jnp.ndarray  # (N,) int32
    overflow: jnp.ndarray  # (N,) bool
    i: jnp.ndarray  # (N,) int32 resumable position
    prev: jnp.ndarray  # (N, P, 3) surviving intervals
    prev_info: jnp.ndarray  # (N, P) int64
    n_prev: jnp.ndarray  # (N,) int32
    last_start: jnp.ndarray  # (N,) int64
    active: jnp.ndarray  # (N,) bool


@functools.partial(jax.jit, static_argnums=(8,))
def backward_segment(fm: DeviceFMIndex, qrows: jnp.ndarray, prev: jnp.ndarray,
                     prev_info: jnp.ndarray, n_prev: jnp.ndarray,
                     i0: jnp.ndarray, min_intv: jnp.ndarray,
                     last_start: jnp.ndarray, max_steps: int) -> BwdOut:
    """Run up to max_steps backward iterations for N (read, call) lanes.

    Lanes die at different times; the caller compacts survivors between
    segments so dead lanes stop consuming lockstep compute. qrows: (N, L)
    uint8; prev: (N, P, 3) idt reversed-push-order forward intervals;
    i0: (N,) the next backward position; last_start: (N,) the containment
    guard state (1<<62 when no mem emitted yet)."""
    N, L = qrows.shape
    P = prev.shape[1]
    rows = jnp.arange(N)
    lanes = jnp.arange(P)

    state = dict(
        i=i0.astype(jnp.int32),
        prev=prev.astype(fm.idt), prev_info=prev_info,
        n_prev=n_prev.astype(jnp.int32),
        mems=jnp.zeros((N, M_CAP, 3), fm.idt),
        mem_infos=jnp.zeros((N, M_CAP), jnp.int64),
        n_mems=jnp.zeros(N, jnp.int32),
        last_start=last_start.astype(jnp.int64),
        active=n_prev > 0,
        overflow=jnp.zeros(N, bool),
        steps=jnp.int32(0),
    )

    def body(st):
        i = st["i"]
        act = st["active"]
        safe_i = jnp.clip(i, 0, L - 1)
        qi = jnp.where((i >= 0) & (i < L), qrows[rows, safe_i], jnp.uint8(4))
        has_c = (i >= 0) & (qi < 4)
        c = jnp.clip(qi, 0, 3).astype(jnp.int32)

        live = lanes[None, :] < st["n_prev"][:, None]  # (N, P)
        ok = fm.extend(st["prev"], 1)  # (N, P, 4, 3)
        okc = ok[rows[:, None], lanes[None, :], c[:, None], :]  # (N, P, 3)
        keeper = live & has_c[:, None] & (okc[:, :, 2] >= min_intv[:, None])

        # mem emission: the first (longest-match) entry fails -> push prev[0]
        first_fails = act & live[:, 0] & ~keeper[:, 0]
        not_contained = (i + 1) < st["last_start"]
        emit = first_fails & not_contained
        midx = jnp.minimum(st["n_mems"], M_CAP - 1)
        mem_ov = emit & (st["n_mems"] >= M_CAP)
        info = st["prev_info"][:, 0] | ((i + 1).astype(jnp.int64) << 32)
        st["mems"] = st["mems"].at[rows, midx].set(
            jnp.where(emit[:, None], st["prev"][:, 0], st["mems"][rows, midx]))
        st["mem_infos"] = st["mem_infos"].at[rows, midx].set(
            jnp.where(emit, info, st["mem_infos"][rows, midx]))
        st["n_mems"] = st["n_mems"] + emit.astype(jnp.int32)
        st["last_start"] = jnp.where(emit, (i + 1).astype(jnp.int64),
                                     st["last_start"])
        st["overflow"] = st["overflow"] | mem_ov

        # survivors: keepers with consecutive duplicate sizes collapsed
        kidx = jnp.where(keeper, lanes[None, :], -1)
        prev_kidx = jax.lax.associative_scan(jnp.maximum, kidx, axis=1)
        prev_kidx = jnp.concatenate(
            [jnp.full((N, 1), -1), prev_kidx[:, :-1]], axis=1)
        prev_size = jnp.take_along_axis(
            okc[:, :, 2], jnp.maximum(prev_kidx, 0), axis=1)
        append = keeper & ((prev_kidx < 0) | (okc[:, :, 2] != prev_size))
        pos = jnp.cumsum(append.astype(jnp.int32), axis=1) - 1
        n_new = append.sum(axis=1).astype(jnp.int32)
        new_prev = jnp.zeros_like(st["prev"])
        new_info = jnp.zeros_like(st["prev_info"])
        scatter_pos = jnp.where(append, pos, P)  # P = dropped
        new_prev = new_prev.at[rows[:, None], scatter_pos].set(okc, mode="drop")
        new_info = new_info.at[rows[:, None], scatter_pos].set(
            st["prev_info"], mode="drop")

        cont = act & (n_new > 0)
        st["prev"] = jnp.where(cont[:, None, None], new_prev, st["prev"])
        st["prev_info"] = jnp.where(cont[:, None], new_info, st["prev_info"])
        st["n_prev"] = jnp.where(cont, n_new, st["n_prev"])
        st["active"] = cont & (i >= 0)
        st["i"] = jnp.where(st["active"], i - 1, i)
        st["steps"] = st["steps"] + 1
        return st

    def cond(st):
        return jnp.any(st["active"]) & (st["steps"] < max_steps)

    state = jax.lax.while_loop(cond, body, state)
    return BwdOut(state["mems"], state["mem_infos"], state["n_mems"],
                  state["overflow"], state["i"], state["prev"],
                  state["prev_info"], state["n_prev"], state["last_start"],
                  state["active"])


def run_backward(fm: DeviceFMIndex, qrows_np, prev_np, prev_info_np, n_prev_np,
                 x0_np, min_intv_np, seg_steps: int = 12):
    """Segmented backward driver with host compaction of dead lanes.

    Returns (per-lane mem lists in emission order, overflow mask) for the
    ORIGINAL lane indexing. numpy inputs; lanes beyond real count must have
    n_prev == 0."""
    import numpy as np

    N0 = len(n_prev_np)
    out_mems = [[] for _ in range(N0)]
    overflow = np.zeros(N0, bool)
    lane_ids = np.arange(N0)
    qrows, prev, prev_info = qrows_np, prev_np, prev_info_np
    n_prev = n_prev_np
    i_cur = x0_np.astype(np.int32) - 1
    last_start = np.full(N0, 1 << 62, np.int64)
    minv = min_intv_np
    while True:
        live = n_prev > 0
        if not live.any():
            break
        # compact
        sel = np.nonzero(live)[0]
        pad = 1 << max(4, (len(sel) - 1).bit_length())
        idxs = np.concatenate([sel, np.zeros(pad - len(sel), np.int64)])
        padmask = np.arange(pad) < len(sel)
        seg = backward_segment(
            fm, jnp.asarray(qrows[idxs]), jnp.asarray(prev[idxs]),
            jnp.asarray(prev_info[idxs]),
            jnp.asarray(np.where(padmask, n_prev[idxs], 0)),
            jnp.asarray(np.where(padmask, i_cur[idxs], -1)),
            jnp.asarray(minv[idxs]), jnp.asarray(last_start[idxs]), seg_steps)
        mems = np.asarray(seg.mems)
        infos = np.asarray(seg.mem_infos)
        nm = np.asarray(seg.n_mems)
        ov = np.asarray(seg.overflow)
        for ln in range(len(sel)):
            oid = lane_ids[sel[ln]]
            for j in range(nm[ln]):
                out_mems[oid].append((int(mems[ln, j, 0]), int(mems[ln, j, 1]),
                                      int(mems[ln, j, 2]), int(infos[ln, j])))
            if ov[ln]:
                overflow[oid] = True
        # write back survivor state into the original-slot arrays
        qrows = qrows[idxs]
        prev = np.asarray(seg.prev)
        prev_info = np.asarray(seg.prev_info)
        act = np.asarray(seg.active)
        n_prev = np.where(act & padmask, np.asarray(seg.n_prev), 0)
        i_cur = np.asarray(seg.i)
        last_start = np.asarray(seg.last_start)
        minv = minv[idxs]
        lane_ids = lane_ids[idxs]
    return out_mems, overflow


class Pass3Out(NamedTuple):
    seeds: jnp.ndarray  # (B, S3_CAP, 3) int64
    infos: jnp.ndarray  # (B, S3_CAP) int64
    n_seeds: jnp.ndarray  # (B,) int32
    overflow: jnp.ndarray  # (B,) bool


@functools.partial(jax.jit, static_argnums=(3, 4))
def pass3(fm: DeviceFMIndex, q: jnp.ndarray, lens: jnp.ndarray,
          min_seed_len: int, max_intv: int) -> Pass3Out:
    """bwt_seed_strategy1 sweep (mem_collect_intv 3rd pass)."""
    B, L = q.shape
    rows = jnp.arange(B)
    SEEK, EXT, DONE = 0, 1, 2

    state = dict(
        x=jnp.zeros(B, jnp.int32), i=jnp.zeros(B, jnp.int32),
        kind=jnp.full(B, SEEK, jnp.int32),
        ik=jnp.zeros((B, 3), fm.idt),
        seeds=jnp.zeros((B, S3_CAP, 3), fm.idt),
        infos=jnp.zeros((B, S3_CAP), jnp.int64),
        n=jnp.zeros(B, jnp.int32),
        overflow=jnp.zeros(B, bool),
    )

    def qat(pos):
        safe = jnp.clip(pos, 0, L - 1)
        return jnp.where((pos >= 0) & (pos < L), q[rows, safe], jnp.uint8(4))

    def body(st):
        x, i, kind = st["x"], st["i"], st["kind"]
        seek = kind == SEEK
        qx = qat(x)
        fin = seek & (x >= lens)
        amb = seek & ~fin & (qx > 3)
        beg = seek & ~fin & ~amb
        st = dict(st, kind=jnp.where(fin, DONE, kind),
                  x=jnp.where(amb, x + 1, x))
        ik0 = fm.set_intv(jnp.clip(qx, 0, 3).astype(jnp.int32))
        st["ik"] = jnp.where(beg[:, None], ik0, st["ik"])
        st["i"] = jnp.where(beg, st["x"] + 1, st["i"])
        st["kind"] = jnp.where(beg, EXT, st["kind"])

        kind, i = st["kind"], st["i"]
        ext = kind == EXT
        end_of_read = ext & (i >= lens)  # loop ran off: return len, done
        qi = qat(i)
        amb_i = ext & ~end_of_read & (qi > 3)  # return i+1 -> next x
        do = ext & ~end_of_read & ~amb_i
        c = (3 - jnp.clip(qi, 0, 3)).astype(jnp.int32)
        nk0, nk1, ns = fm.extend1_fwd(st["ik"][:, 0], st["ik"][:, 1],
                                      st["ik"][:, 2], c)
        okc = jnp.stack([nk0, nk1, ns], axis=-1)
        hit = do & (okc[:, 2] < max_intv) & ((i - st["x"]) >= min_seed_len)
        # emit seed when hit & size > 0
        emit = hit & (okc[:, 2] > 0)
        sidx = jnp.minimum(st["n"], S3_CAP - 1)
        ov = emit & (st["n"] >= S3_CAP)
        info = (st["x"].astype(jnp.int64) << 32) | (i + 1).astype(jnp.int64)
        st["seeds"] = st["seeds"].at[rows, sidx].set(
            jnp.where(emit[:, None], okc, st["seeds"][rows, sidx]))
        st["infos"] = st["infos"].at[rows, sidx].set(
            jnp.where(emit, info, st["infos"][rows, sidx]))
        st["n"] = st["n"] + emit.astype(jnp.int32)
        st["overflow"] = st["overflow"] | ov

        st["kind"] = jnp.where(end_of_read, DONE, st["kind"])
        nxt = amb_i | hit
        st["x"] = jnp.where(nxt, i + 1, st["x"])
        st["kind"] = jnp.where(nxt, SEEK, st["kind"])
        go_on = do & ~hit
        st["ik"] = jnp.where(go_on[:, None], okc, st["ik"])
        st["i"] = jnp.where(go_on, i + 1, st["i"])
        return st

    def cond(st):
        return jnp.any(st["kind"] != DONE)

    state = jax.lax.while_loop(cond, body, state)
    return Pass3Out(state["seeds"], state["infos"], state["n"], state["overflow"])

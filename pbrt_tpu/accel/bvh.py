"""Bounding volume hierarchy over the triangle soup — TPU-native LBVH.

Replaces the role of the reference HLBVH (accelerator/hlbvh.cu:172 build,
:407-516 traversal; hlbvh.h:76-101 interface), redesigned for XLA:

Build (host, numpy, scene-compile time — build is precompute, not the metric,
matching SURVEY §7 Phase 1):
  - triangles are sorted by the 30-bit morton code of their centroid
    (reference hlbvh.cu:229 hlbvh_compute_morton_code) and PHYSICALLY
    reordered so BVH leaves are contiguous runs;
  - the soup is padded to P * K triangles (P a power of two) with degenerate
    never-hit triangles, giving exactly P leaves of exactly K prims;
  - the tree is the IMPLICIT complete binary tree over the P morton-ordered
    chunks: children of node i live at 2i+1 / 2i+2, leaves are node ids
    >= P-1. A median split in morton order is the LBVH topology minus the
    variable-depth radix splits.

Memory layout is dictated by measured TPU gather behavior
(tools/bench_gather.py on v5e: random row gathers cost ~1 ms per 256k rows
REGARDLESS of row width 4..64 f32): everything a traversal step needs is
packed into ONE wide row —
  - `nodes` (P-1, 12): both children's bounds in the PARENT row
    [lmin lmax rmin rmax], so an internal step is a single gather;
  - `leaf_tris` (P, K*9): all K triangles of a chunk in one row, so a leaf
    step is a single gather.

Traversal (device, jit):
  - vectorized over rays; per-ray state = current node + fixed-size stack
    (depth = log2(P), known statically from the array shapes);
  - near-child-first ordering + t_best shrinkage, like hlbvh.cu:459-516's
    Stack<int,128> loop, but as a `lax.while_loop` over dense lanes, with a
    hard iteration bound so a traversal bug degrades instead of wedging the
    chip watchdog;
  - the loop returns only the DISCRETE winner (prim index); the
    differentiable hit record is recomputed outside the loop with one
    per-lane watertight test against tri_p0/p1/p2. Reverse-mode AD cannot
    cross a while_loop, so every loop input is stop_gradient'ed — the refit
    restores the full gradient path through the winning primitive.
"""
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.utils.math import INFINITY, encode_morton3, gamma
from pbrt_tpu.geometry import intersect as ix

# Leaf size: each leaf holds exactly K morton-consecutive triangles; one
# leaf visit costs one row gather + K masked watertight tests. Bigger K
# shrinks the tree and (critically, for masked-dense execution) the WORST
# lane's visit count — silhouette-grazing rays cross O(sqrt(T)/K) leaf
# cells and every extra iteration runs on all lanes. Env-overridable for
# tuning (tools/bench_bvh.py).
import os as _os

LEAF_K = int(_os.environ.get("PBRT_TPU_BVH_LEAF_K", "4"))
# Scenes below this triangle count use the dense all-pairs kernel instead.
MIN_TRIS_FOR_BVH = 64


class BvhBuild(NamedTuple):
    """Host-side build result."""

    rows: np.ndarray       # (2P-1, max(12, K*9)) f32 — ONE table: internal
                           # row i = [lmin lmax rmin rmax pad...], leaf row
                           # P-1+c = [p0 p1 p2] x K of chunk c. A traversal
                           # step is then a single wide gather whether the
                           # lane is at an internal node or a leaf.
    perm: np.ndarray       # (T,) original-index of sorted triangle i
    n_padded: int          # T rounded up to P * K


def build_bvh(p0, p1, p2, leaf_k=LEAF_K):
    """Build the implicit LBVH over triangles (T, 3)x3 -> BvhBuild.

    The caller must reorder all per-triangle scene columns by `perm` and pad
    them to `n_padded` rows (degenerate rows: all three vertices equal never
    pass the watertight test).
    """
    T = p0.shape[0]
    cent = (p0 + p1 + p2) / 3.0
    lo = cent.min(0)
    hi = cent.max(0)
    extent = np.maximum(hi - lo, 1e-30)
    # 10 bits per dimension (reference hlbvh.cu MORTON_SCALE 1<<10)
    q = np.clip(((cent - lo) / extent) * 1023.0, 0.0, 1023.0).astype(np.uint32)
    codes = encode_morton3(q[:, 0], q[:, 1], q[:, 2])
    perm = np.argsort(codes, kind="stable").astype(np.int32)

    n_chunks = -(-T // leaf_k)
    P = 1 << max(0, int(np.ceil(np.log2(max(n_chunks, 1)))))
    n_padded = P * leaf_k

    def pad(v):
        out = np.zeros((n_padded, 3), np.float32)
        out[:T] = v[perm]
        return out

    sp0, sp1, sp2 = pad(p0), pad(p1), pad(p2)
    leaf_tris = np.concatenate([sp0, sp1, sp2], axis=1)          # (TP, 9)
    leaf_tris = leaf_tris.reshape(P, leaf_k * 9).astype(np.float32)

    BIG = np.float32(3e38)
    tri_lo = np.minimum(np.minimum(sp0, sp1), sp2)
    tri_hi = np.maximum(np.maximum(sp0, sp1), sp2)
    # padding rows get inverted boxes so they never enlarge a leaf; the slab
    # test rejects inverted boxes explicitly
    tri_lo[T:] = BIG
    tri_hi[T:] = -BIG

    n_nodes = 2 * P - 1
    node_min = np.full((n_nodes, 3), BIG, np.float32)
    node_max = np.full((n_nodes, 3), -BIG, np.float32)
    node_min[P - 1:] = tri_lo.reshape(P, leaf_k, 3).min(1)
    node_max[P - 1:] = tri_hi.reshape(P, leaf_k, 3).max(1)
    level_start = P - 1
    while level_start > 0:
        parent_start = (level_start - 1) // 2
        n_par = level_start - parent_start
        kids_min = node_min[2 * parent_start + 1: 2 * parent_start + 1 + 2 * n_par]
        kids_max = node_max[2 * parent_start + 1: 2 * parent_start + 1 + 2 * n_par]
        node_min[parent_start:level_start] = np.minimum(
            kids_min[0::2], kids_min[1::2]
        )
        node_max[parent_start:level_start] = np.maximum(
            kids_max[0::2], kids_max[1::2]
        )
        level_start = parent_start

    # pack both children's bounds into the parent row; unify with the leaf
    # rows into one table so every traversal step is exactly one gather
    n_int = P - 1
    i = np.arange(n_int)
    nodes = np.concatenate(
        [
            node_min[2 * i + 1], node_max[2 * i + 1],
            node_min[2 * i + 2], node_max[2 * i + 2],
        ],
        axis=1,
    ).astype(np.float32) if n_int else np.zeros((0, 12), np.float32)
    W = max(12, leaf_k * 9)
    rows = np.zeros((2 * P - 1, W), np.float32)
    rows[:n_int, :12] = nodes
    rows[n_int:, : leaf_k * 9] = leaf_tris

    return BvhBuild(
        rows=rows,
        perm=perm,
        n_padded=n_padded,
    )


# --------------------------------------------------------------- traversal


def _safe_inv(d):
    """1/d that never emits 0*inf = NaN in the slab test."""
    tiny = 1e-30
    mag = jnp.maximum(jnp.abs(d), tiny)
    return jnp.where(d < 0, -1.0, 1.0) / mag


def _slab(o, inv_d, nmin, nmax, t_best):
    """Robust AABB slab test (reference Bounds3f::fast_intersect used at
    hlbvh.cu:429,485). Returns (t_near, hit)."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tf = tf * (1.0 + 2.0 * gamma(3))
    tn = jnp.maximum(tn, 0.0)
    # the per-axis min/max swap would silently "repair" an INVERTED (empty
    # padding) box, sending every ray through every fake subtree — reject
    # them explicitly (padding inverts all axes; one is enough to test)
    nonempty = nmin[..., 0] <= nmax[..., 0]
    hit = nonempty & (tn <= tf) & (tf > 0.0) & (tn < t_best)
    return tn, hit


_DONE = jnp.int32(-1)


class _St(NamedTuple):
    cur: jnp.ndarray      # (R,) node id or _DONE
    sp: jnp.ndarray       # (R,) stack pointer
    stack: jnp.ndarray    # (R, depth)
    t_best: jnp.ndarray   # (R,)
    prim: jnp.ndarray     # (R,)
    it: jnp.ndarray       # () iteration counter (stage cap / safety bound)


def _traverse(rows, leaf_k, o, d, t_max, any_hit=False):
    """Stack-based traversal over the implicit tree.

    rows: (2P-1, max(12, K*9)) unified node/leaf table.  o, d: (R, 3);
    t_max: (R,). Returns (t (R,), prim (R,) i32, -1 on miss). Discrete only
    — call intersect_tri_lanes on the winner for the differentiable record.
    """
    n_nodes = rows.shape[0]
    P = (n_nodes + 1) // 2
    n_int = P - 1
    K = leaf_k
    depth = max(1, int(np.log2(P)) + 1)
    R = o.shape[0]

    # the whole traversal is non-differentiable (discrete hit id); detach
    # every input so AD never tries to transpose the while_loop
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    rows = jax.lax.stop_gradient(rows)

    inv_d = _safe_inv(d)

    st = _St(
        cur=jnp.zeros((R,), jnp.int32),  # start at the root (internal)
        sp=jnp.zeros((R,), jnp.int32),
        stack=jnp.zeros((R, depth), jnp.int32),
        t_best=t_max,
        prim=jnp.full((R,), -1, jnp.int32),
        it=jnp.int32(0),
    )

    slot_ids = jnp.arange(depth, dtype=jnp.int32)
    # a single ray visits each node at most once; anything past 2 * #nodes
    # is a traversal bug — terminate rather than wedge the chip's watchdog
    max_iters = jnp.int32(2 * (2 * P - 1) + 8)

    def make_cond(cap):
        def cond(st):
            return jnp.any(st.cur != _DONE) & (st.it < cap)
        return cond

    def make_body(o, d, inv_d):
        def body(st):
            live = st.cur != _DONE
            cur = jnp.maximum(st.cur, 0)
            is_leaf = live & (cur >= n_int)

            # ---- ONE gather serves both cases: internal bounds or leaf tris
            row = rows[cur]                              # (R, W)
            t_best, prim = st.t_best, st.prim
            chunk = jnp.clip(cur - n_int, 0, P - 1)
            for k in range(K):
                p0 = row[:, k * 9: k * 9 + 3]
                p1 = row[:, k * 9 + 3: k * 9 + 6]
                p2 = row[:, k * 9 + 6: k * 9 + 9]
                t_k, _, hit_k = ix.intersect_tri_lanes(o, d, t_best, p0, p1, p2)
                better = is_leaf & hit_k & (t_k < t_best)
                t_best = jnp.where(better, t_k, t_best)
                prim = jnp.where(better, chunk * K + k, prim)

            found = prim >= 0

            # ---- internal: the same row holds both children's bounds
            tn_l, hit_l = _slab(o, inv_d, row[:, 0:3], row[:, 3:6], t_best)
            tn_r, hit_r = _slab(o, inv_d, row[:, 6:9], row[:, 9:12], t_best)
            l = 2 * cur + 1
            r = l + 1
            is_int = live & ~is_leaf
            hit_l &= is_int
            hit_r &= is_int
            l_near = tn_l <= tn_r
            near = jnp.where(l_near, l, r)
            far = jnp.where(l_near, r, l)
            hit_near = jnp.where(l_near, hit_l, hit_r)
            hit_far = jnp.where(l_near, hit_r, hit_l)
            both = hit_near & hit_far

            # push far where both children hit (per-lane one-hot scatter)
            stack = jnp.where(
                (slot_ids[None, :] == st.sp[:, None]) & both[:, None],
                far[:, None],
                st.stack,
            )
            sp = st.sp + both.astype(jnp.int32)

            # next node: descend if any child hit, else pop
            descend = hit_near | hit_far
            go = jnp.where(hit_near, near, far)
            need_pop = live & (is_leaf | ~descend)
            if any_hit:
                # terminated lanes (shadow hit found) never pop again
                need_pop &= ~found
            can_pop = need_pop & (sp > 0)
            sp_pop = jnp.maximum(sp - 1, 0)
            # select, not gather: a take_along_axis here costs a full
            # scalar-unit pass per iteration; a where-chain is VPU-free
            popped = jnp.sum(
                jnp.where(slot_ids[None, :] == sp_pop[:, None], stack, 0), axis=1
            )
            cur_next = jnp.where(
                is_int & descend,
                go,
                jnp.where(can_pop, popped, _DONE),
            )
            if any_hit:
                cur_next = jnp.where(found, _DONE, cur_next)
            sp = jnp.where(can_pop, sp_pop, sp)
            cur_next = jnp.where(live, cur_next, _DONE)

            return _St(cur=cur_next, sp=sp, stack=stack, t_best=t_best,
                       prim=prim, it=st.it + 1)
        return body

    body = make_body(o, d, inv_d)

    # ---- staged traversal. Masked-dense execution is gated by the WORST
    # lane (a silhouette-grazing ray visits O(sqrt(T)) leaf cells; measured
    # live-lane decay on cornell-mesh at 16k rays: 16k -> 2.4k @32 iters ->
    # 770 @48 -> 546 @96 -> 144 @256 -> ~0 @ a few thousand). Each stage
    # compacts the survivors into a buffer 8x narrower, so tail iterations
    # run at a fraction of the width; a final chunked DENSE sweep of the
    # soup finishes the extreme tail exactly.
    cap1 = jnp.int32(4 * depth)
    st = jax.lax.while_loop(make_cond(cap1), body, st)

    def compact(st, R_T):
        """Gather the unfinished lanes (stable, unfinished-first) into an
        R_T-wide buffer. Returns (sel indices, sub state)."""
        unfinished = st.cur != _DONE
        order = jnp.argsort(jnp.where(unfinished, 0, 1).astype(jnp.int32),
                            stable=True)
        sel = order[:R_T]
        sub = _St(
            cur=st.cur[sel], sp=st.sp[sel], stack=st.stack[sel],
            t_best=st.t_best[sel], prim=st.prim[sel], it=jnp.int32(0),
        )
        return sel, sub

    def scatter(st, sel, sub):
        return st._replace(
            cur=st.cur.at[sel].set(sub.cur),
            sp=st.sp.at[sel].set(sub.sp),
            stack=st.stack.at[sel].set(sub.stack),
            t_best=st.t_best.at[sel].set(sub.t_best),
            prim=st.prim.at[sel].set(sub.prim),
            it=jnp.int32(0),
        )

    def dense_finish(sub, o2, d2):
        """Chunked dense sweep of the WHOLE padded soup for the extreme tail
        — exactly correct (dense == ground truth) and cheap at few lanes."""
        soup = rows[n_int:, : K * 9].reshape(P * K, 9)
        TB = min(4096, P * K)  # triangles per dense block

        def dense_blk(i, carry):
            t_best, prim = carry
            blk = jax.lax.dynamic_slice(soup, (i * TB, 0), (TB, 9))
            t_b, _, hit_b = ix.intersect_tri_block(
                o2, d2, t_best, blk[:, 0:3], blk[:, 3:6], blk[:, 6:9]
            )
            t_b = jnp.where(hit_b, t_b, jnp.inf)
            best = jnp.argmin(t_b, axis=-1)
            rr = jnp.arange(o2.shape[0])
            tb_best = t_b[rr, best]
            better = tb_best < t_best
            t_best = jnp.where(better, tb_best, t_best)
            prim = jnp.where(better, (i * TB + best).astype(jnp.int32), prim)
            return t_best, prim

        n_blk = -(-(P * K) // TB)
        live2 = sub.cur != _DONE
        t3, p3 = jax.lax.fori_loop(0, n_blk, dense_blk, (sub.t_best, sub.prim))
        return sub._replace(
            t_best=jnp.where(live2, t3, sub.t_best),
            prim=jnp.where(live2, p3, sub.prim),
            cur=jnp.where(live2, _DONE, sub.cur),
        )

    # ---- compaction ladder: survivors continue in geometrically narrower
    # buffers. A rung whose buffer holds no unfinished lanes exits its
    # while_loop after ZERO iterations, so generous rungs cost only the
    # (R,)-key argsort. Caps scale with tree depth; the final rung is an
    # exact chunked DENSE sweep sized so its tri-test budget stays ~3e8
    # regardless of scene size.
    ladder = [(2, 8), (8, 16), (32, 32), (128, 64)]
    o_c, d_c, inv_c, cur_sel = o, d, inv_d, None
    frames = []  # (sel, outer_state) to scatter back through
    sub = st
    for divisor, capmul in ladder:
        R_T = R // divisor
        if R_T < 64 or R_T >= sub.cur.shape[0]:
            continue
        sel, nxt = compact(sub, R_T)
        frames.append((sel, sub))
        o_c, d_c, inv_c = o_c[sel], d_c[sel], inv_c[sel]
        body_c = make_body(o_c, d_c, inv_c)
        sub = jax.lax.while_loop(
            make_cond(jnp.int32(capmul * depth)), body_c, nxt
        )
    # exact dense finish for whatever remains, budgeted by scene size
    X = max(128, min(sub.cur.shape[0], int(3e8 // max(P * K, 1))))
    if X < sub.cur.shape[0]:
        sel, nxt = compact(sub, X)
        frames.append((sel, sub))
        o_c, d_c = o_c[sel], d_c[sel]
        sub = nxt
    sub = dense_finish(sub, o_c, d_c)
    for sel, outer in reversed(frames):
        sub = scatter(outer, sel, sub)
    st = sub

    # ---- safety net: if a compaction buffer overflowed this completes the
    # overflow at full width; otherwise it runs ZERO iterations (the cond is
    # false immediately) and costs nothing.
    st = jax.lax.while_loop(make_cond(max_iters), body, st)
    return st.t_best, st.prim


def closest_hit_tris(scene, o, d, t_max):
    """BVH closest hit -> TriHit (same contract as intersect_tris_dense).

    The returned t/bary are recomputed differentiably against the winning
    triangle; prim indexes the LEAF-ORDERED triangle arrays (scene columns
    are already stored in that order by the compiler).
    """
    t_disc, prim = _traverse(
        scene.bvh_rows, LEAF_K, o, d, t_max,
    )
    found = prim >= 0
    pc = jnp.maximum(prim, 0)
    # differentiable refit against the winner (tri_p0/p1/p2 carry gradients)
    t_ref, bary, hit_ref = ix.intersect_tri_lanes(
        o, d, t_max, scene.tri_p0[pc], scene.tri_p1[pc], scene.tri_p2[pc]
    )
    ok = found & hit_ref
    return ix.TriHit(
        t=jnp.where(ok, t_ref, INFINITY),
        prim=jnp.where(ok, prim, -1),
        b=jnp.where(ok[..., None], bary, 0.0),
    )


def any_hit_tris(scene, o, d, t_max):
    """BVH shadow query: True where some triangle blocks (R,)."""
    _, prim = _traverse(
        scene.bvh_rows, LEAF_K, o, d, t_max, any_hit=True,
    )
    return prim >= 0

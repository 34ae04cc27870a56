"""Bounding volume hierarchy over the triangle soup — TPU-native wide BVH.

Replaces the role of the reference HLBVH (accelerator/hlbvh.cu:172 build,
:407-516 traversal; hlbvh.h:76-101 interface), redesigned for XLA:

Build (host, numpy, scene-compile time — build is precompute, not the metric,
matching SURVEY §7 Phase 1):
  - top-down **binned SAH** binary build (the reference's quality target is
    its 24-bucket top SAH, hlbvh.cu:611-813; we bin 16 buckets on the largest
    centroid axis at every node, with morton-median fallback for degenerate
    and tiny ranges);
  - the binary tree is **collapsed into an 8-wide BVH** (largest-area-first
    slot expansion) because on TPU the traversal cost driver is the per-step
    row GATHER (~1 ms per 262k rows regardless of row width 4..64 f32 —
    tools/bench_gather.py), so each step should consume as much tree as one
    row can carry: 8 child AABBs + 8 child links = 56 f32;
  - leaves are padded to exactly K triangles and the triangle soup is
    physically reordered so leaf chunks are contiguous rows.

Memory layout: everything a traversal step needs is packed into ONE wide row
of the unified `rows` table (internal rows first, leaf rows after):
  - internal row i < n_int: [slot0 lo(3) hi(3) | ... slot7 lo hi | 8 child
    ids as exact small floats] = 56 f32 (empty slots: inverted box, id -1);
  - leaf row n_int + c: the K triangles of chunk c, [p0 p1 p2] x K.

Traversal (device, jit):
  - vectorized over rays; per-ray state = one packed int32 `cur` =
    node_id * 256 + child_bitmask (mask 0xFF = fresh visit) and a small
    int32 stack of the same packed entries. A visit with c surviving
    children descends into the nearest and pushes AT MOST ONE entry:
    the sibling itself when c == 2, or (node, remaining-mask) when c >= 3
    (revisits re-gather + re-cull against the shrunken t_best — the
    re-cull is free stale-entry elimination, cf. Ylitie et al. wide-BVH
    traversal);
  - the ray's watertight shear transform is hoisted out of the loop
    (d is loop-invariant), so a leaf step is K translate+edge-function
    tests with no per-iteration argmax/permute;
  - masked-dense execution is gated by the WORST lane, so the loop runs as
    a **compaction ladder** (measured in PROFILE.md §3): a capped full-width
    stage, then survivors continue in geometrically narrower buffers, then
    an exact chunked dense sweep finishes the extreme tail, then a
    full-width uncapped safety loop that normally runs zero iterations;
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

# Leaf size: each leaf holds exactly K reordered triangles; one leaf visit
# costs one row gather + K masked watertight tests. Env-overridable for
# tuning (tools/bench_bvh.py).
import os as _os

LEAF_K = int(_os.environ.get("PBRT_TPU_BVH_LEAF_K", "8"))
# Node width: one (6W+W)-f32 row carries W child boxes + links. Wider nodes
# consume more tree per visit for the SAME per-iteration op count (the slab
# block just gets wider on the VPU), so the while_loop runs far fewer
# iterations — the dominant cost at scale (PROFILE §3 wide-node variant).
# Env-overridable for tools/bench_bvh.py sweeps.
WIDTH = int(_os.environ.get("PBRT_TPU_BVH_WIDTH", "8"))
ROW_W = max(6 * WIDTH + WIDTH, 9 * LEAF_K, 14)
# Scenes below this triangle count use the dense all-pairs kernel instead.
MIN_TRIS_FOR_BVH = 64

_SAH_BINS = 16
_SAH_MIN = 17          # ranges smaller than this split at the median instead
_MAX_DEPTH = 48        # beyond this, force median splits (degenerate scenes)


class BvhBuild(NamedTuple):
    """Host-side build result."""

    rows: np.ndarray       # (n_int + n_leaves, ROW_W) f32 unified table
    src: np.ndarray        # (n_leaves*K,) i32: source tri index per padded
                           # leaf-order row, -1 for padding
    n_int: int             # internal row count (leaf chunk c = row n_int+c)
    n_padded: int          # n_leaves * K
    max_depth: int         # deepest internal chain (stack bound)


class Bvh2Build(NamedTuple):
    """Two-level (TLAS + per-prototype BLAS) build result (reference keeps a
    sub-BVH per ObjectBegin definition wrapped in a TransformedPrimitive,
    scene_builder.cu:70-90,809-876 + primitives/transformed_primitive.h:7-33).

    Unified row table layout: [internal | instance | leaf] — row type is a
    range check on the id, so traversal stays one gather per step. Instance
    row: [w2o 3x4 row-major (12) | blas_root id | instance id | 0...].
    """

    rows: np.ndarray       # (n_int + n_inst + n_leaves, ROW_W)
    src: np.ndarray        # (n_leaves*K,) i32 into the CONCATENATED source
                           # soup [static tris | proto0 tris | proto1 ...]
    n_int: int
    n_inst: int
    n_padded: int
    max_depth: int         # top depth + max BLAS depth + restore margin
    iter_bound: int        # safety-loop bound (sum of per-tree bounds)


def _surface_area(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def _build_binary(tri_lo, tri_hi, cent, order, leaf_k, big_from=None):
    """Binned-SAH binary BVH. Returns (nodes, leaves, root):
    nodes: list of (lo, hi, left, right) with child refs ('n', i)/('l', j)/
    ('i', prim_id); leaves: list of id arrays (each <= leaf_k source ids).

    Ids >= `big_from` are "big" primitives (instances): they always become
    SINGLETON ('i', id) leaves — a range containing one is force-split until
    the instance is alone, so triangle leaf chunks stay homogeneous."""
    nodes = []   # (lo, hi, left_ref, right_ref)
    leaves = []

    # explicit stack of (ids, slot_setter); build root iteratively
    result_root = [None]

    def setter_of(parent_idx, side):
        def set_ref(ref):
            lo, hi, l, r = nodes[parent_idx]
            nodes[parent_idx] = (lo, hi, ref if side == 0 else l,
                                 ref if side == 1 else r)
        return set_ref

    stack = [(order, (lambda ref: result_root.__setitem__(0, ref)), 0)]
    while stack:
        ids, set_ref, depth = stack.pop()
        n = ids.shape[0]
        has_big = big_from is not None and bool(np.any(ids >= big_from))
        if n == 1 and has_big:
            set_ref(("i", int(ids[0])))
            continue
        if n <= leaf_k and not has_big:
            leaves.append(ids)
            set_ref(("l", len(leaves) - 1))
            continue
        if n <= leaf_k and has_big:
            # force-split mixed/instance ranges down to singleton instances
            c_ax = cent[ids]
            axis0 = int(np.argmax(c_ax.max(0) - c_ax.min(0)))
            s = np.argsort(c_ax[:, axis0], kind="stable")
            ids = ids[s]
            mid = max(1, n // 2)
            me = len(nodes)
            lo = tri_lo[ids].min(0).astype(np.float32)
            hi = tri_hi[ids].max(0).astype(np.float32)
            nodes.append((lo, hi, None, None))
            set_ref(("n", me))
            stack.append((ids[:mid], setter_of(me, 0), depth + 1))
            stack.append((ids[mid:], setter_of(me, 1), depth + 1))
            continue

        lo = tri_lo[ids].min(0)
        hi = tri_hi[ids].max(0)
        c = cent[ids]
        clo = c.min(0)
        chi = c.max(0)
        ext = chi - clo
        axis = int(np.argmax(ext))

        split = None
        if n >= _SAH_MIN and depth < _MAX_DEPTH and ext[axis] > 0:
            # ---- binned SAH over ALL THREE centroid axes (the reference
            # bins only along each treelet axis, hlbvh.cu:636-813; sweeping
            # all axes at 16 bins measurably tightens boxes on anisotropic
            # meshes like height fields — fewer node visits per ray)
            best_cost, best_split = np.inf, None
            for ax in range(3):
                if ext[ax] <= 0:
                    continue
                t = (c[:, ax] - clo[ax]) * (_SAH_BINS / ext[ax])
                b = np.minimum(t.astype(np.int32), _SAH_BINS - 1)
                counts = np.bincount(b, minlength=_SAH_BINS)
                sort = np.argsort(b, kind="stable")
                ids_sorted = ids[sort]
                starts = np.zeros(_SAH_BINS, np.int64)
                starts[1:] = np.cumsum(counts)[:-1]
                nonempty = counts > 0
                # reduceat needs strictly valid starts; use nonempty bins
                ne_starts = starts[nonempty]
                blo = np.full((_SAH_BINS, 3), np.inf, np.float64)
                bhi = np.full((_SAH_BINS, 3), -np.inf, np.float64)
                blo[nonempty] = np.minimum.reduceat(
                    tri_lo[ids_sorted], ne_starts, axis=0)
                bhi[nonempty] = np.maximum.reduceat(
                    tri_hi[ids_sorted], ne_starts, axis=0)
                # prefix/suffix bounds + counts over bins
                plo = np.minimum.accumulate(blo, axis=0)
                phi = np.maximum.accumulate(bhi, axis=0)
                slo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
                shi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
                cl = np.cumsum(counts)
                cr = n - cl
                # split after bin i (i = 0.._SAH_BINS-2)
                costs = np.where(
                    (cl[:-1] > 0) & (cr[:-1] > 0),
                    _surface_area(plo[:-1], phi[:-1]) * cl[:-1]
                    + _surface_area(slo[1:], shi[1:]) * cr[:-1],
                    np.inf,
                )
                bi = int(np.argmin(costs))
                if costs[bi] < best_cost:
                    best_cost = costs[bi]
                    mid = int(cl[bi])
                    best_split = (ids_sorted[:mid], ids_sorted[mid:])
            if best_split is not None:
                split = best_split
        if split is None:
            # median of the current (morton / bin-sorted) order; for tiny or
            # degenerate ranges this is the LBVH topology
            if n >= _SAH_MIN and ext[axis] > 0:
                sort = np.argsort(c[:, axis], kind="stable")
                ids = ids[sort]
            mid = n // 2
            split = (ids[:mid], ids[mid:])

        me = len(nodes)
        nodes.append((lo.astype(np.float32), hi.astype(np.float32), None, None))
        set_ref(("n", me))
        stack.append((split[0], setter_of(me, 0), depth + 1))
        stack.append((split[1], setter_of(me, 1), depth + 1))

    return nodes, leaves, result_root[0]


def _collapse_wide(nodes, leaves, root_ref, tri_lo, tri_hi, width):
    """Collapse the binary tree into width-wide nodes (largest-area slot
    expanded first). Returns (wide, order): wide = list of slot lists, each
    slot = (lo, hi, ref) with ref ('w', wide_idx) or ('l', leaf_idx);
    leaves re-emitted in DFS order for locality via `leaf_order`."""

    def bounds_of(ref):
        if ref[0] == "n":
            lo, hi, _, _ = nodes[ref[1]]
            return lo, hi
        if ref[0] == "i":
            return (tri_lo[ref[1]].astype(np.float32),
                    tri_hi[ref[1]].astype(np.float32))
        ids = leaves[ref[1]]
        return tri_lo[ids].min(0).astype(np.float32), tri_hi[ids].max(0).astype(np.float32)

    wide = []        # slot lists; refs into wide/leaf, patched below
    leaf_order = []  # binary-leaf index per emitted chunk

    def emit(ref):
        """Emit the subtree at `ref` as a wide node; returns ('w', idx),
        ('l', chunk) or ('i', prim_id) (instance pseudo-leaf)."""
        if ref[0] == "i":
            return ref
        if ref[0] == "l":
            leaf_order.append(ref[1])
            return ("l", len(leaf_order) - 1)
        # gather up to `width` slot refs by expanding the largest-area
        # internal slot until full
        slots = [ref]
        while len(slots) < width:
            best, best_area = -1, -1.0
            for i, s in enumerate(slots):
                if s[0] == "n":
                    lo, hi, _, _ = nodes[s[1]]
                    a = float(_surface_area(lo, hi))
                    if a > best_area:
                        best, best_area = i, a
            if best < 0:
                break
            _, _, l, r = nodes[slots[best][1]]
            slots[best: best + 1] = [l, r]
        me = len(wide)
        wide.append(None)
        out = []
        for s in slots:
            lo, hi = bounds_of(s)
            out.append((lo, hi, emit(s)))
        wide[me] = out
        return ("w", me)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        root = emit(root_ref)
    finally:
        sys.setrecursionlimit(old)
    return wide, leaf_order, root


def build_bvh(p0, p1, p2, leaf_k=LEAF_K):
    """Build the SAH wide BVH over triangles (T, 3)x3 -> BvhBuild.

    The caller must reorder all per-triangle scene columns into padded leaf
    order via `src` (src[i] < 0 rows are degenerate never-hit padding).
    """
    T = p0.shape[0]
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    tri_lo = np.minimum(np.minimum(p0, p1), p2)
    tri_hi = np.maximum(np.maximum(p0, p1), p2)
    cent = 0.5 * (tri_lo + tri_hi)

    # initial morton order: keeps median-fallback splits spatial and gives
    # bin sorts a good secondary order (reference hlbvh.cu:229)
    lo = cent.min(0)
    extent = np.maximum(cent.max(0) - lo, 1e-30)
    q = np.clip(((cent - lo) / extent) * 1023.0, 0.0, 1023.0).astype(np.uint32)
    codes = encode_morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int64)

    nodes, leaves, root_ref = _build_binary(tri_lo, tri_hi, cent, order, leaf_k)
    wide, leaf_order, root = _collapse_wide(
        nodes, leaves, root_ref, tri_lo, tri_hi, WIDTH
    )

    n_leaves = len(leaf_order)
    n_padded = n_leaves * leaf_k
    src = np.full(n_padded, -1, np.int32)
    for chunk, bleaf in enumerate(leaf_order):
        ids = leaves[bleaf]
        src[chunk * leaf_k: chunk * leaf_k + ids.shape[0]] = ids

    row_w = max(6 * WIDTH + WIDTH, 9 * leaf_k)
    BIG = np.float32(3e38)

    if not wide:
        # single-leaf scene: no internal rows
        n_int = 0
        rows = np.zeros((n_leaves, row_w), np.float32)
        max_depth = 1
    else:
        n_int = len(wide)
        rows = np.zeros((n_int + n_leaves, row_w), np.float32)
        # internal rows: 8x [lo hi] + 8 child ids (unified: leaf chunk c ->
        # id n_int + c)
        for i, slots in enumerate(wide):
            r = rows[i]
            r[0: 6 * WIDTH: 6] = BIG      # default: inverted boxes
            r[3: 6 * WIDTH: 6] = -BIG
            r[6 * WIDTH:] = -1.0
            for s, (slo, shi, ref) in enumerate(slots):
                r[s * 6: s * 6 + 3] = slo
                r[s * 6 + 3: s * 6 + 6] = shi
                cid = ref[1] if ref[0] == "w" else n_int + ref[1]
                r[6 * WIDTH + s] = float(cid)
        # depth of the wide tree (stack bound): longest internal chain
        depth = np.ones(n_int, np.int32)
        for i in range(n_int - 1, -1, -1):
            d = 1
            for _, _, ref in wide[i]:
                if ref[0] == "w":
                    d = max(d, 1 + depth[ref[1]])
            depth[i] = d
        max_depth = int(depth[0]) if n_int else 1

    # leaf rows: K triangles, [p0 p1 p2] per triangle; padding rows keep
    # all-zero vertices (degenerate, never pass the watertight test)
    mask = src >= 0
    si = np.maximum(src, 0)
    tri9 = np.concatenate([p0[si], p1[si], p2[si]], axis=1)
    tri9[~mask] = 0.0
    rows[n_int:, : leaf_k * 9] = tri9.reshape(n_leaves, leaf_k * 9)

    return BvhBuild(
        rows=rows, src=src, n_int=n_int, n_padded=n_padded,
        max_depth=max_depth,
    )


def _transform_aabb(lo, hi, m):
    """World AABB of an object-space box under affine m (3,4)."""
    corners = np.array(
        [[lo[0], lo[1], lo[2]], [lo[0], lo[1], hi[2]],
         [lo[0], hi[1], lo[2]], [lo[0], hi[1], hi[2]],
         [hi[0], lo[1], lo[2]], [hi[0], lo[1], hi[2]],
         [hi[0], hi[1], lo[2]], [hi[0], hi[1], hi[2]]], np.float64
    )
    w = corners @ m[:, :3].T + m[:, 3]
    return w.min(0), w.max(0)


def build_two_level(static_p, protos, inst_proto, inst_o2w, leaf_k=LEAF_K):
    """TLAS + per-prototype BLAS over shared object-space geometry.

    static_p: (T_s, 3, 3) world-space non-instanced triangles;
    protos: list of (T_p, 3, 3) object-space prototype triangles;
    inst_proto: (I,) prototype index per instance;
    inst_o2w: (I, 3, 4) object->world affine per instance.

    Returns Bvh2Build. `src` indexes the CONCATENATED soup
    [static | protos[0] | protos[1] | ...]; the caller reorders all
    per-triangle columns (built in that concatenated order) through it.
    Replaces the reference's TransformedPrimitive + sub-BVH design
    (scene_builder.cu:809-876) without flattening geometry per instance.
    """
    static_p = np.asarray(static_p, np.float32).reshape(-1, 3, 3)
    T_s = static_p.shape[0]
    I = len(inst_proto)
    inst_proto = np.asarray(inst_proto, np.int64)
    inst_o2w = np.asarray(inst_o2w, np.float64).reshape(I, 3, 4)

    # ---- BLAS per prototype (existing single-level machinery, local ids)
    blas = []
    proto_bounds = []
    for P in protos:
        P = np.asarray(P, np.float32).reshape(-1, 3, 3)
        blas.append(build_bvh(P[:, 0], P[:, 1], P[:, 2], leaf_k))
        lo = P.min(axis=(0, 1))
        hi = P.max(axis=(0, 1))
        proto_bounds.append((lo, hi))

    # ---- top-tree primitive set: static tris + instance world boxes
    s_lo = static_p.min(1)
    s_hi = static_p.max(1)
    i_lo = np.zeros((I, 3))
    i_hi = np.zeros((I, 3))
    for i in range(I):
        lo, hi = proto_bounds[inst_proto[i]]
        i_lo[i], i_hi[i] = _transform_aabb(lo, hi, inst_o2w[i])
    prim_lo = np.concatenate([s_lo, i_lo.astype(np.float32)], 0)
    prim_hi = np.concatenate([s_hi, i_hi.astype(np.float32)], 0)
    cent = 0.5 * (prim_lo + prim_hi)

    lo0 = cent.min(0)
    extent = np.maximum(cent.max(0) - lo0, 1e-30)
    q = np.clip(((cent - lo0) / extent) * 1023.0, 0.0, 1023.0).astype(np.uint32)
    codes = encode_morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int64)

    nodes, leaves, root_ref = _build_binary(
        prim_lo, prim_hi, cent, order, leaf_k, big_from=T_s
    )
    wide, leaf_order, root = _collapse_wide(
        nodes, leaves, root_ref, prim_lo, prim_hi, WIDTH
    )
    if root[0] != "w":
        # degenerate top (single chunk / single instance): synthesize a root
        # so row 0 is always an internal row
        lo = prim_lo.min(0).astype(np.float32)
        hi = prim_hi.max(0).astype(np.float32)
        wide = [[(lo, hi, root)]] + wide
        # 'w' refs inside the shifted list must move by one
        wide = [
            [(slo, shi, ("w", r[1] + 1) if r[0] == "w" else r)
             for (slo, shi, r) in slots]
            for slots in wide
        ]
        root = ("w", 0)

    A = len(wide)
    n_top_leaves = len(leaf_order)
    int_off = []
    acc = A
    for b in blas:
        int_off.append(acc)
        acc += b.n_int
    n_int = acc
    L0 = n_int + I                              # first leaf row id
    leaf_off = []
    acc_l = n_top_leaves
    for b in blas:
        leaf_off.append(L0 + acc_l)
        acc_l += b.n_padded // leaf_k
    n_leaves = acc_l
    n_rows = n_int + I + n_leaves
    row_w = max(6 * WIDTH + WIDTH, 9 * leaf_k)
    BIG = np.float32(3e38)
    rows = np.zeros((n_rows, row_w), np.float32)

    # ---- top internal rows
    def top_cid(ref):
        if ref[0] == "w":
            return ref[1]
        if ref[0] == "i":
            return n_int + (ref[1] - T_s)
        return L0 + ref[1]

    for i, slots in enumerate(wide):
        r = rows[i]
        r[0: 6 * WIDTH: 6] = BIG
        r[3: 6 * WIDTH: 6] = -BIG
        r[6 * WIDTH:] = -1.0
        for s, (slo, shi, ref) in enumerate(slots):
            r[s * 6: s * 6 + 3] = slo
            r[s * 6 + 3: s * 6 + 6] = shi
            r[6 * WIDTH + s] = float(top_cid(ref))

    # ---- BLAS rows, ids remapped into the global table
    for p, b in enumerate(blas):
        bi = b.rows[: b.n_int].copy()
        child = bi[:, 6 * WIDTH:]
        is_leaf_c = child >= b.n_int
        child_new = np.where(
            child < 0, -1.0,
            np.where(is_leaf_c, child - b.n_int + leaf_off[p],
                     child + int_off[p]),
        )
        bi[:, 6 * WIDTH:] = child_new
        rows[int_off[p]: int_off[p] + b.n_int] = bi
        nl = b.n_padded // leaf_k
        rows[leaf_off[p]: leaf_off[p] + nl] = b.rows[b.n_int:]

    # ---- instance rows: [w2o 12 | blas root | instance id]
    for i in range(I):
        p = int(inst_proto[i])
        m = np.eye(4)
        m[:3, :4] = inst_o2w[i]
        w2o = np.linalg.inv(m)[:3, :4]
        root_gid = int_off[p] if blas[p].n_int > 0 else leaf_off[p]
        r = rows[n_int + i]
        r[:12] = w2o.reshape(-1).astype(np.float32)
        r[12] = float(root_gid)
        r[13] = float(i)

    # ---- top leaf rows (static tris) + global src
    src = np.full(n_leaves * leaf_k, -1, np.int32)
    for chunk, bleaf in enumerate(leaf_order):
        ids = leaves[bleaf]
        assert np.all(ids < T_s)
        src[chunk * leaf_k: chunk * leaf_k + ids.shape[0]] = ids
    src_off = T_s
    for p, b in enumerate(blas):
        base = (leaf_off[p] - L0) * leaf_k
        bs = b.src
        src[base: base + bs.shape[0]] = np.where(bs >= 0, bs + src_off, -1)
        src_off += int(protos[p].reshape(-1, 3, 3).shape[0])

    mask = src >= 0
    si = np.maximum(src, 0)
    allp = np.concatenate(
        [static_p] + [np.asarray(P, np.float32).reshape(-1, 3, 3) for P in protos],
        axis=0,
    ) if protos else static_p
    tri9 = allp[si].reshape(-1, 9).copy()
    tri9[~mask] = 0.0
    rows[L0:, : leaf_k * 9] = tri9.reshape(n_leaves, leaf_k * 9)

    # depth bound: top chain + restore + deepest BLAS chain
    if wide:
        depth = np.ones(A, np.int32)
        for i in range(A - 1, -1, -1):
            d = 1
            for _, _, ref in wide[i]:
                if ref[0] == "w":
                    d = max(d, 1 + depth[ref[1]])
            depth[i] = d
        top_depth = int(depth[0])
    else:
        top_depth = 1
    max_depth = top_depth + max([b.max_depth for b in blas], default=0) + 2
    iter_bound = 4 * (A + n_top_leaves) + 16
    for i in range(I):
        b = blas[int(inst_proto[i])]
        iter_bound += 4 * (b.n_int + b.n_padded // leaf_k) + 8

    return Bvh2Build(
        rows=rows, src=src, n_int=n_int, n_inst=I,
        n_padded=n_leaves * leaf_k, max_depth=max_depth,
        iter_bound=int(iter_bound),
    )


def reorder_pad(build: BvhBuild, a, fill):
    """Reorder a per-triangle column (T, ...) into padded leaf order."""
    a = np.asarray(a)
    out = np.full((build.n_padded,) + a.shape[1:], fill, a.dtype)
    mask = build.src >= 0
    out[mask] = a[build.src[mask]]
    return out


# --------------------------------------------------------------- traversal


def _safe_inv(d):
    """1/d that never emits 0*inf = NaN in the slab test."""
    tiny = 1e-30
    mag = jnp.maximum(jnp.abs(d), tiny)
    return jnp.where(d < 0, -1.0, 1.0) / mag


def _slab8(o, inv_d, boxes, t_best):
    """Slab test of each lane's 8 gathered child boxes (reference
    Bounds3f::fast_intersect used at hlbvh.cu:429,485).

    o, inv_d: (R, 3); boxes: (R, 8, 6) [lo hi]; t_best: (R,).
    Returns (t_near (R, 8), hit (R, 8))."""
    nmin = boxes[..., 0:3]
    nmax = boxes[..., 3:6]
    t0 = (nmin - o[:, None, :]) * inv_d[:, None, :]
    t1 = (nmax - o[:, None, :]) * inv_d[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tf = tf * (1.0 + 2.0 * gamma(3))
    tn = jnp.maximum(tn, 0.0)
    # empty slots carry INVERTED boxes; the per-axis min/max swap would
    # silently "repair" them, so reject explicitly (one axis is enough)
    nonempty = nmin[..., 0] <= nmax[..., 0]
    hit = nonempty & (tn <= tf) & (tf > 0.0) & (tn < t_best[:, None])
    return tn, hit


_DONE = jnp.int32(-1)
# child bitmask of a first visit: all WIDTH bits set (int32 two's complement
# -1 for WIDTH=32 — distinct powers-of-two sums and &-tests below use != 0,
# never > 0, so the sign bit is an ordinary bit). mask 0 = RESTORE sentinel.
_FRESH = jnp.int32(-1) if WIDTH >= 32 else jnp.int32((1 << WIDTH) - 1)
# stack layout: for W<=8 a stack entry packs nid*256+mask into ONE i32 (one
# where-chain per push/pop); wider masks use parallel (nid, mask) stacks.
_PACKED = WIDTH <= 8


def _stack_push(stack_n, stack_m, at_sp, push_n, push_m):
    if _PACKED:
        return (jnp.where(at_sp, (push_n * 256 + push_m)[:, None], stack_n),
                stack_m)
    return (jnp.where(at_sp, push_n[:, None], stack_n),
            jnp.where(at_sp, push_m[:, None], stack_m))


def _stack_pop(stack_n, stack_m, at_pop):
    if _PACKED:
        popped = jnp.sum(jnp.where(at_pop, stack_n, 0), axis=1)
        return popped >> 8, popped & 255
    return (jnp.sum(jnp.where(at_pop, stack_n, 0), axis=1),
            jnp.sum(jnp.where(at_pop, stack_m, 0), axis=1))


def _stack_m_init(R, SD):
    return jnp.zeros((R, 0 if _PACKED else SD), jnp.int32)


class _St(NamedTuple):
    cur: jnp.ndarray      # (R,) current node id, or _DONE
    cmask: jnp.ndarray    # (R,) surviving-children bitmask of the visit
    sp: jnp.ndarray       # (R,) stack pointer
    stack_n: jnp.ndarray  # (R, SD) stacked node ids
    stack_m: jnp.ndarray  # (R, SD) stacked child bitmasks
    t_best: jnp.ndarray   # (R,)
    prim: jnp.ndarray     # (R,)
    it: jnp.ndarray       # () iteration counter (stage cap / safety bound)


class _StI(NamedTuple):
    """Instanced-traversal state: adds the per-lane CURRENT ray (object
    space while inside a BLAS) and instance context. pbrt forbids nested
    ObjectInstance, so 'restore' always returns to the loop-invariant world
    ray — the stack never has to save rays, only a RESTORE sentinel
    (stacked mask == 0, a value no ordinary push produces)."""

    cur: jnp.ndarray
    cmask: jnp.ndarray
    sp: jnp.ndarray
    stack_n: jnp.ndarray
    stack_m: jnp.ndarray
    t_best: jnp.ndarray
    prim: jnp.ndarray
    hin: jnp.ndarray      # (R,) instance id of the best hit (-1 static)
    inst: jnp.ndarray     # (R,) current instance context (-1 world)
    oc: jnp.ndarray       # (R,3) current-space ray origin
    dc: jnp.ndarray       # (R,3) current-space ray direction (UNNORMALIZED
                          # in object space so t stays world-parameterized)
    it: jnp.ndarray


def make_cond(cap, next_cap=None):
    """Loop condition for a ladder rung: keep iterating while any lane is
    live AND (under the iteration cap OR too many live lanes to fit the
    next rung's buffer). The second clause makes the ladder OVERFLOW-PROOF:
    a rung never hands more than `next_cap` live lanes downstream, so the
    full-width safety loop after the ladder always runs zero iterations.
    (Measured on TPU: an overflowing ladder dumped ~25% of bounce-ray lanes
    into the safety loop -> 12.6 s per 262k traversal; see PROFILE §3.)"""
    def cond(st):
        any_live = jnp.any(st.cur != _DONE)
        under = st.it < cap
        if next_cap is not None:
            n_live = jnp.sum((st.cur != _DONE).astype(jnp.int32))
            return any_live & (under | (n_live > next_cap))
        return any_live & under
    return cond


def make_stepper(rows, n_int, leaf_k, SD, any_hit=False):
    """Build the traversal body factory for a given tree. Returns
    `make_ctx(o, d) -> body`; exposed at module level so tools/probe_bvh.py
    can instrument single iterations."""
    n_rows = rows.shape[0]
    P = n_rows - n_int
    K = leaf_k

    slot_ids = jnp.arange(SD, dtype=jnp.int32)
    bits = (1 << jnp.arange(WIDTH, dtype=jnp.int32))[None, :]      # (1, 8)

    def make_body(o, d, inv_d, shear):
        kz, sx, sy, sz = shear

        def body(st):
            live = st.cur != _DONE
            nid = jnp.maximum(st.cur, 0)
            mask = st.cmask
            is_leaf = live & (nid >= n_int)

            # ---- ONE gather serves both cases: internal row or leaf tris
            row = rows[nid]                              # (R, ROW_W)
            chunk = jnp.clip(nid - n_int, 0, max(P - 1, 0))
            # leaf: ONE (R, K) watertight block (identical math to the
            # per-triangle kernel, batched over the K axis — K separate
            # scalar-shaped tests lowered to ~250 tiny TPU ops at 11.6 ms/
            # iter; the block form runs the same flops in ~40 wide ops at
            # 2.6 ms incl. the gather, tools/probe_traverse_tpu.py)
            t_best, prim = ix.leaf_block_presheared(
                row, K, o, kz, sx, sy, sz, st.t_best, st.prim,
                is_leaf, chunk,
            )
            found = prim >= 0

            # ---- internal: W slab tests from the same row
            is_int = live & ~is_leaf
            boxes = row[:, : 6 * WIDTH].reshape(row.shape[0], WIDTH, 6)
            child = row[:, 6 * WIDTH: 7 * WIDTH].astype(jnp.int32)  # (R, W)
            tn, hit = _slab8(o, inv_d, boxes, t_best)
            hit &= is_int[:, None] & (child >= 0) & ((mask[:, None] & bits) != 0)

            tn_m = jnp.where(hit, tn, INFINITY)
            best_slot = jnp.argmin(tn_m, axis=-1)                    # (R,)
            onehot = (jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
                      == best_slot[:, None])
            # per-lane child gather as one-hot contraction (scalar-unit
            # gathers are poison, PROFILE §2)
            near_child = jnp.sum(jnp.where(onehot & hit, child, 0), axis=-1)
            any_child = jnp.any(hit, axis=-1)

            remaining = hit & ~onehot
            n_rem = jnp.sum(remaining.astype(jnp.int32), axis=-1)
            # arithmetic sum of DISTINCT powers of two == bitwise OR (mod
            # 2^32), so the bit pattern is exact even when bit 31 is set
            rem_bits = jnp.sum(jnp.where(remaining, bits, 0), axis=-1)
            single = jnp.sum(jnp.where(remaining, child, 0), axis=-1)
            # c==2 survivors: push the sibling directly (no revisit);
            # c>=3: push (node, remaining-mask) and re-cull on pop
            push_n = jnp.where(n_rem == 1, single, nid)
            push_m = jnp.where(n_rem == 1, _FRESH, rem_bits)
            do_push = is_int & (n_rem >= 1)
            at_sp = (slot_ids[None, :] == st.sp[:, None]) & do_push[:, None]
            stack_n, stack_m = _stack_push(
                st.stack_n, st.stack_m, at_sp, push_n, push_m)
            sp = st.sp + do_push.astype(jnp.int32)

            # next node: descend if any child hit, else pop
            need_pop = live & (is_leaf | ~any_child)
            if any_hit:
                # terminated lanes (shadow hit found) never pop again
                need_pop &= ~found
            can_pop = need_pop & (sp > 0)
            sp_pop = jnp.maximum(sp - 1, 0)
            # select, not gather: a take_along_axis here costs a full
            # scalar-unit pass per iteration; a where-chain is VPU-free
            at_pop = slot_ids[None, :] == sp_pop[:, None]
            popped_n, popped_m = _stack_pop(stack_n, stack_m, at_pop)
            descend = is_int & any_child
            cur_next = jnp.where(
                descend, near_child, jnp.where(can_pop, popped_n, _DONE)
            )
            cmask_next = jnp.where(descend, _FRESH, popped_m)
            if any_hit:
                cur_next = jnp.where(found, _DONE, cur_next)
            sp = jnp.where(can_pop, sp_pop, sp)
            cur_next = jnp.where(live, cur_next, _DONE)

            return _St(cur=cur_next, cmask=cmask_next, sp=sp,
                       stack_n=stack_n, stack_m=stack_m, t_best=t_best,
                       prim=prim, it=st.it + 1)
        return body

    def make_ctx(o, d):
        inv_d = _safe_inv(d)
        shear = ix.ray_shear(d)
        return make_body(o, d, inv_d, shear)

    return make_ctx


def make_stepper_inst(rows, n_int, n_inst, leaf_k, SD, any_hit=False):
    """Traversal body factory for a TWO-LEVEL table (instance rows present).

    Differences from make_stepper: the ray lives in STATE (oc/dc) because an
    instance-row visit moves the lane into that instance's object space; the
    shear/inv_d are recomputed per iteration from dc (pure VPU math, no
    gather); a RESTORE sentinel (mask==0) pushed on instance entry restores
    the world ray when the BLAS is exhausted."""
    n_rows = rows.shape[0]
    L0 = n_int + n_inst
    P = n_rows - L0
    K = leaf_k

    slot_ids = jnp.arange(SD, dtype=jnp.int32)
    bits = (1 << jnp.arange(WIDTH, dtype=jnp.int32))[None, :]

    def make_body(o_w, d_w):
        def body(st):
            live = st.cur != _DONE
            nid = jnp.maximum(st.cur, 0)
            mask = st.cmask
            is_restore = live & (mask == 0)
            visit = live & ~is_restore
            is_int = visit & (nid < n_int)
            is_instrow = visit & (nid >= n_int) & (nid < L0)
            is_leaf = visit & (nid >= L0)

            row = rows[nid]                              # (R, ROW_W)
            inv_d = _safe_inv(st.dc)
            kz, sx, sy, sz = ix.ray_shear(st.dc)

            # ---- leaf: ONE (R, K) watertight block in the CURRENT space
            chunk = jnp.clip(nid - L0, 0, max(P - 1, 0))
            t_best, prim = ix.leaf_block_presheared(
                row, K, st.oc, kz, sx, sy, sz, st.t_best, st.prim,
                is_leaf, chunk,
            )
            # two instances of one prototype share leaf rows (same global
            # prim id), so detect "improved" via t, not the prim id
            hin = jnp.where(t_best < st.t_best, st.inst, st.hin)
            found = prim >= 0

            # ---- internal: W slab tests from the same row
            boxes = row[:, : 6 * WIDTH].reshape(row.shape[0], WIDTH, 6)
            child = row[:, 6 * WIDTH: 7 * WIDTH].astype(jnp.int32)
            tn, hit = _slab8(st.oc, inv_d, boxes, t_best)
            hit &= is_int[:, None] & (child >= 0) & ((mask[:, None] & bits) != 0)

            tn_m = jnp.where(hit, tn, INFINITY)
            best_slot = jnp.argmin(tn_m, axis=-1)
            onehot = (jnp.arange(WIDTH, dtype=jnp.int32)[None, :]
                      == best_slot[:, None])
            near_child = jnp.sum(jnp.where(onehot & hit, child, 0), axis=-1)
            any_child = jnp.any(hit, axis=-1)

            remaining = hit & ~onehot
            n_rem = jnp.sum(remaining.astype(jnp.int32), axis=-1)
            rem_bits = jnp.sum(jnp.where(remaining, bits, 0), axis=-1)
            single = jnp.sum(jnp.where(remaining, child, 0), axis=-1)
            push_n = jnp.where(n_rem == 1, single, nid)
            push_m = jnp.where(n_rem == 1, _FRESH, rem_bits)
            # instance entry pushes the RESTORE sentinel (mask 0)
            push_n = jnp.where(is_instrow, nid, push_n)
            push_m = jnp.where(is_instrow, 0, push_m)
            do_push = (is_int & (n_rem >= 1)) | is_instrow
            at_sp = (slot_ids[None, :] == st.sp[:, None]) & do_push[:, None]
            stack_n, stack_m = _stack_push(
                st.stack_n, st.stack_m, at_sp, push_n, push_m)
            sp = st.sp + do_push.astype(jnp.int32)

            # ---- instance row: move the lane into object space
            m = row[:, :12].reshape(row.shape[0], 3, 4)
            o_obj = jnp.einsum("rij,rj->ri", m[:, :, :3], o_w) + m[:, :, 3]
            d_obj = jnp.einsum("rij,rj->ri", m[:, :, :3], d_w)
            blas_root = row[:, 12].astype(jnp.int32)
            iid = row[:, 13].astype(jnp.int32)
            oc = jnp.where(is_instrow[:, None], o_obj,
                           jnp.where(is_restore[:, None], o_w, st.oc))
            dc = jnp.where(is_instrow[:, None], d_obj,
                           jnp.where(is_restore[:, None], d_w, st.dc))
            inst = jnp.where(is_instrow, iid,
                             jnp.where(is_restore, -1, st.inst))

            # next node: descend / enter BLAS / pop
            need_pop = live & (is_leaf | is_restore | (is_int & ~any_child))
            if any_hit:
                need_pop &= ~found
            can_pop = need_pop & (sp > 0)
            sp_pop = jnp.maximum(sp - 1, 0)
            at_pop = slot_ids[None, :] == sp_pop[:, None]
            popped_n, popped_m = _stack_pop(stack_n, stack_m, at_pop)
            descend = is_int & any_child
            cur_next = jnp.where(
                descend, near_child,
                jnp.where(is_instrow, blas_root,
                          jnp.where(can_pop, popped_n, _DONE)),
            )
            cmask_next = jnp.where(descend | is_instrow, _FRESH, popped_m)
            if any_hit:
                cur_next = jnp.where(found, _DONE, cur_next)
            sp = jnp.where(can_pop, sp_pop, sp)
            cur_next = jnp.where(live, cur_next, _DONE)

            return _StI(cur=cur_next, cmask=cmask_next, sp=sp,
                        stack_n=stack_n, stack_m=stack_m, t_best=t_best,
                        prim=prim, hin=hin, inst=inst, oc=oc, dc=dc,
                        it=st.it + 1)
        return body

    def make_ctx(o, d):
        return make_body(o, d)

    return make_ctx


def _traverse(rows, n_int, stack_depth, leaf_k, o, d, t_max, any_hit=False,
              n_inst=0, iter_bound=None):
    """Wide-BVH traversal over the unified row table.

    rows: (n_int [+ n_inst] + P, ROW_W); o, d: (R, 3); t_max: (R,). Returns
    (t (R,), prim (R,) i32, inst (R,) i32), prim/inst -1 on miss. Discrete
    only — call intersect_tri_lanes on the winner for the differentiable
    record. n_inst > 0 switches to the two-level stepper.
    """
    n_rows = rows.shape[0]
    P = n_rows - n_int - n_inst
    K = leaf_k
    R = o.shape[0]
    SD = stack_depth + 2

    # the whole traversal is non-differentiable (discrete hit id); detach
    # every input so AD never tries to transpose the while_loop
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    rows = jax.lax.stop_gradient(rows)

    # each (node, child-subset) pair is visited at most once per instance
    # context; anything past this is a traversal bug — terminate rather
    # than wedge the watchdog
    max_iters = jnp.int32(iter_bound if iter_bound else 4 * n_rows + 16)

    # lanes dispatched with t_max <= 0 are masked no-ops (sample_ld hands
    # the ladder dead shadow lanes that way) — start them _DONE instead of
    # letting them burn a full-width iteration discovering it
    cur0 = jnp.where(t_max > 0.0, jnp.int32(0), _DONE)
    if n_inst:
        make_ctx = make_stepper_inst(rows, n_int, n_inst, leaf_k, SD,
                                     any_hit=any_hit)
        st = _StI(
            cur=cur0,  # root (id 0) fresh
            cmask=jnp.full((R,), _FRESH, jnp.int32),
            sp=jnp.zeros((R,), jnp.int32),
            stack_n=jnp.zeros((R, SD), jnp.int32),
            stack_m=_stack_m_init(R, SD),
            t_best=t_max,
            prim=jnp.full((R,), -1, jnp.int32),
            hin=jnp.full((R,), -1, jnp.int32),
            inst=jnp.full((R,), -1, jnp.int32),
            oc=o, dc=d,
            it=jnp.int32(0),
        )
    else:
        make_ctx = make_stepper(rows, n_int, leaf_k, SD, any_hit=any_hit)
        st = _St(
            cur=cur0,
            cmask=jnp.full((R,), _FRESH, jnp.int32),
            sp=jnp.zeros((R,), jnp.int32),
            stack_n=jnp.zeros((R, SD), jnp.int32),
            stack_m=_stack_m_init(R, SD),
            t_best=t_max,
            prim=jnp.full((R,), -1, jnp.int32),
            it=jnp.int32(0),
        )
    body = make_ctx(o, d)

    # ---- staged traversal (PROFILE §3): masked-dense execution is gated by
    # the WORST lane, so run a capped full-width stage then compact
    # survivors into geometrically narrower buffers. A rung whose buffer
    # holds no unfinished lanes exits its while_loop after ZERO iterations.
    # TPU economics (tools/probe_traverse_tpu.py): an iteration costs
    # ~1.4 ms FIXED + ~60 ns/lane, so wide rungs amortize the floor and the
    # extreme tail must NOT run hundreds of narrow iterations — it exits
    # early into the exact dense sweep instead. Every rung's cond keeps
    # iterating while its live count exceeds the next buffer (overflow-proof
    # — see make_cond), so the post-ladder safety loop is always a no-op.
    L_est = int(np.sqrt(max(P * K, 1))) // max(K, 1) + stack_depth
    cap1 = jnp.int32(int(_os.environ.get("PBRT_TPU_BVH_CAP1", "2")))

    def compact(st, R_T):
        """Gather the unfinished lanes (stable, unfinished-first) into an
        R_T-wide buffer. Returns (sel indices, sub state).

        The unfinished-first permutation is built with two cumsums and one
        scatter (rank -> lane id) instead of a full argsort: the sort paid
        ~4 ms per rung at 262k lanes (PROFILE §12), the rank scatter is a
        single pass."""
        unfinished = st.cur != _DONE
        n_unf = jnp.sum(unfinished.astype(jnp.int32))
        r_unf = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
        r_fin = jnp.cumsum((~unfinished).astype(jnp.int32)) - 1
        rank = jnp.where(unfinished, r_unf, n_unf + r_fin)    # permutation
        R_full = rank.shape[0]
        order = jnp.zeros((R_full,), jnp.int32).at[rank].set(
            jnp.arange(R_full, dtype=jnp.int32), mode="drop")
        sel = order[:R_T]
        sub = jax.tree.map(lambda a: a[sel] if a.ndim >= 1 else a, st)
        return sel, sub._replace(it=jnp.int32(0))

    def scatter(st, sel, sub):
        out = jax.tree.map(
            lambda full, part: full.at[sel].set(part) if full.ndim >= 1 else full,
            st, sub,
        )
        return out._replace(it=jnp.int32(0))

    def dense_finish(sub, o2, d2):
        """Chunked dense sweep of the WHOLE padded soup for the extreme tail
        — exactly correct (dense == ground truth) and cheap at few lanes."""
        soup = rows[n_int:, : K * 9].reshape(P * K, 9)
        TB = min(4096, P * K)  # triangles per dense block
        # pad to a whole number of blocks: dynamic_slice CLAMPS an
        # out-of-range start, which would silently shift the final block
        # and misattribute prim ids (i * TB + best). Zero rows are
        # degenerate triangles that never pass the watertight test — the
        # same convention as leaf padding.
        pad = (-(P * K)) % TB
        if pad:
            soup = jnp.concatenate(
                [soup, jnp.zeros((pad, 9), soup.dtype)], axis=0)

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

    # dense-finish tail width (retuned round 5): the old 2e8-test budget
    # (~23 ms of VPU sweep) was priced against a supposed 1.5 ms/iteration
    # narrow-rung floor that turned out to be PER-DISPATCH tunnel overhead
    # (tools/probe_gather2.py) — on-device a 4096-lane iteration costs
    # ~10 us, so narrow rungs are nearly free and the dense sweep only
    # pays once the tail is BOTH small and long (mesh16k: p99=156,
    # max=565 iters). Budget 2e7 keeps dense ~2 ms; when even that is
    # oversized for the soup (X_dense < 256 lanes, e.g. terrain's 162k-tri
    # soup whose tail is only ~60 iters anyway) the ladder finishes in a
    # to-completion narrow rung instead.
    _dense_budget = float(_os.environ.get("PBRT_TPU_BVH_DENSE_BUDGET", "2e7"))
    X_dense = max(128, min(R, int(_dense_budget // max(P * K, 1))))
    use_dense = not n_inst and X_dense >= 256
    _capl = int(_os.environ.get("PBRT_TPU_BVH_CAPL", "2"))
    _ladder_env = _os.environ.get("PBRT_TPU_BVH_LADDER", "")
    if _ladder_env:
        # "div:cap,div:cap,..." sweep override (tools/bench_bvh.py)
        ladder = [(int(d), int(c)) for d, c in
                  (pair.split(":") for pair in _ladder_env.split(","))]
        if n_inst and ladder:
            d_last, c_last = ladder[-1]
            ladder[-1] = (d_last, max(c_last, 3 * L_est))
    else:
        if n_inst:
            ladder = [(4, _capl), (16, max(_capl, 3 * L_est))]
        else:
            ladder = [(4, _capl), (16, _capl), (64, _capl)]
            if not use_dense:
                # no dense sweep: run the tail to completion at R/256
                ladder.append((256, 1 << 30))
    # rung0 (full width) hands off as soon as survivors fit the FIRST
    # ladder buffer
    first_next = R // ladder[0][0] if ladder else R // 4
    if first_next < 64:
        first_next = None
    st = jax.lax.while_loop(make_cond(cap1, first_next), body, st)
    o_c, d_c = o, d
    frames = []  # (sel, outer_state) to scatter back through
    sub = st
    ran_completion = False
    chain_ok = True  # every executed rung drains before its handoff
    for li_, (divisor, cap) in enumerate(ladder):
        R_T = R // divisor
        if R_T < 64 or R_T >= sub.cur.shape[0]:
            continue
        if cap >= (1 << 29):
            ran_completion = True
        nxt_cap = R // (ladder[li_ + 1][0]) if li_ + 1 < len(ladder) else (
            X_dense if use_dense else None
        )
        if nxt_cap is not None and nxt_cap >= R_T:
            # a follow-up buffer at least as wide as this rung can't
            # overflow; for the dense case the compact below is guarded by
            # the same comparison and simply doesn't happen
            nxt_cap = None
            if li_ + 1 < len(ladder) and cap < (1 << 29):
                # ...but a REAL next rung narrower in divisor yet wider in
                # rows means a non-ascending PBRT_TPU_BVH_LADDER override:
                # this capped rung may hand off more live lanes than a
                # LATER buffer holds, so the slim exit below must not skip
                # the safety loop
                chain_ok = False
        sel, nxt = compact(sub, R_T)
        frames.append((sel, sub))
        o_c, d_c = o_c[sel], d_c[sel]
        body_c = make_ctx(o_c, d_c)
        sub = jax.lax.while_loop(
            make_cond(jnp.int32(cap), nxt_cap), body_c, nxt
        )
    if use_dense:
        # exact dense finish for whatever remains — a small-and-LONG
        # extreme tail (mesh16k: max 565 iters) is finished in ONE fat
        # sweep. (Instanced tables never take this path: prototype soup
        # rows live in object space, so a flat world-ray sweep over them
        # would be wrong — the tail finishes in the capped rung instead.
        # Huge soups skip it too — see use_dense above.)
        if X_dense < sub.cur.shape[0]:
            sel, nxt = compact(sub, X_dense)
            frames.append((sel, sub))
            o_c, d_c = o_c[sel], d_c[sel]
            sub = nxt
        sub = dense_finish(sub, o_c, d_c)
    elif n_inst:
        body_c = make_ctx(o_c, d_c)
        sub = jax.lax.while_loop(make_cond(max_iters), body_c, sub)

    if not n_inst and chain_ok and (use_dense or ran_completion):
        # the ladder STRUCTURALLY finished every lane (dense sweep or a
        # to-completion rung ran, and every compact's unfinished-first
        # permutation fits because the preceding rung's cond held until
        # live <= R_T) — scatter back only the RESULT fields (2 arrays per
        # frame instead of the ~10-array full state) and skip the
        # full-width safety loop entirely.
        t_fin, p_fin = sub.t_best, sub.prim
        for sel, outer in reversed(frames):
            t_fin = outer.t_best.at[sel].set(t_fin)
            p_fin = outer.prim.at[sel].set(p_fin)
        return t_fin, p_fin, jnp.full((R,), -1, jnp.int32)

    for sel, outer in reversed(frames):
        sub = scatter(outer, sel, sub)
    st = sub

    # ---- safety net: if a compaction buffer overflowed this completes the
    # overflow at full width; otherwise it runs ZERO iterations (the cond is
    # false immediately) and costs nothing.
    st = jax.lax.while_loop(make_cond(max_iters), body, st)
    if n_inst:
        return st.t_best, st.prim, st.hin
    return st.t_best, st.prim, jnp.full((R,), -1, jnp.int32)


def _scene_tree(scene):
    """(rows, n_int, n_inst, stack_depth, iter_bound) from the compiled
    scene arrays; the zero-byte marker arrays carry static ints in their
    shapes."""
    return (scene.bvh_rows, scene.bvh_nint.shape[0],
            scene.bvh_ninst.shape[0], scene.bvh_depth.shape[0],
            scene.bvh_iterb.shape[0])


def _refit_ray(scene, o, d, hin):
    """Ray transformed into the winning instance's object space (identity
    where hin < 0) for the differentiable refit."""
    iw = jnp.maximum(hin, 0)
    m = scene.inst_w2o[iw].reshape(-1, 3, 4)          # (R,3,4)
    o_i = jnp.einsum("rij,rj->ri", m[:, :, :3], o) + m[:, :, 3]
    d_i = jnp.einsum("rij,rj->ri", m[:, :, :3], d)
    use = (hin >= 0)[:, None]
    return jnp.where(use, o_i, o), jnp.where(use, d_i, d)


def closest_hit_tris(scene, o, d, t_max):
    """BVH closest hit -> TriHit (same contract as intersect_tris_dense).

    The returned t/bary are recomputed differentiably against the winning
    triangle; prim indexes the LEAF-ORDERED triangle arrays (scene columns
    are already stored in that order by the compiler). For instanced hits
    (inst >= 0) the refit runs in the instance's object space — t stays
    world-parameterized because the object-space direction is unnormalized.
    """
    rows, n_int, n_inst, depth, iterb = _scene_tree(scene)
    t_disc, prim, hin = _traverse(rows, n_int, depth, LEAF_K, o, d, t_max,
                                  n_inst=n_inst, iter_bound=iterb)
    found = prim >= 0
    pc = jnp.maximum(prim, 0)
    if n_inst:
        o_r, d_r = _refit_ray(scene, o, d, hin)
    else:
        o_r, d_r = o, d
    # differentiable refit against the winner. ONE gather of a packed
    # (T, 9) row instead of three (T, 3) gathers: gathers cost per ROW on
    # TPU (PROFILE §2), and the three separate vertex gathers measured
    # ~20 ms on-device at 262k lanes on terrain (tools/ wf_probe2). The
    # concatenate is differentiable, so vertex gradients still flow.
    v9 = jnp.concatenate(
        [scene.tri_p0, scene.tri_p1, scene.tri_p2], axis=1)[pc]
    t_ref, bary, hit_ref = ix.intersect_tri_lanes(
        o_r, d_r, t_max, v9[:, 0:3], v9[:, 3:6], v9[:, 6:9]
    )
    ok = found & hit_ref
    return ix.TriHit(
        t=jnp.where(ok, t_ref, INFINITY),
        prim=jnp.where(ok, prim, -1),
        b=jnp.where(ok[..., None], bary, 0.0),
        inst=jnp.where(ok, hin, -1),
    )


def any_hit_tris(scene, o, d, t_max):
    """BVH shadow query: True where some triangle blocks (R,)."""
    rows, n_int, n_inst, depth, iterb = _scene_tree(scene)
    _, prim, _ = _traverse(rows, n_int, depth, LEAF_K, o, d, t_max,
                           any_hit=True, n_inst=n_inst, iter_bound=iterb)
    return prim >= 0

"""Scene (geometry) sharding — the "TP" axis for scenes too large for one
chip's HBM (SURVEY §2.7 TP row; §5 long-context analogue: "optionally shard
the scene (BVH/textures) across chips").

The reference is single-GPU and holds the whole scene in unified memory;
there is no counterpart. TPU-native design:

  * the triangle soup is split into `n_parts` spatially-coherent chunks
    (morton order over centroids, contiguous ranges) and each device
    builds/owns ONE chunk's SAH BVH — per-device geometry memory is
    ~T/n_parts rows instead of T;
  * a closest-hit query runs under `shard_map`: rays are REPLICATED, each
    device traverses its local sub-BVH only, then one all_gather + argmin
    combines the per-device candidate hits over the device axis. The only
    collective is that (R,) reduction per traversal — rays never migrate,
    geometry never moves;
  * compute cost rises (every ray visits every sub-tree) — the classic
    memory/compute trade of object-space-partitioned ray tracing; use
    when the scene does not fit one device.

Exactness: the min over chunk-BVH hits is the global closest hit; verified
against the single-tree traversal in tests/test_scene_shard.py.
"""
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.utils.math import encode_morton3


class ShardedGeometry(NamedTuple):
    """Per-part stacked geometry: leading axis = device/part. Every part
    shares ONE static layout: internal rows in [0, n_int), leaf rows in
    [n_int, n_int + max_leaves) — padding rows hold inverted boxes /
    degenerate triangles that can never be visited or hit."""

    rows: jnp.ndarray      # (n_parts, n_int + max_leaves, ROW_W)
    src: jnp.ndarray       # (n_parts, max_leaves*K) i32 -> ORIGINAL tri id
    n_int: int             # common static internal-row boundary
    depth: int             # max stack bound across parts
    leaf_k: int


def build_sharded(p0, p1, p2, n_parts, leaf_k=bvhlib.LEAF_K):
    """Split T triangles into n_parts morton-contiguous chunks and build a
    BVH per chunk, normalized to one common row layout."""
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)
    T = p0.shape[0]
    cent = (np.minimum(np.minimum(p0, p1), p2)
            + np.maximum(np.maximum(p0, p1), p2)) * 0.5
    lo = cent.min(0)
    ext = np.maximum(cent.max(0) - lo, 1e-30)
    q = np.clip(((cent - lo) / ext) * 1023.0, 0, 1023.0).astype(np.uint32)
    order = np.argsort(
        encode_morton3(q[:, 0], q[:, 1], q[:, 2]), kind="stable")

    bounds = np.linspace(0, T, n_parts + 1).astype(np.int64)
    builds = []
    for i in range(n_parts):
        ids = order[bounds[i]:bounds[i + 1]]
        if ids.size == 0:
            ids = order[:1]  # degenerate tiny scene: duplicate a tri
        b = bvhlib.build_bvh(p0[ids], p1[ids], p2[ids], leaf_k=leaf_k)
        builds.append((b, ids))

    # common boundary: >=1 so a leaf-only chunk (build_bvh returns n_int=0
    # for chunks <= leaf_k tris) can get a synthesized one-child root —
    # traversal always starts at internal row 0, so without a root such a
    # part's triangles were unreachable (ADVICE r4 medium)
    B = max(1, max(b.n_int for b, _ in builds))
    max_leaves = max(b.rows.shape[0] - b.n_int for b, _ in builds)
    R_W = builds[0][0].rows.shape[1]
    BIG = np.float32(3e38)

    rows = np.zeros((n_parts, B + max_leaves, R_W), np.float32)
    # padding internal rows: inverted boxes + child -1 (never visited)
    rows[:, :B, 0: 6 * bvhlib.WIDTH: 6] = BIG
    rows[:, :B, 3: 6 * bvhlib.WIDTH: 6] = -BIG
    rows[:, :B, 6 * bvhlib.WIDTH: 7 * bvhlib.WIDTH] = -1.0
    srcs = np.full((n_parts, max_leaves * leaf_k), -1, np.int32)
    depth = 1
    for i, (b, ids) in enumerate(builds):
        n_leaves = b.rows.shape[0] - b.n_int
        rows[i, :b.n_int] = b.rows[:b.n_int]
        rows[i, B: B + n_leaves] = b.rows[b.n_int:]
        # leaf child ids shift by the boundary padding
        shift = B - b.n_int
        if shift and b.n_int:
            blk = rows[i, :b.n_int, 6 * bvhlib.WIDTH: 7 * bvhlib.WIDTH]
            rows[i, :b.n_int, 6 * bvhlib.WIDTH: 7 * bvhlib.WIDTH] = np.where(
                blk >= b.n_int, blk + shift, blk)
        if b.n_int == 0:
            # synthesized one-child root: slot 0 box = chunk bounds,
            # child -> the (shifted) single leaf row
            tri = np.stack([p0[ids], p1[ids], p2[ids]])   # (3, n, 3)
            rows[i, 0, 0:3] = tri.min((0, 1))
            rows[i, 0, 3:6] = tri.max((0, 1))
            rows[i, 0, 6 * bvhlib.WIDTH] = float(B)
            depth = max(depth, 2)
        # remap chunk-local src to ORIGINAL triangle ids
        srcs[i, :b.n_padded] = np.where(
            b.src >= 0, ids[np.clip(b.src, 0, ids.size - 1)], -1)
        depth = max(depth, b.max_depth)

    return ShardedGeometry(
        rows=jnp.asarray(rows), src=jnp.asarray(srcs),
        n_int=int(B), depth=int(depth), leaf_k=int(leaf_k),
    )


def closest_hit_sharded(geom: ShardedGeometry, o, d, t_max, devices=None):
    """Global closest hit with geometry sharded over devices: rays
    replicated, per-device traversal of the local sub-BVH, then an
    all_gather + argmin over the device axis. Returns (t, prim) with prim
    the ORIGINAL triangle index (-1 miss)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devices = list(devices if devices is not None else jax.devices())
    n = geom.rows.shape[0]
    assert n == len(devices), (n, len(devices))
    mesh = Mesh(np.asarray(devices), ("tp",))
    n_int, depth, K = geom.n_int, geom.depth, geom.leaf_k

    def shard_fn(rows, src, o, d, t_max):
        t, prim, _ = bvhlib._traverse(
            rows[0], n_int, depth, K, o, d, t_max)
        orig = jnp.where(prim >= 0, src[0][jnp.maximum(prim, 0)], -1)
        # min-reduce over the device axis: smallest t wins. t and prim are
        # gathered SEPARATELY — packing prim ids into float32 loses ids
        # >= 2^24, exactly the huge-scene regime this module exists for
        # (ADVICE r4 medium)
        ts = jax.lax.all_gather(t, "tp")                   # (n, R) f32
        ps = jax.lax.all_gather(orig, "tp")                # (n, R) i32
        best = jnp.argmin(ts, axis=0)
        rr = jnp.arange(t.shape[0])
        return ts[best, rr], ps[best, rr]

    key = ("closest", n, tuple(id(dv) for dv in devices), n_int, depth, K,
           tuple(geom.rows.shape), tuple(o.shape))
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("tp"), P("tp"), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        _JIT_CACHE[key] = fn
    return fn(geom.rows, geom.src, o, d, t_max)


_JIT_CACHE = {}


# ------------------------------------------------------ renderer integration


class SceneShard(NamedTuple):
    """Fully-sharded per-triangle geometry for the production renderer
    (VERDICT r4 missing #3: scene sharding as a renderer feature). Leading
    axis = device part; under the ("tp",) shard_map each device sees its
    slice with leading axis 1. EVERY per-triangle table is sharded — BVH
    rows, hit-record rows, and refit vertices — so per-device geometry
    memory is ~1/n_parts of the replicated path's.

    Spheres/disks stay replicated by design: they are analytic primitives
    whose tables are O(bytes) regardless of scene size — sharding them has
    no memory motivation (documented SURVEY §2.7 TP-row choice)."""

    rows: jnp.ndarray    # (n_parts, n_int + max_leaves, ROW_W)
    recv: jnp.ndarray    # (n_parts, max_leaves*K, RW+9): packed hit-record
                         # row (SceneArrays.tri_rec layout) ++ p0 p1 p2
                         # refit vertices — ONE row gather per winning lane
                         # instead of four (gathers cost per ROW, PROFILE §2)
    n_int: jnp.ndarray   # (n_int, 0) zero-byte static marker
    depth: jnp.ndarray   # (depth, 0)
    leaf_k: jnp.ndarray  # (K, 0)


def build_scene_shard(scene, n_parts, leaf_k=None):
    """Split a compiled (non-instanced) scene's triangle soup into n_parts
    morton chunks with per-part BVHs + record tables. Host-side numpy."""
    leaf_k = leaf_k or bvhlib.LEAF_K
    p0 = np.asarray(scene.tri_p0)
    p1 = np.asarray(scene.tri_p1)
    p2 = np.asarray(scene.tri_p2)
    rec = np.asarray(scene.tri_rec)
    # drop the single-tree build's padding rows (degenerate all-zero): a
    # row is live if its record row is addressable; use nonzero area OR
    # any nonzero vertex (padding rows are all-zero by construction)
    live = (np.abs(p0).sum(1) + np.abs(p1).sum(1) + np.abs(p2).sum(1)) > 0
    ids_live = np.nonzero(live)[0]
    g = build_sharded(p0[ids_live], p1[ids_live], p2[ids_live], n_parts,
                      leaf_k=leaf_k)
    src = np.asarray(g.src)                       # (n_parts, L*K) -> live idx
    orig = np.where(src >= 0, ids_live[np.clip(src, 0, ids_live.size - 1)], -1)
    okm = (src >= 0)[..., None]
    safe = np.clip(orig, 0, rec.shape[0] - 1)
    recv_p = np.where(
        okm,
        np.concatenate([rec[safe], p0[safe], p1[safe], p2[safe]], axis=-1),
        0.0,
    )
    return SceneShard(
        rows=jnp.asarray(g.rows),
        recv=jnp.asarray(recv_p.astype(np.float32)),
        n_int=jnp.zeros((g.n_int, 0), jnp.float32),
        depth=jnp.zeros((g.depth, 0), jnp.float32),
        leaf_k=jnp.zeros((g.leaf_k, 0), jnp.float32),
    )


def shard_bytes(sh: SceneShard):
    """Per-device geometry bytes (leading axis already per-part)."""
    per = 0
    for a in (sh.rows, sh.recv):
        per += int(np.prod(a.shape[1:])) * 4
    return per


def closest_hit_local(sh_local: SceneShard, o, d, t_max, axis="tp"):
    """Inside a ("tp",) shard_map: local traversal + one all_gather to
    resolve the global winner. Returns (t (R,), hit record row (R, 24),
    p0/p1/p2 (R,3) of the winning triangle, valid (R,)) — everything the
    SceneHit assembly needs, already argmin-selected across parts.

    The candidate pack rides ONE collective: [t, rec row, p0 p1 p2 (9)]
    per lane per part."""
    n_int = sh_local.n_int.shape[0]
    depth = sh_local.depth.shape[0]
    K = sh_local.leaf_k.shape[0]
    t, prim, _ = bvhlib._traverse(
        sh_local.rows[0], n_int, depth, K, o, d, t_max)
    found = prim >= 0
    pc = jnp.maximum(prim, 0)
    rv = jnp.where(found[:, None], sh_local.recv[0][pc], 0.0)  # (R, RW+9)
    t_c = jnp.where(found, t, jnp.inf)
    RW = rv.shape[-1] - 9
    cand = jnp.concatenate([t_c[:, None], rv], axis=1)     # (R, 1+RW+9)
    allc = jax.lax.all_gather(cand, axis)             # (n_parts, R, 1+RW+9)
    best = jnp.argmin(allc[:, :, 0], axis=0)          # (R,)
    rr = jnp.arange(o.shape[0])
    win = allc[best, rr]                              # (R, 1+RW+9)
    t_w = win[:, 0]
    valid = jnp.isfinite(t_w)
    return (jnp.where(valid, t_w, jnp.inf), win[:, 1:1 + RW],
            win[:, 1 + RW:4 + RW], win[:, 4 + RW:7 + RW],
            win[:, 7 + RW:10 + RW], valid)


def any_hit_local(sh_local: SceneShard, o, d, t_max, axis="tp"):
    """Inside a ("tp",) shard_map: local any-hit OR-reduced over parts."""
    n_int = sh_local.n_int.shape[0]
    depth = sh_local.depth.shape[0]
    K = sh_local.leaf_k.shape[0]
    _, prim, _ = bvhlib._traverse(
        sh_local.rows[0], n_int, depth, K, o, d, t_max, any_hit=True)
    occ = (prim >= 0).astype(jnp.float32)
    return jax.lax.pmax(occ, axis) > 0.0

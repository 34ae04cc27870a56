"""Decompose the BVH traversal body's per-iteration cost at NARROW width.

PROFILE §9: an iteration costs ~1.5 ms even at 4096 lanes — a
width-independent floor that gates the ladder's tail rungs. This probe
times 16 fixed iterations of stripped body variants to locate the floor:

  full    — the production body
  gather  — rows[nid] only (result reduced into t_best so it's not DCE'd)
  slab    — gather + 8-wide slab test
  leaf    — gather + leaf_block_presheared
  nostack — full body with stack push/pop replaced by pass-through

Usage: python tools/probe_floor.py [levels] [width ...]
"""
import sys
import time

sys.path.insert(0, ".")
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pbrt_tpu.accel import bvh as bvhlib
from pbrt_tpu.geometry import intersect as ix
from pbrt_tpu.utils.math import INFINITY

from probe_bvh import setup, bounce_rays, init_state


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main(levels, widths):
    scene, rows, n_int, depth, o, d = setup(levels, 262144)
    ob, db = bounce_rays(scene, rows, n_int, depth, o, d, 262144)
    SD = depth + 2
    N = 16
    K = bvhlib.LEAF_K
    WIDTH = bvhlib.WIDTH
    n_rows = rows.shape[0]
    P = n_rows - n_int
    bits = (1 << jnp.arange(WIDTH, dtype=jnp.int32))[None, :]

    def variant_body(kind, o, d):
        inv_d = bvhlib._safe_inv(d)
        kz, sx, sy, sz = ix.ray_shear(d)
        slot_ids = jnp.arange(SD, dtype=jnp.int32)

        def body(st):
            live = st.cur != bvhlib._DONE
            nid = jnp.maximum(st.cur, 0)
            row = rows[nid]
            if kind == "gather":
                # keep the gather live, nothing else
                t_best = st.t_best + 0.0 * row[:, 0]
                return st._replace(t_best=t_best,
                                   cur=(st.cur + 1) % n_rows,
                                   it=st.it + 1)
            is_leaf = live & (nid >= n_int)
            chunk = jnp.clip(nid - n_int, 0, max(P - 1, 0))
            if kind == "slab":
                boxes = row[:, : 6 * WIDTH].reshape(row.shape[0], WIDTH, 6)
                tn, hit = bvhlib._slab8(o, inv_d, boxes, st.t_best)
                t_best = st.t_best + 0.0 * tn[:, 0]
                return st._replace(
                    t_best=t_best,
                    cur=(st.cur + jnp.any(hit, -1)) % n_rows,
                    it=st.it + 1)
            if kind == "leaf":
                t_best, prim = ix.leaf_block_presheared(
                    row, K, o, kz, sx, sy, sz, st.t_best, st.prim,
                    is_leaf, chunk)
                return st._replace(t_best=t_best, prim=prim,
                                   cur=(st.cur + 1) % n_rows,
                                   it=st.it + 1)
            # full / nostack
            t_best, prim = ix.leaf_block_presheared(
                row, K, o, kz, sx, sy, sz, st.t_best, st.prim,
                is_leaf, chunk)
            found = prim >= 0
            is_int = live & ~is_leaf
            boxes = row[:, : 6 * WIDTH].reshape(row.shape[0], WIDTH, 6)
            child = row[:, 6 * WIDTH: 7 * WIDTH].astype(jnp.int32)
            tn, hit = bvhlib._slab8(o, inv_d, boxes, t_best)
            hit &= is_int[:, None] & (child >= 0) & (
                (st.cmask[:, None] & bits) != 0)
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
            if kind == "nostack":
                cur_next = jnp.where(is_int & any_child, near_child,
                                     bvhlib._DONE)
                cur_next = jnp.where(live, cur_next, bvhlib._DONE)
                return st._replace(
                    cur=cur_next, t_best=t_best, prim=prim,
                    cmask=jnp.where(any_child, bvhlib._FRESH, rem_bits),
                    it=st.it + 1)
            push_n = jnp.where(n_rem == 1, single, nid)
            push_m = jnp.where(n_rem == 1, bvhlib._FRESH, rem_bits)
            do_push = is_int & (n_rem >= 1)
            at_sp = (slot_ids[None, :] == st.sp[:, None]) & do_push[:, None]
            stack_n, stack_m = bvhlib._stack_push(
                st.stack_n, st.stack_m, at_sp, push_n, push_m)
            sp = st.sp + do_push.astype(jnp.int32)
            need_pop = live & (is_leaf | ~any_child)
            can_pop = need_pop & (sp > 0)
            sp_pop = jnp.maximum(sp - 1, 0)
            at_pop = slot_ids[None, :] == sp_pop[:, None]
            popped_n, popped_m = bvhlib._stack_pop(stack_n, stack_m, at_pop)
            descend = is_int & any_child
            cur_next = jnp.where(
                descend, near_child,
                jnp.where(can_pop, popped_n, bvhlib._DONE))
            cmask_next = jnp.where(descend, bvhlib._FRESH, popped_m)
            sp = jnp.where(can_pop, sp_pop, sp)
            cur_next = jnp.where(live, cur_next, bvhlib._DONE)
            return bvhlib._St(cur=cur_next, cmask=cmask_next, sp=sp,
                              stack_n=stack_n, stack_m=stack_m,
                              t_best=t_best, prim=prim, it=st.it + 1)
        return body

    for W in widths:
        ow, dw = ob[:W], db[:W]
        for kind in ("full", "gather", "slab", "leaf", "nostack"):
            @jax.jit
            def fixed(ow, dw, kind=kind):
                body = variant_body(kind, ow, dw)
                st = init_state(W, SD, jnp.full((W,), INFINITY))
                return jax.lax.fori_loop(0, N, lambda i, s: body(s), st)

            dt, _ = timeit(fixed, ow, dw)
            print(f"W={W:7d} {kind:8s}: {N} iters {dt*1e3:8.1f} ms "
                  f"-> {dt/N*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    widths = [int(a) for a in sys.argv[2:]] or [4096, 16384]
    main(levels, widths)

"""Generate scenes/staircase-geo.ply — the detailed woodwork of the
BASELINE config-2 staircase interior (~70k triangles, binary PLY).

The r4 staircase was "staircase in name only" (182 triangles); the
reference gallery's staircase-class interiors carry 10^4-10^6 triangles.
This generator produces geometry at that class deterministically so the
asset is reproducible from source: beveled + grid-subdivided treads and
risers, two sawtooth stringers, turned balusters (lathed profile), and a
swept handrail. All coordinates live in the scene's world space (the
.pbrt places it without a transform).

Usage: python tools/make_staircase.py  (writes scenes/staircase-geo.ply)
"""
import os
import struct

import numpy as np

N_STEPS = 14
STEP_W = 2.0            # x extent of each tread
TREAD_D = 0.30          # z depth per step
RISE = 0.20             # y rise per step
X0, Z0 = 0.0, 0.0       # stair footprint origin


class Mesh:
    def __init__(self):
        self.v = []
        self.f = []

    def add(self, verts, faces):
        base = len(self.v)
        self.v.extend(verts)
        self.f.extend([(a + base, b + base, c + base) for a, b, c in faces])


def grid_quad(p00, p10, p01, nx, ny):
    """Subdivided parallelogram patch: p(u,v) = p00 + u*(p10-p00) + v*(p01-p00).
    Returns (verts, faces)."""
    p00 = np.asarray(p00, float)
    du = np.asarray(p10, float) - p00
    dv = np.asarray(p01, float) - p00
    verts = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            verts.append(p00 + du * (i / nx) + dv * (j / ny))
    faces = []
    for j in range(ny):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + nx + 1
            d = c + 1
            faces.append((a, b, d))
            faces.append((a, d, c))
    return verts, faces


def box(lo, hi, nx=2, ny=2, nz=2):
    """Grid-subdivided axis-aligned box."""
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    m = Mesh()
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    # +y / -y
    m.add(*grid_quad([x0, y1, z0], [x1, y1, z0], [x0, y1, z1], nx, nz))
    m.add(*grid_quad([x0, y0, z1], [x1, y0, z1], [x0, y0, z0], nx, nz))
    # +z / -z
    m.add(*grid_quad([x0, y0, z1], [x1, y0, z1], [x0, y1, z1], nx, ny))
    m.add(*grid_quad([x1, y0, z0], [x0, y0, z0], [x1, y1, z0], nx, ny))
    # +x / -x
    m.add(*grid_quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z1], nz, ny))
    m.add(*grid_quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z0], nz, ny))
    return m.v, m.f


def lathe(profile, center, n_seg=16):
    """Surface of revolution about the +y axis through `center`:
    profile = [(radius, y), ...] bottom->top. Closed with triangle fans."""
    cx, _, cz = center
    rings = []
    for r, y in profile:
        ring = []
        for k in range(n_seg):
            a = 2.0 * np.pi * k / n_seg
            ring.append((cx + r * np.cos(a), y, cz + r * np.sin(a)))
        rings.append(ring)
    verts = [v for ring in rings for v in ring]
    faces = []
    for j in range(len(rings) - 1):
        for k in range(n_seg):
            a = j * n_seg + k
            b = j * n_seg + (k + 1) % n_seg
            c = a + n_seg
            d = b + n_seg
            faces.append((a, b, d))
            faces.append((a, d, c))
    # caps
    for j, flip in ((0, True), (len(rings) - 1, False)):
        cidx = len(verts)
        ys = rings[j][0][1]
        verts.append((cx, ys, cz))
        for k in range(n_seg):
            a = j * n_seg + k
            b = j * n_seg + (k + 1) % n_seg
            faces.append((cidx, b, a) if flip else (cidx, a, b))
    return verts, faces


def tube(path, radius, n_seg=12):
    """Swept circular tube along a 3D polyline (parallel-transport frames)."""
    path = np.asarray(path, float)
    t = np.gradient(path, axis=0)
    t /= np.maximum(np.linalg.norm(t, axis=1, keepdims=True), 1e-12)
    # initial frame
    n = np.array([0.0, 1.0, 0.0])
    n = n - t[0] * np.dot(n, t[0])
    n /= np.linalg.norm(n)
    verts = []
    for i, p in enumerate(path):
        if i:
            # transport n across the tangent change
            axis = np.cross(t[i - 1], t[i])
            s = np.linalg.norm(axis)
            if s > 1e-9:
                axis /= s
                ang = np.arcsin(min(s, 1.0))
                n = (n * np.cos(ang) + np.cross(axis, n) * np.sin(ang)
                     + axis * np.dot(axis, n) * (1 - np.cos(ang)))
        b = np.cross(t[i], n)
        for k in range(n_seg):
            a = 2.0 * np.pi * k / n_seg
            verts.append(p + radius * (np.cos(a) * n + np.sin(a) * b))
    faces = []
    for i in range(len(path) - 1):
        for k in range(n_seg):
            a = i * n_seg + k
            bq = i * n_seg + (k + 1) % n_seg
            c = a + n_seg
            d = bq + n_seg
            faces.append((a, bq, d))
            faces.append((a, d, c))
    return verts, faces


def build():
    m = Mesh()
    # ---- treads + risers (beveled boxes, grid-subdivided for real density)
    for s in range(N_STEPS):
        y = (s + 1) * RISE
        z = Z0 + s * TREAD_D
        # tread slab with nosing overhang
        m.add(*box([X0, y - 0.035, z - 0.03], [X0 + STEP_W, y, z + TREAD_D],
                   nx=32, ny=3, nz=8))
        # riser board
        m.add(*box([X0 + 0.02, y - RISE, z - 0.015],
                   [X0 + STEP_W - 0.02, y - 0.035, z + 0.015],
                   nx=28, ny=6, nz=2))
    # ---- stringers: sawtooth side boards following the steps
    for x_side in (X0 - 0.04, X0 + STEP_W):
        for s in range(N_STEPS):
            y = (s + 1) * RISE
            z = Z0 + s * TREAD_D
            m.add(*box([x_side, 0.0, z], [x_side + 0.04, y, z + TREAD_D],
                       nx=2, ny=8, nz=6))
    # ---- balusters: two turned spindles per step on the open (x=0) side
    profile = [(0.030, 0.00), (0.036, 0.02), (0.022, 0.08), (0.030, 0.16),
               (0.018, 0.28), (0.026, 0.40), (0.016, 0.52), (0.024, 0.62),
               (0.030, 0.68), (0.014, 0.72)]
    for s in range(N_STEPS):
        y = (s + 1) * RISE
        z = Z0 + s * TREAD_D
        for dz in (0.05, 0.15, 0.25):
            base = np.array([X0 + 0.06, 0.0, z + dz])
            prof = [(r, y + py) for r, py in profile]
            m.add(*lathe(prof, [base[0], 0.0, base[2]], n_seg=18))
    # ---- handrail: swept tube over the balusters
    pts = []
    for s in range(N_STEPS * 6 + 1):
        f = s / 6.0
        y = (f + 1) * RISE + 0.74
        z = Z0 + f * TREAD_D + 0.15
        pts.append([X0 + 0.06, y, z])
    m.add(*tube(pts, 0.045, n_seg=16))
    # lower guide rail
    pts2 = [[x, y - 0.35, z] for x, y, z in pts]
    m.add(*tube(pts2, 0.028, n_seg=14))
    # newel post at the bottom
    newel = [(0.06, 0.0), (0.07, 0.05), (0.05, 0.3), (0.065, 0.6),
             (0.045, 0.9), (0.055, 1.0), (0.02, 1.06)]
    m.add(*lathe(newel, [X0 + 0.06, 0.0, Z0 - 0.12], n_seg=18))
    return np.asarray(m.v, np.float32), np.asarray(m.f, np.int32)


def write_ply(path, verts, faces):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"comment generated by tools/make_staircase.py\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        f.write(verts.astype("<f4").tobytes())
        rec = np.empty((len(faces),), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        rec["n"] = 3
        rec["idx"] = faces
        f.write(rec.tobytes())


if __name__ == "__main__":
    verts, faces = build()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scenes", "staircase-geo.ply")
    write_ply(out, verts, faces)
    print(f"{out}: {len(verts)} verts, {len(faces)} tris")

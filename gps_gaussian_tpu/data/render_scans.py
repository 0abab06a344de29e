"""Offline scan -> multiview training-data renderer (capability of
reference prepare_data/render_data.py + the vendored taichi_three).

Takes textured human scans (OBJ + optional texture image), normalises them
to ~1.80 m height, and renders the 16-camera ring layout with 2 source +
3 novel views per sample (reference render_data.py:195-228), writing the
exact on-disk layout the dataset loader consumes (see data/synth.py).

Rendering runs through the native C++ rasterizer (gps_gaussian_tpu.native,
numpy fallback) — the TPU-era replacement of the taichi CUDA JIT renderer.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from gps_gaussian_tpu import native
from gps_gaussian_tpu.data.synth import ring_camera, save_view, ARC_DEG

TARGET_HEIGHT = 1.80   # reference render_data.py height normalisation


def read_obj(path):
    """Minimal OBJ reader: v / vt / f (triangulates fans).

    Capability of taichi_three loader.py:15-71; returns
    (verts (N,3) f32, faces (M,3) i32, uv (N,2) f32 or None).
    UVs are re-indexed per-vertex (last wins) — adequate for scan meshes
    whose vertices have unique texture coordinates.
    """
    verts, uvs, faces, face_uvs = [], [], [], []
    with open(path) as f:
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "v":
                verts.append([float(x) for x in t[1:4]])
            elif t[0] == "vt":
                uvs.append([float(x) for x in t[1:3]])
            elif t[0] == "f":
                idx = []
                for w in t[1:]:
                    parts = w.split("/")
                    vi = int(parts[0])
                    ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    idx.append((vi - 1 if vi > 0 else len(verts) + vi,
                                ti - 1 if ti > 0 else None))
                for k in range(1, len(idx) - 1):   # fan triangulation
                    faces.append([idx[0][0], idx[k][0], idx[k + 1][0]])
                    face_uvs.append([idx[0][1], idx[k][1], idx[k + 1][1]])

    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    uv = None
    if uvs:
        uv = np.zeros((len(verts), 2), np.float32)
        uvs = np.asarray(uvs, np.float32)
        for tri, tri_uv in zip(faces, face_uvs):
            for v, t in zip(tri, tri_uv):
                if t is not None:
                    uv[v] = uvs[t]
    return verts, faces, uv


def normalize_scan(verts: np.ndarray, rng: Optional[np.random.Generator]
                   = None) -> np.ndarray:
    """Scale to 1.80 m (±0.05 randomised per scan), feet on y=0, centered
    with bbox-aware xz jitter (reference render_data.py:108-124: shorter
    scans may move more, scans with >1 m spread barely move)."""
    v = np.asarray(verts, np.float32).copy()
    lo, hi = v.min(axis=0), v.max(axis=0)
    height = TARGET_HEIGHT
    if rng is not None:
        height = TARGET_HEIGHT + rng.uniform(-0.05, 0.05)
    scale = height / max(hi[1] - lo[1], 1e-6)
    center = (lo + hi) * 0.5
    v = (v - center) * scale
    v[:, 1] -= v[:, 1].min()
    if rng is not None:
        move = 0.1 if height < TARGET_HEIGHT else 0.05
        ext = v.max(axis=0) - v.min(axis=0)
        if ext[0] > 1.0 or ext[2] > 1.0:
            move = 0.01
        v[:, 0] += rng.uniform(-move, move)
        v[:, 2] += rng.uniform(-move, move)
    return v


def scan_yaw_degrees(scan_dir: Path, verts: np.ndarray) -> float:
    """Body-facing yaw normalisation angle for the camera ring.

    Reference render_data.py:135-142 reads the SMPL-X global_orient y
    component so every scan is rendered from a pose-normalised ring.  When
    the SMPL-X fit is present (THuman2.0_Smpl_X_Paras/<scan>/smplx_param.pkl
    next to the scan, or smplx_param.pkl inside the scan dir) use it;
    otherwise fall back to a PCA estimate: humans are wider (shoulder axis)
    than deep, so the principal xz axis is left-right and the facing
    direction is its perpendicular (mod 180 deg — good enough to keep the
    source arc on the body, which is what the normalisation is for)."""
    for cand in (scan_dir / "smplx_param.pkl",
                 scan_dir.parent.parent / "THuman2.0_Smpl_X_Paras"
                 / scan_dir.name / "smplx_param.pkl"):
        if cand.exists():
            import pickle

            with open(cand, "rb") as f:
                para = pickle.load(f)
            y_orient = float(np.asarray(para["global_orient"]).reshape(-1,
                                                                       3)[0,
                                                                          1])
            return float(np.degrees(y_orient))
    # PCA fallback on the xz footprint.  A shoulder axis at world angle
    # theta (from +x toward +z) needs the ring rotated by -theta to face
    # the body front: rotationY(a) maps +x to (cos a, -sin a) in xz, so
    # the SIGN must be negated or the estimate lands at -theta (2*theta
    # away from the SMPL-X path, verified numerically).
    xz = verts[:, [0, 2]] - verts[:, [0, 2]].mean(axis=0)
    cov = xz.T @ xz / max(len(xz), 1)
    evals, evecs = np.linalg.eigh(cov)
    major = evecs[:, np.argmax(evals)]        # shoulder (left-right) axis
    return float(-np.degrees(np.arctan2(major[1], major[0])))


def render_scan_views(verts, faces, uv, tex, root: Path, scan: str,
                      seed: int, res: int = 1024, hr: bool = True,
                      yaw_deg: float = 0.0):
    """Render and save the 5-view arc for one scan (vid 0,1 sources;
    2,3,4 novel; novel views also get the 2x hi-res target).

    yaw_deg rotates the whole ring to the scan's body facing (reference
    render_data.py:131-142: integer base angle within +-arc/2 of front,
    plus the SMPL-X yaw)."""
    rng = np.random.default_rng(seed)
    verts = normalize_scan(verts, rng)
    vert_color = np.full((len(verts), 3), 0.7, np.float32)

    base_deg = rng.integers(-ARC_DEG // 2, ARC_DEG // 2) + yaw_deg
    base = np.deg2rad(float(base_deg))
    arc = np.deg2rad(ARC_DEG)
    angles = {
        0: base,
        1: base + arc,
        2: base + rng.uniform(0.25, 0.75) * arc,
        3: base + 0.5 * arc,
        4: base + rng.uniform(0.1, 0.9) * arc,
    }

    def render(intr, extr, r):
        rgb, invz, mask, _ = native.rasterize_mesh(
            verts, faces, vert_color, intr, extr, r, r, uv=uv, tex=tex)
        return (np.clip(rgb, 0, 1) * 255).astype(np.uint8), mask, invz

    for vid, ang in angles.items():
        intr, extr = ring_camera(ang, res)
        rgb8, mask8, invz = render(intr, extr, res)
        rgb8_hr = None
        if hr and vid >= 2:
            intr_hr, _ = ring_camera(ang, res * 2)
            rgb8_hr, _, _ = render(intr_hr, extr, res * 2)
        save_view(root, scan, vid, rgb8, mask8, invz, intr, extr, rgb8_hr)


def render_dataset(scan_dir: str, out_root: str, res: int = 1024,
                   hr: bool = True, val_every: int = 10, seed: int = 1314):
    """Render every scan under scan_dir (expects <scan>/<scan>.obj and an
    optional material texture png/jpg next to it) into train/val splits."""
    from PIL import Image

    scan_dir = Path(scan_dir)
    out_root = Path(out_root)
    scans = sorted(p for p in scan_dir.iterdir() if p.is_dir())
    for i, sp in enumerate(scans):
        objs = sorted(sp.glob("*.obj"))
        if not objs:
            continue
        verts, faces, uv = read_obj(objs[0])
        tex = None
        texs = sorted(list(sp.glob("*.jpg")) + list(sp.glob("*.png")))
        if texs:
            tex = np.asarray(Image.open(texs[0]).convert("RGB"),
                             np.float32) / 255.0
        split = "val" if (i % val_every == val_every - 1) else "train"
        yaw = scan_yaw_degrees(sp, verts)
        render_scan_views(verts, faces, uv, tex, out_root / split, sp.name,
                          seed + i, res, hr, yaw_deg=yaw)
        yield sp.name, split

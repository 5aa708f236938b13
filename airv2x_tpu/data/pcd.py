"""Minimal PCD point-cloud reader (pypcd replacement, numpy only).

Supports the subset the AirV2X dataset uses (utils/pcd_utils.pcd_to_np):
x/y/z/intensity fields in ascii or binary little-endian float32 PCD files.
NaN rows are dropped; intensity defaults to 1.0 when absent.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {("F", 4): "<f4", ("F", 8): "<f8", ("I", 4): "<i4", ("U", 4): "<u4",
           ("I", 1): "<i1", ("U", 1): "<u1", ("I", 2): "<i2", ("U", 2): "<u2"}


def read_pcd(path: str, return_label: bool = False):
    """Read a .pcd file -> (N, 4) float32 [x, y, z, intensity].

    With ``return_label`` also returns the per-point weather label the
    V2X-R simulated-weather clouds carry in the GREEN color channel
    (reference pcd_utils.pcd_to_np(get_weather=True) reads
    ``pcd.colors[:, 1]``; intensity rides in the RED channel, :64-80).
    Files without a color field get label 0 (all points clean)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, val = line.partition(" ")
            header[key.upper()] = val
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"].split()
        sizes = [int(s) for s in header["SIZE"].split()]
        types = header["TYPE"].split()
        counts = [int(c) for c in header.get("COUNT", " ".join(["1"] * len(fields))).split()]
        n = int(header["POINTS"])
        mode = header["DATA"].lower()

        np_dtype = np.dtype(
            [
                (name if cnt == 1 else f"{name}", _DTYPES[(t, s)], (cnt,))
                if cnt > 1
                else (name, _DTYPES[(t, s)])
                for name, s, t, cnt in zip(fields, sizes, types, counts)
            ]
        )

        if mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            raw = raw.reshape(n, -1)
            cols = {}
            i = 0
            for name, cnt in zip(fields, counts):
                cols[name] = raw[:, i] if cnt == 1 else raw[:, i : i + cnt]
                i += cnt
        elif mode == "binary":
            data = np.frombuffer(f.read(n * np_dtype.itemsize), dtype=np_dtype, count=n)
            cols = {name: np.asarray(data[name], np.float64) for name in fields}
        else:
            raise ValueError(f"unsupported PCD DATA mode: {mode}")

    x = cols.get("x")
    y = cols.get("y")
    z = cols.get("z")
    label = np.zeros_like(np.asarray(x, np.float32))
    if "rgb" in cols:
        # packed RGB (PCL convention): byte lanes R,G,B, stored either as a
        # reinterpreted float32 or a uint32; open3d's pcd.colors normalizes
        # by 255 — intensity=R/255, label=G/255
        if types[fields.index("rgb")] == "U":
            u = np.asarray(cols["rgb"], np.float64).astype(np.uint32)
        else:
            u = np.ascontiguousarray(
                np.asarray(cols["rgb"], np.float64).astype(np.float32)
            ).view(np.uint32)
        inten = ((u >> 16) & 0xFF).astype(np.float32) / 255.0
        label = ((u >> 8) & 0xFF).astype(np.float32) / 255.0
    else:
        inten = cols.get("intensity", np.ones_like(x))
    pts = np.stack([x, y, z, inten], axis=-1).astype(np.float32)
    keep = ~np.isnan(pts).any(axis=1)
    if return_label:
        return pts[keep], label[keep]
    return pts[keep]


def write_pcd(path: str, points: np.ndarray, binary: bool = True,
              label: np.ndarray | None = None) -> None:
    """Write (N, 4) [x, y, z, intensity] to a PCD file (test fixtures).

    With ``label`` (per-point weather label in [0, 1]) the intensity+label
    pair is packed into a V2X-R-style float32 rgb column instead
    (R=intensity, G=label)."""
    n = len(points)
    pts = np.asarray(points, np.float32)
    if label is not None:
        r = np.clip(np.round(pts[:, 3] * 255.0), 0, 255).astype(np.uint32)
        g = np.clip(np.round(np.asarray(label) * 255.0), 0, 255).astype(
            np.uint32
        )
        rgb = ((r << 16) | (g << 8)).view(np.float32)
        pts = np.concatenate([pts[:, :3], rgb[:, None]], axis=1)
        fields = "x y z rgb"
    else:
        fields = "x y z intensity"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F F\n"
        "COUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(pts.astype("<f4").tobytes())
        else:
            np.savetxt(f, pts, fmt="%.9g")

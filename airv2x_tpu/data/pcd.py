"""Minimal PCD point-cloud reader (pypcd replacement, numpy only).

Supports the subset the AirV2X dataset uses (utils/pcd_utils.pcd_to_np):
x/y/z/intensity fields in ascii or binary little-endian float32 PCD files.
NaN rows are dropped; intensity defaults to 1.0 when absent.
"""

from __future__ import annotations

import numpy as np

_DTYPES = {("F", 4): "<f4", ("F", 8): "<f8", ("I", 4): "<i4", ("U", 4): "<u4",
           ("I", 1): "<i1", ("U", 1): "<u1", ("I", 2): "<i2", ("U", 2): "<u2"}


def read_pcd(path: str) -> np.ndarray:
    """Read a .pcd file -> (N, 4) float32 [x, y, z, intensity]."""
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
    inten = cols.get("intensity", np.ones_like(x))
    pts = np.stack([x, y, z, inten], axis=-1).astype(np.float32)
    return pts[~np.isnan(pts).any(axis=1)]


def write_pcd(path: str, points: np.ndarray, binary: bool = True) -> None:
    """Write (N, 4) [x, y, z, intensity] to a PCD file (test fixtures)."""
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z intensity\n"
        "SIZE 4 4 4 4\n"
        "TYPE F F F F\n"
        "COUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        pts = np.asarray(points, np.float32)
        if binary:
            f.write(pts.astype("<f4").tobytes())
        else:
            np.savetxt(f, pts, fmt="%.6f")

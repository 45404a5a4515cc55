"""Self-contained PLY I/O: generic codec + the 3DGS interchange schema.

The Gaussian snapshot format must stay byte-compatible with the reference and
the wider 3DGS ecosystem (``scene/gaussian_model.py:218-258``): binary
little-endian, one ``vertex`` element with float32 properties

  x y z nx ny nz f_dc_0..2 f_rest_0..(3K-4) opacity scale_0..2 rot_0..3

all *raw* (pre-activation) values; f_rest stored channel-major (all K-1
coefficients of R, then G, then B — the transpose(1,2).flatten layout of the
reference). load restores them to the [N, K-1, 3] layout used internally.

No external plyfile dependency: a minimal numpy structured-array codec below
handles binary little-endian and ascii PLY with a single element.
"""

from __future__ import annotations

import os

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "short": "i2", "ushort": "u2",
    "int": "i4", "uint": "u4", "int8": "i1", "uint8": "u1",
    "int16": "i2", "uint16": "u2", "int32": "i4", "uint32": "u4",
    "float": "f4", "double": "f8", "float32": "f4", "float64": "f8",
}
_INV_DTYPES = {"f4": "float", "f8": "double", "u1": "uchar", "i4": "int",
               "i1": "char", "u4": "uint", "i2": "short", "u2": "ushort"}


def read_ply(path: str) -> np.ndarray:
    """Read a single-element PLY into a numpy structured array."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        count = 0
        props: list[tuple[str, str]] = []
        element_seen = False
        while True:
            line = f.readline().strip().decode("ascii")
            if line.startswith("comment"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                if element_seen:
                    raise ValueError("multi-element PLY not supported")
                element_seen = True
                count = int(line.split()[2])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    raise ValueError("list properties not supported")
                props.append((parts[2], _PLY_DTYPES[parts[1]]))
            elif line == "end_header":
                break
        if fmt == "binary_little_endian":
            dtype = np.dtype([(n, "<" + t) for n, t in props])
            return np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
        if fmt == "binary_big_endian":
            dtype = np.dtype([(n, ">" + t) for n, t in props])
            return np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
        if fmt == "ascii":
            dtype = np.dtype([(n, t) for n, t in props])
            rows = [tuple(f.readline().split()) for _ in range(count)]
            return np.array(rows, dtype=dtype)
        raise ValueError(f"unsupported PLY format {fmt}")


def write_ply(path: str, data: np.ndarray, element: str = "vertex") -> None:
    """Write a numpy structured array as binary little-endian PLY."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0", f"element {element} {len(data)}"]
    le = data.astype(np.dtype([(n, "<" + data.dtype[n].str[1:]) for n in data.dtype.names]))
    for name in data.dtype.names:
        kind = data.dtype[name].str[1:]
        header.append(f"property {_INV_DTYPES[kind]} {name}")
    header.append("end_header\n")
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(le.tobytes())


# ----------------------------------------------------------------------------
# point clouds (SfM init; dataset_readers.py:156-182)
# ----------------------------------------------------------------------------


def read_pointcloud_ply(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (points [N,3] f32, colors [N,3] f32 in [0,1], normals [N,3])."""
    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    if "red" in v.dtype.names:
        cols = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32) / 255.0
    else:
        cols = np.full_like(pts, 0.5)
    if "nx" in v.dtype.names:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], 1).astype(np.float32)
    else:
        normals = np.zeros_like(pts)
    return pts, cols, normals


def write_pointcloud_ply(path: str, points: np.ndarray, colors_u8: np.ndarray) -> None:
    """Schema of the reference's storePly: xyz f4, nxnynz f4 (zero), rgb u1."""
    dtype = [(n, "f4") for n in ("x", "y", "z", "nx", "ny", "nz")] + [
        (n, "u1") for n in ("red", "green", "blue")
    ]
    arr = np.empty(points.shape[0], dtype=dtype)
    for i, n in enumerate(("x", "y", "z")):
        arr[n] = points[:, i].astype(np.float32)
        arr["n" + n] = 0.0
    for i, n in enumerate(("red", "green", "blue")):
        arr[n] = colors_u8[:, i].astype(np.uint8)
    write_ply(path, arr)


# ----------------------------------------------------------------------------
# Gaussian snapshots (gaussian_model.py:218-318)
# ----------------------------------------------------------------------------


def gaussian_ply_property_names(max_sh_degree: int) -> list[str]:
    k = (max_sh_degree + 1) ** 2
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(3 * (k - 1))]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    return names


def save_gaussian_ply(
    path: str,
    xyz: np.ndarray,
    features_dc: np.ndarray,  # [N,1,3]
    features_rest: np.ndarray,  # [N,K-1,3]
    logit_opacity: np.ndarray,  # [N,1]
    log_scale: np.ndarray,  # [N,3]
    quat: np.ndarray,  # [N,4]
) -> None:
    n = xyz.shape[0]
    k1 = features_rest.shape[1]
    max_deg = int(round((k1 + 1) ** 0.5)) - 1
    names = gaussian_ply_property_names(max_deg)
    # channel-major flatten: transpose [N,K,3] -> [N,3,K] then flatten
    f_dc = np.transpose(features_dc, (0, 2, 1)).reshape(n, -1)
    f_rest = np.transpose(features_rest, (0, 2, 1)).reshape(n, -1)
    cols = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, logit_opacity, log_scale, quat], axis=1
    ).astype(np.float32)
    arr = np.empty(n, dtype=[(nm, "f4") for nm in names])
    for i, nm in enumerate(names):
        arr[nm] = cols[:, i]
    write_ply(path, arr)


def load_gaussian_ply(path: str):
    """Returns dict of raw parameter arrays + inferred max_sh_degree.

    Mirrors ``load_ply`` (``gaussian_model.py:267-318``): f_rest_* sorted by
    numeric suffix, reshaped channel-major back to [N, K-1, 3].
    """
    v = read_ply(path)
    names = set(v.dtype.names)
    n = len(v)
    xyz = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    opacity = np.asarray(v["opacity"], np.float32)[:, None]
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], 1).astype(np.float32)  # [N,3]
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    n_rest = len(rest_names)
    k1 = n_rest // 3
    max_deg = int(round((k1 + 1) ** 0.5)) - 1
    if n_rest:  # sh_degree 0 (the fork's default) writes no f_rest_* columns
        f_rest = np.stack([v[nm] for nm in rest_names], 1).astype(np.float32)
        f_rest = f_rest.reshape(n, 3, k1).transpose(0, 2, 1)  # -> [N, K-1, 3]
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    scale_names = sorted(
        (nm for nm in names if nm.startswith("scale_")), key=lambda s: int(s.split("_")[-1])
    )
    log_scale = np.stack([v[nm] for nm in scale_names], 1).astype(np.float32)
    rot_names = sorted(
        (nm for nm in names if nm.startswith("rot_")), key=lambda s: int(s.split("_")[-1])
    )
    quat = np.stack([v[nm] for nm in rot_names], 1).astype(np.float32)
    return {
        "xyz": xyz,
        "features_dc": f_dc[:, None, :],  # [N,1,3]
        "features_rest": f_rest,
        "logit_opacity": opacity,
        "log_scale": log_scale,
        "quat": quat,
        "max_sh_degree": max_deg,
    }

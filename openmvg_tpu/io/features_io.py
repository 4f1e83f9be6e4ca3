"""openMVG .feat/.desc feature file IO.

Reference parity: features/feature.hpp loadFeatsFromFile (ASCII
"x y scale orientation" per line) and descriptor container IO
(features/descriptor.hpp loadDescsFromBinFile: size_t count then raw
values).  SIFT descriptors are 128 x uint8 (regions_factory.hpp
SIFT_Regions); AKAZE float regions are 64 x float.
"""

import os

import numpy as np


def load_feats(path):
    """(N, 4) float array [x, y, scale, orientation]."""
    if os.path.getsize(path) == 0:
        return np.zeros((0, 4))
    a = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if a.shape[1] == 2:  # plain PointFeatures
        a = np.concatenate([a, np.zeros((len(a), 2))], axis=1)
    return a


def save_feats(path, feats):
    feats = np.asarray(feats)
    if feats.shape[1] == 2:
        feats = np.concatenate([feats, np.zeros((len(feats), 2))], axis=1)
    with open(path, "w") as f:
        for row in feats:
            f.write(f"{row[0]} {row[1]} {row[2]} {row[3]}\n")


def load_descs(path, dim=128, dtype=np.uint8):
    """Binary: size_t (uint64 LE) count, then count*dim raw values
    (descriptor.hpp loadDescsFromBinFile)."""
    with open(path, "rb") as f:
        n = int(np.frombuffer(f.read(8), np.uint64)[0])
        data = np.frombuffer(f.read(), dtype=dtype)
    return data.reshape(n, dim)


def save_descs(path, descs):
    descs = np.ascontiguousarray(descs)
    with open(path, "wb") as f:
        f.write(np.uint64(len(descs)).tobytes())
        f.write(descs.tobytes())

"""openMVG matches file IO: matches.*.bin (cereal PortableBinary) and .txt.

Reference parity: matching/indMatch_utils.cpp Load/Save —
  .txt:  "I J\\n<count>\\n i j\\n ..." blocks
  .bin:  cereal::PortableBinaryArchive of
         std::map<Pair(uint32,uint32), std::vector<IndMatch{uint32 i_, j_}>>
         == [uint8 endian_flag=1][uint64 map_size] then per entry
            [uint32 I][uint32 J][uint64 n][n x (uint32 i, uint32 j)]
"""

import struct
from typing import Dict, Tuple

import numpy as np

PairWiseMatches = Dict[Tuple[int, int], np.ndarray]  # (M, 2) int arrays


def save_matches(matches: PairWiseMatches, path: str):
    if path.endswith(".txt"):
        with open(path, "w") as f:
            for (i, j), m in sorted(matches.items()):
                f.write(f"{i} {j}\n{len(m)}\n")
                for a, b in np.asarray(m):
                    f.write(f"{int(a)} {int(b)}\n")
        return True
    with open(path, "wb") as f:
        f.write(struct.pack("<B", 1))  # little-endian flag
        f.write(struct.pack("<Q", len(matches)))
        for (i, j), m in sorted(matches.items()):
            m = np.ascontiguousarray(np.asarray(m, np.uint32))
            f.write(struct.pack("<II", int(i), int(j)))
            f.write(struct.pack("<Q", len(m)))
            f.write(m.tobytes())
    return True


def load_matches(path: str) -> PairWiseMatches:
    out: PairWiseMatches = {}
    if path.endswith(".txt"):
        with open(path) as f:
            tok = f.read().split()
        pos = 0
        while pos < len(tok):
            i, j, n = int(tok[pos]), int(tok[pos + 1]), int(tok[pos + 2])
            pos += 3
            vals = np.asarray(tok[pos:pos + 2 * n], np.uint32).reshape(n, 2)
            pos += 2 * n
            out[(i, j)] = vals.astype(np.int64)
        return out
    with open(path, "rb") as f:
        data = f.read()
    pos = 1  # skip endian flag
    (n_pairs,) = struct.unpack_from("<Q", data, pos)
    pos += 8
    for _ in range(n_pairs):
        i, j = struct.unpack_from("<II", data, pos)
        pos += 8
        (n,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        m = np.frombuffer(data, np.uint32, count=2 * n, offset=pos).reshape(n, 2)
        pos += 8 * n
        out[(int(i), int(j))] = m.astype(np.int64)
    return out

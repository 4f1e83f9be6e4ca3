"""Core index types and sentinels.

Reference parity: openMVG/types.hpp:47-67 defines IndexT = uint32 with
UndefinedIndexT sentinel, Pair = pair<IndexT,IndexT>.  Here ids are plain
int32 numpy/jax arrays (int32 is the natural TPU integer) and "maps" are
dense arrays indexed by id; -1 is the undefined sentinel (plays the role
of UndefinedIndexT and is friendlier to masked gathers than 0xFFFFFFFF).
"""

import numpy as np

IndexDType = np.int32
UNDEFINED_INDEX = np.int32(-1)

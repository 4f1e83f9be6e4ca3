"""Descriptor matching on the MXU: brute-force L2, cascade-hashing-style
Hamming prefilter, ratio test, dedupe.

Reference parity: matching/ —
  metric.hpp L2 (unrolled SSE/AVX2 in the reference -> one MXU matmul here:
    |a-b|^2 = |a|^2 + |b|^2 - 2 a.b), metric_hamming.hpp popcount,
  matcher_brute_force.hpp (full distance rows + partial sort -> top-k),
  matching_filters.hpp NNdistanceRatio (dist1 < ratio^2 * dist2 on squared
    distances, default 0.8),
  indMatch.hpp IndMatch::getDeduplicated (unique left AND right indices),
  cascade_hasher.hpp (128-bit hyperplane hash + bucket candidate gather +
    Hamming ranking + exact L2 on top-10).

TPU redesign of cascade hashing: buckets exist to avoid the full distance
matrix on CPUs.  On the MXU the full Hamming matrix is itself one bf16
matmul of +/-1 sign codes (hamming = (D - s_a . s_b) / 2, exact in bf16
for D = 128), ~4x cheaper than the f32 L2 matmul; we rank all candidates
by Hamming, take the top-C, and run exact L2 only on those (a gather +
tiny matmul).  Same output contract as CascadeHashingMatcher, no buckets.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

DESC_DIM = 128


def l2_distance_matrix(a, b, precision=None):
    """(N, D) x (M, D) -> (N, M) squared L2 distances via the MXU.

    exact_u8=True routes uint8 descriptors through the int8 MXU with int32
    accumulation (center by 128: sum a.b = dot(a-128, b-128) + 128*(sum a +
    sum b) - 128^2 D) — bit-exact integer distances (metric.hpp L2 on u8).
    Off by default: on v5e the int32 distance-matrix materialization costs
    more than the matmul saves; the f32 path measures ~60% of MXU peak.
    """
    if precision == "exact_u8" and a.dtype == jnp.uint8 and b.dtype == jnp.uint8:
        D = a.shape[-1]
        ac = (a.astype(jnp.int32) - 128).astype(jnp.int8)
        bc = (b.astype(jnp.int32) - 128).astype(jnp.int8)
        cross0 = jax.lax.dot_general(
            ac, bc, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.int32,
            precision=jax.lax.Precision.DEFAULT)
        a32 = a.astype(jnp.int32)
        b32 = b.astype(jnp.int32)
        sa = jnp.sum(a32, axis=-1)
        sb = jnp.sum(b32, axis=-1)
        cross = cross0 + 128 * (sa[..., :, None] + sb[..., None, :]) \
            - (128 * 128) * D
        an = jnp.sum(a32 * a32, axis=-1)
        bn = jnp.sum(b32 * b32, axis=-1)
        d = an[..., :, None] + bn[..., None, :] - 2 * cross
        return d.astype(jnp.float32)
    u8_exact_bf16 = a.dtype == jnp.uint8 and b.dtype == jnp.uint8
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    an = jnp.sum(a * a, axis=-1, keepdims=True)
    bn = jnp.sum(b * b, axis=-1, keepdims=True)
    if u8_exact_bf16:
        # u8 values fit bf16's 8 significand bits exactly and the f32
        # accumulator stays < 2^24, so the double-rate bf16 MXU path is
        # bit-identical to f32 for uint8 descriptors
        cross = jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
    else:
        cross = jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (b.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.maximum(an + jnp.swapaxes(bn, -1, -2) - 2.0 * cross, 0.0)


def two_nn(dist, valid_cols=None):
    """Per-row two smallest distances and the best index.

    dist (..., N, M); valid_cols (..., M) masks padding.
    Returns (d1, d2, idx1).  Implemented with min/argmin reductions plus a
    one-hot mask instead of top_k — exact, and far cheaper on the VPU than
    a sort-based top-k over wide rows.
    """
    if valid_cols is not None:
        big = jnp.asarray(jnp.finfo(dist.dtype).max, dist.dtype)
        dist = jnp.where(valid_cols[..., None, :], dist, big)
    idx1 = jnp.argmin(dist, axis=-1)
    d1 = jnp.take_along_axis(dist, idx1[..., None], axis=-1)[..., 0]
    cols = jax.lax.broadcasted_iota(idx1.dtype, dist.shape, dist.ndim - 1)
    big = jnp.asarray(jnp.finfo(dist.dtype).max, dist.dtype)
    masked = jnp.where(cols == idx1[..., None], big, dist)
    d2 = jnp.min(masked, axis=-1)
    return d1, d2, idx1


def ratio_filter(d1, d2, ratio=0.8):
    """NNdistanceRatio on squared distances: d1 < ratio^2 * d2."""
    return d1 < (ratio * ratio) * d2


def dedupe_right(idx1, keep, d1, n_cols):
    """Keep only the best (smallest-distance) match per right index
    (IndMatch dedupe; ties break to the lowest row).  Returns the updated
    keep mask.

    Implemented as one lexicographic sort on (right index, distance, row)
    + a boundary scan: scatter-min (segment_min) lowers to serial scatter
    ops on TPU and measures ~5x slower at 4096-feature scale.
    """
    del n_cols  # sort-based path does not need the column count
    big = jnp.asarray(jnp.finfo(d1.dtype).max, d1.dtype)
    d_masked = jnp.where(keep, d1, big)
    rows = jnp.arange(idx1.shape[0], dtype=jnp.int32)
    # lax.sort is stable, so the row tie-break comes for free and `keep`
    # is recoverable as d < big: 3 operands / 2 keys instead of the
    # round-2 4 / 3 (TPU sort cost scales with operand count; the dedupe
    # sort is ~30% of the whole matcher)
    si, sd, sr = jax.lax.sort(
        (idx1.astype(jnp.int32), d_masked, rows), num_keys=2)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), si[1:] != si[:-1]])
    win = first & (sd < big)
    # un-permute with a second 1-operand sort instead of `.at[sr].set`:
    # the scatter lowers to serial per-element stores (~29 us of the
    # ~78 us/pair full matcher, round-3 profile); sr is a permutation of
    # arange so sorting (row*2 | win) ascending IS row order
    packed = jax.lax.sort(sr * 2 + win.astype(jnp.int32))
    return (packed % 2) == 1


class MatchResult(NamedTuple):
    idx_a: jnp.ndarray  # (N,) row index (== arange)
    idx_b: jnp.ndarray  # (N,) matched col per row
    mask: jnp.ndarray   # (N,) valid match flag
    dist: jnp.ndarray   # (N,) squared distance


@partial(jax.jit, static_argnames=("ratio",))
def match_brute_force(desc_a, desc_b, valid_a=None, valid_b=None, ratio=0.8):
    """ArrayMatcherBruteForce + ratio + dedupe as one fused device call.

    desc_* (N|M, D) any dtype; valid_* mask padded rows.
    """
    dist = l2_distance_matrix(desc_a, desc_b)
    d1, d2, idx1 = two_nn(dist, valid_b)
    keep = ratio_filter(d1, d2, ratio)
    if valid_a is not None:
        keep = keep & valid_a
    keep = dedupe_right(idx1, keep, d1, desc_b.shape[0])
    return MatchResult(idx_a=jnp.arange(desc_a.shape[0]), idx_b=idx1,
                       mask=keep, dist=d1)


@partial(jax.jit, static_argnames=("ratio",))
def match_brute_force_fused(desc_a, desc_b, valid_a=None, valid_b=None,
                            ratio=0.8):
    """match_brute_force on the fused Pallas 2-NN kernel: the (N, M)
    distance matrix never leaves VMEM (ops/pallas_matching.py).  Same
    contract; ~4x the XLA path's throughput on a v5e chip."""
    from openmvg_tpu.ops.pallas_matching import two_nn_fused

    d1, d2, idx1 = two_nn_fused(desc_a, desc_b, valid_b)
    keep = ratio_filter(d1, d2, ratio)
    if valid_a is not None:
        keep = keep & valid_a
    keep = dedupe_right(idx1, keep, d1, desc_b.shape[0])
    return MatchResult(idx_a=jnp.arange(desc_a.shape[0]), idx_b=idx1,
                       mask=keep, dist=d1)


def _unpack_bits_pm1(packed):
    """(N, B) uint8 -> (N, 8B) +/-1 bf16 sign codes."""
    weights = jnp.asarray(2 ** np.arange(8), jnp.uint8)
    bits = (packed[..., :, None] & weights[None, None, :]) > 0
    s = jnp.where(bits, 1.0, -1.0).astype(jnp.bfloat16)
    return s.reshape(packed.shape[0], -1)


@partial(jax.jit, static_argnames=("ratio",))
def match_brute_force_hamming(desc_a, desc_b, valid_a=None, valid_b=None,
                              ratio=0.8):
    """Brute-force Hamming 2-NN matching of packed binary descriptors
    (metric_hamming.hpp popcount -> one bf16 sign matmul on the MXU:
    hamming = (bits - s_a . s_b) / 2, exact for <= 4096 bits)."""
    sa = _unpack_bits_pm1(desc_a)
    sb = _unpack_bits_pm1(desc_b)
    bits = sa.shape[1]
    ham = (bits - jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)) * 0.5
    d1, d2, idx1 = two_nn(ham, valid_b)
    # NOTE: hamming distances are linear, not squared — the ratio applies
    # directly (NNdistanceRatio on the metric values, matching_filters.hpp)
    keep = d1 < ratio * d2
    if valid_a is not None:
        keep = keep & valid_a
    keep = dedupe_right(idx1, keep, d1, desc_b.shape[0])
    return MatchResult(idx_a=jnp.arange(desc_a.shape[0]), idx_b=idx1,
                       mask=keep, dist=d1)


def preemptive_subset(feats, descs, k=200):
    """Preemptive matching subset: the k largest-scale features
    (main_ComputeMatches.cpp:55-57, sfm_preemptive_regions_provider.hpp:19)."""
    feats = np.asarray(feats)
    if len(feats) <= k:
        return feats, np.asarray(descs)
    order = np.argsort(-feats[:, 2], kind="stable")[:k]
    return feats[order], np.asarray(descs)[order]


# ---------------------------------------------------------------------------
# cascade-hashing-style Hamming prefilter
# ---------------------------------------------------------------------------

def make_hash_projections(key, dim=DESC_DIM, bits=128, dtype=jnp.float32):
    """Random hyperplanes (CascadeHasher::Init primary hash)."""
    return jax.random.normal(key, (dim, bits), dtype)


def sign_codes(desc, proj, mean):
    """Zero-mean descriptors -> +/-1 codes (bf16, MXU-exact for D<=256)."""
    z = (desc.astype(jnp.float32) - mean) @ proj
    return jnp.where(z >= 0, 1.0, -1.0).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("ratio", "top_c"))
def match_cascade(desc_a, desc_b, proj, mean, valid_a=None, valid_b=None,
                  ratio=0.8, top_c=16):
    """Hamming-prefiltered matcher (FASTCASCADEHASHINGL2 contract).

    1. 128-bit sign codes for both sides (one matmul each)
    2. full Hamming matrix via bf16 sign matmul: h = (bits - s_a s_b^T)/2
    3. top_c smallest-Hamming candidates per row
    4. exact L2 on candidates only, 2-NN ratio + dedupe
    """
    sa = sign_codes(desc_a, proj, mean)
    sb = sign_codes(desc_b, proj, mean)
    bits = proj.shape[1]
    ham = (bits - jax.lax.dot_general(
        sa, sb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)) * 0.5
    if valid_b is not None:
        ham = jnp.where(valid_b[None, :], ham, jnp.asarray(1e9, ham.dtype))
    # approx_min_k: TPU-native partial reduction (full top_k sorts the row)
    _, cand = jax.lax.approx_min_k(ham, top_c, recall_target=0.95)

    a32 = desc_a.astype(jnp.float32)
    b32 = desc_b.astype(jnp.float32)
    bc = b32[cand]  # (N, C, D)
    d = a32[:, None, :] - bc
    dist = jnp.sum(d * d, axis=-1)  # (N, C)
    if valid_b is not None:
        dist = jnp.where(valid_b[cand], dist, jnp.asarray(jnp.finfo(jnp.float32).max))
    neg, k2 = jax.lax.top_k(-dist, 2)
    dd = -neg
    idx1 = jnp.take_along_axis(cand, k2[..., :1], axis=-1)[..., 0]
    keep = ratio_filter(dd[..., 0], dd[..., 1], ratio)
    if valid_a is not None:
        keep = keep & valid_a
    keep = dedupe_right(idx1, keep, dd[..., 0], desc_b.shape[0])
    return MatchResult(idx_a=jnp.arange(desc_a.shape[0]), idx_b=idx1,
                       mask=keep, dist=dd[..., 0])


# ---------------------------------------------------------------------------
# collection matching: batched pairs
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ratio", "method", "top_c"))
def match_pair_batch(descs, counts, pair_ij, proj=None, mean=None,
                     ratio=0.8, method="bruteforce", top_c=16):
    """Match a batch of image pairs in one call.

    descs (V, Nmax, D) padded stack, counts (V,), pair_ij (P, 2).
    Returns MatchResult with leading dim (P, Nmax).

    method: "bruteforce" auto-selects the fused Pallas kernel on TPU
    ("bruteforce_fused" / "bruteforce_xla" pin a path), "cascade" the
    Hamming-prefiltered matcher.
    """
    Nmax = descs.shape[1]
    col = jnp.arange(Nmax)
    if method == "bruteforce":
        method = ("bruteforce_fused" if jax.default_backend() == "tpu"
                  else "bruteforce_xla")

    def one(pair):
        i, j = pair[0], pair[1]
        va = col < counts[i]
        vb = col < counts[j]
        if method == "bruteforce_fused":
            return match_brute_force_fused(descs[i], descs[j], va, vb,
                                           ratio=ratio)
        if method == "bruteforce_xla":
            return match_brute_force(descs[i], descs[j], va, vb, ratio=ratio)
        return match_cascade(descs[i], descs[j], proj, mean, va, vb,
                             ratio=ratio, top_c=top_c)

    return jax.vmap(one)(pair_ij)


def matches_to_dict(pair_ij, result: MatchResult):
    """Device batch -> {(i, j): (M, 2) numpy} PairWiseMatches."""
    out = {}
    pair_ij = np.asarray(pair_ij)
    mask = np.asarray(result.mask)
    idx_b = np.asarray(result.idx_b)
    for p in range(len(pair_ij)):
        sel = np.nonzero(mask[p])[0]
        if len(sel):
            out[(int(pair_ij[p, 0]), int(pair_ij[p, 1]))] = np.stack(
                [sel, idx_b[p][sel]], axis=1).astype(np.int64)
    return out


def match_kdtree(desc_a, desc_b, ratio=0.8):
    """Exact kd-tree 2-NN matcher on the host (FLANN kd-tree parity,
    matching/matcher_kdtree_flann.hpp:34 — scipy cKDTree instead of the
    vendored FLANN).  Same ratio + best-per-right-index dedupe semantics
    as match_brute_force; returns (M, 2) int64 match indices.

    This exists for flag compatibility and CPU-only environments; the MXU
    brute-force/cascade paths dominate it on TPU (SURVEY §2.9).
    """
    from scipy.spatial import cKDTree

    a = np.asarray(desc_a, np.float32)
    b = np.asarray(desc_b, np.float32)
    if len(a) == 0 or len(b) < 2:
        return np.zeros((0, 2), np.int64)
    tree = cKDTree(b)
    d, idx = tree.query(a, k=2)          # euclidean
    d1, d2 = d[:, 0] ** 2, d[:, 1] ** 2  # squared, like the device path
    keep = d1 < (ratio * ratio) * d2
    idx1 = idx[:, 0]
    # best-per-right-index dedupe, lowest row on ties
    order = np.lexsort((np.arange(len(a)), d1))
    seen = np.zeros(len(b), bool)
    rows = []
    for r in order:
        if keep[r] and not seen[idx1[r]]:
            seen[idx1[r]] = True
            rows.append(r)
    rows = np.sort(np.asarray(rows, np.int64))
    return np.stack([rows, idx1[rows]], 1) if len(rows) else \
        np.zeros((0, 2), np.int64)

"""K-means clustering + VLAD image retrieval embeddings.

Reference parity: clustering/kmeans.hpp (Lloyd iterations, k-means++ init,
KMeansInitType:29) and matching_image_collection/VladBase.hpp:38-77 /
Vlad.hpp — VLAD aggregation of descriptors over a codebook with intra- and
L2 normalization; used by main_ComputeVLAD.cpp for pair retrieval.

TPU design: assignment = one MXU distance matmul per iteration; VLAD
aggregation = segment sums; retrieval = one similarity matmul.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from openmvg_tpu.ops.matching import l2_distance_matrix


def kmeans_pp_init(key, X, k):
    """k-means++ seeding (KMeansInitType::KMEANS_PLUS_PLUS)."""
    n = X.shape[0]
    idx0 = jax.random.randint(key, (), 0, n)
    centers = [X[idx0]]
    d2 = jnp.sum((X - centers[0]) ** 2, axis=-1)
    for i in range(1, k):
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.categorical(sub, jnp.log(probs + 1e-20))
        c = X[idx]
        centers.append(c)
        d2 = jnp.minimum(d2, jnp.sum((X - c) ** 2, axis=-1))
    return jnp.stack(centers)


@partial(jax.jit, static_argnames=("n_iter",))
def _lloyd(X, centers, n_iter=25):
    k = centers.shape[0]

    def step(centers, _):
        d = l2_distance_matrix(X, centers)
        assign = jnp.argmin(d, axis=-1)
        sums = jax.ops.segment_sum(X, assign, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones(X.shape[0], X.dtype), assign,
                                     num_segments=k)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centers)
        return new.astype(centers.dtype), None

    centers, _ = jax.lax.scan(step, centers, None, length=n_iter)
    d = l2_distance_matrix(X, centers)
    return centers, jnp.argmin(d, axis=-1)


def kmeans(key, X, k, n_iter=25):
    """Returns (centers (k, D), assignments (N,))."""
    X = jnp.asarray(X, jnp.float32)
    centers = kmeans_pp_init(key, X, k)
    return _lloyd(X, centers, n_iter=n_iter)


def build_codebook(key, descriptors, k=128, max_samples=100000):
    """Codebook from a pooled descriptor sample (main_ComputeVLAD)."""
    X = np.asarray(descriptors, np.float32)
    if len(X) > max_samples:
        sel = np.random.default_rng(0).choice(len(X), max_samples, replace=False)
        X = X[sel]
    centers, _ = kmeans(key, X, k)
    return np.asarray(centers)


@jax.jit
def vlad_embedding(desc, centers):
    """VLAD vector of one image: sum of residuals to assigned center,
    intra-normalized per cluster then globally L2 (VladBase.hpp)."""
    desc = desc.astype(jnp.float32)
    d = l2_distance_matrix(desc, centers)
    assign = jnp.argmin(d, axis=-1)
    resid = desc - centers[assign]
    k = centers.shape[0]
    agg = jax.ops.segment_sum(resid, assign, num_segments=k)  # (k, D)
    # intra (per-cluster) L2 normalization
    agg = agg / jnp.maximum(jnp.linalg.norm(agg, axis=-1, keepdims=True), 1e-12)
    v = agg.reshape(-1)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def retrieve_pairs(vlads, top_k=10):
    """Top-k most similar images per image from stacked VLADs (V, kD)."""
    V = jnp.asarray(vlads)
    sim = V @ V.T
    sim = sim - 2.0 * jnp.eye(sim.shape[0])  # exclude self
    _, idx = jax.lax.top_k(sim, min(top_k, sim.shape[0] - 1))
    pairs = set()
    idx = np.asarray(idx)
    for i in range(idx.shape[0]):
        for j in idx[i]:
            pairs.add((min(i, int(j)), max(i, int(j))))
    return sorted(pairs)

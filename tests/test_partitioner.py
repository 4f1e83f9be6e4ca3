import numpy as np

from openmvg_tpu.parallel import partitioner


def test_partition_pairs_balanced():
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    counts = {v: 1000 + 100 * v for v in range(10)}
    shards = partitioner.partition_pairs(pairs, 4, counts)
    assert sum(len(s) for s in shards) == len(pairs)
    loads = [sum(counts[a] * counts[b] for a, b in s) for s in shards]
    assert max(loads) / max(min(loads), 1) < 1.3


def test_partition_observations_grouping():
    rng = np.random.default_rng(0)
    obs_pose = rng.integers(0, 20, 1000)
    obs_point = rng.integers(0, 300, 1000)
    order, bounds = partitioner.partition_observations(obs_pose, 4)
    assert bounds[0] == 0 and bounds[-1] == 1000
    rep = partitioner.residency_report(obs_pose, obs_point, order, bounds)
    # sorted-by-pose sharding keeps most poses on a single shard
    assert rep["poses_single_shard"] > 0.7

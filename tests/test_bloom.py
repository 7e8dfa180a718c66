"""Bloom-filter pruning: no false negatives, real pruning power."""

import numpy as np
import pandas as pd


def test_bloom_never_drops_members_and_prunes_most_others():
    import ray.data as rd

    from proj_ray.stages.bloom import bloom_build, bloom_prune

    rng = np.random.default_rng(41)
    members = rng.choice(10_000_000, size=5_000, replace=False) \
        .astype(np.int64)
    build = rd.from_pandas(pd.DataFrame({"k": members})).repartition(4)
    bloom = bloom_build(build, "k", m_bits=1 << 17, k=5)

    # probe: all members plus 20,000 keys drawn from a disjoint range
    outsiders = (rng.choice(10_000_000, size=20_000, replace=False)
                 + 20_000_000).astype(np.int64)
    probe = pd.DataFrame({"k": np.concatenate([members, outsiders])})
    kept = bloom_prune(rd.from_pandas(probe).repartition(3),
                       "k", bloom).to_pandas()["k"].to_numpy()

    member_set = set(members.tolist())
    kept_members = sum(1 for x in kept if x in member_set)
    assert kept_members == len(members)          # NO false negatives
    fp = len(kept) - kept_members
    # m/n ~ 26 bits/key at k=5 -> fp rate well under 2%
    assert fp / len(outsiders) < 0.02, fp

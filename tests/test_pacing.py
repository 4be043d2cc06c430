from __future__ import annotations

import random

from aqueduct_core_spark.pacing import TokenBucket, calculate_retry_after_ms


def test_retry_after_formula_reference_values():
    # retry = ceil(nodeCount / (pool / queryTime)), capped
    # 3000 nodes, pool 24, query 8 ms -> ceil(3000 / 3) = 1000 ms
    assert calculate_retry_after_ms(8, 10, node_count=3000, db_pool_size=24) == 1000
    # instant query -> 1 ms floor
    assert calculate_retry_after_ms(0, 10) == 1
    # cap respected
    assert calculate_retry_after_ms(10_000, 10, node_count=3000, db_pool_size=24,
                                    max_retry_after_ms=600_000) == 600_000


def test_empty_read_jitters_above_cap():
    rng = random.Random(1)
    vals = {calculate_retry_after_ms(5, 0, max_retry_after_ms=1000, rng=rng) for _ in range(20)}
    assert all(1000 <= v <= 2000 for v in vals)
    assert len(vals) > 1  # jittered, not constant


def test_token_bucket_gates_fast_path():
    tb = TokenBucket(capacity_per_s=2.0)
    assert tb.try_acquire(now=0.0)      # first permit
    assert not tb.try_acquire(now=0.1)  # bucket drained
    assert tb.try_acquire(now=0.7)      # refilled at 2/s
    assert not tb.try_acquire(now=0.71)

"""Input prefetcher: ordering, error propagation, and decode/compute overlap
(the starvation micro-bench VERDICT r1 asked for)."""
import time

import pytest

from ipercore_tpu.data.prefetch import prefetch


def test_order_preserved():
    assert list(prefetch(iter(range(100)), depth=4)) == list(range(100))


def test_exception_propagates():
    def gen():
        yield 1
        raise ValueError("decode failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_overlap_hides_decode_cost():
    """With prefetch, total time ~= max(producer, consumer), not the sum:
    doubling decode cost must not change step time while compute dominates."""
    def producer(cost):
        def gen():
            for i in range(8):
                time.sleep(cost)
                yield i
        return gen()

    def run(decode_cost, step_cost=0.02):
        t0 = time.perf_counter()
        for _ in prefetch(producer(decode_cost), depth=2):
            time.sleep(step_cost)  # the "device step"
        return time.perf_counter() - t0

    t_fast = run(0.005)
    t_slow = run(0.010)  # decode cost doubled, still < step cost
    # both are bounded by the consumer; allow generous slack for CI jitter
    assert t_slow < t_fast * 1.5, (t_fast, t_slow)
    # sequential (no overlap) would take >= 8 * (0.01 + 0.02) = 0.24
    assert t_slow < 0.24, t_slow

"""Prefetch iterator: ordering, error propagation, clean shutdown."""
import time

import pytest

from on_device_image_captioning_tpu.data.prefetch import PrefetchIterator


def test_prefetch_preserves_order():
    n = [0]

    def next_batch():
        n[0] += 1
        return {"i": n[0]}

    pf = PrefetchIterator(next_batch, lambda b: {"x": b["i"] * 10}, depth=3)
    got = [pf.get() for _ in range(10)]
    pf.close()
    assert [b["i"] for b, _ in got] == list(range(1, 11))
    assert [a["x"] for _, a in got] == [i * 10 for i in range(1, 11)]


def test_prefetch_overlaps_work():
    def slow_batch():
        time.sleep(0.05)
        return {}

    pf = PrefetchIterator(slow_batch, lambda b: b, depth=2)
    pf.get()  # warm
    t0 = time.time()
    for _ in range(4):
        pf.get()
        time.sleep(0.05)  # simulated device step
    elapsed = time.time() - t0
    pf.close()
    # serial would be >= 8 * 0.05 = 0.4s; overlapped stays near 4 * 0.05
    assert elapsed < 0.35, elapsed


def test_prefetch_propagates_errors():
    def bad_batch():
        raise RuntimeError("loader broke")

    pf = PrefetchIterator(bad_batch, lambda b: b, depth=1)
    with pytest.raises(RuntimeError, match="loader broke"):
        pf.get()
    pf.close()

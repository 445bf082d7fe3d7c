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

    # serial baseline measured in the SAME environment so contention on a
    # loaded box (e.g. a TPU rehearsal sharing the core) inflates both
    # sides instead of tripping an absolute wall-clock threshold
    t0 = time.time()
    for _ in range(4):
        slow_batch()
        time.sleep(0.05)
    serial = time.time() - t0

    pf = PrefetchIterator(slow_batch, lambda b: b, depth=2)
    pf.get()  # warm
    t0 = time.time()
    for _ in range(4):
        pf.get()
        time.sleep(0.05)  # simulated device step
    elapsed = time.time() - t0
    pf.close()
    # perfect overlap halves the serial time; allow generous slack
    assert elapsed < 0.8 * serial, (elapsed, serial)


def test_prefetch_propagates_errors():
    def bad_batch():
        raise RuntimeError("loader broke")

    pf = PrefetchIterator(bad_batch, lambda b: b, depth=1)
    with pytest.raises(RuntimeError, match="loader broke"):
        pf.get()
    pf.close()


def test_prefetch_drains_queue_before_raising():
    """A finite producer (raises StopIteration when exhausted) must not lose
    batches it already queued: the worker runs ahead and dies on the sentinel
    while earlier batches still sit in the queue — get() must return ALL of
    them first, then raise."""
    it = iter(range(5))

    pf = PrefetchIterator(lambda: next(it), lambda b: b, depth=4)
    time.sleep(0.3)  # let the worker run to exhaustion with queued batches
    got = []
    with pytest.raises(StopIteration):
        while True:
            b, _ = pf.get()
            got.append(b)
    pf.close()
    assert got == [0, 1, 2, 3, 4]


def test_prefetch_consumed_state_tracks_consumption():
    """consumed_state must always reflect the last CONSUMED batch, not the
    worker's run-ahead cursor, so checkpoints resume at the exact next batch
    (reference data/transparent_data_loader.py:49-61 semantics)."""

    class FakeLoader:
        def __init__(self):
            self.i = 0

        def next(self):
            b = {"i": self.i}
            self.i += 1
            return b

        def save_state(self):
            return {"next": self.i}

    ld = FakeLoader()
    pf = PrefetchIterator(ld.next, lambda b: b, depth=3, snapshot=ld.save_state)
    assert pf.consumed_state == {"next": 0}  # nothing consumed yet
    for k in range(6):
        b, _ = pf.get()
        assert b["i"] == k
        # even though the worker ran up to `depth` batches ahead, the exposed
        # cursor is exactly "resume at batch k+1"
        assert pf.consumed_state == {"next": k + 1}
    pf.close()


def test_prefetch_resume_replays_exact_next_batch(tmp_path):
    """End-to-end with the real loader: save consumed_state mid-run with
    prefetch depth 2, load it into a fresh loader, and the fresh loader's next
    batch must equal the batch a synchronous run would produce."""
    import json

    import numpy as np

    from on_device_image_captioning_tpu.data.datasets import load_coco_karpathy
    from on_device_image_captioning_tpu.data.loader import ShardedCaptionLoader

    rng = np.random.default_rng(0)
    words = ["cat", "dog", "ball", "red", "runs", "a", "the", "sits"]
    items = [
        {
            "cocoid": i,
            "filepath": "val2014",
            "filename": f"img{i}.jpg",
            "split": "train",
            "sentences": [{"raw": " ".join(rng.choice(words, size=4))}],
        }
        for i in range(16)
    ]
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"images": items}))
    ds = load_coco_karpathy(str(ann), dict_min_occurrences=1)

    def make_loader():
        return ShardedCaptionLoader(
            ds, array_of_init_seeds=[11, 12, 13], batch_size=4
        )

    # synchronous ground truth: batches 0..7
    sync = make_loader()
    sync_batches = [sync.get_next_batch(12) for _ in range(8)]

    # prefetched run: consume 3 batches, checkpoint, stop
    loader = make_loader()
    pf = PrefetchIterator(
        lambda: loader.get_next_batch(12), lambda b: b, depth=2,
        snapshot=loader.save_state,
    )
    for k in range(3):
        b, _ = pf.get()
        assert b["img_idxs"] == sync_batches[k]["img_idxs"]
    saved = pf.consumed_state
    pf.close()

    # resume: a fresh loader must replay batch 3 exactly
    resumed = make_loader()
    resumed.load_state(saved)
    nxt = resumed.get_next_batch(12)
    assert nxt["img_idxs"] == sync_batches[3]["img_idxs"]
    assert nxt["captions"] == sync_batches[3]["captions"]

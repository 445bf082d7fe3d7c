"""Data-layer tests: vocab construction, deterministic sharding, cursor
save/restore, dataset parsing, feature IO.

The sharding test replicates the reference's only 'distributed' test — two loaders
with ranks 0/1 and the same seeds produce disjoint deterministic shards on one host
(reference data/vizwiz_dataloader.py:318-360)."""
import json

import numpy as np
import pytest

from on_device_image_captioning_tpu.data import text
from on_device_image_captioning_tpu.data.datasets import (
    CaptionDataset,
    load_coco_karpathy,
    load_vizwiz,
)
from on_device_image_captioning_tpu.data.features_io import FeatureStore
from on_device_image_captioning_tpu.data.loader import ShardedCaptionLoader


def _toy_dataset(n_images=12, caps_per_image=3):
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "ball", "red", "runs", "jumps", "big", "small"]
    records = []
    caps_corpus = []
    for i in range(n_images):
        caps = [
            " ".join(rng.choice(words, size=4)) for _ in range(caps_per_image)
        ]
        caps_corpus += caps
        records.append({"img_id": 1000 + i, "img_path": f"/img/{i}.jpg", "captions": caps})
    vocab = text.Vocab.build(caps_corpus, min_occurrences=1)
    return CaptionDataset(
        splits={"train": records, "val": records[:2], "test": records[:2]},
        vocab=vocab,
        max_seq_len=20,
    )


def test_vocab_build_and_specials():
    vocab = text.Vocab.build(["a cat runs", "a dog runs", "a cat jumps"], 2)
    # sorted order; specials present
    assert vocab.idx2word == sorted(vocab.idx2word)
    for tok in ["PAD", "SOS", "EOS", "UNK"]:
        assert tok in vocab.word2idx
    # words below min occurrences map to UNK
    assert vocab.encode(["jumps"]) == [vocab.unk_idx]
    enc = vocab.encode_caption("a cat runs")
    assert enc[0] == vocab.sos_idx and enc[-1] == vocab.eos_idx


def test_reference_vocab_convention(reference_path):
    """The shipped 10k COCO vocab follows sorted order with PAD/SOS/EOS/UNK at
    78/79/77/80 (SURVEY §2.2)."""
    vocab = text.Vocab.from_json(str(reference_path / "vocab/coco_vocab_idx_dict.json"))
    assert len(vocab) == 10000
    assert (vocab.pad_idx, vocab.sos_idx, vocab.eos_idx, vocab.unk_idx) == (
        78, 79, 77, 80,
    )
    assert vocab.description([79, 9999, 77]) == "Zucchini."


def test_sharded_loader_disjoint_deterministic():
    ds = _toy_dataset()
    mk = lambda rank: ShardedCaptionLoader(
        ds, [42], batch_size=4, rank=rank, num_procs=2
    )
    l0a, l0b, l1 = mk(0), mk(0), mk(1)
    seen0, seen0b, seen1 = [], [], []
    for _ in range(l0a.get_num_batches()):
        seen0 += [tuple(x) for x in zip(l0a.get_next_batch()["img_idxs"])]
        seen0b += [tuple(x) for x in zip(l0b.get_next_batch()["img_idxs"])]
        seen1 += [tuple(x) for x in zip(l1.get_next_batch()["img_idxs"])]
    assert seen0 == seen0b  # deterministic
    # same global schedule, disjoint caption assignments per rank
    assert l0a.get_num_batches() == l1.get_num_batches()
    # per-rank batch is global/num_procs
    assert len(l0a._schedule[0]) == 2


def test_loader_cursor_roundtrip():
    ds = _toy_dataset()
    loader = ShardedCaptionLoader(ds, [1, 2], batch_size=4)
    for _ in range(3):
        loader.get_next_batch()
    state = loader.save_state()

    fresh = ShardedCaptionLoader(ds, [9], batch_size=2)
    fresh.load_state(state)
    a = fresh.get_next_batch()
    b = loader.get_next_batch()
    assert a["img_idxs"] == b["img_idxs"]
    assert a["captions"] == b["captions"]


def test_loader_epoch_rollover_and_modes():
    ds = _toy_dataset()
    loader = ShardedCaptionLoader(ds, [7, 8], batch_size=6)
    n = loader.get_num_batches()
    for _ in range(n):
        batch = loader.get_next_batch()
        assert len(batch["captions"]) == 6
        assert all(c[0] == ds.vocab.sos_idx for c in batch["captions"])
    assert loader.get_epoch_it() == 0
    loader.get_next_batch()
    assert loader.get_epoch_it() == 1

    img_loader = ShardedCaptionLoader(ds, [7], batch_size=4, mode="image_wise")
    batch = img_loader.get_next_batch()
    assert len(batch["img_idxs"]) == 4
    assert len(batch["all_captions"][0]) == 3  # all refs for SCST


def test_coco_karpathy_parsing(tmp_path):
    items = []
    for i, split in enumerate(["train", "restval", "val", "test"]):
        items.append(
            {
                "cocoid": i,
                "filepath": "val2014",
                "filename": f"img{i}.jpg",
                "split": split,
                "sentences": [{"raw": f"a photo number {i} of a cat"}] * 2,
            }
        )
    p = tmp_path / "dataset_coco.json"
    p.write_text(json.dumps({"images": items}))
    ds = load_coco_karpathy(str(p), images_path="/data", dict_min_occurrences=1)
    assert ds.num_images("train") == 2  # train + restval
    assert ds.num_images("val") == 1 and ds.num_images("test") == 1
    assert ds.records("train")[0]["img_path"] == "/data/val2014/img/img0.jpg"


def test_vizwiz_parsing_and_quality_filter(tmp_path):
    ann = {
        "images": [
            {"id": 0, "file_name": "a.jpg"},
            {"id": 1, "file_name": "b.jpg"},
            {"id": 2, "file_name": "c.jpg"},
        ],
        "annotations": [
            {"image_id": 0, "caption": "a kitchen counter"},
            {"image_id": 0, "caption": "Quality issues are too severe to recognize visual content."},
            {"image_id": 1, "caption": "a dog on grass"},
            {"image_id": 2, "caption": "a red ball"},
        ],
    }
    for split in ["train", "val"]:
        (tmp_path / f"{split}.json").write_text(json.dumps(ann))
    ds = load_vizwiz(str(tmp_path), images_dir="/viz", dict_min_occurrences=1)
    # image 0 dropped entirely under strict filtering
    assert [r["img_id"] for r in ds.records("train")] == [1, 2]
    assert ds.records("train")[0]["img_path"] == "/viz/train/b.jpg"

    ds2 = load_vizwiz(
        str(tmp_path), images_dir="/viz", dict_min_occurrences=1, strict_filter=False
    )
    assert [r["img_id"] for r in ds2.records("train")] == [0, 1, 2]
    assert ds2.records("train")[0]["captions"] == ["a kitchen counter"]


def test_feature_store_roundtrip(tmp_path):
    path = str(tmp_path / "features.hdf5")
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((144, 16), dtype=np.float32)
    f2 = rng.standard_normal((100, 16), dtype=np.float32)
    with FeatureStore(path, "w") as store:
        store.write(11, f1)
        store.write(22, f2)
    with FeatureStore(path) as store:
        assert 11 in store and 33 not in store
        np.testing.assert_array_equal(store.read(11), f1)
        batch, pads = store.read_batch([11, 22])
        assert batch.shape == (2, 144, 16)
        assert pads == [0, 44]
        np.testing.assert_array_equal(batch[1, :100], f2)
        assert (batch[1, 100:] == 0).all()


def test_preprocessed_image_store(tmp_path):
    from on_device_image_captioning_tpu.data.images_io import (
        PreprocessedImageStore,
        build_store,
    )
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(3):
        arr = rng.integers(0, 255, (17, 23, 3), dtype=np.uint8)
        p = img_dir / f"{i}.jpg"
        Image.fromarray(arr).save(p)
        records.append({"img_id": 100 + i, "img_path": str(p)})
    store_path = str(tmp_path / "preproc.hdf5")
    build_store(store_path, records, size=16, verbose=False)
    with PreprocessedImageStore(store_path) as store:
        assert 100 in store and 999 not in store
        batch = store.read_batch([100, 102])
        assert batch.shape == (2, 16, 16, 3) and batch.dtype == np.uint8

"""Data layer tests: MDS round-trip, streaming determinism + partition
disjointness (SURVEY.md §4), loaders, transforms, filters, datapipes, mix."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from diffusion_tpu.data.dataloader import DataLoader, default_collate
from diffusion_tpu.data.datapipes import (list_shards,
    sample_multiplexer,
    sample_shuffle,
    tar_samples)
from diffusion_tpu.data.filters import filter_fn
from diffusion_tpu.data.mds import MDSIndex, MDSShardReader, MDSWriter
from diffusion_tpu.data.streaming import StreamingDataset
from diffusion_tpu.data.transforms import (CenterCropSDTransform,
                                           LargestCenterSquare, sd_normalize)


def _jpeg_bytes(w=40, h=30, color=(255, 0, 0)):
    img = Image.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def make_mds(tmp_path, n=25, size_limit=2000):
    out = str(tmp_path / "mds")
    with MDSWriter(out, {"jpg": "bytes", "caption": "str", "idx": "int"},
                   size_limit=size_limit) as w:
        for i in range(n):
            w.write({"jpg": _jpeg_bytes(), "caption": f"caption {i}", "idx": i})
    return out


def test_shard_hash_validation(tmp_path):
    """Writer records sha1 per shard (mosaicml wire format); the reader's
    validate_hash verifies on first open, heals a corrupt LOCAL copy by
    re-downloading from remote, and raises on truly corrupt data."""
    import json
    import shutil

    from diffusion_tpu.data.streaming import StreamingDataset

    remote = str(tmp_path / "remote")
    with MDSWriter(remote, {"caption": "str"}, hashes=("sha1",)) as w:
        for i in range(8):
            w.write({"caption": f"c{i}"})
    with open(f"{remote}/index.json") as f:
        info = json.load(f)["shards"][0]
    assert "sha1" in info["raw_data"]["hashes"]

    # clean read validates fine
    ds = StreamingDataset(remote=remote, validate_hash="sha1")
    assert ds.get_sample(0)["caption"] == "c0"

    # corrupt the LOCAL cache copy -> heals from remote
    local = str(tmp_path / "local")
    shutil.copytree(remote, local)
    shard = f"{local}/{info['raw_data']['basename']}"
    with open(shard, "r+b") as f:
        f.seek(-1, 2)
        f.write(b"\xff")
    ds2 = StreamingDataset(remote=remote, local=local, validate_hash="sha1")
    assert ds2.get_sample(0)["caption"] == "c0"  # re-downloaded

    # corrupt REMOTE (no healthy source) -> loud failure
    local3 = str(tmp_path / "corrupt")
    shutil.copytree(remote, local3)
    with open(f"{local3}/{info['raw_data']['basename']}", "r+b") as f:
        f.seek(-1, 2)
        f.write(b"\xff")
    ds3 = StreamingDataset(local=local3, validate_hash="sha1")
    with pytest.raises(ValueError, match="validation"):
        ds3.get_sample(0)

    # dataset written without hashes -> actionable error
    nohash = str(tmp_path / "nohash")
    with MDSWriter(nohash, {"caption": "str"}) as w:
        w.write({"caption": "x"})
    ds4 = StreamingDataset(local=nohash, validate_hash="sha1")
    with pytest.raises(ValueError, match="records no"):
        ds4.get_sample(0)


@pytest.mark.parametrize("spec", ["zstd:3", "gz"])
def test_mds_compression_roundtrip(tmp_path, spec):
    """Compressed shards (mosaicml wire format: zip_data + compression in
    the index, raw removed) inflate on demand; remote streaming, hash
    validation, and shard release/re-materialize all compose with it."""
    import json as _json

    from diffusion_tpu.data.streaming import StreamingDataset

    remote = str(tmp_path / f"remote_{spec.replace(':', '_')}")
    with MDSWriter(remote, {"caption": "str", "idx": "int"},
                   compression=spec, hashes=("sha1",),
                   size_limit=256) as w:
        for i in range(12):
            w.write({"caption": f"c{i} " + "x" * 40, "idx": i})
    with open(f"{remote}/index.json") as f:
        shards = _json.load(f)["shards"]
    assert len(shards) > 1
    assert shards[0]["compression"] == spec
    assert shards[0]["zip_data"]["basename"].endswith(
        "." + spec.split(":")[0])
    # raw files were replaced by zips on disk
    assert not os.path.exists(f"{remote}/{shards[0]['raw_data']['basename']}")

    # local-only read (zip is the source; it must survive inflation)
    ds = StreamingDataset(local=remote, validate_hash="sha1")
    assert ds.get_sample(0)["idx"] == 0
    assert ds.get_sample(11)["caption"].startswith("c11")
    assert os.path.exists(f"{remote}/{shards[0]['zip_data']['basename']}")

    # remote streaming: zip downloads, inflates, zip removed locally
    local = str(tmp_path / f"local_{spec.replace(':', '_')}")
    ds2 = StreamingDataset(remote=remote, local=local, validate_hash="sha1")
    assert ds2.get_sample(5)["idx"] == 5
    flat = ds2.flat_shard_of(5)
    raw = shards[flat]["raw_data"]["basename"]
    assert os.path.exists(f"{local}/{raw}")
    assert not os.path.exists(
        f"{local}/{shards[flat]['zip_data']['basename']}")

    # release frees the raw; access re-downloads + re-inflates
    assert ds2.release_shard(flat)
    assert not os.path.exists(f"{local}/{raw}")
    assert ds2.get_sample(5)["idx"] == 5


def test_mds_roundtrip(tmp_path):
    out = make_mds(tmp_path)
    index = MDSIndex(out)
    assert index.num_samples == 25
    assert len(index.shards) > 1  # size_limit forced multiple shards
    reader = MDSShardReader.from_shard_info(out, index.shards[0])
    s0 = reader.get(0)
    assert s0["caption"] == "caption 0"
    assert s0["idx"] == 0
    assert Image.open(io.BytesIO(s0["jpg"])).size == (40, 30)


def test_streaming_dataset_access_and_order(tmp_path):
    out = make_mds(tmp_path)
    ds = StreamingDataset(local=out, shuffle=True, shuffle_seed=5,
                          num_canonical_nodes=4)
    assert len(ds) == 25
    assert ds.get_sample(13)["idx"] == 13

    o1 = ds.epoch_order(0)
    o2 = ds.epoch_order(0)
    o3 = ds.epoch_order(1)
    np.testing.assert_array_equal(o1, o2)            # deterministic
    assert not np.array_equal(o1, o3)                # varies by epoch
    assert sorted(o1.tolist()) == list(range(25))    # a permutation


def test_streaming_partition_equal_complete(tmp_path):
    """Every rank gets EXACTLY the same sample count (multi-host liveness:
    one extra batch on one host would hang the pod in a collective) via
    mosaicml-style padding; coverage stays complete and duplication is
    bounded by the <world padding repeats."""
    out = make_mds(tmp_path)
    ds = StreamingDataset(local=out, shuffle=True, num_canonical_nodes=2)
    parts = [ds.partition(0, r, 4) for r in range(4)]   # 25 % 4 != 0
    assert len({len(p) for p in parts}) == 1            # equal lengths
    all_ids = np.concatenate(parts)
    assert len(all_ids) == 28                            # ceil(25/4)*4
    assert set(all_ids.tolist()) == set(range(25))       # complete
    # at most world-1 repeated ids (the padding)
    assert len(all_ids) - len(set(all_ids.tolist())) <= 3
    # divisible case: exactly disjoint + complete
    parts5 = [ds.partition(0, r, 5) for r in range(5)]
    ids5 = np.concatenate(parts5)
    assert len(ids5) == 25 and len(set(ids5.tolist())) == 25


def test_streaming_remote_download(tmp_path):
    remote = make_mds(tmp_path)
    local = str(tmp_path / "cache")
    ds = StreamingDataset(remote=remote, local=local, shuffle=False)
    assert ds.get_sample(3)["idx"] == 3
    assert os.path.exists(os.path.join(local, "index.json"))


def test_concurrent_same_shard_download_is_safe(tmp_path):
    """Many workers racing on one shard must each publish a COMPLETE file:
    unique per-call tmp names + atomic replace (a shared '<shard>.tmp' used
    to let worker B truncate worker A's finished download mid-replace)."""
    from concurrent.futures import ThreadPoolExecutor

    from diffusion_tpu.data.object_store import ObjectStore

    src = tmp_path / "src.bin"
    payload = os.urandom(1 << 16)
    src.write_bytes(payload)
    dst = str(tmp_path / "cache" / "src.bin")
    store = ObjectStore()
    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda _: store.download(str(src), dst), range(32)))
    assert open(dst, "rb").read() == payload
    leftovers = [p for p in os.listdir(tmp_path / "cache")
                 if p.endswith(".tmp")]
    assert not leftovers


def test_dataloader_persistent_pool_reused_across_epochs(tmp_path):
    """persistent_workers (default) keeps ONE pool across __iter__ calls —
    epoch boundaries must not respawn workers / re-pickle the dataset."""
    out = make_mds(tmp_path, n=8)
    ds = StreamingDataset(local=out, shuffle=False)
    dl = DataLoader(ds, batch_size=4, drop_last=True, num_workers=2)
    list(dl)
    pool_first = dl._pool
    assert pool_first is not None
    list(dl)
    assert dl._pool is pool_first
    dl.close()
    assert dl._pool is None
    assert len(list(dl)) == 2  # usable again after close


def test_dataloader_batches(tmp_path):
    out = make_mds(tmp_path, n=25)

    class Identity(StreamingDataset):
        def process_sample(self, s):
            return {"idx": np.int64(s["idx"]), "x": np.ones(3, np.float32)}

    ds = Identity(local=out, shuffle=False)
    dl = DataLoader(ds, batch_size=4, drop_last=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 6                          # 25 // 4
    assert batches[0]["x"].shape == (4, 3)
    seen = np.concatenate([b["idx"] for b in batches])
    assert len(set(seen.tolist())) == 24

    # resume mid-epoch
    dl2 = DataLoader(ds, batch_size=4, drop_last=True, num_workers=1)
    dl2.load_state_dict({"epoch": 0, "batch_in_epoch": 3})
    rest = list(dl2)
    assert len(rest) == 3
    np.testing.assert_array_equal(rest[0]["idx"], batches[3]["idx"])

    # resume AT the epoch boundary: a checkpoint taken on an epoch's final
    # batch is written while __iter__ is suspended at its last yield, so
    # the saved position points past the end of the epoch; resuming must
    # start the next epoch, not yield an empty one (this hung autoresume
    # across epoch boundaries in run.py)
    dl3 = DataLoader(ds, batch_size=4, drop_last=True, num_workers=1)
    dl3.load_state_dict({"epoch": 0, "batch_in_epoch": 6})
    nxt = list(dl3)
    assert len(nxt) == 6
    assert dl3.state_dict() == {"epoch": 2, "batch_in_epoch": 0}


def test_collate():
    out = default_collate([{"a": np.ones(2), "b": 1, "c": "x"},
                           {"a": np.zeros(2), "b": 2, "c": "y"}])
    assert out["a"].shape == (2, 2)
    np.testing.assert_array_equal(out["b"], [1, 2])
    assert out["c"] == ["x", "y"]


def test_largest_center_square():
    img = Image.new("RGB", (100, 60))
    out = LargestCenterSquare(32)(img)
    assert out.size == (32, 32)
    arr = sd_normalize(out)
    assert arr.shape == (32, 32, 3)
    assert arr.min() >= -1 and arr.max() <= 1


def test_center_crop_sd_transform():
    img = Image.new("RGB", (100, 60), (255, 255, 255))
    arr = CenterCropSDTransform(size=16)(img)
    assert arr.shape == (16, 16, 3)
    np.testing.assert_allclose(arr, 1.0, atol=1e-2)   # white -> ~1.0


def test_filter_fn():
    strat = {"short_side": {"min": 256, "default": False},
             "aesthetic": {"min": 5.0, "default": True},
             "punsafe": {"max": 0.5, "default": True}}
    ok = {"json": {"height": 512, "width": 300, "aesthetic": 6.0, "punsafe": 0.1}}
    assert filter_fn(ok, strat)
    assert not filter_fn({"json": {"height": 100, "width": 300}}, strat)
    assert not filter_fn({"json": {}}, strat)                       # missing side -> drop
    assert not filter_fn({"json": {"height": 512, "width": 512,
                                   "AESTHETIC_SCORE": 2.0}}, strat)  # variant key
    assert not filter_fn({"json": {"height": 512, "width": 512,
                                   "punsafe": 0.9}}, strat)
    assert filter_fn({"json": {}}, None)                             # no strategy


def _make_tar(tmp_path, name, n, caption_key="txt"):
    path = str(tmp_path / name)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, data in ((f"jpg", _jpeg_bytes()),
                              (caption_key, f"sample {name}-{i}".encode()),
                              ("json", json.dumps({"height": 512,
                                                   "width": 512}).encode())):
                info = tarfile.TarInfo(f"{name}-{i:04d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return path


def test_tar_samples_grouping(tmp_path):
    shard = _make_tar(tmp_path, "a.tar", 5)
    samples = list(tar_samples([shard]))
    assert len(samples) == 5
    assert set(samples[0]) >= {"jpg", "txt", "json", "__key__"}


def test_wds_pipeline_end_to_end(tmp_path):
    shards = [_make_tar(tmp_path, f"{i}.tar", 6) for i in range(3)]
    from diffusion_tpu.data.wds import build_wds_dataloader
    dl = build_wds_dataloader(urls=shards, batch_size=4, resize_size=16,
                              shuffle_buffer=8, shuffle=True)
    batches = list(iter(dl))
    assert len(batches) == 4                          # 18 samples // 4
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[0]["captions"].shape == (4, 77)

    # next epoch yields a different order (shard shuffle by epoch)
    b2 = list(iter(dl))
    assert len(b2) == 4


def test_wds_list_shards_from_dir(tmp_path):
    _make_tar(tmp_path, "x.tar", 1)
    _make_tar(tmp_path, "y.tar", 1)
    assert len(list_shards(str(tmp_path))) == 2


def test_sample_multiplexer_weights():
    a = list(range(1000))
    b = list(range(1000, 2000))
    mixed = list(sample_multiplexer({tuple(a): 0.9, tuple(b): 0.1}, seed=0))
    first_500 = mixed[:500]
    frac_a = sum(1 for x in first_500 if x < 1000) / 500
    assert 0.8 < frac_a <= 1.0
    assert len(mixed) == 2000                          # nothing lost


def test_sample_shuffle_preserves_elements():
    out = list(sample_shuffle(range(100), buffer_size=10, seed=1))
    assert sorted(out) == list(range(100))
    assert out != list(range(100))


def test_mix_dataloader(tmp_path):
    shards_a = [_make_tar(tmp_path, "ma.tar", 8)]
    shards_b = [_make_tar(tmp_path, "mb.tar", 8)]
    from diffusion_tpu.data.mix import build_mix_dataloader
    dl = build_mix_dataloader(
        datapipes={
            "a": {"_target_": "diffusion_tpu.data.wds.build_wds_dataloader",
                  "weight": 3.0, "urls": shards_a},
            "b": {"_target_": "diffusion_tpu.data.wds.build_wds_dataloader",
                  "weight": 1.0, "urls": shards_b},
        },
        batch_size=4, resize_size=16)
    batches = list(iter(dl))
    assert len(batches) == 4
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    # introspection: the text pipeline graph names every source with its
    # normalized weight and the stage chain (reference renders this graph
    # to datapipes.pdf, mix_datapipe.py:98-100)
    graph = dl.describe()
    assert "source a (weight 0.7500)" in graph
    assert "source b (weight 0.2500)" in graph
    assert "sample_multiplexer" in graph and "length_sync" in graph


def test_laion_precomputed_latents(tmp_path):
    out = str(tmp_path / "laion")
    lat = np.arange(4 * 32 * 32, dtype=np.float16)
    cap = np.arange(77 * 1024, dtype=np.float16)
    with MDSWriter(out, {"jpg": "bytes", "caption": "str",
                         "latents_256": "bytes", "caption_latents": "bytes"}) as w:
        for i in range(4):
            w.write({"jpg": _jpeg_bytes(), "caption": f"c{i}",
                     "latents_256": lat.tobytes(),
                     "caption_latents": cap.tobytes()})
    from diffusion_tpu.data.laion import build_streaming_laion_dataloader
    dl = build_streaming_laion_dataloader(remote=out, batch_size=2,
                                          resize_size=256,
                                          precomputed_latents=True,
                                          shuffle=False, num_workers=1)
    batch = next(iter(dl))
    assert batch["image_latents"].shape == (2, 32, 32, 4)   # NHWC delivery
    assert batch["caption_latents"].shape == (2, 77, 1024)


def test_coco_dataset_zero_one_range(tmp_path):
    out = str(tmp_path / "coco")
    with MDSWriter(out, {"image": "bytes", "captions": "json"}) as w:
        for i in range(3):
            w.write({"image": _jpeg_bytes(64, 64, (128, 128, 128)),
                     "captions": [f"first {i}", f"second {i}"]})
    from diffusion_tpu.data.coco import build_streaming_cocoval_dataloader
    dl = build_streaming_cocoval_dataloader(remote=out, batch_size=3,
                                            resize_size=32, num_workers=1)
    batch = next(iter(dl))
    img = batch["image"]
    assert img.shape == (3, 32, 32, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0       # FID range, no +-1
    assert batch["captions"].shape == (3, 77)


def test_mds_writer_remote_upload(tmp_path):
    """(local, remote) MDSWriter streams every shard + index to the remote in
    the background (reference cloudwriter targets buckets directly,
    laion_cloudwriter.py:230-235,299-309); keep_local=False prunes local
    shard copies after their upload lands."""
    local = str(tmp_path / "local")
    remote = str(tmp_path / "remote")
    with MDSWriter((local, remote), {"jpg": "bytes", "caption": "str"},
                   size_limit=2000, keep_local=False) as w:
        for i in range(25):
            w.write({"jpg": _jpeg_bytes(), "caption": f"c {i}"})
    index = MDSIndex(remote)
    assert index.num_samples == 25
    assert len(index.shards) > 1
    for s in index.shards:
        base = s["raw_data"]["basename"]
        assert os.path.exists(os.path.join(remote, base))
        assert not os.path.exists(os.path.join(local, base))  # pruned
    # remote copy is readable end to end
    ds = StreamingDataset(local=remote)
    assert ds.get_sample(13)["caption"] == "c 13"


def test_release_shard_deletes_cache_only(tmp_path):
    """release_shard removes a consumed shard from the local CACHE and the
    shard transparently re-downloads on next access; it refuses to touch a
    local-only source (reference precompute_latents.py:335-351)."""
    src = make_mds(tmp_path, n=25)
    cache = str(tmp_path / "cache")
    ds = StreamingDataset(remote=src, local=cache)
    assert ds.get_sample(0)["idx"] == 0
    flat = ds.flat_shard_of(0)
    base = ds._indexes[0].shards[flat]["raw_data"]["basename"]
    assert os.path.exists(os.path.join(cache, base))
    assert ds.release_shard(flat)
    assert not os.path.exists(os.path.join(cache, base))
    assert ds.get_sample(0)["idx"] == 0       # re-downloaded transparently
    # local-only dataset: refuse
    ds2 = StreamingDataset(local=src)
    assert not ds2.release_shard(ds2.flat_shard_of(0))
    assert ds2.get_sample(0)["idx"] == 0


def test_process_worker_loader_matches_thread(tmp_path):
    """worker_type='process' (the reference's process fan-out, torchdata
    MultiProcessingReadingService / laion_cloudwriter.py:299-309) yields
    byte-identical batches to the thread pool, through the full
    image-caption path (JPEG decode + transform + tokenizer pickling)."""
    from diffusion_tpu.data.image_caption import (
        build_streaming_image_caption_dataloader)

    out = str(tmp_path / "mds")
    with MDSWriter(out, {"image": "bytes", "caption": "str"}) as w:
        rng = np.random.default_rng(3)
        for i in range(12):
            arr = rng.integers(0, 255, (48, 40, 3)).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write({"image": buf.getvalue(), "caption": f"caption {i}"})

    def batches(worker_type):
        dl = build_streaming_image_caption_dataloader(
            remote=out, batch_size=4, resize_size=32, shuffle=False,
            num_workers=2, drop_last=True, worker_type=worker_type)
        return list(dl)

    thread_b, proc_b = batches("thread"), batches("process")
    assert len(thread_b) == len(proc_b) == 3
    for tb, pb in zip(thread_b, proc_b):
        np.testing.assert_array_equal(tb["image"], pb["image"])
        np.testing.assert_array_equal(tb["captions"], pb["captions"])


def test_laion_subset_partition_equal_lengths(tmp_path):
    """num_samples subsetting must keep per-rank lengths EQUAL after
    filtering (which ids survive the < num_samples cut varies per rank) —
    unequal batch counts deadlock a multi-host pod (same invariant as
    StreamingDataset.partition)."""
    from diffusion_tpu.data.laion import _Subset
    out = make_mds(tmp_path)
    ds = StreamingDataset(local=out, shuffle=True, num_canonical_nodes=2)
    sub = _Subset(ds, num_samples=10)           # of 25
    for world in (2, 3, 4, 8):
        parts = [sub.partition(0, r, world) for r in range(world)]
        assert len({len(p) for p in parts}) == 1, world
        assert len(parts[0]) == -(-10 // world), world
        for p in parts:
            assert (np.asarray(p) < 10).all()
    # degenerate: more ranks than samples still gives every rank >= 1 id
    tiny = _Subset(ds, num_samples=2)
    parts = [tiny.partition(0, r, 8) for r in range(8)]
    assert all(len(p) == 1 for p in parts)
    assert all(int(p[0]) < 2 for p in parts)


def test_mds_writer_flush_is_durability_barrier(tmp_path):
    """flush() forces buffered samples into a shard, refreshes the remote
    index, and drains uploads — after it returns, a reader pointed at the
    REMOTE sees everything written so far (the point where the cloudwriter
    may safely delete consumed source parquets)."""
    local = str(tmp_path / "local")
    remote = str(tmp_path / "remote")
    w = MDSWriter((local, remote), {"caption": "str"},
                  size_limit=10**6, keep_local=False)   # never auto-flushes
    for i in range(5):
        w.write({"caption": f"c{i}"})
    w.flush()
    ds = StreamingDataset(local=remote)                 # mid-run remote read
    assert len(ds) == 5 and ds.get_sample(4)["caption"] == "c4"
    w.write({"caption": "c5"})
    w.finish()
    ds2 = StreamingDataset(local=str(tmp_path / "cache"), remote=remote)
    assert len(ds2) == 6 and ds2.get_sample(5)["caption"] == "c5"

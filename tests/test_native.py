"""Native data-plane library (csrc/dataio.cpp) parity vs pure Python.

Builds libdataio.so on the fly when a toolchain is present; skips otherwise
(the Python fallbacks are always active in production code paths)."""

import io
import json
import os
import shutil
import subprocess
import tarfile

import numpy as np
import pytest

from diffusion_tpu.data import native
from diffusion_tpu.data.mds import MDSWriter


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.native_available():
        if shutil.which("g++") is None:
            pytest.skip("no g++ and no prebuilt libdataio.so")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(["python", os.path.join(root, "tools", "build_native.py")],
                       check=True)
        native._lib = None  # force reload
    assert native.native_available()


def _make_tar(path, n):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            for ext, data in (("jpg", b"x" * (100 + i)),
                              ("txt", f"cap {i}".encode())):
                info = tarfile.TarInfo(f"s{i:04d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_tar_index_matches_tarfile(tmp_path):
    path = str(tmp_path / "t.tar")
    _make_tar(path, 9)
    nat = native.tar_index(path)
    ref = []
    with tarfile.open(path, "r") as tf:
        for m in tf:
            if m.isfile():
                ref.append((m.name, m.offset_data, m.size))
    assert nat == ref


def test_tar_index_data_correct(tmp_path):
    path = str(tmp_path / "t.tar")
    _make_tar(path, 3)
    blob = open(path, "rb").read()
    for name, off, size in native.tar_index(path):
        if name.endswith(".txt"):
            idx = int(name.split(".")[0][1:])
            assert blob[off:off + size] == f"cap {idx}".encode()


def test_mds_sample_table_matches_header(tmp_path):
    out = str(tmp_path / "mds")
    with MDSWriter(out, {"a": "str"}) as w:
        for i in range(12):
            w.write({"a": "v" * (i + 1)})
    basename = json.load(open(os.path.join(out, "index.json")))[
        "shards"][0]["raw_data"]["basename"]
    blob = open(os.path.join(out, basename), "rb").read()
    table = native.mds_sample_table(blob)
    n = int(np.frombuffer(blob[:4], np.uint32)[0])
    offs = np.frombuffer(blob[4:4 + 4 * (n + 1)], np.uint32)
    np.testing.assert_array_equal(table[:, 0], offs[:-1])
    np.testing.assert_array_equal(table[:, 1], offs[1:])


def test_malformed_tar_tolerated(tmp_path):
    """Garbage headers yield no entries (the pipeline's per-shard handler
    treats empty/failed shards as skippable, reference wds/utils.py:5-8)."""
    path = str(tmp_path / "bad.tar")
    with open(path, "wb") as f:
        f.write(b"Z" * 100 + b"\x00" * 412)  # one garbage header, truncated
    entries = native.tar_index(path)  # no crash; at most junk zero-size rows
    assert all(size == 0 for _, _, size in entries)


# ---- native JPEG decode (csrc/dataio.cpp jpeg_decode_square) ---------------

def _smooth_jpeg(w, h, quality=92):
    """Synthetic smooth RGB image (hard edges would amplify codec diffs)."""
    import io

    from PIL import Image
    x = (np.linspace(0, 8 * np.pi, w)[None, :]
         + np.linspace(0, 6 * np.pi, h)[:, None])
    arr = np.stack([127.5 + 120 * np.sin(x),
                    127.5 + 120 * np.cos(0.7 * x),
                    127.5 + 120 * np.sin(0.3 * x + 1)], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.skipif(not native.jpeg_native_available(),
                    reason="libdataio built without libjpeg")
@pytest.mark.parametrize("wh", [(640, 480), (300, 500), (64, 64), (90, 120)])
def test_jpeg_decode_square_matches_pil_transform(wh):
    """Native decode+LargestCenterSquare+normalize == the PIL path at the
    SAME (full) decode scale within JPEG/resample rounding. (At reduced DCT
    scales the two legitimately diverge: libjpeg does any N/8, PIL draft
    only powers of two.)"""
    import io

    from PIL import Image

    from diffusion_tpu.data.transforms import SDSquareNormalize

    data = _smooth_jpeg(*wh)
    size = 56
    img = Image.open(io.BytesIO(data))
    want = SDSquareNormalize(size)(img.convert("RGB"))
    got = native.jpeg_decode_square(data, size, min_short=10 ** 6)
    assert got is not None and got.shape == (size, size, 3)
    assert got.dtype == np.float32
    # [-1, 1] units: 0.03 ~= 4/255 (PIL uses fixed-point resample coeffs)
    np.testing.assert_allclose(got, want, atol=0.03)


@pytest.mark.skipif(not native.jpeg_native_available(),
                    reason="libdataio built without libjpeg")
def test_jpeg_decode_square_reduced_scale_close():
    """The default fast path (DCT-scaled decode straight to the target) is
    a faithful low-pass of the full-decode reference — content, not exact
    pixels."""
    data = _smooth_jpeg(612, 408)
    size = 56
    ref = native.jpeg_decode_square(data, size, min_short=10 ** 6)
    fast = native.jpeg_decode_square(data, size)  # N/8 DCT scale engaged
    assert float(np.abs(fast - ref).mean()) < 0.05


@pytest.mark.skipif(not native.jpeg_native_available(),
                    reason="libdataio built without libjpeg")
def test_jpeg_decode_square_declines_bad_inputs():
    assert native.jpeg_decode_square(b"\x89PNG\r\n", 32) is None   # not JPEG
    assert native.jpeg_decode_square(b"\xff\xd8\xff\xe0junk", 32) is None
    # truncated-but-valid-prefix stream: no crash — either graceful None or
    # a partial decode (libjpeg pads with EOI, the same tolerance PIL's
    # LOAD_TRUNCATED_IMAGES gives, reference wds_datapipe.py:31)
    data = _smooth_jpeg(200, 200)
    out = native.jpeg_decode_square(data[: len(data) // 3], 32)
    assert out is None or (out.shape == (32, 32, 3)
                           and np.isfinite(out).all())


def test_image_caption_loader_native_pil_agree(tmp_path):
    """The MDS loader yields the same tensors with the native decode on and
    off (DIFFUSION_TPU_NATIVE_JPEG gate) within codec tolerance."""
    import os

    from diffusion_tpu.data.image_caption import (
        build_streaming_image_caption_dataloader)
    from diffusion_tpu.data.mds import MDSWriter

    out = str(tmp_path / "mds")
    with MDSWriter(out, {"image": "bytes", "caption": "str"}) as w:
        for i in range(8):
            w.write({"image": _smooth_jpeg(120 + 8 * i, 100 + 4 * i),
                     "caption": f"sample {i}"})

    def batches(native_on):
        os.environ["DIFFUSION_TPU_NATIVE_JPEG"] = "1" if native_on else "0"
        try:
            loader = build_streaming_image_caption_dataloader(
                remote=out, batch_size=8, resize_size=48, shuffle=False,
                num_workers=1, persistent_workers=False)
            return next(iter(loader))
        finally:
            os.environ.pop("DIFFUSION_TPU_NATIVE_JPEG", None)

    a, b = batches(True), batches(False)
    assert a["image"].shape == b["image"].shape == (8, 48, 48, 3)
    np.testing.assert_array_equal(a["captions"], b["captions"])
    if native.jpeg_native_available():
        # native decodes at 1x DCT headroom vs PIL's 2x draft: small-block
        # detail differs, so compare loosely — the contract is [-1,1] range
        # and the same image content
        assert np.abs(a["image"] - b["image"]).mean() < 0.08
    else:
        np.testing.assert_array_equal(a["image"], b["image"])

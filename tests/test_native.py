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

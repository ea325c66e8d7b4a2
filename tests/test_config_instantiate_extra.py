"""Call-site _recursive_/_partial_ control (hydra parity, reference
train.py:41 passes _recursive_=False so builders receive raw child configs)."""

import functools

from diffusion_tpu.config import instantiate


def test_callsite_recursive_false():
    node = {
        "_target_": "builtins.dict",
        "inner": {"_target_": "fractions.Fraction", "numerator": 1},
    }
    obj = instantiate(node, _recursive_=False)
    # child passed through raw for the builder to instantiate itself
    assert obj["inner"] == {"_target_": "fractions.Fraction", "numerator": 1}


def test_callsite_partial():
    p = instantiate({"_target_": "fractions.Fraction", "denominator": 4},
                    _partial_=True)
    assert isinstance(p, functools.partial)
    import fractions
    assert p(1) == fractions.Fraction(1, 4)


def test_mix_config_via_instantiate(tmp_path):
    """The mixdata yaml shape: outer builder receives raw datapipes configs."""
    import io
    import tarfile
    from diffusion_tpu.config import loads_config

    def make_tar(name, n):
        path = str(tmp_path / name)
        with tarfile.open(path, "w") as tf:
            from PIL import Image
            for i in range(n):
                buf = io.BytesIO()
                Image.new("RGB", (20, 20)).save(buf, format="JPEG")
                for ext, data in (("jpg", buf.getvalue()),
                                  ("txt", f"c{i}".encode())):
                    info = tarfile.TarInfo(f"{name}-{i:03d}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        return path

    a, b = make_tar("a.tar", 6), make_tar("b.tar", 6)
    cfg = loads_config(f"""
train_dataset:
  _target_: diffusion_tpu.data.mix.build_mix_dataloader
  batch_size: 4
  resize_size: 16
  datapipes:
    a:
      _target_: diffusion_tpu.data.wds.build_wds_dataloader
      weight: 1.0
      urls: [{a}]
    b:
      _target_: diffusion_tpu.data.wds.build_wds_dataloader
      weight: 1.0
      urls: [{b}]
""")
    dl = instantiate(cfg["train_dataset"], batch_size=4, _recursive_=False)
    batches = list(iter(dl))
    assert len(batches) == 3  # 12 samples // 4
    assert batches[0]["image"].shape == (4, 16, 16, 3)

"""BPE parity vs transformers.CLIPTokenizer on identical vocab/merges files.

The reference tokenizes with transformers' CLIPTokenizer (reference:
diffusion/datasets/image_caption.py:96-100); this proves our pure-Python BPE
produces byte-identical ids for the same vocabulary."""

import json
import os

import numpy as np
import pytest

from diffusion_tpu.text.tokenizer import CLIPTokenizer, _bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("vocab")
    syms = list(_bytes_to_unicode().values())
    vocab = {}
    for s in syms:
        vocab[s] = len(vocab)
    for s in syms:
        vocab[s + "</w>"] = len(vocab)
    merges = [("t", "h"), ("th", "e</w>"), ("c", "a"), ("ca", "t</w>"),
              ("i", "n"), ("in", "g</w>"), ("a", "n"), ("an", "d</w>"),
              ("o", "f</w>"), ("l", "o"), ("lo", "n"), ("lon", "g</w>")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(root / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(root / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(root)


@pytest.fixture(scope="module")
def both(vocab_dir):
    from transformers import CLIPTokenizer as HFCLIPTokenizer
    ours = CLIPTokenizer.from_pretrained(vocab_dir)
    theirs = HFCLIPTokenizer(os.path.join(vocab_dir, "vocab.json"),
                             os.path.join(vocab_dir, "merges.txt"),
                             model_max_length=77)
    return ours, theirs


TEXTS = [
    "the cat",
    "a long caption of the thing and the other thing",
    "Hello, World!  Mixed   CASE and punctuation...",
    "don't can't won't it's",
    "numbers 123 456 7",
    "unicode café naïve 中文",
    "",
    "    leading and trailing    ",
]


@pytest.mark.parametrize("text", TEXTS)
def test_ids_match_hf(both, text):
    ours, theirs = both
    got = ours(text, padding="max_length", truncation=True)["input_ids"][0]
    want = theirs(text, padding="max_length", truncation=True,
                  return_tensors="np")["input_ids"][0]
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_truncation_matches_hf(both):
    ours, theirs = both
    text = "the cat and the thing " * 40
    got = ours(text)["input_ids"][0]
    want = theirs(text, padding="max_length", truncation=True,
                  return_tensors="np")["input_ids"][0]
    assert got.shape == want.shape == (77,)
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_decode_roundtrip(both):
    ours, _ = both
    ids = ours("the cat and the dog")["input_ids"][0]
    assert ours.decode(ids) == "the cat and the dog"


def test_sd2_pad_token_config(vocab_dir, tmp_path):
    """SD2's tokenizer_config.json sets pad_token '!' (id 0); padded ids must
    match HF with that config (ADVICE r1: CFG negative-prompt/padding parity)."""
    import shutil

    from transformers import CLIPTokenizer as HFCLIPTokenizer

    sd2_dir = tmp_path / "sd2_tok"
    shutil.copytree(vocab_dir, sd2_dir)
    with open(sd2_dir / "tokenizer_config.json", "w") as f:
        json.dump({"pad_token": "!", "model_max_length": 77}, f)

    ours = CLIPTokenizer.from_pretrained(str(sd2_dir))
    theirs = HFCLIPTokenizer(os.path.join(sd2_dir, "vocab.json"),
                             os.path.join(sd2_dir, "merges.txt"),
                             model_max_length=77, pad_token="!")
    assert ours.pad_token_id == theirs.pad_token_id == ours.encoder["!"]
    for text in ("the cat", ""):
        got = ours(text, padding="max_length", truncation=True)["input_ids"][0]
        want = theirs(text, padding="max_length", truncation=True,
                      return_tensors="np")["input_ids"][0]
        np.testing.assert_array_equal(got, want.astype(np.int32))


def test_pad_token_dict_form(vocab_dir, tmp_path):
    """special_tokens_map.json AddedToken dict form also resolves."""
    import shutil

    sd2_dir = tmp_path / "tok2"
    shutil.copytree(vocab_dir, sd2_dir)
    with open(sd2_dir / "special_tokens_map.json", "w") as f:
        json.dump({"pad_token": {"content": "!"}}, f)
    ours = CLIPTokenizer.from_pretrained(str(sd2_dir))
    assert ours.pad_token_id == ours.encoder["!"]

"""CLIP BPE tokenizer tests (tiny self-contained vocab)."""

import numpy as np

from diffusion_tpu.text.tokenizer import CLIPTokenizer, tiny_tokenizer


def test_shapes_and_specials():
    tok = tiny_tokenizer()
    out = tok(["a photo of a cat", "dog"])
    ids = out["input_ids"]
    assert ids.shape == (2, 77)
    assert ids.dtype == np.int32
    assert (ids[:, 0] == tok.bos_token_id).all()
    # padded with eos
    assert ids[1, -1] == tok.eos_token_id


def test_attention_mask():
    tok = tiny_tokenizer()
    out = tok("hi")
    mask = out["attention_mask"][0]
    n = int(mask.sum())
    assert n == 2 + len(tok.tokenize("hi"))  # bos + tokens + eos
    assert (mask[:n] == 1).all() and (mask[n:] == 0).all()


def test_roundtrip_decode():
    tok = tiny_tokenizer()
    text = "a photo of a majestic lion"
    ids = tok(text)["input_ids"][0]
    assert tok.decode(ids) == text


def test_lowercase_and_whitespace():
    tok = tiny_tokenizer()
    a = tok("A   Photo\tOf a CAT")["input_ids"]
    b = tok("a photo of a cat")["input_ids"]
    np.testing.assert_array_equal(a, b)


def test_truncation():
    tok = tiny_tokenizer(model_max_length=8)
    ids = tok("a very long caption that exceeds the maximum length")["input_ids"][0]
    assert ids.shape == (8,)
    assert ids[0] == tok.bos_token_id
    assert ids[-1] == tok.eos_token_id


def test_bpe_merges_apply():
    # vocab: characters + merged 'ab'; the merge must win over char-by-char
    from diffusion_tpu.text.tokenizer import _bytes_to_unicode
    syms = list(_bytes_to_unicode().values())
    vocab = {}
    for s in syms:
        vocab[s] = len(vocab)
    for s in syms:
        vocab[s + "</w>"] = len(vocab)
    vocab["ab</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    tok = CLIPTokenizer(vocab, merges=[("a", "b</w>")])
    ids = tok.tokenize("ab")
    assert ids == [vocab["ab</w>"]]
    assert tok.decode([vocab["ab</w>"]]) == "ab"


def test_batch_decode():
    tok = tiny_tokenizer()
    ids = tok(["one", "two"])["input_ids"]
    assert tok.batch_decode(ids) == ["one", "two"]

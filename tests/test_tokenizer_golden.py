"""Tokenizer goldens: our ClipTokenizer vs committed ids AND live vs
transformers' CLIPTokenizer (an independent implementation of the OpenAI
CLIP BPE) over a trained mini merges table.

The real `bpe_simple_vocab_16e6.txt.gz` is not redistributable through this
offline environment (see tests/goldens/regen_tokenizer.py); the table here
is smaller but the *algorithm* under test is identical — byte-to-unicode
mapping, `</w>` word-end handling, rank-ordered merge loop, overlap
resolution, truncation-with-eot. With the real vocab only the table
contents change.
"""

import json
import os

import numpy as np
import pytest

from tooncrafter_tpu.utils.tokenizer import ClipTokenizer

HERE = os.path.dirname(__file__)
MERGES = os.path.join(HERE, "goldens", "clip_bpe_merges.txt")
GOLDEN = os.path.join(HERE, "goldens", "tokenizer_golden_ids.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def tok():
    return ClipTokenizer(bpe_path=MERGES)


def test_tokenizer_golden_ids(tok, golden):
    got = tok(golden["texts"])
    want = np.asarray(golden["ids"], np.int32)
    np.testing.assert_array_equal(got, want)


def test_tokenizer_matches_transformers_live(tok, golden):
    """Re-derive the ids with transformers' CLIPTokenizer at test time —
    guards against a stale golden file masking a behavior change."""
    import sys

    sys.path.insert(0, os.path.join(HERE, "goldens"))
    try:
        from regen_tokenizer import build_vocab, hf_tokenize
    finally:
        sys.path.pop(0)
    merges = list(tok.bpe_ranks)
    ids = hf_tokenize(merges, build_vocab(merges), golden["texts"])
    np.testing.assert_array_equal(tok(golden["texts"]),
                                  np.asarray(ids, np.int32))


def test_truncation_preserves_eot(tok):
    long = ("a very long prompt that keeps going " * 20).strip()
    out = tok([long])
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.sot
    assert out[0, 76] == tok.eot          # truncated tail keeps eot
    assert tok.eot not in out[0, 1:76]    # and only at the end


def test_empty_and_whitespace_prompts(tok):
    out = tok(["", "   "])
    for row in out:
        assert row[0] == tok.sot and row[1] == tok.eot
        assert (row[2:] == 0).all()


def test_merge_overlap_resolution(tok):
    """'aaaaaa': merges must apply left-to-right at each rank, never
    overlapping — the classic BPE pitfall."""
    ids = tok.encode("aaaaaa")
    toks = []
    inv = {v: k for k, v in tok.encoder.items()}
    toks = [inv[i] for i in ids]
    assert "".join(toks).replace("</w>", "") == "aaaaaa"


def test_unicode_multibyte_roundtrip(tok):
    """Emoji are 4 utf-8 bytes each; every byte must map through the
    byte-unicode table and survive BPE unmerged (no emoji in the table)."""
    ids = tok.encode("\U0001f3a8")
    inv = {v: k for k, v in tok.encoder.items()}
    joined = "".join(inv[i] for i in ids).replace("</w>", "")
    raw = bytes(tok.byte_decoder[c] for c in joined)
    assert raw.decode("utf-8") == "\U0001f3a8"

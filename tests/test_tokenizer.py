"""CLIP BPE tokenizer parity vs transformers (reference tokenises prompts
with transformers CLIPTokenizer, reference magicanimate/pipelines/
animation.py:75-76)."""

import json

import numpy as np
import pytest

from emox.data.tokenizer import (
    CLIP_MAX_LENGTH,
    CLIP_VOCAB_SIZE,
    CLIPTokenizer,
    bytes_to_unicode,
    fallback_vocab,
)

TEXTS = [
    "a photo of a talking head",
    "A PORTRAIT, speaking!  ",
    "hello   world's  end",
    "emoji \U0001f600 and accents café",
    "",
    "don't stop-me now; 42 cats",
]


def _write_hf_vocab(tmp_path, merges):
    chars = list(bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars] + ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    vj = tmp_path / "vocab.json"
    mt = tmp_path / "merges.txt"
    vj.write_text(json.dumps(vocab), encoding="utf-8")
    mt.write_text("#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n", encoding="utf-8")
    return str(tmp_path)


# merges chosen to exercise chains (t+h -> th, th+e</w> -> the</w>), partial
# application, and ties resolved by rank order
MERGES = [
    ("t", "h"),
    ("th", "e</w>"),
    ("a", "</w>"),
    ("o", "f</w>"),
    ("i", "n"),
    ("in", "g</w>"),
    ("l", "l"),
    ("h", "e"),
    ("he", "a"),
    ("hea", "d</w>"),
    ("o", "r"),
    ("w", "or"),
    ("c", "a"),
    ("ca", "t"),
]


def test_parity_vs_transformers(tmp_path):
    transformers = pytest.importorskip("transformers")
    vdir = _write_hf_vocab(tmp_path, MERGES)
    theirs = transformers.CLIPTokenizer(vdir + "/vocab.json", vdir + "/merges.txt")
    ours = CLIPTokenizer(vdir)
    assert not ours.is_fallback
    for text in TEXTS:
        ref = theirs(text, padding="max_length", truncation=True, max_length=CLIP_MAX_LENGTH)[
            "input_ids"
        ]
        got = ours.encode(text)[0].tolist()
        assert got == ref, f"mismatch on {text!r}: {got[:12]} vs {ref[:12]}"


def test_parity_truncation(tmp_path):
    transformers = pytest.importorskip("transformers")
    vdir = _write_hf_vocab(tmp_path, MERGES)
    theirs = transformers.CLIPTokenizer(vdir + "/vocab.json", vdir + "/merges.txt")
    ours = CLIPTokenizer(vdir)
    text = " ".join(["the head of a cat"] * 40)
    ref = theirs(text, padding="max_length", truncation=True, max_length=CLIP_MAX_LENGTH)["input_ids"]
    got = ours.encode(text)[0].tolist()
    assert len(got) == CLIP_MAX_LENGTH
    assert got == ref


def test_fallback_is_id_compatible():
    """Fallback vocab ids must coincide with the real CLIP vocabulary for
    byte tokens and specials (module docstring contract)."""
    vocab, merges = fallback_vocab()
    assert merges == []
    chars = list(bytes_to_unicode().values())
    assert vocab[chars[0]] == 0 and vocab[chars[255]] == 255
    assert vocab[chars[0] + "</w>"] == 256
    assert vocab["<|startoftext|>"] == CLIP_VOCAB_SIZE - 2
    assert vocab["<|endoftext|>"] == CLIP_VOCAB_SIZE - 1


def test_fallback_roundtrip():
    tok = CLIPTokenizer()
    assert tok.is_fallback
    ids = tok.encode("Hello, WORLD café")
    assert ids.shape == (1, CLIP_MAX_LENGTH)
    assert ids[0, 0] == tok.sot and ids[0, -1] == tok.eot
    # lowercased on the way in (CLIP is lowercase-only)
    assert tok.decode(ids[0]) == "hello , world café"
    # batch form
    batch = tok.encode(["a", "bb"])
    assert batch.shape == (2, CLIP_MAX_LENGTH)
    assert batch.dtype == np.int32


def test_empty_prompt_matches_reference_uncond():
    """Empty prompt = [SOT, EOT, EOT...] — the reference's CFG uncond
    embedding input (reference pipeline_animation.py:243-271)."""
    tok = CLIPTokenizer()
    ids = tok.encode("")
    assert ids[0, 0] == tok.sot
    assert all(int(i) == tok.eot for i in ids[0, 1:])

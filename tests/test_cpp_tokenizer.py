"""Cross-language tokenizer parity: the C++ BPE (cpp/src/inference/
tokenizer.cc, via the gabby_tokenize CLI) must match the Python tokenizer
(gabby_tpu/tokenizer.py) on encode AND decode over an ASCII corpus (the C++
pretokenizer is exact for ASCII; non-ASCII uses approximate \\p{L} tables)."""

import json
import os
import subprocess

import pytest

from gabby_tpu.tokenizer import Tokenizer, _byte_to_unicode

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "cpp", "build", "gabby_tokenize")


def _mini_tokenizer_dict():
    """Byte-level BPE over ASCII with merges learned greedily from a seed
    corpus — enough structure to exercise ranks, spaces, digits, specials."""
    b2u = _byte_to_unicode()
    vocab = {}
    for b in range(256):
        vocab[b2u[b]] = len(vocab)
    seed = ("the quick brown fox jumps over the lazy dog "
            "hello world this is a test of the tokenizer 123 456")
    words = [w for w in seed.split(" ") if w]
    # greedy pair counting for a few rounds
    merges = []
    tokens = [[b2u[b] for b in (" " + w).encode()] for w in words]
    for _ in range(60):
        counts = {}
        for t in tokens:
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (a, b), n = max(counts.items(), key=lambda kv: kv[1])
        if n < 2:
            break
        merges.append(f"{a} {b}")
        vocab.setdefault(a + b, len(vocab))
        tokens = [_apply(t, a, b) for t in tokens]
    specials = ["<|begin_of_text|>", "<|end_of_text|>",
                "<|start_header_id|>", "<|end_header_id|>", "<|eot_id|>"]
    added = [{"id": len(vocab) + i, "content": s}
             for i, s in enumerate(specials)]
    return {"model": {"type": "BPE", "vocab": vocab, "merges": merges},
            "added_tokens": added}


def _apply(t, a, b):
    out, i = [], 0
    while i < len(t):
        if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(t[i])
            i += 1
    return out


CORPUS = [
    "hello world",
    "The quick brown fox jumps over the lazy dog.",
    "  leading and trailing spaces  ",
    "multiple   spaces between",
    "line\nbreaks\r\nand tabs\there",
    "numbers 1 22 333 4444 55555",
    "punctuation!? (brackets) [and] {braces}, \"quotes\"",
    "contractions: don't we'll I'm you're they've it's he'd",
    "<|begin_of_text|>special<|eot_id|> tokens",
    "mixed 123abc def456 x1y2z3",
    "a",
    "",
    "   ",
    "...",
]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    if not os.path.exists(CLI):
        try:
            from gabby_tpu.bridge import build_native
            build_native()
            subprocess.run(["cmake", "--build",
                            os.path.join(REPO, "cpp", "build"),
                            "--target", "gabby_tokenize"], check=True,
                           capture_output=True)
        except Exception as e:
            pytest.skip(f"native build unavailable: {e}")
    d = _mini_tokenizer_dict()
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    path.write_text(json.dumps(d))
    return str(path), Tokenizer.from_dict(d)


def _cpp_encode(path, lines):
    out = subprocess.run([CLI, path], input="\n".join(lines),
                         capture_output=True, text=True, check=True)
    return [[int(x) for x in line.split()] if line else []
            for line in out.stdout.split("\n")[:len(lines)]]


def test_encode_parity(setup):
    path, pytok = setup
    # newline cases can't ride the line-oriented CLI; test single-line here
    lines = [c for c in CORPUS if "\n" not in c and "\r" not in c]
    cpp = _cpp_encode(path, lines)
    for text, ids in zip(lines, cpp):
        assert ids == pytok.encode(text), f"diverged on {text!r}"


def test_decode_parity(setup):
    path, pytok = setup
    ids = pytok.encode("hello world, this is a test! 123")
    out = subprocess.run([CLI, path, "--decode"],
                         input=" ".join(map(str, ids)),
                         capture_output=True, text=True, check=True)
    assert out.stdout.rstrip("\n") == pytok.decode(ids)

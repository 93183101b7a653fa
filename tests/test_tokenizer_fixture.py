"""Parity against RECORDED goldens from the HuggingFace `tokenizers`
library (the reference implementation real checkpoints ship with), on a
committed multilingual fixture: accents, CJK, Cyrillic, Greek, Arabic,
emoji, Unicode digits, mixed scripts, NFC/NFD. Both the Python tokenizer
and the C++ one must reproduce HF's token ids exactly — the closest this
offline environment can get to the reference CI's real-model asset tests
(/root/reference/.github/workflows/cmake-x86_64-linux.yml:25-43). Fixture
provenance: tools/make_tokenizer_fixture.py."""

import json
import os
import subprocess

import pytest

from gabby_tpu.tokenizer import Tokenizer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures",
                       "multilingual_tokenizer.json")
GOLDENS = os.path.join(REPO, "tests", "fixtures", "tokenizer_goldens.json")
CLI = os.path.join(REPO, "cpp", "build", "gabby_tokenize")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDENS, encoding="utf-8") as f:
        return json.load(f)["goldens"]


@pytest.fixture(scope="module")
def pytok():
    return Tokenizer.from_file(FIXTURE)


def test_python_encode_matches_hf_goldens(pytok, goldens):
    for g in goldens:
        got = pytok.encode(g["text"])
        assert got == g["ids"], (
            f"python tokenizer diverged from HF on {g['text']!r}:\n"
            f"  got      {got}\n  expected {g['ids']}")


def test_python_decode_matches_hf_goldens(pytok, goldens):
    for g in goldens:
        assert pytok.decode(g["ids"]) == g["decoded"], g["text"]


def test_python_roundtrip_nonascii(pytok):
    for text in ["héllo wörld — ¡sí! ٣٤٥ 😀", "日本語とEnglishの混在",
                 "tab\tand nbsp and ideographic　space"]:
        assert pytok.decode(pytok.encode(text)) == text


@pytest.fixture(scope="module")
def cli():
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
    return CLI


def test_cpp_encode_matches_hf_goldens(cli, goldens):
    lines = [g for g in goldens
             if "\n" not in g["text"] and "\r" not in g["text"]]
    out = subprocess.run([cli, FIXTURE],
                         input="\n".join(g["text"] for g in lines),
                         capture_output=True, text=True, check=True)
    got = [[int(x) for x in line.split()] if line else []
           for line in out.stdout.split("\n")[:len(lines)]]
    for g, ids in zip(lines, got):
        assert ids == g["ids"], (
            f"C++ tokenizer diverged from HF on {g['text']!r}:\n"
            f"  got      {ids}\n  expected {g['ids']}")


def test_cpp_decode_matches_hf_goldens(cli, goldens):
    for g in goldens[:8]:
        out = subprocess.run([cli, FIXTURE, "--decode"],
                             input=" ".join(map(str, g["ids"])),
                             capture_output=True, text=True, check=True)
        assert out.stdout.rstrip("\n") == g["decoded"], g["text"]

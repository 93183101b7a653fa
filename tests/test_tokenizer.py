"""Tokenizer golden tests: our BPE must byte-for-byte match the HF
`tokenizers` library on a tokenizer.json we train with the real Llama-3
split pattern + byte-level alphabet."""

import json

import pytest

from gabby_tpu.tokenizer import LLAMA3_SPLIT_PATTERN, ChatFormat, Tokenizer

SPECIALS = [
    "<|begin_of_text|>", "<|end_of_text|>", "<|start_header_id|>",
    "<|end_header_id|>", "<|eot_id|>", "<|eom_id|>",
]

CORPUS = [
    "hello world, hello tokenizer! The quick brown fox jumps over the lazy dog.",
    "Numbers: 1 22 333 4444 55555 123456789, and punctuation?! (yes); [maybe]",
    "newlines\nand\r\nmore   spaces\t\ttabs",
    "unicode: naïve café über straße 日本語 emoji 🦙🚀 done",
    "contractions: don't can't I'm we'll they've she'd it's",
    "def f(x):\n    return x ** 2  # python code\n",
] * 4


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import tokenizers
    from tokenizers import Tokenizer as HFTokenizer
    from tokenizers.models import BPE
    from tokenizers import pre_tokenizers, decoders, trainers

    hf = HFTokenizer(BPE())
    hf.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(tokenizers.Regex(LLAMA3_SPLIT_PATTERN), "isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    hf.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=600, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(), show_progress=False)
    hf.train_from_iterator(CORPUS, trainer)
    hf.add_special_tokens(SPECIALS)

    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    hf.save(path)
    return hf, Tokenizer.from_file(path)


STRINGS = CORPUS[:6] + [
    "",
    " ",
    "   leading spaces",
    "trailing spaces   ",
    "a",
    "🦙",
    "mixed 123 ABC deF 🦙 !!!\n\n\nok",
    "<|begin_of_text|>special passthrough<|eot_id|>",
]


def test_encode_matches_hf(trained):
    hf, ours = trained
    for s in STRINGS:
        expected = hf.encode(s).ids
        got = ours.encode(s)
        assert got == expected, f"mismatch on {s!r}: {got} != {expected}"


def test_decode_roundtrip(trained):
    _, ours = trained
    for s in STRINGS:
        ids = ours.encode(s)
        assert ours.decode(ids) == s


def test_specials_not_special_when_disallowed(trained):
    hf, ours = trained
    s = "<|eot_id|>"
    ids = ours.encode(s, allow_special=False)
    assert ours.added_tokens[s] not in ids
    assert ours.decode(ids) == s


def test_chat_format(trained):
    _, ours = trained
    chat = ChatFormat(ours)
    ids = chat.prompt_ids([
        {"role": "system", "content": "You are a helpful assistant."},
        {"role": "user", "content": "Hello!"},
    ])
    text = ours.decode(ids)
    assert text.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
    assert "You are a helpful assistant.<|eot_id|>" in text
    assert "<|start_header_id|>user<|end_header_id|>\n\nHello!<|eot_id|>" in text
    assert text.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert ours.added_tokens["<|eot_id|>"] in chat.stop_ids()


def test_real_llama3_shaped_tokenizer_json(tmp_path):
    """Parse a tokenizer.json structured exactly like Llama-3's (Sequence
    pre-tokenizer with Split{Regex} + ByteLevel, merges as strings)."""
    vocab = {c: i for i, c in enumerate("abcdefgh")}
    vocab.update({"ab": 8, "abc": 9})
    d = {
        "model": {"type": "BPE", "vocab": vocab,
                  "merges": ["a b", "ab c"]},
        "added_tokens": [{"id": 100, "content": "<|x|>", "special": True}],
        "pre_tokenizer": {"type": "Sequence", "pretokenizers": [
            {"type": "Split", "pattern": {"Regex": LLAMA3_SPLIT_PATTERN},
             "behavior": "Isolated", "invert": False},
            {"type": "ByteLevel", "add_prefix_space": False,
             "trim_offsets": True, "use_regex": False},
        ]},
        "decoder": {"type": "ByteLevel"},
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(d))
    tok = Tokenizer.from_file(str(p))
    assert tok.encode("abcd<|x|>") == [9, 3, 100]
    assert tok.vocab_size == 101

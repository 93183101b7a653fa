"""Byte-level BPE tokenizer driven by a HuggingFace `tokenizer.json`.

The reference intends but never implements this (its Tokenize returns an
empty vector, /root/reference/src/inference/tokenizer.cc:6-8, and its config
loader merely parses tokenizer.json into a DOM,
/root/reference/src/inference/config.cc:13-17). This is a complete
implementation of the subset the Llama-3 tokenizer uses:

  model.type == "BPE" with byte-level vocab + ranked merges,
  pre_tokenizer: Sequence[Split(Regex, isolated), ByteLevel(use_regex=False)],
  added_tokens (the <|...|> specials, ids 128000+),
  ByteLevel decoder.

Tokenization is a host-side, request-latency concern (microseconds per
request vs milliseconds per forward step), so it lives in Python with a
per-word LRU cache; nothing here touches JAX.
"""

from __future__ import annotations

import functools
import json
from typing import Iterable, Optional

import regex  # supports \p{L} classes used by the Llama-3 split pattern

# Llama-3's tiktoken-style pre-tokenization pattern (from its tokenizer.json).
LLAMA3_SPLIT_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


@functools.lru_cache(maxsize=1)
def _byte_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte <-> printable-unicode mapping."""
    keep = (list(range(ord("!"), ord("~") + 1))
            + list(range(0xA1, 0xAC + 1)) + list(range(0xAE, 0xFF + 1)))
    mapping: dict[int, str] = {}
    n = 0
    for b in range(256):
        if b in keep:
            mapping[b] = chr(b)
        else:
            mapping[b] = chr(256 + n)
            n += 1
    return mapping


@functools.lru_cache(maxsize=1)
def _unicode_to_byte() -> dict[str, int]:
    return {c: b for b, c in _byte_to_unicode().items()}


class Tokenizer:
    """BPE encode/decode. Construct via `Tokenizer.from_file(tokenizer.json)`."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 added_tokens: dict[str, int],
                 split_pattern: str = LLAMA3_SPLIT_PATTERN):
        self.vocab = vocab
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.added_tokens = added_tokens
        self.id_to_token: dict[int, str] = {i: t for t, i in vocab.items()}
        self.id_to_added: dict[int, str] = {i: t for t, i in added_tokens.items()}
        self._split = regex.compile(split_pattern)
        if added_tokens:
            alternation = "|".join(
                regex.escape(t) for t in sorted(added_tokens, key=len, reverse=True))
            self._added_split = regex.compile(f"({alternation})")
        else:
            self._added_split = None
        self._b2u = _byte_to_unicode()
        self._u2b = _unicode_to_byte()
        self._bpe_cache: dict[str, tuple[int, ...]] = {}
        self._raw_cache: dict[int, bytes] = {}

    # ---- construction ----

    @staticmethod
    def byte_fallback(vocab_size: int) -> "Tokenizer":
        """A degenerate byte-level tokenizer (no merges) for serving random
        weights in smoke tests: bytes map to ids 0..255 (mod vocab), and the
        Llama-3 chat specials take the TOP ids of the vocab so ChatFormat
        works at any vocab size (incl. the `tiny` preset's 256)."""
        specials = ["<|begin_of_text|>", "<|end_of_text|>",
                    "<|start_header_id|>", "<|end_header_id|>",
                    "<|eot_id|>", "<|eom_id|>"]
        n_bytes = min(vocab_size - len(specials), 256)
        assert n_bytes > 0, "vocab too small for byte fallback"
        b2u = _byte_to_unicode()
        vocab = {b2u[b]: b for b in range(n_bytes)}
        added = {t: vocab_size - len(specials) + i
                 for i, t in enumerate(specials)}
        return Tokenizer(vocab, [], added)

    @staticmethod
    def from_file(path: str) -> "Tokenizer":
        with open(path, encoding="utf-8") as f:
            return Tokenizer.from_dict(json.load(f))

    @staticmethod
    def from_dict(d: dict) -> "Tokenizer":
        model = d["model"]
        assert model.get("type", "BPE") == "BPE", "only BPE models supported"
        vocab: dict[str, int] = model["vocab"]
        merges: list[tuple[str, str]] = []
        for m in model.get("merges", []):
            if isinstance(m, str):
                a, b = m.split(" ", 1)
            else:
                a, b = m
            merges.append((a, b))
        added = {t["content"]: t["id"] for t in d.get("added_tokens", [])}
        pattern = LLAMA3_SPLIT_PATTERN
        pre = d.get("pre_tokenizer") or {}
        parts = pre.get("pretokenizers", [pre]) if pre else []
        for p in parts:
            if p.get("type") == "Split":
                pat = p.get("pattern", {})
                if "Regex" in pat:
                    pattern = pat["Regex"]
        return Tokenizer(vocab, merges, added, pattern)

    @property
    def vocab_size(self) -> int:
        top = max(max(self.vocab.values(), default=-1),
                  max(self.added_tokens.values(), default=-1))
        return top + 1

    def token_id(self, token: str) -> int:
        if token in self.added_tokens:
            return self.added_tokens[token]
        return self.vocab[token]

    # ---- encode ----

    def _bpe(self, word: str) -> tuple[int, ...]:
        """Apply ranked merges to a byte-level-mapped word."""
        cached = self._bpe_cache.get(word)
        if cached is not None:
            return cached
        parts = list(word)
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i: best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        ids = tuple(self.vocab[p] for p in parts)
        if len(self._bpe_cache) < 65536:
            self._bpe_cache[word] = ids
        return ids

    def encode(self, text: str, *, allow_special: bool = True) -> list[int]:
        """Text -> token ids. Special (added) tokens appearing literally in
        `text` are emitted as their ids when allow_special, else BPE'd as
        plain text (prompt-injection hygiene for user content)."""
        ids: list[int] = []
        if allow_special and self._added_split is not None:
            segments = self._added_split.split(text)
        else:
            segments = [text]
        for seg in segments:
            if not seg:
                continue
            if allow_special and seg in self.added_tokens:
                ids.append(self.added_tokens[seg])
                continue
            for piece in self._split.findall(seg):
                mapped = "".join(self._b2u[b] for b in piece.encode("utf-8"))
                ids.extend(self._bpe(mapped))
        return ids

    # ---- decode ----

    def token_raw(self, i: int) -> Optional[tuple[bool, object]]:
        """One token's decode payload: (True, literal_text) for added
        specials, (False, raw_bytes) for regular tokens, None for
        out-of-vocab ids (dropped, matching decode()). The building block
        for INCREMENTAL detokenization — streaming callers decode only the
        newly emitted token's bytes through a codecs incremental UTF-8
        decoder instead of re-decoding the whole id list per token (the
        whole-list form made serving's emit path O(n^2) in max_tokens)."""
        added = self.id_to_added.get(i)
        if added is not None:
            return True, added
        tok = self.id_to_token.get(i)
        if tok is None:
            return None
        cached = self._raw_cache.get(i)
        if cached is None:
            cached = bytes(self._u2b[c] for c in tok)
            self._raw_cache[i] = cached
        return False, cached

    def decode(self, ids: Iterable[int]) -> str:
        out: list[str] = []
        buf = bytearray()
        for i in ids:
            added = self.id_to_added.get(i)
            if added is not None:
                if buf:
                    out.append(buf.decode("utf-8", errors="replace"))
                    buf = bytearray()
                out.append(added)
                continue
            tok = self.id_to_token.get(i)
            if tok is None:
                continue  # out-of-vocab id: drop
            buf.extend(self._u2b[c] for c in tok)
        if buf:
            out.append(buf.decode("utf-8", errors="replace"))
        return "".join(out)


class ChatFormat:
    """Llama-3-Instruct chat framing (the template HF ships in
    tokenizer_config.json, hardcoded rather than Jinja-interpreted)."""

    BEGIN = "<|begin_of_text|>"
    START = "<|start_header_id|>"
    END = "<|end_header_id|>"
    EOT = "<|eot_id|>"

    def __init__(self, tokenizer: Tokenizer):
        self.tok = tokenizer

    def _header(self, role: str) -> list[int]:
        return ([self.tok.token_id(self.START)]
                + self.tok.encode(role, allow_special=False)
                + [self.tok.token_id(self.END)]
                + self.tok.encode("\n\n", allow_special=False))

    def _message(self, role: str, content: str) -> list[int]:
        return (self._header(role)
                + self.tok.encode(content.strip(), allow_special=False)
                + [self.tok.token_id(self.EOT)])

    def prompt_ids(self, messages: list[dict[str, str]]) -> list[int]:
        """messages: [{role, content}, ...] -> ids ending with the open
        assistant header (generation continues from there)."""
        ids = [self.tok.token_id(self.BEGIN)]
        for m in messages:
            ids += self._message(m["role"], m["content"])
        ids += self._header("assistant")
        return ids

    def stop_ids(self) -> set[int]:
        ids = {self.tok.token_id(self.EOT)}
        for t in ("<|end_of_text|>", "<|eom_id|>"):
            if t in self.tok.added_tokens:
                ids.add(self.tok.added_tokens[t])
        return ids

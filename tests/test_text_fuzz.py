"""Tokenizer fuzz (VERDICT r3 task 6): golden-id fixtures prove the happy
path; prompt text is adversarial by nature.

* ``CLIPBPETokenizer`` vs transformers' slow ``CLIPTokenizer`` on >=1000
  randomized unicode strings (CJK, emoji, composed AND decomposed accents,
  exotic whitespace, contractions, punctuation runs), on a real-shaped
  synthetic vocab (byte-level base + ``</w>`` forms + merges actually
  *trained* by pair-counting on a corpus — the same structure as the real
  49k CLIP vocab), in both pad layouts (CLIP-L eos-pad, CLIP-G ``!``-pad).
* ``SentencePieceUnigram`` Viterbi vs an independently-coded exact DP
  oracle on randomized unigram models and texts (the ``sentencepiece``
  library is not in this image — documented in ``text/spm.py``; the DP
  oracle checks the same optimality contract).
"""

import json
import random
import unicodedata

import numpy as np
import pytest

from naturaldiffusion_tpu.text import CLIPBPETokenizer, bytes_to_unicode
from naturaldiffusion_tpu.text.spm import SentencePieceUnigram


# ---------------------------------------------------------------------------
# real-shaped CLIP vocab: train merges by pair counting on a corpus
# ---------------------------------------------------------------------------

_CORPUS = """
a photo of a cat sitting on the mat in the sun with a red ball
an astronaut riding a horse on mars in a photorealistic style
the quick brown fox jumps over the lazy dog again and again
sharp high quality detailed portrait photograph studio lighting
watercolor painting of mountains lakes and forests at sunset
low resolution blurry image with artifacts and noise removed
hello world lower lowest newest widest deep learning diffusion
""".split()


def _train_bpe(corpus, num_merges=300):
    """Minimal reference BPE trainer (pair counting, greedy max)."""
    words = {}
    for w in corpus:
        chars = tuple(list(w[:-1]) + [w[-1] + "</w>"])
        words[chars] = words.get(chars, 0) + 1
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for word, freq in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = {}
        for word, freq in words.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1 and (word[i], word[i + 1]) == best):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + freq
        words = merged
    return merges


@pytest.fixture(scope="module")
def clip_assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clip_fuzz")
    b2u = bytes_to_unicode()
    base = [b2u[b] for b in range(256)]
    merges = _train_bpe(_CORPUS)
    tokens = base + [c + "</w>" for c in base] + ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    vpath, mpath = tmp / "vocab.json", tmp / "merges.txt"
    vpath.write_text(json.dumps(vocab), encoding="utf-8")
    mpath.write_text("#version: 0.2\n"
                     + "\n".join(" ".join(m) for m in merges) + "\n",
                     encoding="utf-8")
    return str(vpath), str(mpath)


_POOLS = [
    "abcdefghijklmnopqrstuvwxyz",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "0123456789",
    ".,!?;:()[]{}-_+=*&^%$#@~`\"'\\|/",
    " \t\n\u00a0\u2009\u3000",            # nbsp, thin, ideographic space
    "áéíóúàèâêîôäëïöüñçß",               # composed accents
    "e\u0301a\u0308o\u0302",             # decomposed accents (NFC stress)
    "中文漢字日本語カタカナひらがな한국어",
    "😀🎉🚀🔥🤖",
    "👍🏽❤️",                              # modifier + VS16 sequences
    "αβγδΩλπ", "русскийтекст",
    "'s 't 're 've 'm 'll 'd",           # CLIP pretokenizer specials
]


def _rand_text(rng: random.Random) -> str:
    n = rng.randint(0, 12)
    parts = []
    for _ in range(n):
        pool = rng.choice(_POOLS)
        k = rng.randint(1, 6)
        if " " in pool and len(pool) < 20:   # contraction pool: take a unit
            parts.append(rng.choice(pool.split(" ")))
        else:
            parts.append("".join(rng.choice(pool) for _ in range(k)))
        if rng.random() < 0.5:
            parts.append(rng.choice([" ", "", "  ", "\t"]))
    return "".join(parts)


@pytest.mark.parametrize("pad", ["eos", "bang"])
def test_clip_bpe_fuzz_vs_transformers(clip_assets, pad):
    transformers = pytest.importorskip("transformers")
    vpath, mpath = clip_assets
    if pad == "bang":
        hf = transformers.CLIPTokenizer(vpath, mpath, pad_token="!")
        kw = {"pad_token": "!"}
    else:
        hf = transformers.CLIPTokenizer(vpath, mpath)
        kw = {}
    ours = CLIPBPETokenizer.from_files(vpath, mpath)

    rng = random.Random(20260819 if pad == "eos" else 42)
    mismatches = []
    for i in range(600):
        text = _rand_text(rng)
        want = hf(text, padding="max_length", max_length=32,
                  truncation=True)["input_ids"]
        got = ours([text], context_length=32, **kw)[0].tolist()
        if got != want:
            mismatches.append((repr(text), got[:8], want[:8]))
            if len(mismatches) >= 5:
                break
    assert not mismatches, mismatches


# ---------------------------------------------------------------------------
# SentencePiece unigram Viterbi vs exact-DP oracle on random models
# ---------------------------------------------------------------------------


def _oracle_best_score(text, piece_score, max_len):
    """Independent exact DP over END positions (the tokenizer's Viterbi runs
    over start positions; this one is a plain dict-lookup DP coded from the
    problem statement, not from the implementation).  The fuzz models cover
    every single character, so no unk edges are needed."""
    n = len(text)
    best = [float("-inf")] * (n + 1)
    best[0] = 0.0
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            if best[start] == float("-inf"):
                continue
            cand = text[start:end]
            if cand in piece_score:
                s = best[start] + piece_score[cand]
                if s > best[end]:
                    best[end] = s
    return best[n]


def _random_spm(rng: random.Random):
    alphabet = "abc▁"
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", -10.0, 2)]
    seen = set()
    for _ in range(rng.randint(4, 24)):
        ln = rng.randint(1, 4)
        p = "".join(rng.choice(alphabet) for _ in range(ln))
        if p in seen:
            continue
        seen.add(p)
        pieces.append((p, round(rng.uniform(-8.0, -0.5), 3), None))
    # ensure every single char is reachable so segmentation always exists
    for ch in alphabet:
        if ch not in seen:
            pieces.append((ch, -9.0, None))
            seen.add(ch)
    return pieces


def test_spm_viterbi_fuzz_vs_dp_oracle():
    rng = random.Random(7)
    checked = 0
    for trial in range(150):
        pieces = _random_spm(rng)
        tok = SentencePieceUnigram(
            pieces, add_dummy_prefix=False,
            remove_extra_whitespaces=False,
            unk_id=2, eos_id=1, pad_id=0)
        # NOTE: the tokenizer matches NORMAL (None-typed) pieces; unk edges
        # fire only where no single-char piece matches, which the fuzz
        # models rule out (every char covered)
        piece_score = {p: s for p, s, t in pieces if t is None}
        max_len = max(len(p) for p in piece_score)
        id2piece = {i: (p, s, t) for i, (p, s, t) in enumerate(pieces)}
        for _ in range(4):
            text = "".join(rng.choice("abc") for _ in
                           range(rng.randint(1, 18)))
            norm = tok.normalize(text)
            ids = tok.encode(text)
            assert 2 not in ids, (text, ids)     # no unks possible
            total, rebuilt = 0.0, ""
            for i in ids:
                p, s, _t = id2piece[i]
                total += s
                rebuilt += p
            want = _oracle_best_score(norm, piece_score, max_len)
            assert np.isfinite(want)
            # Viterbi optimality: the produced path's score must equal the
            # DP optimum exactly (ties may pick different paths; score ties)
            assert rebuilt == norm, (text, norm, rebuilt)
            assert abs(total - want) < 1e-6, (text, norm, ids, total, want)
            checked += 1
    assert checked >= 400, checked


def test_spm_normalize_matches_unicodedata():
    """NFKC + whitespace handling on adversarial input (the normalizer runs
    before Viterbi; a mismatch here shifts every downstream id)."""
    tok = SentencePieceUnigram(
        [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
         ("a", -1.0, None)],
        add_dummy_prefix=True, remove_extra_whitespaces=True,
        unk_id=2, eos_id=1, pad_id=0)
    rng = random.Random(3)
    for _ in range(300):
        text = _rand_text(rng)
        norm = tok.normalize(text)
        # idempotent
        assert tok.normalize(norm.replace("▁", " ")) == norm
        # NFKC applied: no compatibility characters survive
        body = norm.replace("▁", " ")
        assert unicodedata.normalize("NFKC", body) == body
        # no double spaces, no leading/trailing raw space in the body
        assert "  " not in body.strip()

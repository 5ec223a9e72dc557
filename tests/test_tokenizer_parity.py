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

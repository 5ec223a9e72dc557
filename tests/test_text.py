"""Text frontend tests: normalizer rules, token parser, tokenizer, prompt."""

import numpy as np

from miotts_tpu.text import (
    build_prompt, build_token_code_table, format_speech_tokens,
    normalize_tts_text, parse_speech_tokens, should_normalize_ja,
)
from miotts_tpu.text.tokenizer import (
    TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL, TOKEN_TYPE_USER_DEFINED, Tokenizer,
)


# -- normalizer (contract: /root/reference/src/text-normalize.cpp) -----------

def test_normalize_english_passthrough():
    # <10% Japanese chars -> untouched, including spaces
    s = "Hello,  world! (unchanged)"
    assert normalize_tts_text(s) == s


def test_normalize_ja_gate():
    assert should_normalize_ja("こんにちは")
    assert not should_normalize_ja("hello")
    assert not should_normalize_ja("")
    # exactly 1 ja char out of 10 total non-ws = 10% -> gate opens
    assert should_normalize_ja("あ" + "a" * 9)
    assert not should_normalize_ja("あ" + "a" * 10)


def test_normalize_punctuation_and_symbols():
    assert normalize_tts_text("こんにちは！元気？") == "こんにちは!元気?"
    assert normalize_tts_text("いくよ〜がんばれ～") == "いくよーがんばれー"
    assert normalize_tts_text("すき♥まる●さんかく◯しかく〇") == "すき♡まる○さんかく○しかく○"


def test_normalize_whitespace_removal():
    assert normalize_tts_text("こん にちは\tそして[n]終わり　です") == "こんにちはそして終わりです"


def test_normalize_ellipsis_collapse():
    assert normalize_tts_text("ねえ…………すごい") == "ねえ……すごい"
    assert normalize_tts_text("ねえ……………………すごい") == "ねえ……すごい"


def test_normalize_wrapper_strip():
    assert normalize_tts_text("「こんにちは」") == "こんにちは"
    assert normalize_tts_text("『こんにちは』") == "こんにちは"
    assert normalize_tts_text("【こんにちは】") == "こんにちは"
    # only strips when BOTH ends match
    assert normalize_tts_text("「こんにちは") == "「こんにちは"


def test_normalize_trailing_punct():
    assert normalize_tts_text("こんにちは。") == "こんにちは"
    assert normalize_tts_text("こんにちは。、。") == "こんにちは"


# -- speech token parser (contract: /root/reference/src/token-parser.cpp) ----

def test_parse_speech_tokens_basic():
    assert parse_speech_tokens("<|s_0|><|s_42|><|s_12799|>") == [0, 42, 12799]


def test_parse_speech_tokens_tolerant():
    # junk between/around tokens, malformed fragments skipped
    text = "xx<|s_1|>yy<|s_<|s_2|>zz<|s_3xx<|s_4|>"
    assert parse_speech_tokens(text) == [1, 2, 4]
    assert parse_speech_tokens("no tokens here") == []


def test_format_roundtrip():
    codes = [5, 100, 12799]
    assert parse_speech_tokens(format_speech_tokens(codes)) == codes


def test_token_code_table():
    vocab = ["a", "<|s_0|>", "<|im_end|>", "<|s_7|>", "<|s_x|>"]
    table = build_token_code_table(vocab)
    np.testing.assert_array_equal(table, [-1, 0, -1, 7, -1])


# -- prompt template (contract: /root/reference/src/test-to-speech.cpp:90-92)

def test_build_prompt():
    assert build_prompt("やあ") == (
        "<|startoftext|><|im_start|>user\nやあ<|im_end|>\n<|im_start|>assistant\n"
    )


# -- BPE tokenizer -----------------------------------------------------------

def _toy_tokenizer():
    """Byte-level BPE vocab: bytes for ascii letters + a few merges."""
    from miotts_tpu.text.tokenizer import _byte_to_unicode
    b2u = _byte_to_unicode()
    byte_tokens = [b2u[b] for b in range(256)]
    specials = ["<|im_start|>", "<|im_end|>", "<|startoftext|>", "<|s_0|>", "<|s_1|>"]
    merged = [b2u[ord("h")] + b2u[ord("e")], b2u[ord("l")] + b2u[ord("l")]]
    tokens = byte_tokens + merged + specials
    types = ([TOKEN_TYPE_NORMAL] * (256 + len(merged))
             + [TOKEN_TYPE_CONTROL] * 3 + [TOKEN_TYPE_USER_DEFINED] * 2)
    merges = [f"{b2u[ord('h')]} {b2u[ord('e')]}", f"{b2u[ord('l')]} {b2u[ord('l')]}"]
    return Tokenizer(tokens=tokens, token_types=types, merges=merges,
                     eos_id=tokens.index("<|im_end|>"))


def test_bpe_merges_and_decode():
    tok = _toy_tokenizer()
    ids = tok.encode("hello", add_special=False)
    # "he" and "ll" merge; "o" stays a byte token
    pieces = [tok.tokens[i] for i in ids]
    assert len(ids) == 3
    assert tok.decode(ids) == "hello"


def test_special_token_matching():
    tok = _toy_tokenizer()
    text = "<|im_start|>he<|im_end|>"
    ids = tok.encode(text, add_special=False)
    assert ids[0] == tok.token_to_id["<|im_start|>"]
    assert ids[-1] == tok.token_to_id["<|im_end|>"]
    assert tok.decode(ids) == text


def test_speech_tokens_are_single_ids():
    tok = _toy_tokenizer()
    ids = tok.encode("<|s_0|><|s_1|>", add_special=False)
    assert len(ids) == 2
    table = tok.speech_code_table()
    assert table[ids[0]] == 0 and table[ids[1]] == 1


def test_utf8_multibyte_roundtrip():
    tok = _toy_tokenizer()
    text = "こんにちは"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


# -- SPM (sentencepiece) tokenizer -------------------------------------------

def _spm_tokenizer():
    from miotts_tpu.text.tokenizer import TOKEN_TYPE_BYTE
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, 3, 3]  # unk, control, control
    scores = [0.0, 0.0, 0.0]
    # byte fallback tokens
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TOKEN_TYPE_BYTE)
        scores.append(-1e6)
    # pieces with merge scores (higher = merged earlier)
    pieces = [("▁", -1.0), ("h", -2.0), ("e", -2.0), ("l", -2.0), ("o", -2.0),
              ("he", -0.5), ("ll", -0.6), ("hell", -0.3), ("hello", -0.1),
              ("▁hello", -0.05)]
    for piece, sc in pieces:
        tokens.append(piece)
        types.append(TOKEN_TYPE_NORMAL)
        scores.append(sc)
    return Tokenizer(tokens=tokens, token_types=types, scores=scores,
                     model="llama", unk_id=0, bos_id=1, eos_id=2,
                     add_space_prefix=True)


def test_spm_merges_to_longest_piece():
    tok = _spm_tokenizer()
    ids = tok.encode("hello", add_special=False)
    assert [tok.tokens[i] for i in ids] == ["▁hello"]
    assert tok.decode(ids) == " hello"


def test_spm_byte_fallback():
    tok = _spm_tokenizer()
    ids = tok.encode("hz", add_special=False)   # 'z' not in vocab -> bytes
    pieces = [tok.tokens[i] for i in ids]
    assert "<0x7A>" in pieces  # 'z'
    assert tok.decode(ids) == " hz"


def test_spm_whitespace_handling():
    tok = _spm_tokenizer()
    ids = tok.encode("hello hello", add_special=False)
    # both words become ▁hello
    assert [tok.tokens[i] for i in ids] == ["▁hello", "▁hello"]
    assert tok.decode(ids) == " hello hello"


def test_spm_dummy_prefix_unconditional():
    """sentencepiece add_dummy_prefix prepends the escape space even when
    the text already starts with one: ' hello' -> '▁▁hello' (NOT collapsed
    to '▁hello' — that would change round-tripped audio prompts)."""
    tok = _spm_tokenizer()
    ids = tok.encode(" hello", add_special=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces == ["▁", "▁hello"]
    assert tok.decode(ids) == "  hello"


def test_spm_score_greedy_beats_merge_rules():
    """llama.cpp SPM merges the highest-SCORE adjacent pair anywhere in the
    word (sentencepiece semantics) — not a BPE merge-rule table.  With
    score('he') > score('ll'), 'hell' must assemble via he+l+l -> he,ll ->
    hell regardless of any rule ordering."""
    tok = _spm_tokenizer()
    ids = tok.encode("hell", add_special=False)
    # '▁' + 'hell' have no combined piece '▁hell', so they stay split
    assert [tok.tokens[i] for i in ids] == ["▁", "hell"]


def test_spm_multicodepoint_byte_fallback():
    """A symbol outside the vocab falls back to one <0xNN> token PER UTF-8
    BYTE — a 4-byte emoji yields four byte tokens, and decode restores it."""
    tok = _spm_tokenizer()
    ids = tok.encode("🎉", add_special=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces[0] == "▁"
    assert pieces[1:] == ["<0xF0>", "<0x9F>", "<0x8E>", "<0x89>"]
    assert tok.decode(ids) == " 🎉"


def test_spm_space_prefix_after_special():
    """llama.cpp SPM sets is_prev_special=true after every special-token
    fragment, so raw text FOLLOWING a mid-text special also gets the dummy
    space prefix — not just the first fragment."""
    tok = _spm_tokenizer()
    ids = tok.encode("hello</s>hello", add_special=False)
    pieces = [tok.tokens[i] for i in ids]
    assert pieces == ["▁hello", "</s>", "▁hello"]

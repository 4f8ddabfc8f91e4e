"""Frontend tests: cleaners, number verbalization, phonemizer, tokenizer.

Expected strings follow the reference pipeline's semantics
(reference tts/process_text/*; keithito-style cleaners + inflect), locked in
here as golden values.
"""

import numpy as np
import pytest

from prompt_tts_tpu.frontend import (
    sequence_to_text,
    text_to_sequence,
)
from prompt_tts_tpu.frontend.cleaners import english_cleaners
from prompt_tts_tpu.frontend.cmudict import default_cmudict
from prompt_tts_tpu.frontend.numbers import normalize_numbers, number_to_words
from prompt_tts_tpu.frontend.symbols import SYMBOLS, SYMBOL_TO_ID
from prompt_tts_tpu.frontend.tokenizer import (
    DEFAULT_MAX_LEN,
    MIN_VOCAB,
    SEP_ID,
    Tokenizer,
    intersperse,
)


class TestSymbols:
    def test_symbol_count_matches_reference(self):
        # reference tts/process_text/symbols.py:18 -> 148 symbols
        assert len(SYMBOLS) == 148
        assert SEP_ID == 148
        assert MIN_VOCAB == 149

    def test_layout(self):
        # [pad] + [-] + punctuation + letters + 84 @arpabet
        assert SYMBOLS[0] == "_"
        assert SYMBOLS[1] == "-"
        assert SYMBOLS[2:12] == list("!'(),.:;? ")
        assert SYMBOLS[12:64] == list(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        )
        assert all(s.startswith("@") for s in SYMBOLS[64:])
        assert len(SYMBOLS[64:]) == 84


class TestNumbers:
    @pytest.mark.parametrize(
        "num,expected",
        [
            (0, "zero"),
            (7, "seven"),
            (17, "seventeen"),
            (20, "twenty"),
            (23, "twenty-three"),
            (100, "one hundred"),
            (101, "one hundred one"),
            (123, "one hundred twenty-three"),
            (1000, "one thousand"),
            (3456, "three thousand, four hundred fifty-six"),
            (1000000, "one million"),
            (1234567, "one million, two hundred thirty-four thousand, "
                      "five hundred sixty-seven"),
        ],
    )
    def test_cardinal_no_and(self, num, expected):
        assert number_to_words(num, andword="") == expected

    def test_cardinal_with_and(self):
        assert number_to_words(123) == "one hundred and twenty-three"

    @pytest.mark.parametrize(
        "text,expected",
        [
            ("1873", "eighteen seventy-three"),
            ("1906", "nineteen oh six"),
            ("2000", "two thousand"),
            ("2008", "two thousand eight"),
            ("1800", "eighteen hundred"),
            ("2010", "twenty ten"),
            ("1,234", "twelve thirty-four"),
            ("100", "one hundred"),
            ("$1", "one dollar"),
            ("$3.50", "three dollars, fifty cents"),
            ("$0.99", "ninety-nine cents"),
            ("$2", "two dollars"),
            ("3.14", "three point fourteen"),
            ("23rd", "twenty-third"),
            ("1st", "first"),
            ("2nd", "second"),
            ("5th", "fifth"),
            ("9th", "ninth"),
            ("12th", "twelfth"),
            ("20th", "twentieth"),
            ("101st", "one hundred and first"),
        ],
    )
    def test_normalize(self, text, expected):
        assert normalize_numbers(text) == expected


class TestCleaners:
    def test_english_cleaners(self):
        assert (
            english_cleaners("Dr. Smith bought 2 apples for $3.50.")
            == "doctor smith bought two apples for three dollars, "
               "fifty cents."
        )

    def test_ascii_fold_and_case(self):
        assert english_cleaners("Café  Münster—résumé") == "cafe munster--resume"

    def test_abbreviations_after_numbers(self):
        assert english_cleaners("Mrs. Jones met Lt. Dan") == (
            "misess jones met lieutenant dan"
        )


class TestTextToSequence:
    def test_char_mode_no_dict(self):
        seq = text_to_sequence("abc", ["basic_cleaners"])
        assert seq == [SYMBOL_TO_ID["a"], SYMBOL_TO_ID["b"], SYMBOL_TO_ID["c"]]

    def test_pad_symbol_never_emitted(self):
        seq = text_to_sequence("a_b", ["basic_cleaners"])
        assert SYMBOL_TO_ID["_"] not in seq

    def test_dict_mode_first_pronunciation(self):
        d = default_cmudict()
        seq = text_to_sequence("hello", ["english_cleaners"], d)
        # HELLO's first CMU pronunciation: HH AH0 L OW1
        expected = [SYMBOL_TO_ID["@" + p] for p in ["HH", "AH0", "L", "OW1"]]
        assert seq == expected

    def test_oov_falls_back_to_characters(self):
        d = default_cmudict()
        seq = text_to_sequence("zqzqzq", ["english_cleaners"], d)
        assert seq == [SYMBOL_TO_ID[c] for c in "zqzqzq"]

    def test_punctuation_attached_word_falls_back(self):
        # parity quirk: "world!" is not in the dict, so char fallback
        d = default_cmudict()
        seq = text_to_sequence("world!", ["english_cleaners"], d)
        assert seq == [SYMBOL_TO_ID[c] for c in "world!"]

    def test_inline_arpabet_braces(self):
        d = default_cmudict()
        seq = text_to_sequence("{HH AW1 S}", ["english_cleaners"], d)
        assert seq == [SYMBOL_TO_ID["@" + p] for p in ["HH", "AW1", "S"]]

    def test_no_trailing_space(self):
        d = default_cmudict()
        seq = text_to_sequence("hello world", ["english_cleaners"], d)
        assert seq[-1] != SYMBOL_TO_ID[" "]

    def test_roundtrip_text(self):
        seq = text_to_sequence("printing", ["basic_cleaners"])
        assert sequence_to_text(seq) == "printing"


class TestTokenizer:
    def test_intersperse(self):
        assert intersperse([5, 7], 148) == [148, 5, 148, 7, 148]
        assert intersperse([], 148) == [148]

    def test_static_shapes(self):
        tok = Tokenizer(max_len=64)
        ids, mask = tok.encode_batch(["hello world", "a"])
        assert ids.shape == (2, 64) and mask.shape == (2, 64)
        assert ids.dtype == np.int32 and mask.dtype == np.int32

    def test_mask_and_padding(self):
        tok = Tokenizer(max_len=32)
        ids, mask = tok.encode("hi")
        n = mask.sum()
        assert (ids[n:] == 0).all()
        assert (mask[:n] == 1).all() and (mask[n:] == 0).all()
        # interspersed: separator at even positions
        assert ids[0] == SEP_ID and ids[n - 1] == SEP_ID

    def test_truncation(self):
        tok = Tokenizer(max_len=8)
        ids, mask = tok.encode("the quick brown fox jumps over the lazy dog")
        assert ids.shape == (8,)
        assert mask.sum() == 8

    def test_default_max_len_matches_reference(self):
        # reference train.py:164-165
        assert DEFAULT_MAX_LEN == 550
        assert Tokenizer().max_len == 550

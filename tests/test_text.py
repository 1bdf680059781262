"""Text frontend tests: cleaners, number expansion, symbol table, parser."""

import io

from speech_masters_thesis_tpu.text.cleaners import english_cleaners
from speech_masters_thesis_tpu.text.cmudict import ARPABET_SYMBOLS, CMUDict
from speech_masters_thesis_tpu.text.numbers import number_to_words, ordinal_words
from speech_masters_thesis_tpu.text.parser import CMUDictParser, intersperse_blanks

FAKE_CMUDICT = """\
HELLO  HH AH0 L OW1
WORLD  W ER1 L D
WORLD(1)  W ER1 L D D
PRINTING  P R IH1 N T IH0 NG
;;; comment line
BADPHONE  QQ ZZ
"""


def make_parser():
    parser = CMUDictParser()
    parser.cmu_dict = CMUDict(io.StringIO(FAKE_CMUDICT))
    parser.symbols = parser.symbols + ["@" + s for s in parser.cmu_dict.valid_symbols]
    parser._symbol_to_id = {s: i for i, s in enumerate(parser.symbols)}
    parser._id_to_symbol = {i: s for i, s in enumerate(parser.symbols)}
    return parser


def test_number_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty-two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(1234, andword="") == "one thousand, two hundred thirty-four"
    assert number_to_words(1000000, andword="") == "one million"
    assert number_to_words(1999, andword="", zero="oh", group=2) == "nineteen, ninety-nine"
    assert number_to_words(2015, andword="", zero="oh", group=2) == "twenty, fifteen"


def test_ordinals():
    assert ordinal_words(1) == "first"
    assert ordinal_words(2) == "second"
    assert ordinal_words(3) == "third"
    assert ordinal_words(4) == "fourth"
    assert ordinal_words(12) == "twelfth"
    assert ordinal_words(20) == "twentieth"
    assert ordinal_words(21) == "twenty-first"
    assert ordinal_words(105) == "one hundred fifth"


def test_english_cleaners_numbers_and_abbrev():
    assert english_cleaners("Dr. Smith bought 2 apples.") == "doctor smith bought two apples."
    assert english_cleaners("in 1876,") == "in eighteen seventy-six ,"
    # leading space is reference behavior: re.split("(\\d+)") on a string
    # starting with a digit yields an empty first element before the join
    assert english_cleaners("$1.50") == " one dollar, fifty cents"
    assert english_cleaners("It cost $5") == "it cost five dollars"
    assert english_cleaners("the 3rd time") == "the third time"
    assert english_cleaners("Mt.  Vesuvius  erupted") == "mt. vesuvius erupted"


def test_ascii_fold():
    assert english_cleaners("café naïve") == "cafe naive"


def test_symbol_table_layout():
    """148-symbol contract: pad, '-', punctuation, letters, 84 @ARPAbet."""
    parser = make_parser()
    assert len(ARPABET_SYMBOLS) == 84
    assert parser.symbols[0] == "_"
    assert parser.symbols[1] == "-"
    assert parser.symbols[2:12] == list("!'(),.:;? ")
    assert parser.symbols[12:64] == list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz")
    assert len(parser.symbols) == 64 + 84  # == 148
    assert parser.symbols[64] == "@AA"


def test_parser_arpabet_substitution():
    parser = make_parser()
    seq = parser("Hello world.")
    text = parser.sequence_to_text(seq)
    assert text == "{HH AH0 L OW1} {W ER1 L D} ."
    # unknown words fall back to characters
    seq2 = parser("zzz hello")
    assert parser.sequence_to_text(seq2) == "zzz {HH AH0 L OW1}"


def test_parser_curly_spans():
    parser = make_parser()
    seq = parser.text_to_sequence("Turn {HH AW1 S} street", ["english_cleaners"], parser.cmu_dict)
    assert parser.sequence_to_text(seq) == "turn {HH AW1 S}street"


def test_cmudict_parsing():
    d = CMUDict(io.StringIO(FAKE_CMUDICT))
    assert d.lookup("hello") == ["HH AH0 L OW1"]
    assert d.lookup("WORLD") == ["W ER1 L D", "W ER1 L D D"]
    assert d.lookup("badphone") is None
    assert len(d) == 3


def test_intersperse_blanks():
    assert intersperse_blanks([5, 9], 148) == [148, 5, 148, 9, 148]

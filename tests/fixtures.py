"""Boundary-case line pool for the keep/drop kernel (FIXTURES.md par.2).

Each case pins the behavior of one rule at its threshold; expected
verdicts in tests come from tests/oracle.py (the frozen reference
transcription) plus a handful of hand-derived hard expectations in
test_kernel_parity.py that guard against oracle+kernel agreeing on the
wrong semantics.
"""

from __future__ import annotations

# (case_id, raw_line)
LINE_CASES = [
    # raw length gate: 15 vs 16 chars (cc_corpus.py:256)
    ("len_raw_15", "a" * 15),
    ("len_raw_16_but_short_clean", "a" * 16),
    ("len_raw_16_long", "this sentence easily exceeds the fifty character threshold limit."),
    # post-clean length gate (cc_corpus.py:269): long raw, short after strip
    ("postlen_url_only", "http://averyveryverylongurl.example.com/path/stuff"),
    ("postlen_tag_heavy", "<div><span><b></b>hello there</span></div> again!"),
    # each illegal char (utilities.py:9); padded to survive other gates.
    # NOTE © and ® are stripped by the emoji step first (reference behavior
    # with the real emoji package) so those two lines are NOT dropped as
    # 'illegal'.
    *[
        (f"illegal_{i}", f"a perfectly reasonable english sentence here {c} of fifty characters")
        for i, c in enumerate(("|", "©", "«", "®", "»", "˂", "˃", "˄", "˅",
                               "/", "\\", "{", "}"))
    ],
    # alphabetic-mass gate: strip numeric+punct leaves <=12 (cc_corpus.py:272)
    ("alphamass_numbers", "123456 7890 123456 7890 12 999 123456 7890 123456 ab"),
    ("alphamass_punct", ",,,,, ..... ;;;;; ::::: !!!!! ????? ((()))) ab cd"),
    # CJK gates (cc_corpus.py:276-284): threshold 15 (CJK) vs 50 (latin).
    # NOTE: the 15-char CJK minimum is unreachable in practice - the raw
    # (>15) and post-clean (>15) gates already require >=16 chars - so a
    # pure-CJK line that reaches the CJK gate always passes it; the rule
    # only ever drops NON-short-alphabet lines of length 16..49.
    ("cjk_16", "中" * 16),
    ("hangul_16", "한" * 16),
    ("hiragana_16", "あ" * 16),
    ("katakana_16", "ア" * 16),
    ("latin_49", "x" * 49),
    ("latin_50", "y" * 50),
    ("mixed_cjk_latin_20", "中文 latin mix here ab"),         # mixed -> 50 gate
    ("no_alpha_line", "!!!! ???? ,,,, ;;;; :::: ???? !!!! ,,,, ;;"),  # vacuous CJK -> 15 gate
    # punctuation budget thresholds at k-1 / k (cc_corpus.py:287-291)
    ("dash_3", "a long sentence with dashes - one - two - three and fifty chars"),
    ("dash_4", "a long sentence with-dashes - one - two - three - four chars!"),
    ("eq_1", "a sentence that has = one equals sign and still fifty chars"),
    ("eq_2", "a sentence that = has = two equals signs and still fifty chars"),
    ("dot_14", "a sentence. with. many. dots. here. more. dots. now. go. on. a. b. c. d ok"),
    ("dot_15", "a sentence. with. many. dots. here. more. dots. now. go. on. a. b. c. d. e. ok"),
    ("star_4", "a long sentence **** with four stars that still has fifty chars"),
    ("star_5", "a long sentence ***** with five stars that still has fifty chars"),
    ("bracket_2", "a long sentence [ with ] two brackets and fifty characters ok"),
    ("bracket_3", "a long sentence [ with [ three [ open brackets and fifty chars"),
    # stripping behavior (utilities.py:265-270)
    ("strip_url", "read this http://t.co/abc123 and keep the rest of the line going on"),
    ("strip_mention", "@someone said the meeting starts at noon sharp in the hall today"),
    ("strip_hashtag", "#breaking the news cycle continues without any interruption today"),
    ("strip_tag", "some <b>bold</b> claims need <i>italic</i> emphasis to stand out ok"),
    ("empty_tag", "some <> angle pair should vanish via first pass not gensim here ok"),
    # emoji (utilities.py:222-223)
    ("emoji_mid", "what a great day \U0001F600\U0001F600 to write some spark pipelines today"),
    ("emoji_only_padding", "\U0001F600" * 20 + "abcd efgh ijkl"),
    # gensim split_alphanum + whitespace collapse (cc_corpus.py:264-266)
    ("alnum_split", "model abc123def45 should split into parts and keep going fine"),
    ("alnum_upper", "MODEL ABC123DEF45 stays unsplit uppercase but line is long ok"),
    ("multi_ws", "too   many\tspaces and unicode ones collapse to single here"),
    ("leading_ws", "   leading and trailing whitespace become single spaces here ok   "),
    # crlf / unicode linebreak handling happens at page level (see pages)
    ("plain_keep", "the quick brown fox jumps over the lazy dog fifty chars yes"),
]

# multi-line page fixtures: (url, text) - exercise splitlines + line_id
PAGE_CASES = [
    ("https://www.example.de/a",
     "first good line that is long enough to pass every filter easily ok\n"
     "short\r\n"
     "second good line that is long enough to pass every filter too yes "
     "third good line also long enough to pass every filter indeed okay"),
    ("https://www.dup.fr/b",
     "duplicated line that is long enough to pass every filter easily ok\n"
     "duplicated line that is long enough to pass every filter easily ok"),
]

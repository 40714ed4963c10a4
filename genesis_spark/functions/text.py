"""Text scalar kernels shared by the parse operator, the oracle, and fixtures.

Pure stdlib (the reference leans on gensim/nltk/phonenumbers/thefuzz; none of
those are available here, so each gets a deterministic stand-in with the same
shape — divergences are documented per function). Reference semantics:
/root/reference/app/crawler/crawler_services/shared/helper_method.py
(strip_special_character :29-31, clean_text :219-222, extract_emails :64-68,
extract_phone_numbers :71-85), spell_check_handler.py:63-83, and
api/nlp_manager/nlp_controller.py:13-34.
"""

from __future__ import annotations

import re

# --- stopwords (stand-in for gensim.parsing.preprocessing.STOPWORDS;
#     helper_method.is_stop_word :22-26). Fixed set, frozen for determinism. ---
STOPWORDS = frozenset("""
a about above after again against all am an and any are as at be because been
before being below between both but by can did do does doing down during each
few for from further had has have having he her here hers herself him himself
his how i if in into is it its itself just me more most my myself no nor not
now of off on once only or other our ours ourselves out over own same she so
some such than that the their theirs them themselves then there these they
this those through to too under until up very was we were what when where
which while who whom why will with you your yours yourself yourselves
""".split())

# --- dictionary (stand-in for the reference's spell-check wordlist,
#     spell_check_handler.py:39-44). The fixture generator draws its prose
#     vocabulary from this list, so the >=60%-known-tokens sentence gate
#     (clean_paragraph :63-83) exercises both branches deterministically. ---
DICTIONARY = frozenset("""
market service hidden search engine index forum board user account login
register password secure private network relay node circuit router gateway
data base record file archive image video document page site link mirror
vendor product listing price order payment wallet coin token escrow review
message thread post reply topic member admin moderator rule guide wiki news
update release version status online offline server host domain address
research report analysis system security privacy encrypted anonymous access
browser protocol connection traffic bandwidth cache proxy tunnel bridge
content text media upload download share public leak dump breach credential
email contact support help question answer information detail description
welcome home main menu section category tag label title header footer
quality score count total number list item entry key value source target
""".split())


def load_dictionary(path: str | None = None) -> frozenset[str]:
    """File-backed spell dictionary, the reference's loading shape verbatim
    (spell_check_handler.py:39-44: ``set(open(path).read().split())``).
    ``path=None`` falls back to the frozen fixture-vocabulary stand-in
    above; a repo-shipped default lives at genesis_spark/data/dictionary.txt
    (the shape of the reference's app/raw/dictionary). A missing explicit
    path raises — silent fallback would quietly change parse goldens."""
    if path is None:
        return DICTIONARY
    with open(path) as f:
        return frozenset(f.read().split())


def default_dictionary_path() -> str:
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "dictionary.txt")


def gensim_stopwords_path() -> str:
    """Path of the bundled ``gensim.parsing.preprocessing.STOPWORDS`` dump
    (337 words, the frozen public set the reference imports at
    helper_method.py:8 and probes in is_stop_word :22-26). Pass this to
    ``load_stopwords`` for exact reference parity on stopword-gated
    paragraphs; the frozen fixture stand-in above stays the default so
    existing parse goldens are unchanged."""
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "stopwords.txt")


def strip_special_character(text: str) -> str:
    """helper_method.py:29-31 — drop leading non-word run."""
    return re.sub(r"^\W+", "", text)


def clean_ws(text: str) -> str:
    """helper_method.clean_text (:219-222) — collapse whitespace, strip."""
    return re.sub(r"\s+", " ", text).strip()


EMAIL_RE = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}")
PHONE_RE = re.compile(
    r"\+?\d{1,3}[-.\s]?\(?\d{1,4}?\)?[-.\s]?\d{1,4}[-.\s]?\d{1,4}[-.\s]?\d{1,9}")


def extract_emails(text: str) -> list[str]:
    """nlp_controller.py:17 — set() of regex matches. Returned sorted for
    determinism (the reference's set order is arbitrary per process)."""
    return sorted(set(EMAIL_RE.findall(text)))


# Public ITU-T E.164 assigned country calling codes (Annex to ITU
# Operational Bulletin; stable public knowledge). Longest-prefix match:
# '1' and '7' are 1-digit codes; 2-digit codes 2x-9x; 3-digit codes fill
# the gaps. Used for prefix validation only — national numbering-plan
# length rules per country are out of scope for a library-free validator.
_CC1 = {"1", "7"}
_CC2 = {"20", "27", "30", "31", "32", "33", "34", "36", "39", "40", "41",
        "43", "44", "45", "46", "47", "48", "49", "51", "52", "53", "54",
        "55", "56", "57", "58", "60", "61", "62", "63", "64", "65", "66",
        "81", "82", "84", "86", "90", "91", "92", "93", "94", "95", "98"}
_CC3 = {"211", "212", "213", "216", "218", "220", "221", "222", "223",
        "224", "225", "226", "227", "228", "229", "230", "231", "232",
        "233", "234", "235", "236", "237", "238", "239", "240", "241",
        "242", "243", "244", "245", "246", "248", "249", "250", "251",
        "252", "253", "254", "255", "256", "257", "258", "260", "261",
        "262", "263", "264", "265", "266", "267", "268", "269", "290",
        "291", "297", "298", "299", "350", "351", "352", "353", "354",
        "355", "356", "357", "358", "359", "370", "371", "372", "373",
        "374", "375", "376", "377", "378", "380", "381", "382", "383",
        "385", "386", "387", "389", "420", "421", "423", "500", "501",
        "502", "503", "504", "505", "506", "507", "508", "509", "590",
        "591", "592", "593", "594", "595", "596", "597", "598", "599",
        "670", "672", "673", "674", "675", "676", "677", "678", "679",
        "680", "681", "682", "683", "685", "686", "687", "688", "689",
        "690", "691", "692", "850", "852", "853", "855", "856", "880",
        "886", "960", "961", "962", "963", "964", "965", "966", "967",
        "968", "970", "971", "972", "973", "974", "975", "976", "977",
        "992", "993", "994", "995", "996", "998"}


# National-significant-number length ranges (min, max digits after the
# country code) for the most common calling codes, from the published ITU
# national numbering plan summaries (public). Ranges are conservative —
# they cover every service type in the plan — so a number a full
# phonenumbers library would accept is never rejected here; codes without
# an entry fall back to the length-agnostic 8..15-total check.
_NSN_LEN: dict[str, tuple[int, int]] = {
    "1": (10, 10), "7": (10, 10),
    "27": (9, 9), "31": (9, 9), "32": (8, 9), "33": (9, 9), "34": (9, 9),
    "39": (6, 11), "41": (9, 9), "44": (7, 10), "45": (8, 8), "46": (7, 9),
    "47": (8, 8), "48": (9, 9), "49": (6, 11), "52": (10, 10),
    "55": (10, 11), "60": (7, 10), "61": (5, 15), "62": (8, 12),
    "63": (8, 10), "64": (8, 10), "65": (8, 8), "66": (8, 9),
    "81": (9, 10), "82": (8, 11), "84": (9, 10), "86": (10, 12),
    "90": (10, 10), "91": (10, 10), "92": (9, 10), "98": (10, 10),
    "212": (9, 9), "234": (8, 10), "254": (9, 9), "852": (8, 8),
    "853": (8, 8), "880": (8, 10), "886": (8, 9), "966": (8, 9),
    "971": (8, 9), "972": (8, 9),
}


def valid_e164(digits: str) -> bool:
    """Library-free E.164 plausibility: 8..15 digits total, the leading
    1-3 digits are an ITU-assigned country calling code (longest match),
    AND — when the code has a published national-plan length range in
    ``_NSN_LEN`` — the national number's length falls inside it. Tighter
    than round-2's prefix-only check; remaining divergence from the
    phonenumbers library: within-range but unassigned national numbers
    pass, and codes outside ``_NSN_LEN`` skip the length check."""
    if not (digits.isdigit() and 8 <= len(digits) <= 15):
        return False
    cc = None
    if digits[:3] in _CC3:
        cc = digits[:3]
    elif digits[:2] in _CC2:
        cc = digits[:2]
    elif digits[:1] in _CC1:
        cc = digits[:1]
    if cc is None:
        return False
    rng = _NSN_LEN.get(cc)
    if rng is None:
        return True
    return rng[0] <= len(digits) - len(cc) <= rng[1]


def extract_phone_numbers(text: str) -> list[str]:
    """nlp_controller.py:16,19-27 — regex candidates, cleaned to [\\d+],
    then E.164-validated (``valid_e164``: '+' prefix, 8..15 digits,
    ITU-assigned country code). Fixture phones are generated with real
    country codes so this validator and the phonenumbers library agree on
    the fixture space."""
    out = set()
    for cand in set(PHONE_RE.findall(text)):
        cleaned = re.sub(r"[^\d+]", "", cand)
        if cleaned.startswith("+") and valid_e164(cleaned[1:]):
            out.add("+" + cleaned[1:])
    return sorted(out)


def _lcs_len(a: str, b: str) -> int:
    """Exact longest-common-subsequence length, bit-parallel (Hyyrö 2004,
    'Bit-parallel LCS-length computation revisited' — public algorithm):
    O(|a|·|b|/w) on Python bigints. Used to get true indel similarity
    rather than difflib's greedy (autojunk-prone, M <= LCS) approximation."""
    if not a or not b:
        return 0
    if len(a) > len(b):          # pattern = shorter string
        a, b = b, a
    masks: dict[str, int] = {}
    for i, ch in enumerate(a):
        masks[ch] = masks.get(ch, 0) | (1 << i)
    n = len(a)
    full = (1 << n) - 1
    v = full
    for ch in b:
        u = v & masks.get(ch, 0)
        v = ((v + u) | (v - u)) & full
    return n - bin(v).count("1")


def fuzz_ratio(a: str, b: str) -> int:
    """thefuzz.fuzz.ratio parity (html_parse_manager.py:291-295): thefuzz
    delegates to rapidfuzz, whose ratio is the normalized indel similarity
    (lensum - indel_dist) / lensum = 2·LCS / lensum, scaled to 0..100 and
    int-rounded by the thefuzz wrapper. Exact LCS via ``_lcs_len`` (the
    round-2 difflib stand-in could undercount matches on junk-heavy
    strings; T13 is now full parity, not a stand-in)."""
    lensum = len(a) + len(b)
    if lensum == 0:
        return 100
    return int(round(200 * _lcs_len(a, b) / lensum))


_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_sentences(text: str) -> list[str]:
    """nltk.sent_tokenize stand-in: split after terminal punctuation.
    Fixture prose uses simple '.'-terminated sentences where this agrees
    with punkt."""
    return [s for s in _SENT_SPLIT.split(text) if s]


def load_stopwords(path: str | None = None) -> frozenset[str]:
    """File-backed stopword set (T10 injection point, same shape as
    ``load_dictionary``): one whitespace-separated list. ``path=None``
    falls back to the frozen stand-in above; deployments that need exact
    gensim ``STOPWORDS`` parity dump that public frozenset to a file
    (``" ".join(sorted(STOPWORDS))``) and pass its path here — the set is
    data, not logic, so parity is a file swap. A missing explicit path
    raises rather than silently changing parse goldens."""
    if path is None:
        return STOPWORDS
    with open(path) as f:
        return frozenset(f.read().split())


def clean_paragraph(text: str, dictionary: frozenset[str] = DICTIONARY,
                    stopwords: frozenset[str] = STOPWORDS) -> str:
    """spell_check_handler.clean_paragraph (:63-83): keep sentences where
    >=60% of whitespace tokens are stopwords or dictionary words; join
    survivors with ' - '."""
    kept = ""
    for sentence in split_sentences(text):
        tokens = sentence.lower().split()
        if not tokens:
            continue
        valid = sum(1 for t in tokens if t in stopwords or t in dictionary)
        if valid > 0 and valid / len(tokens) >= 0.60:
            kept = sentence if not kept else kept + " - " + sentence
    return kept


def dedup_words(text: str) -> str:
    """html_parse_manager.__clean_text (:246-268) context/phrase dedup minus
    the raw-paragraph removal (callers pass that separately): drop a token if
    it appears in the previous-5 emitted or next-5 pending tokens, or if its
    5-gram already occurs in the emitted stream."""
    toks = text.split()
    out: list[str] = []
    emitted = ""
    for i, tok in enumerate(toks):
        if tok in out[-5:] or tok in toks[i + 1:i + 6]:
            continue
        pattern = " ".join(toks[i:i + 5])
        if pattern in emitted:
            continue
        out.append(tok)
        emitted = " ".join(out)
    return " ".join(out)


def clean_text_vs_raw(text: str, raw_paragraphs: list[str]) -> str:
    """Full html_parse_manager.__clean_text (:246-268): lowercase, blank out
    already-captured raw paragraphs, normalize whitespace, then the word/
    5-gram context dedup."""
    m = text.lower()
    for item in raw_paragraphs:
        m = m.replace(item, " ")
    m = m.replace("\n", " ").replace("\t", " ").replace("\r", " ")
    m = re.sub(" +", " ", m)
    return dedup_words(m.lower())

"""Porter stemmer — independent implementation of the public algorithm,
in two modes.

- ``nltk`` (default): M.F. Porter's 1980 rules PLUS the publicly documented
  departures that NLTK's ``PorterStemmer`` applies in its default
  ``NLTK_EXTENSIONS`` mode.  The reference engine stems with exactly that
  class (/root/reference/indexing/index_builder/helpers.py:2,7,46), so this
  mode is the reference-parity default.  nltk itself is not installed in
  this environment; the extensions are re-implemented here from their
  published description (each is spelled out in the NLTK source's
  docstrings): an irregular-forms pool (sky, dying→die, news, proceed, …),
  words of length ≤ 2 pass through, ``dies→die``/``died→die`` ies/ied
  handling, step 1c's *(c and not first-letter)* y→i condition
  (``happy→happi`` but ``enjoy→enjoy``), step 2's ``bli→ble`` (for
  ``abli→able``), apply-``alli``-first-then-rerun, ``fulli→ful`` and
  ``logi→log`` (measured on the stem keeping the ``l``), and the two-letter
  ``vc`` form counting as ending-cvc in step 1b/5a (``axe`` keeps its e).

- ``original``: the unmodified 1980 cascade (Program 14(3) pp. 130-137),
  except that length ≤ 2 words still pass through (shared guard; the
  published paper is silent on them).

Both modes pass the Porter-1980 example vocabulary identically; they
diverge exactly on the extension cases above (pinned in
tests/test_analysis.py).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# NLTK_EXTENSIONS irregular-forms pool: surface form -> stem, checked
# before any rule runs.
_POOL = {
    "skies": "sky", "sky": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "news": "news",
    "innings": "inning", "inning": "inning",
    "outings": "outing", "outing": "outing",
    "cannings": "canning", "canning": "canning",
    "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the C?(VC){m}V? form of the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str, nltk: bool) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y.  NLTK also
    counts a bare two-letter vc form (so 'axe' keeps its final e)."""
    if (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    ):
        return True
    return (
        nltk
        and len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(stem) > min_m, swap the suffix.
    A matching suffix whose condition fails returns the word unchanged
    (per-step scanning stops at the first matching suffix)."""
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word


def _by_penult(pairs):
    """Group suffix rules by the suffix's second-to-last character — for a
    given word only the ``word[-2]`` bucket can match, so the per-word scan
    shrinks from the full list to one small bucket (the 1980 paper's own
    dispatch suggestion).  Rule order inside a bucket is preserved, which
    keeps the longest-first semantics for overlapping suffixes
    (ational/tional, ization/ation, ement/ment/ent)."""
    d: dict[str, tuple] = {}
    for suf, rep in pairs:
        d.setdefault(suf[-2], []).append((suf, rep))
    return {k: tuple(v) for k, v in d.items()}


_STEP2_COMMON = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"),
]
_STEP2_TAIL = [
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
]
# 1980 text's DEPARTURES note: abli -> able is better served by
# bli -> ble; NLTK adopts it, the original list does not
_STEP2_RULES = {
    True: _by_penult(_STEP2_COMMON + [("bli", "ble")] + _STEP2_TAIL
                     + [("fulli", "ful")]),
    False: _by_penult(_STEP2_COMMON + [("abli", "able")] + _STEP2_TAIL),
}

# every suffix in steps 3/4 is >= 2 chars, so a word can only match rules
# in its word[-2] bucket (same dispatch argument as step 2); list order is
# preserved inside each bucket
_STEP3_RULES = _by_penult([
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
])
_STEP4_RULES = _by_penult([
    (s, "") for s in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )
])


def _step2(w: str, nltk: bool) -> str:
    # NLTK applies ALLI -> AL before the ordered scan and, when it fires,
    # re-runs step 2 on the result (so e.g. y->i'd '-alli' adverbs reduce
    # through their '-al' adjective).
    if nltk and w.endswith("alli") and _measure(w[:-4]) > 0:
        return _step2(w[:-4] + "al", nltk)
    if len(w) >= 2:
        for suf, rep in _STEP2_RULES[nltk].get(w[-2], ()):
            res = _replace(w, suf, rep, 0)
            if res is not None:
                return res
    # NLTK's extra LOGI -> LOG measures the stem WITH the 'l' kept, so
    # geo-/theo- work like archaeo-/philo-
    if nltk and w.endswith("logi") and _measure(w[:-3]) > 0:
        return w[:-4] + "log"
    return w


def _stem_impl(word: str, nltk: bool) -> str:
    if nltk and word in _POOL:
        return _POOL[word]
    if len(word) <= 2:
        return word
    w = word

    # --- step 1a
    if nltk and w.endswith("ies") and len(w) == 4:
        w = w[:-3] + "ie"  # dies -> die (but flies -> fli below)
    elif w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # --- step 1b
    flag_1b = False
    if nltk and w.endswith("ied"):
        w = w[:-3] + ("ie" if len(w) == 4 else "i")  # died -> die, spied -> spi
    elif w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _contains_vowel(w[:-2]):
            w = w[:-2]
            flag_1b = True
    elif w.endswith("ing"):
        if _contains_vowel(w[:-3]):
            w = w[:-3]
            flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w):
            if w[-1] not in "lsz":
                w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w, nltk):
            w = w + "e"

    # --- step 1c
    if w.endswith("y"):
        stem_ = w[:-1]
        if nltk:
            # y -> i only after a non-initial consonant: happy -> happi,
            # enjoy -> enjoy, by -> by
            if len(stem_) > 1 and _is_consonant(stem_, len(stem_) - 1):
                w = stem_ + "i"
        elif _contains_vowel(stem_):
            w = stem_ + "i"

    # --- step 2 (m > 0)
    w = _step2(w, nltk)

    # --- step 3 (m > 0)
    if len(w) >= 2:
        for suf, rep in _STEP3_RULES.get(w[-2], ()):
            res = _replace(w, suf, rep, 0)
            if res is not None:
                w = res
                break

    # --- step 4 (m > 1): scanning stops at the FIRST suffix match, even
    # when its measure condition fails (no later suffix is tried)
    matched4 = False
    if len(w) >= 2:
        for suf, _ in _STEP4_RULES.get(w[-2], ()):
            if w.endswith(suf):
                matched4 = True
                stem_ = w[: len(w) - len(suf)]
                if _measure(stem_) > 1:
                    w = stem_
                break
    if not matched4:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # --- step 5a
    if w.endswith("e"):
        stem_ = w[:-1]
        m = _measure(stem_)
        if m > 1 or (m == 1 and not _ends_cvc(stem_, nltk)):
            w = stem_

    # --- step 5b
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]

    return w


def stem(word: str, mode: str = "nltk") -> str:
    """Stem one lowercase token.  ``mode="nltk"`` (default) reproduces the
    reference's nltk ``PorterStemmer`` behavior; ``mode="original"`` runs
    the unmodified 1980 cascade."""
    return _stem_impl(word, mode == "nltk")


def stem_original(word: str) -> str:
    return _stem_impl(word, False)


def stem_nltk(word: str) -> str:
    return _stem_impl(word, True)

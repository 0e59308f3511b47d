"""Stemmers for the reference locales NLTK has no Snowball port for:
Turkish, Greek, Tamil (reference: rust-stemmers Algorithm::Turkish /
::Greek / ::Tamil, nlp/mod.rs:50,101,104).

- Turkish: a from-scratch implementation following the published Snowball
  Turkish algorithm's structure (Çilden 2007): nominal-verb then noun
  suffix classes stripped longest-match-first with vowel-harmony and
  buffer-consonant checks, the -ki chain, and final-consonant devoicing
  restoration. No official-vector oracle exists in this zero-egress image,
  so exact Snowball parity is NOT claimed — behavior is locked by the
  hand-derived vectors in tests/test_stemmers.py instead.
- Greek / Tamil: light inflectional-suffix strippers (the full Ntais and
  Snowball-Tamil algorithms carry large exception tables; these cover the
  dominant case/number/person endings, which is what BM25 term conflation
  needs). Strictly better than the identity fallback they replace.
"""

from __future__ import annotations

from functools import lru_cache

# ---------------------------------------------------------------- Turkish

_TR_VOWELS = "aeıioöuü"
_TR_BACK = "aıou"
# voiceless consonants trigger the D->t / C->ç allomorphs ("fıstıkçı şahap")
_TR_VOICELESS = "fstkçşhp"

_TR_U_FOR = {"a": "ı", "ı": "ı", "o": "u", "u": "u",
             "e": "i", "i": "i", "ö": "ü", "ü": "ü"}


def _tr_last_vowel(w: str) -> str:
    for ch in reversed(w):
        if ch in _TR_VOWELS:
            return ch
    return ""


def _tr_harmonic(stem: str, suffix: str) -> bool:
    """Progressive vowel harmony: the first suffix vowel must agree with
    the last stem vowel (A-type: a/e by backness; U-type: ı/i/u/ü by
    backness+rounding)."""
    sv = _tr_last_vowel(stem)
    if not sv:
        return True
    for ch in suffix:
        if ch in "ae":
            return (ch == "a") == (sv in _TR_BACK)
        if ch in "ıiuü":
            return _TR_U_FOR[sv] == ch
        if ch in _TR_VOWELS:
            return True
    return True


def _tr_expand(template: str) -> list[str]:
    """Expand a Snowball-style suffix template (A = a/e, U = ı/i/u/ü,
    D = d/t, C = c/ç) into concrete surface forms."""
    forms = [""]
    for ch in template:
        if ch == "A":
            alts = "ae"
        elif ch == "U":
            alts = "ıiuü"
        elif ch == "D":
            alts = "dt"
        elif ch == "C":
            alts = "cç"
        else:
            alts = ch
        forms = [f + a for f in forms for a in alts]
    return forms


def _tr_class(templates: list[str]) -> list[tuple[str, str]]:
    """Concrete (suffix, attach-constraint) pairs for a class, longest
    first. Templates with a leading (y)/(n)/(s)/(U) optional segment
    contribute both variants; constraints encode Turkish morphotactics:
    a buffer-consonant variant attaches only after a vowel, a vowel-
    initial form only after a consonant ("öğretmen-im" vs "araba-yım")."""
    out: dict[str, str] = {}
    def add(form: str, constraint: str) -> None:
        prev = out.get(form)
        # keep the laxer constraint if two templates collide
        out[form] = "" if prev == "" else (prev or constraint)

    for t in templates:
        if t.startswith("+"):
            # "+(y)Uz": buffered variant only — the bare form collides
            # with too many roots ("den-iz", "dom-uz", "yıld-ız")
            close = t.index(")")
            for f in _tr_expand(t[2:close] + t[close + 1:]):
                add(f, "after_vowel")
        elif t.startswith("("):
            close = t.index(")")
            opt, rest = t[1:close], t[close + 1:]
            for f in _tr_expand(opt + rest):
                # y/n/s buffer consonants join two vowels; a buffer vowel
                # (U) joins two consonants
                add(f, "after_cons" if opt in ("U", "A") else "after_vowel")
            for f in _tr_expand(rest):
                # the bare variant's context: after a consonant for y/s
                # templates ("güzel-se" vs "hasta-ysa") and U templates'
                # vowel-initial forms; anywhere for n templates ("araba-da"
                # AND "ev-de" — the n variant marks a preceding possessive)
                if opt == "n":
                    add(f, "after_cons" if f[0] in _TR_VOWELS else "")
                elif opt in ("U", "A"):
                    add(f, "after_vowel")
                else:
                    add(f, "after_cons")
        else:
            for f in _tr_expand(t):
                add(f, "after_cons" if f[0] in _TR_VOWELS else "")
    return sorted(out.items(), key=lambda kv: len(kv[0]), reverse=True)


# Nominal verb suffixes (predicate endings on nouns). No lAr here — the
# plural pass covers it; keeping it in this always-first class cascades
# ("arabalar" -> strip lar -> a case pass then eats the root's final a).
_TR_NOMINAL_VERB = _tr_class([
    "cAsInA", "sUnUz", "(y)mUş", "(y)DU", "(y)sA", "(y)ken",
    "+(y)Uz", "(y)Um", "sUn", "mU", "DUr",
])

# Noun suffix classes stripped as ordered single passes (case, then
# possessive, then plural), mirroring Turkish morphotactics
# root(+lAr)(+poss)(+case); a looped strip over one flat class cascades
# through single-letter suffixes and eats stems ("öğretmen" -> "öğret").
_TR_CASE = _tr_class([
    "(n)DAn", "(n)DA", "(n)Un", "(y)lA", "(y)A", "(n)A",
    "(y)U", "(n)U", "(n)CA",
])
# 1sg/2sg keep only the post-consonantal Um/Un forms: the bare post-
# vocalic single letters ("araba-m") strip real root letters far more
# often than they strip suffixes ("öğretmen" -> "öğretme")
_TR_POSS = _tr_class([
    "lArI", "(U)mUz", "(U)nUz", "(s)U", "Um", "Un",
])
_TR_PLURAL = _tr_class(["lAr"])
_TR_KI = _tr_class(["ki", "kü"])


def _tr_strip_one(word: str, suffixes: list[tuple[str, str]]) -> str | None:
    """Strip the longest applicable suffix, or None. Applicability:
    harmony holds (-ki/-kü exempt), the stem keeps >= 2 chars and a
    vowel, the attach constraint matches the stem-final letter, and D/C
    allomorphs agree with the voicing of the preceding consonant."""
    for suf, constraint in suffixes:
        if not word.endswith(suf) or len(word) - len(suf) < 2:
            continue
        # a 2-char stem may only shed short suffixes or the plural
        # ("ev-de", "ev-ler" yes; "de-niz" no — long suffixes on tiny
        # stems are nearly always misparsed roots)
        if (len(word) - len(suf) < 3 and len(suf) > 2
                and suf not in ("lar", "ler")):
            continue
        stem = word[: -len(suf)]
        if _tr_last_vowel(stem) == "":
            continue
        # -ki/-kü and -(y)ken are harmony-invariable
        if suf not in ("ki", "kü", "ken", "yken") and not _tr_harmonic(stem, suf):
            continue
        if constraint == "after_vowel" and stem[-1] not in _TR_VOWELS:
            continue
        if constraint == "after_cons" and stem[-1] in _TR_VOWELS:
            continue
        if suf[0] in "dt":
            want = "t" if stem[-1] in _TR_VOICELESS else "d"
            if suf[0] != want:
                continue
        if suf[0] in "cç":
            want = "ç" if stem[-1] in _TR_VOICELESS else "c"
            if suf[0] != want:
                continue
        return stem
    return None


@lru_cache(maxsize=65536)
def turkish_stem(word: str) -> str:
    w = word.lower()
    if len(w) < 3 or _tr_last_vowel(w) == "":
        return w
    # one nominal-verb suffix, then the noun chain root(+lAr)(+poss)(+case)
    # stripped back-to-front as ordered single passes; -ki re-opens the
    # chain ("sokaktaki" -> "sokakta" -> "sokak")
    s = _tr_strip_one(w, _TR_NOMINAL_VERB)
    if s is not None:
        w = s

    def noun_chain(w: str) -> str:
        s = _tr_strip_one(w, _TR_CASE)
        skip_poss = False
        if s is not None and len(w) - len(s) == 1 and w[-1] in _TR_VOWELS:
            # bare-vowel accusative ("ev-i") is ambiguous with a longer
            # possessive ("kedi-si"): prefer the longer morpheme
            p = _tr_strip_one(w, _TR_POSS)
            if p is not None and len(p) < len(s):
                s, skip_poss = p, True
        if s is not None:
            # a buffer-y case variant ("kapı-yı") attaches to a bare
            # vowel-final root — a possessive before it would have selected
            # the pronominal-n variant ("kapı-sı-nı") — so don't let the
            # possessive pass eat the root's final vowel
            skip_poss = skip_poss or w[len(s):][0] == "y"
            w = s
        if not skip_poss:
            p = _tr_strip_one(w, _TR_POSS)
            if p is not None:
                w = p
        p = _tr_strip_one(w, _TR_PLURAL)
        if p is not None:
            w = p
        # one final case attempt so plural-stripped words land on the same
        # stem as their unsuffixed form ("öğrenciler"->"öğrenci"->"öğrenç"
        # must agree with "öğrenci"->"öğrenç")
        p = _tr_strip_one(w, _TR_CASE)
        if p is not None:
            w = p
        return w

    # -ki first (it closes the chain: "evde+ki"), min stem 3 so lexical
    # -ki words ("eski", "iki") survive; then the chain on what remains
    s = _tr_strip_one(w, _TR_KI)
    if s is not None and len(s) >= 3:
        w = s
    w = noun_chain(w)
    # restore final devoicing exposed by stripping: kitab- -> kitap
    if w and w[-1] in "bcdğ":
        w = w[:-1] + {"b": "p", "c": "ç", "d": "t", "ğ": "k"}[w[-1]]
    return w


# ----------------------------------------------------------------- Greek

# Replacement rules first (the -μα noun family inflects on an extended
# stem: σώμα / σώματα / σωμάτων must conflate), then plain strips of the
# dominant inflectional endings (nouns/adjectives/verbs incl. passive
# aorist and diminutives), longest first. Lowercase, final-sigma
# normalized to σ, tonos folded.
_EL_REPLACE = sorted([
    ("ματων", "μα"), ("ματοσ", "μα"), ("ματα", "μα"),
    # bare -μα nominative: stop (so σώμα stays σωμα, matching σώματα)
    ("μα", "μα"),
], key=lambda kv: len(kv[0]), reverse=True)
_EL_SUFFIXES = sorted([
    # verbs
    "ονταν", "ονται", "ομαστε", "οσαστε", "ομουν", "οσουν",
    "θηκαμε", "θηκατε", "θηκαν", "θηκα", "θηκε",
    "ηκαμε", "ηκατε", "ηκαν", "ηκα", "ηκε",
    "ουσαμε", "ουσατε", "ουσαν", "ουσα", "ουσε",
    "ησαμε", "ησατε", "ησαν", "ησα", "ησε",
    "ομαι", "εται", "εσαι", "ουμε", "ουνε", "ετε", "εστε", "ουν", "ανε",
    "αμε", "ατε", "αν", "ω",
    # nouns/adjectives
    "ιουσ", "ιων", "εισ", "εων", "ουσ", "ων", "οσ", "ησ", "ασ", "ου",
    "ια", "ιο", "οι", "αι", "εσ", "ει",
    # diminutives
    "ακια", "ακι", "ουλα", "ουλεσ", "ιτσα", "ιτσεσ", "ιτσασ", "ακοσ",
    "α", "η", "ο", "ι", "ε",
], key=len, reverse=True)
_EL_VOWELS = "αεηιουω"


@lru_cache(maxsize=65536)
def greek_stem(word: str) -> str:
    w = word.lower().replace("ς", "σ")
    # strip diacritics common in Greek text (tonos)
    w = w.translate(str.maketrans("άέήίόύώϊϋΐΰ", "αεηιουωιυιυ"))
    if len(w) < 4:
        return w
    for suf, rep in _EL_REPLACE:
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            return w[: -len(suf)] + rep
    for suf in _EL_SUFFIXES:
        stem = w[: -len(suf)] if w.endswith(suf) else None
        if stem and len(stem) >= 3 and any(c in _EL_VOWELS for c in stem):
            return stem
    return w


# ----------------------------------------------------------------- Tamil

# Case/plural/clitic suffixes, longest first (NFC-composed forms).
_TA_SUFFIXES = sorted([
    "களுக்கு", "களில்", "களால்", "களின்", "களை", "கள்",
    "னுக்கு", "வுக்கு", "உக்கு", "க்கு",
    "ிலிருந்து", "இலிருந்து", "ில்", "இல்",
    "ினால்", "ால்", "ோடு", "உடன்", "ுடன்",
    "ின்", "இன்", "ை", "ும்", "ோ", "ா", "ே",
], key=len, reverse=True)


@lru_cache(maxsize=65536)
def tamil_stem(word: str) -> str:
    w = word
    for _ in range(2):
        for suf in _TA_SUFFIXES:
            if w.endswith(suf) and len(w) - len(suf) >= 2:
                w = w[: -len(suf)]
                break
        else:
            break
    return w


@lru_cache(maxsize=4)
def get_extra_stemmer(locale: str):
    return {"tr": turkish_stem, "el": greek_stem, "ta": tamil_stem}.get(locale)

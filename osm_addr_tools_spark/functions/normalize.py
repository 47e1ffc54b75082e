"""Address-normalization kernels (SURVEY.md §2.8, F1–F4).

These reproduce the *merger semantics* named by BASELINE.json north_star
("addr:housenumber/addr:street normalization, duplicate-node detection").
The reference implementation was unavailable (SURVEY.md §0), so the exact
rules are pinned HERE (and in FIXTURES.md §3) as the normative spec, gated
by golden fixtures in tests/test_normalize.py.

All kernels are batch ``pd.Series -> pd.Series`` functions (Arrow-vectorized
via pandas string methods — no per-row Python in the hot path, per
BASELINE.json input_hint). Each is idempotent: f(f(x)) == f(x).
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# Leading street-prefix expansion map (generic designators). A leading
# token matching a key (with or without the trailing dot) is replaced by
# the value; empty string means "drop the designator".
STREET_PREFIXES: dict[str, str] = {
    "ul": "",          # ulica — dropped (OSM convention: bare street name)
    "ulica": "",
    "al": "aleja",
    "aleja": "aleja",
    "pl": "plac",
    "plac": "plac",
    "os": "osiedle",
    "osiedle": "osiedle",
    "st": "street",    # english abbreviations expand to the full word
    "ave": "avenue",
    "rd": "road",
}

_PUNCT_CLASS = r"""[.,;:'"()!?]"""


def norm_housenumber(s: pd.Series) -> pd.Series:
    """F1 — canonical housenumber.

    Rules (pinned by FIXTURES.md §3.1):
      1. trim + collapse internal whitespace
      2. backslash separator unified to "/" and spaces around "/" removed
      3. a space between a digit and a trailing letter suffix is removed
      4. leading zeros of every numeric run stripped ("012" → "12")
      5. uppercase
    """
    s = s.fillna("").astype(str)
    s = s.str.strip().str.replace(r"\s+", " ", regex=True)
    s = s.str.replace("\\", "/", regex=False)
    s = s.str.replace(r"\s*/\s*", "/", regex=True)
    s = s.str.replace(r"(\d)\s+([A-Za-z])\b", r"\1\2", regex=True)
    s = s.str.replace(r"(?<!\d)0+(\d)", r"\1", regex=True)
    return s.str.upper()


def norm_street(s: pd.Series) -> pd.Series:
    """F2 — canonical street name.

    Rules (FIXTURES.md §3.2, r4 revision): NFC unicode normalize; lowercase;
    trim and collapse whitespace; strip punctuation (and collapse again);
    THEN expand/drop a leading generic prefix per STREET_PREFIXES, iterated
    to a fixpoint.

    Ordering is load-bearing for idempotence (VERDICT r3 #1): stripping
    punctuation AFTER expansion let a punctuation-wrapped leading token hide
    the prefix on pass 1 and expand on pass 2 ('.sT' → "st" → "street" —
    the same logical street arriving as 'ul. Długa' vs '.ul Długa' got
    different canonicals, breaking duplicate-node detection). Punctuation
    first means the expansion always sees the canonical token; running it
    to a fixpoint makes stacked designators ('ul. pl. Wolności' →
    "plac wolności") converge too. The output is then provably a fixpoint
    of the whole chain: it is lowercase, collapsed, punctuation-free, and
    expansion-stable by construction.
    """
    s = s.fillna("").astype(str)
    s = s.map(lambda x: unicodedata.normalize("NFC", x))
    s = s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    s = s.str.replace(_PUNCT_CLASS, "", regex=True)
    s = s.str.replace(r"\s+", " ", regex=True).str.strip()

    def expand(x: str) -> str:
        # fixpoint bounded by token count: each step drops the head or
        # replaces it by a map value that is itself a map fixpoint
        for _ in range(x.count(" ") + 2):
            if not x:
                return x
            head, _, rest = x.partition(" ")
            repl = STREET_PREFIXES.get(head)
            nxt = x if repl is None else ((repl + " " + rest).strip() if repl else rest)
            if nxt == x:
                return x
            x = nxt
        return x

    return s.map(expand)


# instrumentation: exact-matcher invocations (in-process kernel tests only;
# Spark workers each carry their own copy)
EXACT_RATIO_CALLS = 0


def street_similarity(a: pd.Series, b: pd.Series, tau: float | None = None) -> pd.Series:
    """F3 — SequenceMatcher-style longest-matching-blocks ratio in [0, 1].

    ratio = 2*M / (len(a)+len(b)) where M is total matched characters via
    recursive longest-common-substring blocks (difflib semantics,
    autojunk off — fully deterministic). Used only as a tie-breaker when
    exact normalized match fails (SURVEY §2.8 F3), so the per-pair Python
    cost inside the Arrow batch is bounded and off the hot path.

    ``tau``: acceptance-threshold fast path (VERDICT r2 #2). The matching
    blocks are disjoint and ordered in both strings, so their concatenation
    is a common subsequence; hence M ≤ |char-multiset intersection| and
    ratio ≤ 2·|∩| / (la+lb). Pairs whose bound is already < tau return 0.0
    (NOT the bound — ADVICE r3: the bound is not a ratio, and callers
    consuming the column without the ≥-tau filter must never mistake it
    for one; 0.0 keeps the ≥-tau pair set identical, property-tested)
    without running the O(n²) matcher; Counter-∩ is O(n). Survivors get
    the exact ratio, so ranking among accepted pairs is unchanged.
    """
    import difflib
    from collections import Counter

    global EXACT_RATIO_CALLS
    av, bv = a.fillna(""), b.fillna("")
    out = []
    for x, y in zip(av, bv):
        x, y = x or "", y or ""
        if tau is not None:
            la, lb = len(x), len(y)
            if la + lb:
                common = sum((Counter(x) & Counter(y)).values())
                bound = 2.0 * common / (la + lb)
                if bound < tau:
                    out.append(0.0)
                    continue
        EXACT_RATIO_CALLS += 1
        out.append(difflib.SequenceMatcher(None, x, y, autojunk=False).ratio())
    return pd.Series(out, index=a.index, dtype="float64")


def addr_key(
    city: pd.Series, street: pd.Series, place: pd.Series, housenumber: pd.Series
) -> pd.Series:
    """F4 — canonical duplicate-detection key:
    ``lower(city) | norm_street(street or place) | norm_housenumber(hn)``.
    """
    city_n = city.fillna("").astype(str).str.strip().str.lower()
    street_or_place = street.where(street.fillna("") != "", place)
    return city_n + "|" + norm_street(street_or_place) + "|" + norm_housenumber(housenumber)

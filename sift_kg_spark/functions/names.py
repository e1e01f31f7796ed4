"""Entity-name key derivation: title-prefix stripping + singularization.

Reimplements the reference's entity-name normalizers (X2/X3 in SURVEY §2.7)
as pure JVM-side column expressions — no Python UDF in the path:

* Title-prefix strip (/root/reference/src/sift_kg/graph/prededup.py:30-54):
  the reference loops over a frozen ~40-prefix tuple, stripping the first
  matching ``prefix + " "`` and restarting until fixpoint. Because every
  strip is anchored at the string start, the fixpoint is EXACTLY one
  anchored repeated-group regex ``^(?:(?:p1|p2|...)\\s+)+`` applied once —
  one ``regexp_replace``, whole-stage codegen, no loop.

* Per-word singularization (prededup.py:64-72): the reference calls
  ``inflect.singular_noun`` per word. inflect is not a public contract of
  this engine (SURVEY §7 risk list: deterministic rule-based singularizer
  instead); the rules below cover the reference test matrix
  (tests/test_prededup.py:28-39 — plural merge cases) and run JVM-side via
  ``transform`` over the split words (higher-order function, no UDF).

Every function has a pure-Python oracle with the same name + ``_py`` used
by the tests to pin Spark/Python parity, and the DuckDB-SQL equivalent is
exercised by the ``entity_name_keys`` driver query.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Frozen constant copied from the reference (prededup.py:29-41) — data,
# not code; order matters only for prefix-of-prefix pairs ("dr." before
# "dr"), which the tuple already satisfies.
TITLE_PREFIXES: tuple[str, ...] = (
    "detective", "det.", "officer", "sergeant", "sgt.", "lieutenant", "lt.",
    "captain", "cpt.", "chief", "deputy", "agent", "special agent",
    "dr.", "dr", "doctor", "prof.", "professor",
    "mr.", "mr", "mrs.", "mrs", "ms.", "ms", "miss",
    "judge", "justice", "hon.", "honorable",
    "senator", "sen.", "representative", "rep.", "governor", "gov.",
    "president", "vice president",
    "attorney", "atty.", "counsel", "esquire", "esq.",
    "reverend", "rev.", "father", "sister", "brother",
    "sir", "dame", "lord", "lady",
)

# "special agent" must win over "agent", "vice president" over
# "president": regex alternation is first-match, so sort longest-first
# (the reference's startswith loop is order-sensitive the same way only
# for prefix-of-prefix pairs, where longest-first gives the fixpoint the
# loop converges to).
_ALTERNATION = "|".join(
    re.escape(p) for p in sorted(TITLE_PREFIXES, key=len, reverse=True)
)
TITLE_PREFIX_REGEX = rf"^(?:(?:{_ALTERNATION})\s+)+"

# Irregular plurals the suffix rules can't reach (reference inflect
# handles these; frozen here as data).
IRREGULAR_PLURALS: dict[str, str] = {
    "men": "man",
    "women": "woman",
    "children": "child",
    "people": "person",
    "mice": "mouse",
    "geese": "goose",
    "feet": "foot",
    "teeth": "tooth",
}


def strip_title_prefixes(name: Column) -> Column:
    """Strip repeated leading title prefixes (fixpoint) — one regexp."""
    return F.trim(F.regexp_replace(name, TITLE_PREFIX_REGEX, ""))


def strip_title_prefixes_py(name: str) -> str:
    return re.sub(TITLE_PREFIX_REGEX, "", name).strip()


def _singular_word(w: Column) -> Column:
    """Rule-based singular of one lowercase word (Column -> Column).

    Rules (applied first-match): irregular map; -ss/-us/-is invariant;
    -ies -> -y (len >= 5); -sses/-xes/-ches/-shes/-zes -> drop "es";
    trailing -s -> drop it.
    """
    expr = None
    for plural, singular in IRREGULAR_PLURALS.items():
        cond = w == plural
        expr = F.when(cond, singular) if expr is None else expr.when(cond, singular)
    drop_es = (
        w.endswith("sses") | w.endswith("xes") | w.endswith("ches")
        | w.endswith("shes") | w.endswith("zes")
    )
    keep = w.endswith("ss") | w.endswith("us") | w.endswith("is")
    return (
        expr.when(keep, w)
        .when(
            w.endswith("ies") & (F.length(w) >= 5),
            F.concat(F.substring(w, 1, F.length(w) - 3), F.lit("y")),
        )
        .when(drop_es, F.substring(w, 1, F.length(w) - 2))
        .when(w.endswith("s"), F.substring(w, 1, F.length(w) - 1))
        .otherwise(w)
    )


def singularize_words(name: Column) -> Column:
    """Singularize every space-separated word — JVM-side ``transform``."""
    return F.array_join(F.transform(F.split(name, " "), _singular_word), " ")


def _singular_word_py(w: str) -> str:
    if w in IRREGULAR_PLURALS:
        return IRREGULAR_PLURALS[w]
    if w.endswith(("ss", "us", "is")):
        return w
    if w.endswith("ies") and len(w) >= 5:
        return w[:-3] + "y"
    if w.endswith(("sses", "xes", "ches", "shes", "zes")):
        return w[:-2]
    if w.endswith("s"):
        return w[:-1]
    return w


def singularize_words_py(name: str) -> str:
    return " ".join(_singular_word_py(w) for w in name.split(" "))


def entity_name_key(name: Column) -> Column:
    """The reference's Layer-1 phase-1 blocking key for entity names
    (prededup.py:104-117): lower -> trim -> strip titles -> singularize.

    Unicode folding for names rides ``normalize_text`` (already applied
    upstream when the name column comes from extracted text).
    """
    return singularize_words(strip_title_prefixes(F.lower(F.trim(name))))


def entity_name_key_py(name: str) -> str:
    return singularize_words_py(strip_title_prefixes_py(name.lower().strip()))

"""Grammar fuzz for the byte-identity extraction contract (north rule:
byte-identical extracted text per url).

The oracle here is NOT a second parser: hypothesis builds a random DOM
tree and the expected text is computed from the tree at construction
time by the extraction SPEC — visible data runs (delimited by tag and
comment boundaries), each stripped, empties dropped, joined with "\\n",
with script/style/head subtrees removed. A divergence therefore means
``extract_text_py`` violates its documented contract, not that two
parsers disagree on undefined behavior.

Grammar constraints that keep the expectation well-defined (each pinned
by a probe in the test matrix below / tests/test_text.py):

* text pieces never contain ``<`` or ``&`` raw; ampersands enter only
  through a fixed entity list with trailing semicolons (html.parser's
  html5 table would otherwise decode surprising prefixes, e.g. ``&not``);
* script/style are raw-text (CDATA) elements and get TEXT-ONLY children,
  as in the HTML spec — a nested ``<script>`` inside CDATA is invisible
  to any conforming tokenizer, so a tree oracle cannot model it;
* comments flush the current data run (handle_comment splits
  handle_data calls: ``a<!--c-->b`` -> ``"a\\nb"``).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sift_kg_spark.functions.text import extract_text_py

SKIP_TAGS = frozenset({"script", "style", "head"})
RAW_TEXT_TAGS = frozenset({"script", "style"})
VISIBLE_TAGS = ("div", "p", "span", "a", "li", "b", "em", "ul", "td", "h1")
VOID_TAGS = ("br", "img", "hr")

# (serialized, decoded) entity pairs — all with semicolons, all in the
# html5 named/numeric tables.
ENTITIES = (
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#65;", "A"),
    ("&#x2603;", "☃"),
)

_TEXT_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCXYZ0123456789 .,:;!?-_()'"
    "\t\néß中文\U0001f388"
)

_text_piece = st.text(alphabet=_TEXT_ALPHABET, min_size=0, max_size=12).map(
    lambda s: (s, s)
)
_entity = st.sampled_from(ENTITIES)

# A text node is a concatenation of raw pieces and entities; both the
# serialized form and the decoded expectation are built together.
_text_node = st.lists(
    st.one_of(_text_piece, _entity), min_size=1, max_size=5
).map(
    lambda pieces: (
        "text",
        "".join(p[0] for p in pieces),
        "".join(p[1] for p in pieces),
    )
)

_comment_node = st.text(
    alphabet="abcxyz 0123456789.", min_size=0, max_size=8
).map(lambda s: ("comment", s, None))

_attr = st.one_of(
    st.none(),
    st.text(alphabet="abcdefghij", min_size=1, max_size=6).map(
        lambda v: f' class="{v}"'
    ),
)


def _element(children_strategy):
    return st.one_of(
        # visible container
        st.tuples(
            st.sampled_from(VISIBLE_TAGS),
            _attr,
            st.lists(children_strategy, max_size=4),
        ).map(lambda t: ("elem", t[0], t[2], t[1])),
        # void element: serialized without a closing tag
        st.sampled_from(VOID_TAGS).map(lambda tag: ("void", tag, [], None)),
        # head: skipped but a normal (non-CDATA) container
        st.lists(children_strategy, max_size=3).map(
            lambda ch: ("elem", "head", ch, None)
        ),
        # raw-text skip elements: text-only children (HTML spec: script/
        # style content is raw text; nested tags do not exist there)
        st.tuples(
            st.sampled_from(sorted(RAW_TEXT_TAGS)),
            st.lists(
                st.text(alphabet="abc XYZ0().;", max_size=10).map(
                    lambda s: ("text", s, s)
                ),
                max_size=2,
            ),
        ).map(lambda t: ("elem", t[0], t[1], None)),
    )


_node = st.recursive(
    st.one_of(_text_node, _comment_node),
    _element,
    max_leaves=40,
)
_doc = st.lists(_node, max_size=6)


def serialize(nodes) -> str:
    out: list[str] = []

    def emit(n) -> None:
        kind = n[0]
        if kind == "text":
            out.append(n[1])
        elif kind == "comment":
            out.append(f"<!--{n[1]}-->")
        elif kind == "void":
            out.append(f"<{n[1]}>")
        else:
            _, tag, children, attr = n
            out.append(f"<{tag}{attr or ''}>")
            for c in children:
                emit(c)
            out.append(f"</{tag}>")

    for n in nodes:
        emit(n)
    return "".join(out)


def expected_text(nodes) -> str:
    """The extraction spec, evaluated on the tree: data runs are
    delimited by tag open/close and comment events; each run is
    stripped; empties dropped; runs joined with newline; runs inside
    script/style/head subtrees discarded."""
    runs: list[str] = []
    cur: list[str] = []

    def flush() -> None:
        s = "".join(cur)
        cur.clear()
        s = s.strip()
        if s:
            runs.append(s)

    def walk(ns, skip: bool) -> None:
        for n in ns:
            kind = n[0]
            if kind == "text":
                if not skip:
                    cur.append(n[2])
            elif kind == "comment":
                flush()
            else:
                _, tag, children, _attr = n
                flush()
                walk(children, skip or tag in SKIP_TAGS)
                flush()

    walk(nodes, False)
    flush()
    return "\n".join(runs)


class TestExtractionGrammarFuzz:
    @settings(max_examples=300, deadline=None)
    @given(_doc)
    def test_matches_spec_oracle(self, nodes):
        html = serialize(nodes)
        assert extract_text_py(html) == expected_text(nodes)

    @settings(max_examples=150, deadline=None)
    @given(_doc)
    def test_bytes_input_parity(self, nodes):
        """The UDF column is binary; utf-8 bytes must extract to the
        byte-identical string the str path produces."""
        html = serialize(nodes)
        assert extract_text_py(html.encode("utf-8")) == extract_text_py(html)


class TestExtractionRobustness:
    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def test_arbitrary_bytes_never_raise(self, raw):
        """Malformed markup / non-utf8 bytes must quarantine (None) or
        extract — never raise — and must be deterministic (the resume
        path re-extracts and relies on identical output)."""
        first = extract_text_py(raw)
        assert first is None or isinstance(first, str)
        assert extract_text_py(raw) == first

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300))
    def test_arbitrary_text_never_raises(self, s):
        first = extract_text_py(s)
        assert first is None or isinstance(first, str)
        assert extract_text_py(s) == first


class TestNormalizeKeyProperties:
    """normalize_text_py output is the exact-dup KEY; these are the
    properties the key contract relies on, fuzzed over arbitrary
    unicode (not just the fixture corpus)."""

    @settings(max_examples=400, deadline=None)
    @given(st.text(max_size=120))
    def test_idempotent_and_mark_free(self, s):
        import unicodedata

        from sift_kg_spark.functions.text import normalize_text_py

        out = normalize_text_py(s)
        # idempotence: re-normalizing a stored key must not change it
        # (resume/incremental paths compare fresh keys to committed ones)
        assert normalize_text_py(out) == out
        # no combining marks survive (casefold can reintroduce Mn only
        # via codepoints NFKD already decomposes, e.g. U+0130)
        assert not any(unicodedata.category(c) == "Mn" for c in out)
        # whitespace is fully collapsed: single spaces, no edge spaces
        assert "  " not in out and out == out.strip()

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcdefg ", max_size=40))
    def test_accent_variants_fold_together(self, s):
        """Composed, decomposed and uppercase accent spellings of the
        same word must produce the same key."""
        from sift_kg_spark.functions.text import normalize_text_py

        composed = s.replace("e", "é")          # é precomposed
        decomposed = s.replace("e", "é")        # e + combining acute
        assert (
            normalize_text_py(composed)
            == normalize_text_py(decomposed)
            == normalize_text_py(s.upper().replace("E", "É"))
        )

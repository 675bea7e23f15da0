"""Gazetteer mention detection + OpenIE-style pattern triple extraction.

Spark-first shape (SURVEY.md §2.8): the gazetteer is broadcast once; each
executor builds the Aho-Corasick automaton (and the compiled relation
regexes) ONCE PER PARTITION inside ``mapInPandas``, then streams Arrow
batches through it.  Output is a flat mentions/triples DataFrame — the
fan-out that the reference models with its recursive serializer is an
``explode``-shaped row multiplication here.

No shuffle is introduced by either operator; downstream joins decide the
partitioning.  At 10^12 documents this stage scales linearly with input
splits; the automaton is O(sum of surface lengths) memory per task, shared
across all rows of the partition.
"""

from __future__ import annotations

import re
from collections import deque
from collections.abc import Iterable, Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame


class AhoCorasick:
    """Minimal Aho-Corasick automaton (pure Python, public-algorithm).

    Built per partition; matching is O(len(text) + matches).  Matches are
    filtered to word boundaries and reduced to the longest-leftmost
    non-overlapping set, so "Acme Analytics Inc" wins over its prefix
    "Acme Analytics".
    """

    def __init__(self, patterns: Iterable[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[str]] = [[]]
        for pat in patterns:
            self._insert(pat)
        self._build_failure_links()

    def _insert(self, pat: str) -> None:
        state = 0
        for ch in pat:
            nxt = self.goto[state].get(ch)
            if nxt is None:
                nxt = len(self.goto)
                self.goto.append({})
                self.fail.append(0)
                self.out.append([])
                self.goto[state][ch] = nxt
            state = nxt
        self.out[state].append(pat)

    def _build_failure_links(self) -> None:
        queue: deque[int] = deque()
        for nxt in self.goto[0].values():
            queue.append(nxt)
        while queue:
            state = queue.popleft()
            for ch, nxt in self.goto[state].items():
                queue.append(nxt)
                f = self.fail[state]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != nxt else 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def _raw_matches(self, text: str) -> Iterator[tuple[int, str]]:
        state = 0
        for i, ch in enumerate(text):
            while state and ch not in self.goto[state]:
                state = self.fail[state]
            state = self.goto[state].get(ch, 0)
            for pat in self.out[state]:
                yield i - len(pat) + 1, pat

    @staticmethod
    def _is_word_boundary(text: str, start: int, end: int) -> bool:
        before_ok = start == 0 or not text[start - 1].isalnum()
        after_ok = end >= len(text) or not text[end].isalnum()
        return before_ok and after_ok

    def find(self, text: str) -> list[tuple[int, int, str]]:
        """Longest-leftmost non-overlapping word-boundary matches:
        list of (start, end, surface)."""
        cands = [
            (s, s + len(p), p)
            for s, p in self._raw_matches(text)
            if self._is_word_boundary(text, s, s + len(p))
        ]
        # prefer longer matches, then earlier position
        cands.sort(key=lambda t: (t[0], -(t[1] - t[0])))
        picked: list[tuple[int, int, str]] = []
        last_end = -1
        for s, e, p in cands:
            if s >= last_end:
                picked.append((s, e, p))
                last_end = e
        return picked


MENTIONS_SCHEMA = (
    "url string, surface string, label string, canonical string, "
    "start int, end int"
)


def _all_word_surfaces(surfaces) -> bool:
    """True when every gazetteer surface is a single alphanumeric word.

    For such a gazetteer the Aho-Corasick longest-leftmost word-boundary
    semantics reduce EXACTLY to "maximal alnum runs of the text that equal
    a surface": an all-alnum surface occurrence with non-alnum (or
    text-edge) neighbors IS a maximal run, maximal runs are disjoint (so
    the greedy overlap filter keeps all of them), and no other candidates
    exist.  That unlocks a C-speed regex scan (``[^\\W_]+`` matches
    precisely ``str.isalnum()`` runs per the ``\\w`` definition) instead of
    the per-character Python automaton loop — same matches, same order."""
    return all(s and all(ch.isalnum() for ch in s) for s in surfaces)


def _make_matcher(surfaces):
    """Returns find(text) -> list[(start, end, surface)] — the word-regex
    fast path when it is provably equivalent, else the automaton."""
    if _all_word_surfaces(surfaces):
        gaz_set = set(surfaces)
        word_re = re.compile(r"[^\W_]+")

        def find(text: str):
            return [
                (m.start(), m.end(), m.group())
                for m in word_re.finditer(text)
                if m.group() in gaz_set
            ]

        return find
    return AhoCorasick(surfaces).find


def detect_mentions(
    pages: DataFrame,
    gazetteer: Mapping[str, tuple[str, str]],
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Flat mentions table: one row per (doc, matched surface occurrence).

    ``gazetteer``: surface → (label, canonical_id); captured in the task
    closure (broadcast by Spark with the serialized function, built into an
    automaton once per partition).
    """
    gaz = dict(gazetteer)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        find = _make_matcher(list(gaz.keys()))
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for s, e, surface in find(text):
                    label, canon = gaz[surface]
                    rows.append((doc_id, surface, label, canon, s, e))
            yield pd.DataFrame(
                rows,
                columns=["url", "surface", "label", "canonical", "start", "end"],
            )

    return pages.select(id_col, text_col).mapInPandas(run, schema=MENTIONS_SCHEMA)


MENTION_COUNTS_SCHEMA = "url string, canonical string, n long, first int"


def detect_mention_counts(
    pages: DataFrame,
    gazetteer: Mapping[str, tuple[str, str]],
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Per-(row, canonical) mention PARTIALS: (url, canonical, n, first).

    The aggregate-before-shuffle form of ``detect_mentions`` (guide §2.3):
    downstream consumers that only need per-(doc, concept) counts and the
    first offset — the flagship KG shape — would otherwise ship one Arrow
    row per OCCURRENCE across the Python boundary and shuffle it (measured
    ~23× the rows of the aggregated result on the driver corpus).  The
    in-kernel fold per input row is exact: the final
    ``groupBy(doc, canonical).agg(sum(n), min(first))`` over these
    partials equals the occurrence-level ``count(*)``/``min(start)``
    bit-for-bit, including when one doc id spans several input rows."""
    gaz = dict(gazetteer)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        find = _make_matcher(list(gaz.keys()))
        for pdf in batches:
            urls, canons, ns, firsts = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                agg: dict[str, list[int]] = {}
                for s, _e, surface in find(text):
                    canon = gaz[surface][1]
                    slot = agg.get(canon)
                    if slot is None:
                        agg[canon] = [1, s]
                    else:
                        slot[0] += 1
                        if s < slot[1]:
                            slot[1] = s
                for canon, (n, first) in agg.items():
                    urls.append(doc_id)
                    canons.append(canon)
                    ns.append(n)
                    firsts.append(first)
            yield pd.DataFrame(
                {"url": urls, "canonical": canons, "n": ns, "first": firsts}
            )

    return pages.select(id_col, text_col).mapInPandas(
        run, schema=MENTION_COUNTS_SCHEMA
    )


TRIPLES_SCHEMA = (
    "url string, subj_surface string, pred string, obj_surface string, "
    "char_start int"
)


def build_relation_patterns(
    templates: Iterable[tuple[str, str, str, str]],
    surfaces_by_label: Mapping[str, list[str]],
) -> list[tuple[str, str]]:
    """Compile (pred, template) pairs into regexes with named s/o groups.

    Template example: ``"{s} works for {o}."`` with s drawn from Person
    surfaces and o from Organization surfaces.  Alternations are sorted
    longest-first so prefixes never shadow full names.
    """

    def alt(label: str) -> str:
        surfaces = sorted(surfaces_by_label[label], key=len, reverse=True)
        return "(?:" + "|".join(re.escape(s) for s in surfaces) + ")"

    out = []
    for pred, s_label, o_label, tmpl in templates:
        pattern = re.escape(tmpl)
        pattern = pattern.replace(re.escape("{s}"), f"(?P<s>{alt(s_label)})")
        pattern = pattern.replace(re.escape("{o}"), f"(?P<o>{alt(o_label)})")
        out.append((pred, pattern))
    return out


def extract_triples(
    pages: DataFrame,
    patterns: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """(subj, pred, obj) triples with provenance (url, char offset)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        compiled = [(pred, re.compile(pat)) for pred, pat in patterns]
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for pred, rx in compiled:
                    for m in rx.finditer(text):
                        rows.append(
                            (doc_id, m.group("s"), pred, m.group("o"), m.start())
                        )
            yield pd.DataFrame(
                rows,
                columns=["url", "subj_surface", "pred", "obj_surface", "char_start"],
            )

    return pages.select(id_col, text_col).mapInPandas(run, schema=TRIPLES_SCHEMA)

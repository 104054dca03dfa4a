"""Deterministic interleaved-span document generator.

Produces the input table mandated by BASELINE.json's input_hint
(``doc_id:string, spans:array<struct<kind,text,media_ref,offset>>``),
seeded and a pure function of the document index — so the SAME table
materializes at any scale, any partitioning, any cluster size. The
pathology mix follows FIXTURES.md §1 (each case cites the cleanup
behavior it exercises).

Scale design: generation runs distributed via ``spark.range(n) →
mapInPandas`` — no driver-side materialization, no collect; 10^12 rows
would generate exactly like 10^3, just on more partitions.
"""

import random
from typing import Any, Dict, Iterator, List, Tuple

import pandas as pd

from ..schema import INPUT_SCHEMA

DEFAULT_SEED = 42

_WORDS = (
    "the spectrum of cosmic rays measured at high energy shows features "
    "that require detailed modeling of both acceleration and propagation "
    "processes in galactic magnetic fields while recent observations "
    "suggest additional local sources contribute significantly to the "
    "observed flux and anisotropy patterns across many decades in energy"
).split()

_LIGATURE_WORDS = ("eﬀective", "ﬁnite", "ﬂux", "diﬃcult", "æther", "Œuvre")
_ACCENT_GARBLE = ("Schr\xa8\nodinger", "caf\xb4\ne", "Ang\xb0\nstrom", "na\xef")
_ABBREVS = ("Fig. 3", "Eqs. 4", "Sect. 2", "Refs. 7", "Prof. Smith", "Dr. Jones",
            "U.S.A. based", "e.g. here")
_BOILERPLATE = (
    "arXiv:1701.00001v1 [hep-ph] 3 Jan 2017",
    "this figure will be inserted by hand later",
    "This manuscript was prepared with the aas macros",
)
_JUNK = ("(cid:123)", "(cid:9)", "lllll", ".....", "*****")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _text_block(rng: random.Random, n_lines: int, pathology: bool) -> str:
    """A multi-line text block with optional pathological features."""
    lines: List[str] = []
    for _ in range(n_lines):
        roll = rng.random() if pathology else 1.0
        if roll < 0.08:  # hyphenated continuation (psv.py:111-124)
            lines.append(_sentence(rng, rng.randint(4, 9))[:-1] + "- ")
            lines.append(rng.choice(_WORDS) + " " + _sentence(rng, 4).lower())
        elif roll < 0.14:  # ligatures (fixunicode.py:26-61)
            lines.append(
                " ".join(rng.choice(_LIGATURE_WORDS) for _ in range(3))
                + " " + _sentence(rng, 5)
            )
        elif roll < 0.18:  # garbled accents (psv.py:285-309)
            lines.append(rng.choice(_ACCENT_GARBLE) + " " + _sentence(rng, 5))
        elif roll < 0.24:  # abbreviations (psv.py:151-167,184-193)
            lines.append(rng.choice(_ABBREVS) + " " + _sentence(rng, 6))
        elif roll < 0.28:  # boilerplate (psv.py:127-148)
            lines.append(rng.choice(_BOILERPLATE))
        elif roll < 0.31:  # digits line + affiliation pair (psv.py:143-146)
            lines.append(str(rng.randint(1000, 999999)))
            lines.append("University of Somewhere")
        elif roll < 0.35:  # junk repeats (fulltext.py:18)
            lines.append(_sentence(rng, 4) + " " + rng.choice(_JUNK) * 3)
        elif roll < 0.39:  # whitespace variety (psv.py:103-108)
            lines.append("col1\tcol2\tcol3  " + _sentence(rng, 3) + "\r")
        else:
            lines.append(_sentence(rng, rng.randint(5, 14)))
    return "\n".join(lines)


def _refs_block(rng: random.Random, n: int) -> str:
    entries = [
        f"[{k + 1}] A. Author{k}, J. Phys. {rng.randint(1, 99)}, "
        f"{rng.randint(100, 999)} ({rng.randint(1980, 2020)})."
        for k in range(n)
    ]
    return "References\n" + "\n".join(entries)


def make_doc(i: int, seed: int = DEFAULT_SEED) -> Tuple[str, List[Dict[str, Any]]]:
    """Generate document ``i`` — pure function of (i, seed)."""
    rng = random.Random(seed * 1_000_003 + i)

    # both arXiv id styles (store path handling store.py:111-128)
    doc_id = f"cs/{i:07d}" if i % 7 == 0 else f"{2001 + i % 24:04d}.{i:06d}"

    spans: List[Dict[str, Any]] = []
    offset = 0

    def add_text(text: str) -> None:
        nonlocal offset
        spans.append({"kind": "text", "text": text, "media_ref": None,
                      "offset": offset})
        offset += 1

    def add_media() -> None:
        nonlocal offset
        spans.append({"kind": "media", "text": None,
                      "media_ref": f"img://{doc_id}/{offset}", "offset": offset})
        offset += 1

    if i % 53 == 1:  # media-only document
        for _ in range(rng.randint(1, 4)):
            add_media()
        return doc_id, spans

    if i % 101 == 3:  # engineered quality-gate failure: one giant word
        add_text("x" * rng.randint(300, 2000))
        return doc_id, spans

    if i % 97 == 5:  # layout-retry path: merged-word runs
        merged = "".join(
            w.capitalize() for w in rng.choices(_WORDS, k=rng.randint(60, 120))
        )
        add_text(merged)
        if rng.random() < 0.5:
            add_media()
        return doc_id, spans

    # regular document: skewed size (median ~1k chars, rare ~1M-char giants)
    if i % 997 == 7:
        n_blocks = rng.randint(120, 200)  # giant straggler
        lines_per_block = rng.randint(40, 80)
    else:
        n_blocks = rng.randint(1, 6)
        lines_per_block = rng.randint(2, 10)

    if i % 3 == 0:
        add_text(_BOILERPLATE[0])  # arXiv stamp as leading span

    for b in range(n_blocks):
        add_text(_text_block(rng, lines_per_block, pathology=True))
        if rng.random() < 0.25:
            add_media()

    if i % 4 != 3:
        # trailing references; every ~29th doc gets an oversized block
        # that must NOT be stripped (psv.py:265-273)
        n_refs = lines_per_block * n_blocks * 3 if i % 29 == 11 else rng.randint(2, 8)
        add_text(_refs_block(rng, n_refs))

    # shuffle span order in the table — the pipeline must re-sort by
    # offset, never trust arrival order (I3)
    rng.shuffle(spans)
    return doc_id, spans


def generate_batch(indices: Iterator[int], seed: int = DEFAULT_SEED) -> pd.DataFrame:
    rows = [make_doc(i, seed) for i in indices]
    return pd.DataFrame({"doc_id": [r[0] for r in rows],
                         "spans": [r[1] for r in rows]})


def spans_table(spark, n_docs: int, seed: int = DEFAULT_SEED, parallelism: int | None = None):
    """Distributed deterministic generation: range → mapInPandas."""
    if parallelism is None:
        parallelism = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_batch(iter(pdf["id"].tolist()), seed)

    return (
        spark.range(0, n_docs, numPartitions=parallelism)
        .mapInPandas(gen, schema=INPUT_SCHEMA)
    )


def write_spans_parquet(spark, path: str, n_docs: int,
                        seed: int = DEFAULT_SEED) -> None:
    """Materialize the fixture table (bench/correctness input)."""
    spans_table(spark, n_docs, seed).write.mode("overwrite").parquet(path)

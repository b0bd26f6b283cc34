"""Benchmark decontamination — flag training documents that contain a
verbatim snippet of any held-out benchmark document (the CCNet /
GPT-3-style 40-char-substring contamination check).

Shape at 100 TB: the benchmark side is SMALL by construction (a fixed
eval suite — thousands of snippets, not a data-scale table), so it is
collected once, shipped once per worker (a single replace-on-new-ref
worker-cache slot), and the check is a broadcast map over the corpus —
no shuffle, fully streaming. Each snippet test is one vectorized
``str.contains(..., regex=False)`` pass (C-level substring search);
with a much larger snippet set the same stage would swap in one
compiled alternation / Aho-Corasick automaton per worker without
changing the dataflow.

Here the "benchmark" is derived deterministically from the corpus
itself (every ``doc_id % 97 == 0`` document donates characters
[10, 50) as its snippet) so the op is closed over the driver's
testdata and exactly reproducible in SQL: the oracle cross-joins the
same snippet set with ``position(snip IN text)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .util import tbl

BENCH_MOD = 97  #: doc_id % BENCH_MOD == 0 → benchmark member
SNIP_START = 10  #: 0-based char offset of the snippet
SNIP_LEN = 40
MIN_DOC_CHARS = SNIP_START + SNIP_LEN  #: donors must cover the window


#: hard bound on the collected benchmark side. The op's contract is a
#: SMALL fixed eval suite; the doc_id % 97 derivation used for the
#: self-contained oracle grows with the corpus, so refusing (rather
#: than silently truncating — which would diverge from the oracle) is
#: the honest behavior when the derived set stops being benchmark-
#: sized. A production deployment feeds a real external benchmark
#: table here instead.
MAX_SNIPPETS = 100_000


def benchmark_snippets(sf_dir: str) -> list[str]:
    """The small side: one 40-char snippet per benchmark document.
    Collected to the driver — bounded by the benchmark suite size
    (``MAX_SNIPPETS``), never by the corpus."""
    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        # pandas slicing is CHARACTER-based, exactly DuckDB's
        # substr(text, SNIP_START+1, SNIP_LEN) — byte slicing would
        # diverge on the corpus's CJK documents
        keep = (batch["doc_id"] % BENCH_MOD == 0) & (
            texts.str.len() >= MIN_DOC_CHARS
        )
        # always an ARROW table (typed even when empty): an empty
        # pandas object column trips Ray's block-size estimator, and
        # mixed pandas/arrow blocks from one operator draw schema
        # warnings downstream
        import pyarrow as pa

        sel = batch.loc[keep]
        return pa.table(
            {
                "doc_id": pa.array(
                    sel["doc_id"].to_numpy(dtype="int64"), pa.int64()
                ),
                "snip": pa.array(
                    texts.loc[keep]
                    .str.slice(SNIP_START, SNIP_START + SNIP_LEN)
                    .tolist(),
                    pa.string(),
                ),
            }
        )

    rows = ds.map_batches(pick, batch_format="pandas").take_all()
    if len(rows) > MAX_SNIPPETS:
        raise ValueError(
            f"derived benchmark set has {len(rows)} snippets "
            f"(> {MAX_SNIPPETS}); decontaminate() broadcasts the "
            "benchmark side and requires it to be eval-suite-sized — "
            "feed a real (small) benchmark table at this scale"
        )
    rows.sort(key=lambda r: r["doc_id"])
    return [r["snip"] for r in rows]


class ContaminationChecker:
    """Per-worker broadcast state: the snippet list fetched once from
    the object store (ray.put'd by the driver, not re-shipped per
    batch)."""

    def __init__(self, snips_ref) -> None:
        import ray

        self.ref = snips_ref
        self.snips = ray.get(snips_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        hits = np.zeros(len(texts), dtype=np.int64)
        for snip in self.snips:
            hits += texts.str.contains(snip, regex=False).to_numpy(
                dtype=np.int64
            )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_bench_hits": hits,
                "contaminated": hits > 0,
            }
        )


def decontaminate(sf_dir: str):
    """Per-document contamination verdict: how many benchmark snippets
    the document contains verbatim (duplicate snippets count once per
    donor, mirroring the SQL cross-join), and the boolean flag a
    filter stage would drop on. Non-trivial on the testdata because
    the documents table carries exact duplicates — a duplicate of a
    benchmark donor is contaminated without being a donor itself."""
    import ray

    snips_ref = ray.put(benchmark_snippets(sf_dir))
    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        # ONE worker-cache slot, replaced when the benchmark ref
        # changes — keying by ref would grow the cache per call
        # (the r2 LSH cache-leak lesson)
        from .util import _WORKER_CACHE

        inst = _WORKER_CACHE.get("contam-checker")
        if inst is None or inst.ref != snips_ref:
            inst = _WORKER_CACHE["contam-checker"] = ContaminationChecker(
                snips_ref
            )
        return inst(batch)

    return ds.map_batches(check, batch_format="pandas").sort("doc_id")

"""PII redaction over EXTRACTED turn text — the extract → scrub chain
every training-data pipeline runs after boilerplate removal.

The stage is a pure per-row vectorized regex map (three compiled
patterns, pandas ``str.count`` / ``str.replace`` — C-level RE loops,
no Python row iteration) appended to the flagship extraction pipeline,
so it streams: no shuffle, no materialization, and at 100 TB it scales
exactly like the extraction stage itself. Patterns are written in the
common RE2 ∩ Python-re dialect (no lookaround, no backreferences) so
the DuckDB oracle replays the identical replacements on the golden
text (parity spot-checked in tests/test_ops.py).

Replacement order is fixed (email → ip → phone); the placeholders
contain no digits or ``@`` so a replacement can never create a new
match for a later pattern. Counts are taken on the ORIGINAL text.
"""

from __future__ import annotations

import re

import pandas as pd

from ..pipeline import extract_ds, read_transcripts
from ..transcripts import transcripts_for
from .util import cached

#: RE2-compatible and Python-re-compatible (leftmost match identical:
#: greedy quantifiers only, no alternation whose branch order matters)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


class PiiScrubber:
    """Compiled-pattern batch scrubber (built once per worker via
    ``cached`` — the §2.7 per-worker-state pattern)."""

    def __init__(self) -> None:
        self.email = re.compile(EMAIL_RE)
        self.ip = re.compile(IP_RE)
        self.phone = re.compile(PHONE_RE)

    def scrub(self, texts: pd.Series) -> pd.Series:
        out = texts.str.replace(self.email, "<EMAIL>", regex=True)
        out = out.str.replace(self.ip, "<IP>", regex=True)
        return out.str.replace(self.phone, "<PHONE>", regex=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["extracted_text"].fillna("")
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "scrubbed_text": self.scrub(texts),
                "n_emails": texts.str.count(self.email).astype("int64"),
                "n_phones": texts.str.count(self.phone).astype("int64"),
                "n_ips": texts.str.count(self.ip).astype("int64"),
            }
        )


def pii_scrub(sf_dir: str):
    """Extract clean text from every turn, then redact emails / phone
    numbers / IPv4s, emitting per-turn PII counts plus the scrubbed
    text, keyed by (conv_id, turn_idx). UNORDERED output (README
    ordering contract — this is a derived per-turn op, not the
    extraction comparison surface; its trailing stable_order sort was
    a pure all-to-all presentation cost). Oracle: the identical
    ``regexp_replace`` chain over the generation-time golden text."""
    src = transcripts_for(sf_dir)
    ds = read_transcripts(src)
    out = extract_ds(ds, batch_size=512, emit_log=False, emit_lineage=False)
    return out.map_batches(
        lambda b: cached("pii-scrubber", PiiScrubber)(b),
        batch_format="pandas",
    )

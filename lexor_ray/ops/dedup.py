"""Deduplication operators over the ``documents`` table.

Five dedup families a training-data pipeline needs, each expressed
Ray-Data-first:

- exact: content hash → hash-partitioned groupby → first per group
- MinHash + LSH: shingle → minhash signature → band → bucket groupby
  → candidate pairs → exact-Jaccard verify
- SimHash: 64-bit signature, Hamming-distance candidates via 4-band
  exact-match buckets
- n-gram Jaccard: the verify kernel, also exposed directly
- embedding cosine near-dup: sign-LSH buckets over the embeddings
  table → within-bucket cosine verify

Signatures are computed vectorized per batch (numpy over tokenized
arrays); the only wide ops are the bucket groupbys, whose keys are
engineered to be small (band hashes), never raw text.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

from .util import tbl

# ---------------------------------------------------------------------------
# exact


def _hash64(texts: list[str]) -> np.ndarray:
    """Vectorized deterministic 64-bit content hash (pandas SipHash)."""
    return pd.util.hash_array(
        np.asarray([t or "" for t in texts], dtype=object)
    ).astype(np.uint64)


def exact_dedup(sf_dir: str):
    """Exact dedup: 64-bit content hash in ``map_batches`` (so the
    shuffle key is 8 bytes, not the document), hash groupby, keep the
    min doc_id as representative + the copy count."""
    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _hash64(batch.column("text").to_pylist())
        return pa.table(
            {"doc_id": batch["doc_id"], "h": pa.array(h, type=pa.uint64())}
        )

    from ray.data.aggregate import Count, Min

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )
    return out.drop_columns(["h"]).sort("doc_id")


# ---------------------------------------------------------------------------
# MinHash + LSH

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hashes (uint64) — hashed with pandas'
    deterministic vectorized SipHash (``pd.util.hash_array``), not a
    per-shingle Python digest (C-speed; same result on every worker)."""
    words = (text or "").split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(grams, dtype=object))


def _minhash_sig(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_sh, n_perm) permuted hashes — vectorized; uint64 wraparound
    # is intentional modular arithmetic
    with np.errstate(over="ignore"):
        vals = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


class MinHashSignatures:
    """Actor-pool stage: permutation params built once per actor
    (SURVEY.md §2.7 pattern), signatures per batch."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, bands: int = 16):
        self.a, self.b = _minhash_params(num_perm)
        self.k = shingle_k
        self.bands = bands
        self.rows = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, len(self.a)), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = _minhash_sig(_shingles(text, self.k), self.a, self.b)
        # vectorized FNV-1a fold over each band's rows → one uint64
        # key per (doc, band); no per-doc Python hashing.
        prime = np.uint64(1099511628211)
        band_keys = np.empty((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for bi in range(self.bands):
                h = np.full(n, 14695981039346656037, dtype=np.uint64)
                for r in range(self.rows):
                    h = (h ^ sigs[:, bi * self.rows + r]) * prime
                band_keys[:, bi] = h
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n)
                ),
                "band_hash": pa.array(band_keys.reshape(-1), type=pa.uint64()),
            }
        )


def _minhash_batches(batch, num_perm: int, bands: int):
    from .util import cached

    fn = cached(
        ("minhash", num_perm, bands),
        lambda: MinHashSignatures(num_perm=num_perm, bands=bands),
    )
    return fn(batch)


def minhash_lsh_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16):
    """MinHash-LSH candidate pairs: signature stage (actor pool) →
    explode to (band_id, band_hash, doc_id) → bucket groupby → pairs.
    Returns unique candidate (a, b) pairs with a < b."""
    import functools

    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = ds.map_batches(
        functools.partial(_minhash_batches, num_perm=num_perm, bands=bands),
        batch_format="pyarrow",
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": "int64", "b": "int64"})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    from .util import coarse_dedup, coarse_grouped

    cand = coarse_grouped(
        sigs, ["band_id", "band_hash"], pairs, min_group_size=2
    )
    # dedup pairs found in multiple bands (vectorized coarse dedup)
    return coarse_dedup(cand, ["a", "b"]).sort(["a", "b"])


def ngram_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard similarity for every LSH candidate pair (no
    threshold) — the verify kernel exposed directly as an operator."""
    import ray

    cand = minhash_lsh_candidates(sf_dir).to_pandas()
    if len(cand) == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    docs = tbl(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    texts_ref = ray.put(dict(zip(docs["doc_id"], docs["text"])))
    import ray.data

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(texts_ref)
        batch["jaccard"] = [
            round(jaccard(t.get(a, ""), t.get(b, "")), 4)
            for a, b in zip(batch["a"], batch["b"])
        ]
        return batch

    return (
        ray.data.from_pandas(cand)
        .map_batches(score, batch_format="pandas")
        .sort(["a", "b"])
    )


def jaccard(a_text: str, b_text: str, k: int = 3) -> float:
    sa, sb = set(_shingles(a_text, k).tolist()), set(_shingles(b_text, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(sf_dir: str, threshold: float = 0.8):
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify
    (broadcast the candidate docs' texts — the candidate set is small
    relative to the corpus; at larger scale this becomes a bucketed
    join on doc_id)."""
    import ray

    cand = minhash_lsh_candidates(sf_dir).to_pandas()
    if len(cand) == 0:
        return pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
    need = set(cand["a"].tolist()) | set(cand["b"].tolist())
    docs = tbl(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    texts = dict(
        zip(
            docs.loc[docs["doc_id"].isin(need), "doc_id"],
            docs.loc[docs["doc_id"].isin(need), "text"],
        )
    )
    texts_ref = ray.put(texts)
    cand_ds = ray.data.from_pandas(cand)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(texts_ref)
        batch["jaccard"] = [
            round(jaccard(t.get(a, ""), t.get(b, "")), 4)
            for a, b in zip(batch["a"], batch["b"])
        ]
        return batch[batch["jaccard"] >= threshold]

    import ray.data

    return cand_ds.map_batches(verify, batch_format="pandas").sort(["a", "b"])


def dedup_clusters(sf_dir: str, threshold: float = 0.8, max_rounds: int = 10):
    """Near-duplicate clusters: connected components over the verified
    MinHash pair graph via iterative min-label propagation.

    Each round: broadcast the current (node → label) map (it covers
    only nodes that appear in some near-dup pair — a small fraction of
    the corpus by construction of LSH+verify), recompute per-edge
    label minima in ``map_batches``, reduce with a per-node groupby
    min, stop when labels are stable. ``max_rounds`` bounds the
    longest chain; the guide's alternative (driver union-find) is
    valid exactly because this node set is small — the broadcast
    variant keeps the reduction distributed anyway.

    Returns (doc_id, cluster_id) for every doc in a cluster, where
    cluster_id is the minimum doc_id of its component.
    """
    pairs = minhash_dedup(sf_dir, threshold=threshold)
    return cluster_pairs(pairs.to_pandas(), max_rounds=max_rounds)


def cluster_pairs(pdf: pd.DataFrame, max_rounds: int = 10) -> pa.Table:
    """Connected components over an (a, b) pair DataFrame — the
    engine behind :func:`dedup_clusters`, separated for testability."""
    import ray

    if len(pdf) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "cluster_id": pa.array([], type=pa.int64()),
            }
        )
    import ray.data

    edges = ray.data.from_pandas(
        pd.concat(
            [
                pdf[["a", "b"]].rename(columns={"a": "src", "b": "dst"}),
                pdf[["a", "b"]].rename(columns={"b": "src", "a": "dst"}),
            ],
            ignore_index=True,
        )
    )
    nodes = np.unique(np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()]))
    labels = {int(n): int(n) for n in nodes}
    converged = False
    for _ in range(max_rounds):
        lab_ref = ray.put(labels)

        def relabel(batch: pd.DataFrame) -> pd.DataFrame:
            lab = ray.get(lab_ref)
            cand = np.minimum(
                batch["src"].map(lab).to_numpy(), batch["dst"].map(lab).to_numpy()
            )
            return pd.DataFrame({"node": batch["dst"], "label": cand})

        from ray.data.aggregate import Min

        new = (
            edges.map_batches(relabel, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .to_pandas()
        )
        new_labels = dict(labels)
        for n, l in zip(new["node"], new["label"]):
            if l < new_labels[int(n)]:
                new_labels[int(n)] = int(l)
        if new_labels == labels:
            converged = True
            break
        labels = new_labels
    if not converged:
        # a component with diameter > max_rounds did not finish — the
        # node set is small by LSH construction, so finish exactly with
        # driver-side union-find over the pair list (guide fallback)
        parent = dict(labels)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["a"], pdf["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        labels = {n: find(n) for n in parent}
    out = pd.DataFrame(
        {"doc_id": list(labels.keys()), "cluster_id": list(labels.values())}
    ).sort_values("doc_id")
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# SimHash


class SimHashSignatures:
    """64-bit SimHash per document; vectorized bit-vote accumulation."""

    def __init__(self) -> None:
        self.bits = np.arange(64, dtype=np.uint64)

    def sim64(self, text: str) -> int:
        words = (text or "").split()
        if not words:
            return 0
        hs = pd.util.hash_array(np.asarray(words, dtype=object))
        bits = (hs[:, None] >> self.bits[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0) * 2 - len(words)
        return int(((votes > 0).astype(np.uint64) << self.bits).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sig = np.array([self.sim64(t) for t in texts], dtype=np.uint64)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sig, type=pa.uint64())}
        )


def _simhash_batches(batch):
    from .util import cached

    return cached("simhash", SimHashSignatures)(batch)


def simhash_candidates(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup candidates: split the 64-bit signature into 4
    16-bit bands; any pair within Hamming distance 3 shares at least
    one exact band (pigeonhole) → bucket groupby per band, verify
    Hamming distance within buckets."""
    ds = tbl(sf_dir, "documents", columns=["doc_id", "text"])
    sigs = ds.map_batches(_simhash_batches, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(sig)
        doc = np.repeat(ids, 4)
        band = np.tile(np.arange(4, dtype=np.int32), n)
        key = np.empty(4 * n, dtype=np.uint64)
        for b in range(4):
            key[b::4] = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "band_id": pa.array(band),
                "band_key": pa.array(key, type=pa.uint64()),
                "simhash": pa.array(np.repeat(sig, 4), type=pa.uint64()),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame(
                {"a": [], "b": [], "hamming": []}
            ).astype({"a": "int64", "b": "int64", "hamming": "int64"})
        ids = g["doc_id"].to_numpy()
        sig = g["simhash"].to_numpy().astype(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(sig[i]) ^ int(sig[j])).count("1") for i, j in zip(ii, jj)]
        )
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "hamming": ham[keep]}
        )

    from .util import coarse_dedup, coarse_grouped

    cand = coarse_grouped(
        exploded, ["band_id", "band_key"], pairs, min_group_size=2
    )
    return coarse_dedup(cand, ["a", "b"]).sort(["a", "b"])


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_neardup(
    sf_dir: str, threshold: float = 0.95, n_planes: int = 12, ds=None
):
    """Near-duplicate vectors: sign-LSH (random hyperplanes) buckets →
    within-bucket exact cosine verify. The bucket groupby is the only
    shuffle; the hyperplane matrix is built per actor from a fixed
    seed (no broadcast needed — determinism IS the share). ``ds``
    overrides the input Dataset (tests plant known near-dups)."""
    if ds is None:
        ds = tbl(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    class Bucket:
        def __init__(self) -> None:
            rng = np.random.default_rng(13)
            self.planes = rng.standard_normal((64, n_planes)).astype(np.float32)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
            proj = emb @ self.planes
            bits = (proj > 0).astype(np.uint32)
            key = np.zeros(len(emb), dtype=np.uint32)
            for b in range(n_planes):
                key |= bits[:, b] << b
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "bucket": pa.array(key, type=pa.uint32()),
                    "embedding": batch["embedding"],
                }
            )

    from .util import cached
    import functools

    def bucket_batches(batch, _n=n_planes):
        return cached(("neardup-bucket", _n), Bucket)(batch)

    bucketed = ds.map_batches(bucket_batches, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": "int64", "b": "int64", "cosine": "float64"}
            )
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        emb = np.asarray(g["embedding"].tolist(), dtype=np.float64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        emb = emb / norm
        sim = emb @ emb.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sim[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ii][keep],
                "b": ids[jj][keep],
                "cosine": np.round(sim[ii, jj][keep], 4),
            }
        )

    from .util import coarse_dedup

    cand = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    return coarse_dedup(cand, ["a", "b"]).sort(["a", "b"])

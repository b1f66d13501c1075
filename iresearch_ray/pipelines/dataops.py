"""Training-data pipeline operators (SURVEY §2.9 + task brief).

Large-scale training-data curation ops over document / embedding tables,
expressed Ray-Data-first: every op is a composition of
``map_batches(batch_format="pyarrow")`` narrow stages plus at most ONE keyed
shuffle (``groupby``), with small sides broadcast via ``ray.put`` and read
inside actor ``__init__`` — never re-shipped per batch.

Inventory
---------
exact-dedup          hash(text) groupby → keep min key        (1 shuffle)
fingerprints         md5 + 64-bit rolling (Rabin-Karp) hash   (narrow)
token_stats          token / distinct counts, char lens       (narrow, vectorized)
quality_score        length + stopword + distinct-ratio heuristic (narrow)
lang_id              marker-set n-gram heuristic, pinned      (narrow)
ngram_jaccard_pairs  EXACT word-shingle Jaccard ≥ t pairs     (shingle shuffle)
minhash_lsh_pairs    MinHash → LSH band buckets → verified pairs (band shuffle)
simhash64            64-bit SimHash + hamming-bucket near-dup (chunk shuffle)
embedding ops        brute-force cosine top-k (broadcast queries),
                     cosine near-dup pairs, LSH-bucketed scale path

Scale notes are inline per op.  All text ops assume the pinned tokenizer
(SURVEY §2.1.1): documents are space-joined lowercase tokens, so
``split(' ')`` here equals the engine tokenizer and DuckDB
``string_split(text, ' ')`` — which is what makes the SQL oracles in
``__ray_entry__.py`` exact.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# tokens → exploded numpy views (shared vectorized plumbing)
# ---------------------------------------------------------------------------


def round_half_away(x, decimals: int = 4):
    """Round half away from zero — matches SQL ROUND() (numpy's np.round is
    half-even, which diverges from the DuckDB oracles on exact .5 ties,
    e.g. 0.65625 → 0.6563 not 0.6562)."""
    x = np.asarray(x, dtype=np.float64)
    f = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * f + 0.5) / f, x)


def _explode_tokens(texts: pa.ChunkedArray | pa.Array):
    """Vectorized token explode: returns (flat_tokens: pa.Array,
    parent_row: np.int64[], n_tokens_per_row: np.int64[])."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    split = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    n_tok = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, parent, n_tok


def _unique_per_row(flat: pa.Array, parent: np.ndarray, n_rows: int) -> np.ndarray:
    """Distinct-token count per row, vectorized: dictionary-encode the flat
    token array, unique over (row, code) pairs, bincount rows."""
    if len(flat) == 0:
        return np.zeros(n_rows, dtype=np.int64)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    pair = parent * (codes.max() + 1) + codes
    uniq = np.unique(pair)
    rows = uniq // (codes.max() + 1)
    return np.bincount(rows, minlength=n_rows).astype(np.int64)


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------

_ROLL_BASE = 1099511628211  # FNV prime as Rabin base
_ROLL_MASK = 0xFFFFFFFFFFFFFFFF


def md5_hex(texts: list[str | None]) -> list[str | None]:
    return [None if t is None else hashlib.md5(t.encode()).hexdigest() for t in texts]


def rolling_fingerprint(tokens: list[str]) -> int:
    """64-bit polynomial rolling hash over the token sequence (document
    fingerprint; order-sensitive, unlike a bag-of-words hash)."""
    h = 14695981039346656037
    for t in tokens:
        th = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        h = ((h * _ROLL_BASE) ^ th) & _ROLL_MASK
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    md5s = md5_hex(texts)
    rolls = [rolling_fingerprint(t.split(" ")) if t else 0 for t in texts]
    return batch.append_column("md5", pa.array(md5s, pa.string())).append_column(
        "fingerprint64", pa.array(rolls, pa.uint64())
    )


def fingerprints(ds, text_col: str = "text"):
    """doc → (…, md5, fingerprint64).  Narrow; no shuffle."""
    return ds.map_batches(lambda b: fingerprint_batch(b, text_col), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds, key_col: str = "doc_id", text_col: str = "text"):
    """Exact text dedup: fingerprint (narrow) → groupby(fingerprint) →
    keep the row with the minimum key per group ("first" under the stable
    key order).  ONE hash shuffle keyed by md5 — uniform by construction
    (cryptographic hash), so no skew/salting needed even at 100 TB.
    Returns survivors with original columns."""

    def add_fp(b: pa.Table) -> pa.Table:
        return b.append_column("__fp", pa.array(md5_hex(b[text_col].to_pylist()), pa.string()))

    def keep_first(g: pa.Table) -> pa.Table:
        i = pc.index(pc.equal(g[key_col], pc.min(g[key_col])), True).as_py()
        return g.slice(i, 1).drop_columns(["__fp"])

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("__fp")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# token stats / quality / language id  (all narrow + fully vectorized)
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it")

# pinned marker sets for the lang-id heuristic (deterministic, mirrored in
# the SQL oracle; tie-break = alphabetical language code)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}


def token_stats_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    flat, parent, n_tok = _explode_tokens(batch[text_col])
    n_rows = batch.num_rows
    n_unique = _unique_per_row(flat, parent, n_rows)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    char_sum = np.bincount(parent, weights=tok_lens, minlength=n_rows).astype(np.int64)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok),
            "n_unique": pa.array(n_unique),
            "token_chars": pa.array(char_sum),
        }
    )


def token_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda b: token_stats_batch(b, text_col, id_col), batch_format="pyarrow")


def quality_score_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Pinned quality heuristic (documented in the SQL oracle too):
    distinct_ratio = n_unique/n_tokens; stopword_ratio = stop/n_tokens;
    mean_token_len = token_chars/n_tokens;
    score = round(0.5*distinct_ratio + 0.3*(1-stopword_ratio)
                  + 0.2*min(n_tokens,64)/64, 4)."""
    flat, parent, n_tok = _explode_tokens(batch[text_col])
    n_rows = batch.num_rows
    n_unique = _unique_per_row(flat, parent, n_rows)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    stop_cnt = np.bincount(parent, weights=is_stop.astype(np.float64), minlength=n_rows)
    nt = np.maximum(n_tok, 1).astype(np.float64)
    distinct_ratio = n_unique / nt
    stop_ratio = stop_cnt / nt
    score = 0.5 * distinct_ratio + 0.3 * (1.0 - stop_ratio) + 0.2 * np.minimum(n_tok, 64) / 64.0
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok),
            "distinct_ratio": pa.array(round_half_away(distinct_ratio, 4)),
            "stopword_ratio": pa.array(round_half_away(stop_ratio, 4)),
            "quality": pa.array(round_half_away(score, 4)),
        }
    )


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda b: quality_score_batch(b, text_col, id_col), batch_format="pyarrow")


def lang_id_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Marker-set language scoring: count tokens in each language's marker
    set; predict the argmax (ties → alphabetically first language; all-zero →
    'und').  Deterministic and SQL-mirrored."""
    flat, parent, _ = _explode_tokens(batch[text_col])
    n_rows = batch.num_rows
    langs = sorted(LANG_MARKERS)
    counts = np.zeros((n_rows, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        hit = pc.is_in(flat, value_set=pa.array(LANG_MARKERS[lang])).to_numpy(zero_copy_only=False)
        counts[:, j] = np.bincount(parent, weights=hit.astype(np.float64), minlength=n_rows)
    best = np.argmax(counts, axis=1)  # first max → alphabetical tie-break
    pred = np.array(langs, dtype=object)[best]
    pred[counts.max(axis=1) == 0] = "und"
    out = {id_col: batch[id_col], "pred_lang": pa.array(list(pred), pa.string())}
    for j, lang in enumerate(langs):
        out[f"score_{lang}"] = pa.array(counts[:, j])
    return pa.table(out)


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.map_batches(lambda b: lang_id_batch(b, text_col, id_col), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# word-shingle machinery (shared by jaccard / minhash)
# ---------------------------------------------------------------------------


def _shingle_hashes(tokens: list[str], n: int) -> np.ndarray:
    """Distinct 64-bit hashes of word n-gram shingles (md5-derived so the
    value is library-stable)."""
    if len(tokens) < n:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    hs = {int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in joined}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def shingle_explode(ds, n: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """doc → (id, shingle_hash) distinct pairs + per-doc shingle count."""

    def explode(b: pa.Table) -> pa.Table:
        ids, sh = [], []
        for i, t in enumerate(b[text_col].to_pylist()):
            h = _shingle_hashes((t or "").split(" "), n)
            sh.append(h)
            ids.append(np.full(len(h), b[id_col][i].as_py(), dtype=np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(ids) if ids else np.array([], np.int64)),
                "shingle": pa.array(np.concatenate(sh) if sh else np.array([], np.uint64)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_shingle_cap: int = 10_000,
    combine: str = "broadcast",
):
    """EXACT n-gram-shingle Jaccard near-dup pairs (a, b, jaccard ≥ t), a < b.

    Plan: explode distinct shingles (narrow) → groupby(shingle) emits candidate
    pairs sharing a shingle with multiplicity (ONE shuffle, keyed by shingle
    hash) → groupby(pair) counts |A∩B| → jaccard from broadcast per-doc
    shingle counts.

    Scale: per-doc shingle-count map is broadcast (ray.put) — fine while the
    doc-count side table fits workers (8 B/doc); beyond that swap the final
    combine for a hash join on id.  Shingle groups larger than
    ``hot_shingle_cap`` would emit O(cap²) pairs; they are dropped with a
    warning (a shingle shared by >cap docs carries ~zero Jaccard signal).
    """
    import ray

    pairs_src = shingle_explode(ds, n, text_col, id_col)

    sizes_ds = pairs_src.groupby(id_col).count()
    if combine == "broadcast":
        # per-doc distinct shingle counts (small side): driver collect +
        # ray.put once — right while the id→count table fits worker heaps
        sizes_tbl = sizes_ds.to_pandas()
        sizes = dict(
            zip(sizes_tbl[id_col].astype(np.int64), sizes_tbl["count()"].astype(np.int64))
        )
        sizes_ref = ray.put(sizes)
    else:
        sizes_ref = None  # "join" scale path below

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        if len(ids) < 2 or len(ids) > hot_shingle_cap:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ia]), "b": pa.array(ids[ib])})

    common = (
        pairs_src.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    if combine == "join":
        # scale path: hash-join the per-doc sizes instead of broadcasting —
        # works when the doc-count table exceeds worker heaps (100 TB regime)
        sz_a = sizes_ds.map_batches(
            lambda t: t.rename_columns(["a", "sz_a"]), batch_format="pyarrow"
        )
        sz_b = sizes_ds.map_batches(
            lambda t: t.rename_columns(["b", "sz_b"]), batch_format="pyarrow"
        )
        nparts = 8
        joined = common.join(sz_a, "inner", nparts, on=("a",)).join(
            sz_b, "inner", nparts, on=("b",)
        )

        def jac_join(b: pa.Table) -> pa.Table:
            inter = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
            sa = b["sz_a"].to_numpy(zero_copy_only=False).astype(np.float64)
            sb = b["sz_b"].to_numpy(zero_copy_only=False).astype(np.float64)
            j = inter / (sa + sb - inter)
            keep = j >= threshold
            return pa.table(
                {
                    "a": b["a"].filter(pa.array(keep)),
                    "b": b["b"].filter(pa.array(keep)),
                    "jaccard": pa.array(round_half_away(j[keep], 4)),
                }
            )

        return joined.map_batches(jac_join, batch_format="pyarrow")

    def to_jaccard(b: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        inter = b["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
        sa = np.array([sz[x] for x in a], dtype=np.float64)
        sb = np.array([sz[x] for x in bb], dtype=np.float64)
        j = inter / (sa + sb - inter)
        keep = j >= threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(bb[keep]),
                "jaccard": pa.array(round_half_away(j[keep], 4)),
            }
        )

    return common.map_batches(to_jaccard, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


@dataclass
class MinHashCfg:
    num_perm: int = 128
    bands: int = 32  # rows per band = num_perm // bands
    shingle_n: int = 3
    seed: int = 42
    # (a, b) affine perm parameters, derived deterministically from seed
    _ab: np.ndarray = field(default=None, repr=False)

    def perms(self) -> np.ndarray:
        if self._ab is None:
            rng = np.random.default_rng(self.seed)
            a = rng.integers(1, int(_MERSENNE), self.num_perm, dtype=np.uint64)
            b = rng.integers(0, int(_MERSENNE), self.num_perm, dtype=np.uint64)
            object.__setattr__(self, "_ab", np.stack([a, b]))
        return self._ab


def minhash_signature(shingles: np.ndarray, cfg: MinHashCfg) -> np.ndarray:
    """(num_perm,) uint64 signature — vectorized (num_perm × n_shingles)."""
    if len(shingles) == 0:
        return np.full(cfg.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    ab = cfg.perms()
    # (P, S): (a*h + b) mod M  — uint64 wrap then mask to 61 bits is fine for
    # min-comparison purposes (universal-enough family, deterministic)
    vals = (ab[0][:, None] * shingles[None, :] + ab[1][:, None]) & _MERSENNE
    return vals.min(axis=1)


def minhash_lsh_pairs(
    ds,
    cfg: MinHashCfg | None = None,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """MinHash → LSH banding → candidate pairs → EXACT Jaccard verify ≥ t.

    Plan: narrow signature stage → explode (band_id, band_hash) → groupby
    band bucket (ONE shuffle) → candidate pairs → verify with true shingle
    sets (broadcast small side, same scale note as ngram_jaccard_pairs).
    Output (a, b, jaccard); approximate RECALL (LSH may miss pairs), exact
    PRECISION (verified).
    """
    import ray

    cfg = cfg or MinHashCfg()
    rows_per_band = cfg.num_perm // cfg.bands

    def signatures(b: pa.Table) -> pa.Table:
        out_id, band_ids, band_hash = [], [], []
        for i, t in enumerate(b[text_col].to_pylist()):
            sh = _shingle_hashes((t or "").split(" "), cfg.shingle_n)
            sig = minhash_signature(sh, cfg)
            did = b[id_col][i].as_py()
            for band in range(cfg.bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                # deterministic across processes (builtin hash() is salted)
                h = int.from_bytes(
                    hashlib.md5(band.to_bytes(4, "big") + chunk.tobytes()).digest()[:8], "big"
                ) & 0x7FFFFFFFFFFFFFFF
                out_id.append(did)
                band_ids.append(band)
                band_hash.append(h)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "bucket": pa.array(band_hash, pa.int64()),
            }
        )

    # broadcast true shingle sets for verification (small side)
    shingle_sets: dict[int, np.ndarray] = {}
    for b in shingle_explode(ds, cfg.shingle_n, text_col, id_col).iter_batches(batch_format="pyarrow"):
        ids = b[id_col].to_numpy(zero_copy_only=False)
        sh = b["shingle"].to_numpy(zero_copy_only=False)
        for d in np.unique(ids):
            cur = sh[ids == d]
            shingle_sets[int(d)] = (
                np.union1d(shingle_sets[int(d)], cur) if int(d) in shingle_sets else np.sort(cur)
            )
    sets_ref = ray.put(shingle_sets)

    def emit_pairs(g: pa.Table) -> pa.Table:
        ids = np.unique(g[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        if len(ids) < 2 or len(ids) > 10_000:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(len(ids), k=1)
        return pa.table({"a": pa.array(ids[ia]), "b": pa.array(ids[ib])})

    cand = (
        ds.map_batches(signatures, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )

    def verify(b: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, bb):
            sx, sy = ss[int(x)], ss[int(y)]
            inter = len(np.intersect1d(sx, sy, assume_unique=True))
            j = inter / (len(sx) + len(sy) - inter)
            if j >= threshold:
                out_a.append(int(x))
                out_b.append(int(y))
                out_j.append(float(round_half_away(j, 4)))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# near-dup clustering + survivor selection
# ---------------------------------------------------------------------------


def cluster_pairs(pairs, id_col: str = "doc_id") -> dict[int, int]:
    """Union-find over near-dup pairs → {doc_id: cluster_root}.  The pair
    set is tiny relative to the corpus by construction (already thresholded),
    so this runs on the driver even at 100 TB corpus scale — the heavy work
    (finding the pairs) stayed distributed."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def near_dedup(
    ds,
    threshold: float = 0.5,
    cfg: MinHashCfg | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Near-duplicate removal keeping the BEST doc per cluster: MinHash+LSH
    verified pairs → driver union-find clusters → per cluster keep the
    highest quality_score (ties → lowest id); singletons survive untouched.
    Returns the survivor Dataset (original columns)."""
    import ray

    pairs_df = minhash_lsh_pairs(ds, cfg=cfg, threshold=threshold,
                                 text_col=text_col, id_col=id_col).to_pandas()
    roots = cluster_pairs(zip(pairs_df["a"], pairs_df["b"]), id_col)
    if not roots:
        return ds

    # pick the survivor of each cluster by (quality desc, id asc)
    member_ids = np.array(sorted(roots), dtype=np.int64)

    def quality_of_members(b: pa.Table) -> pa.Table:
        keep = np.isin(b[id_col].to_numpy(zero_copy_only=False), member_ids)
        sub = b.filter(pa.array(keep))
        if sub.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "quality": pa.array([], pa.float64())})
        q = quality_score_batch(sub, text_col, id_col)
        return q.select([id_col, "quality"])

    qdf = ds.map_batches(quality_of_members, batch_format="pyarrow").to_pandas()
    best: dict[int, tuple] = {}
    for did, qual in zip(qdf[id_col], qdf["quality"]):
        r = roots[int(did)]
        cand = (-float(qual), int(did))
        if r not in best or cand < best[r]:
            best[r] = cand
    survivors = {did for _, did in best.values()}
    losers = np.array(sorted(set(roots) - survivors), dtype=np.int64)
    losers_ref = ray.put(losers)

    def drop_losers(b: pa.Table) -> pa.Table:
        ls = ray.get(losers_ref)
        keep = ~np.isin(b[id_col].to_numpy(zero_copy_only=False), ls)
        return b.filter(pa.array(keep))

    return ds.map_batches(drop_losers, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over tf-weighted md5 token hashes."""
    if not tokens:
        return 0
    uniq, tf = np.unique(np.array(tokens, dtype=object), return_counts=True)
    bits = np.zeros(64, dtype=np.float64)
    for tok, w in zip(uniq, tf):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        v = np.array([(h >> i) & 1 for i in range(64)], dtype=np.float64)
        bits += w * (2 * v - 1)
    out = 0
    for i in range(64):
        if bits[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    hs = [simhash64((t or "").split(" ")) for t in batch[text_col].to_pylist()]
    return pa.table({id_col: batch[id_col], "simhash": pa.array(hs, pa.uint64())})


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id"):
    """Near-dup pairs with hamming(simhash) ≤ d via the pigeonhole LSH:
    split 64 bits into d+1 chunks; any pair within d differs in ≤ d chunks so
    it collides on ≥ 1 chunk → groupby (chunk_idx, chunk_value) buckets (ONE
    shuffle), verify hamming inside buckets, dedupe pairs."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks

    def explode_chunks(b: pa.Table) -> pa.Table:
        sh = simhash_batch(b, text_col, id_col)
        ids = sh[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = sh["simhash"].to_numpy(zero_copy_only=False)
        out_id, out_c, out_v, out_h = [], [], [], []
        for c in range(n_chunks):
            v = (h >> np.uint64(c * chunk_bits)) & np.uint64((1 << chunk_bits) - 1)
            out_id.extend(ids.tolist())
            out_c.extend([c] * len(ids))
            out_v.extend(v.tolist())
            out_h.extend(h.tolist())
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk": pa.array(out_c, pa.int32()),
                "val": pa.array(out_v, pa.uint64()),
                "simhash": pa.array(out_h, pa.uint64()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = g["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        ids, hs = ids[keep], hs[keep]
        if len(ids) < 2 or len(ids) > 10_000:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()), "hamming": pa.array([], pa.int64())}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        ok = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(ids[ia][ok]),
                "b": pa.array(ids[ib][ok]),
                "hamming": pa.array(ham[ok]),
            }
        )

    def dedupe(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return (
        ds.map_batches(explode_chunks, batch_format="pyarrow")
        .groupby(["chunk", "val"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(dedupe, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# embedding similarity
# ---------------------------------------------------------------------------


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


class BruteForceTopK:
    """Actor-pool stage: cosine top-k of every batch row against a broadcast
    query matrix.  Queries are put in the object store ONCE (ray.put by the
    caller) and fetched in __init__ — never re-shipped per batch."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = queries_ref
        if not isinstance(q, np.ndarray):
            q = ray.get(q)
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[self.vec_col].to_pylist(), dtype=np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _normalize(vecs) @ self.q.T  # (B, Q)
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            out_q.extend([qi] * len(ids))
            out_id.extend(ids.tolist())
            out_s.extend(sims[:, qi].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def embedding_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Brute-force cosine top-k per query over an embedding Dataset.
    Per-batch matmul against broadcast queries (narrow), then a tiny
    per-query top-k reduction.  Scale path: per-batch partial top-k keeps the
    reduce input at Q×k rows per block, so the final groupby is small."""
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float64))

    scored = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(q_ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=1,
    )

    def partial_topk(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas()
        df = df.sort_values(["query_idx", "cosine", id_col], ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby("query_idx").head(k), preserve_index=False)

    def final_topk(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        df["rank"] = np.arange(1, len(df) + 1)
        df["cosine"] = round_half_away(df["cosine"].to_numpy(), 4)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        scored.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_idx")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def embedding_neardup_pairs(ds, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"):
    """All (a < b) pairs with cosine ≥ t.  v1: broadcast the full normalized
    matrix (ray.put once), each batch computes its block-row of the gram
    matrix — O(N·B) per batch, no shuffle.  Scale note: beyond
    broadcastable N use `embedding_lsh_buckets` (hyperplane LSH) so only
    bucket-local pairs are computed."""
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = _normalize(np.array(full[vec_col].to_list(), dtype=np.float64))
    ref = ray.put((ids_all, mat))

    class Block:
        def __init__(self):
            self.ids_all, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            vecs = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
            sims = vecs @ self.mat.T
            out_a, out_b, out_s = [], [], []
            for i, a in enumerate(ids):
                hit = np.where(sims[i] >= threshold)[0]
                for j in hit:
                    b = self.ids_all[j]
                    if a < b:
                        out_a.append(int(a))
                        out_b.append(int(b))
                        out_s.append(float(round_half_away(sims[i, j], 4)))
            return pa.table(
                {
                    "a": pa.array(out_a, pa.int64()),
                    "b": pa.array(out_b, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    return ds.map_batches(Block, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)


def embedding_lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Scale-path ANN: random-hyperplane LSH bucketing.  Vectors are bucketed
    by sign pattern (narrow stage); each query probes only its own bucket ∪
    hamming-1 neighbor buckets, so per-query work is ~N/2^planes instead of N.
    Approximate (recall < 1); tested for recall ≥ 0.9 vs brute force."""
    rng = np.random.default_rng(seed)
    dim = len(np.asarray(queries)[0])
    planes = rng.standard_normal((n_planes, dim))
    qn = _normalize(np.asarray(queries, dtype=np.float64))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        return ((mat @ planes.T) > 0).astype(np.uint64) @ (1 << np.arange(n_planes, dtype=np.uint64))

    q_buckets = bucket_of(qn)
    probe: dict[int, list[int]] = {}
    for qi, qb in enumerate(q_buckets):
        wanted = {int(qb)} | {int(qb) ^ (1 << p) for p in range(n_planes)}
        for w in wanted:
            probe.setdefault(w, []).append(qi)

    def assign(b: pa.Table) -> pa.Table:
        vecs = _normalize(np.array(b[vec_col].to_pylist(), dtype=np.float64))
        bk = bucket_of(vecs)
        keep = np.array([int(x) in probe for x in bk])
        t = b.append_column("bucket", pa.array(bk.astype(np.int64)))
        return t.filter(pa.array(keep))

    filtered = ds.map_batches(assign, batch_format="pyarrow")

    def score_bucket(g: pa.Table) -> pa.Table:
        bk = int(g["bucket"][0].as_py())
        qis = probe.get(bk, [])
        if not qis:
            return pa.table({"query_idx": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _normalize(np.array(g[vec_col].to_pylist(), dtype=np.float64))
        sims = vecs @ qn[qis].T
        out_q, out_id, out_s = [], [], []
        for col, qi in enumerate(qis):
            order = np.argsort(-sims[:, col], kind="stable")[:k]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_s.extend(sims[order, col].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pa.Table) -> pa.Table:
        import pandas as pd

        df = g.to_pandas().sort_values(["cosine", id_col], ascending=[False, True])
        df = df.drop_duplicates(subset=[id_col]).head(k)
        df["cosine"] = round_half_away(df["cosine"].to_numpy(), 4)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        filtered.groupby("bucket")
        .map_groups(score_bucket, batch_format="pyarrow")
        .groupby("query_idx")
        .map_groups(final_topk, batch_format="pyarrow")
    )

"""Arrow-batched numpy kernels for the vector similarity hot paths.

Optimization round 12, guide §4.2 ("hand whole batches to vectorized native
libraries"): the per-pair cosine / PQ-encode expression chains in
functions/vectors.py and operators/similarity.py are higher-order functions
(`aggregate` / `zip_with` / `transform`), which Spark evaluates INTERPRETED,
one lambda call per element — measured microseconds per pair. These kernels
compute the identical IEEE arithmetic on whole Arrow batches in numpy.

Bitwise-identity contract (what makes these drop-in for oracle-hash-gated
queries): `F.aggregate(arr, 0.0, (acc, x) -> acc + x)` is a strict
left-to-right fold. numpy's `cumsum` (`np.add.accumulate`) is ALSO a strict
sequential accumulation — unlike `np.sum`/`np.dot`, which use pairwise
summation / SIMD blocking and round differently. Folding with a leading 0.0
(`_seq_fold`) therefore reproduces the JVM expression's exact IEEE sequence,
including the (0.0 + p1) first step and signed-zero behavior; float32 →
float64 casts are exact, and elementwise multiply is one IEEE op in both
engines. tests/test_vector_kernels.py pins the bit-identity against the JVM
expressions on adversarial data.
"""

from __future__ import annotations

import numpy as np

#: Block size for pairwise score matrices: bounds peak kernel memory at
#: roughly block * n_corpus * (dim + 1) float64s regardless of batch size.
_PAIR_BLOCK = 128


def seq_fold_sum(p: np.ndarray) -> np.ndarray:
    """Strict left-fold sum over the LAST axis with a leading 0.0 — the
    bitwise twin of ``F.aggregate(arr, 0.0, (acc, x) -> acc + x)``.

    ``p`` must be float64; returns float64 with the last axis reduced."""
    shape = p.shape[:-1] + (1,)
    lead = np.zeros(shape, dtype=np.float64)
    return np.concatenate([lead, p], axis=-1).cumsum(axis=-1, dtype=np.float64)[
        ..., -1
    ]


def fold_norms(x64: np.ndarray) -> np.ndarray:
    """sqrt of the left-fold sum of squares — bitwise twin of V.norm."""
    return np.sqrt(seq_fold_sum(x64 * x64))


def cosine_block(
    a64: np.ndarray, na: np.ndarray, b64: np.ndarray, nb: np.ndarray
) -> np.ndarray:
    """Cosine of every (row of a64) x (row of b64), bitwise-identical to
    V.cosine's fold: dot via seq_fold_sum over the elementwise products,
    norm product as one IEEE multiply, one IEEE divide. Entries where
    either norm is zero come out non-finite (inf/nan) — the caller masks
    them, mirroring V.cosine's NULL branch.

    a64: (m, d) float64 with na = fold_norms(a64); b64: (n, d) float64
    with nb = fold_norms(b64). Returns (m, n) float64."""
    out = np.empty((a64.shape[0], b64.shape[0]), dtype=np.float64)
    for s in range(0, a64.shape[0], _PAIR_BLOCK):
        e = min(s + _PAIR_BLOCK, a64.shape[0])
        # (blk, n, d) products — one IEEE multiply per element, then the
        # strict fold; blocked so peak memory stays ~_PAIR_BLOCK*n*d*8 B.
        prods = a64[s:e, None, :] * b64[None, :, :]
        out[s:e] = seq_fold_sum(prods)
    denom = na[:, None] * nb[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        out = out / denom
    return out


def pq_encode_block(
    x32: np.ndarray, books64: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Unit-normalize + per-subspace nearest-centroid encode, bitwise twin
    of similarity._encode_pq / _pq_codes:

      - norm = fold_norms(float64(x)); zero norms replaced by 1.0;
      - unit = float(x)/norm (one IEEE divide per element, same as the JVM
        ``transform(vec, x -> x / nrm)``);
      - per subspace j: squared L2 to each centroid via the strict fold of
        (u - c)^2, argmin with FIRST-match tie rule (np.argmin), matching
        ``array_position(dists, array_min(dists))``.

    x32: (n, dim) float64-exact input (float32 parquet values upcast);
    books64: (m, k, sub) float64 codebooks. Returns (codes int32 (n, m),
    unit float64 (n, dim))."""
    n, dim = x32.shape
    m, k, sub = books64.shape
    x64 = x32.astype(np.float64)
    nrm = fold_norms(x64)
    nrm = np.where(nrm == 0.0, 1.0, nrm)
    unit = x64 / nrm[:, None]
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        u = unit[:, j * sub : (j + 1) * sub]
        # (n, k, sub) diffs -> strict-fold squared distances
        diff = u[:, None, :] - books64[j][None, :, :]
        d2 = seq_fold_sum(diff * diff)
        codes[:, j] = np.argmin(d2, axis=1).astype(np.int32)
    return codes, unit

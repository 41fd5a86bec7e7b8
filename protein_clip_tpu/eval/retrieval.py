"""Retrieval evaluation — the reference's top-k protocol (topk.py:48-88 +
training_utils.py:174-228, eval_gc_allrec_onepep).

Reference semantics per query k: pin the k-th peptide, score it against all
256 receptor candidates (16 batches x 16 under GradCache), and report
rank = 1 + #(candidates scoring above the true partner). The cumulative
top-k accuracy curve over 256 queries is compared to a shuffled-random
baseline.

TPU-native redesign: encode each side ONCE (batched, jit) and rank the whole
256x256 logit matrix in one shot — the reference re-encodes all 256
candidates per query (256x redundant work). Ranks are identical: logit[i, j]
depends only on embeddings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import clip
from ..train.clip_engine import tokenize_pair_batch
from ..train.gradcache import encode_hidden_chunked


@dataclasses.dataclass
class RetrievalResult:
    ranks: np.ndarray            # (N,) 1-based rank of true partner per query
    accuracies: np.ndarray       # (N,) cumulative top-k accuracy
    random_accuracies: np.ndarray

    @property
    def top1(self) -> float:
        return float(self.accuracies[0])


def _collect_pairs(loader, n_candidates: int) -> tuple[list[str], list[str]]:
    peps: list[str] = []
    recs: list[str] = []
    for p, r in loader:
        peps.extend(p)
        recs.extend(r)
        if len(peps) >= n_candidates:
            break
    if len(peps) < n_candidates:
        raise ValueError(
            f"loader yielded {len(peps)} pairs < {n_candidates} candidates")
    return peps[:n_candidates], recs[:n_candidates]


def encode_candidates(params, esm_params, loader, tokenizer, mcfg,
                      n_candidates: int = 256, num_chunks: int = 16,
                      packed: bool = False):
    """Collect the first n_candidates pairs from the loader and embed both
    sides once. Returns (pep_emb, rec_emb), each (N, D).

    packed=True rides the sequence-packed backbone path (the training
    throughput winner) — identical embeddings in original order (owner
    maps carry global indices), ~95% token fill instead of pad-to-longest.
    """
    peps, recs = _collect_pairs(loader, n_candidates)
    if packed:
        from ..train.packed_engine import embed_packed, tokenize_packed
        batch = tokenize_packed(tokenizer, peps, recs)
        return embed_packed(params, esm_params, batch, mcfg)
    batch = tokenize_pair_batch(tokenizer, peps, recs)

    @jax.jit
    def embed(params, esm_params, batch):
        from ..train.clip_engine import expand_batch
        batch = expand_batch(batch)
        hp = encode_hidden_chunked(esm_params, batch["pep_ids"],
                                   batch["pep_mask"], mcfg.esm, num_chunks)
        hr = encode_hidden_chunked(esm_params, batch["rec_ids"],
                                   batch["rec_mask"], mcfg.esm, num_chunks)
        pep = clip.encode_side(params, "pep", hp.astype(jnp.float32),
                               batch["pep_mask"], mcfg, train=False)
        rec = clip.encode_side(params, "rec", hr.astype(jnp.float32),
                               batch["rec_mask"], mcfg, train=False)
        return pep, rec

    return embed(params, esm_params, batch)


def ranks_from_embeddings(pep_emb, rec_emb) -> np.ndarray:
    """1-based rank of the true partner for every query.

    rank_k = 1 + #(diag logits strictly above the true diag logit), the
    reference's counting rule (training_utils.py:219-223): query k is
    broadcast against every receptor, so scores = logits[k, :], and the
    reference compares diag(broadcast matrix) == logits[k, :] against
    logits[k, k].
    """
    logits = np.asarray(jnp.einsum("id,jd->ij", pep_emb, rec_emb))
    diag = np.diag(logits)
    # the self term contributes 0 (x > x is False), as in the reference
    return 1 + (logits > diag[:, None]).sum(axis=1)


def topk_curve(ranks: np.ndarray, n: int) -> np.ndarray:
    """Cumulative top-k accuracy curve (topk.py:53-61)."""
    top_k = np.zeros(n, dtype=np.int64)
    for r in ranks:
        idx = min(int(r) - 1, n - 1)
        top_k[idx] += 1
    return np.cumsum(top_k) / len(ranks)


def random_baseline_curve(n: int, seed: int | None = None) -> np.ndarray:
    """Shuffled-arange baseline (topk.py:63-74): ranks are a permutation of
    0..n-1, giving the diagonal accuracy line."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    top_k = np.zeros(n, dtype=np.int64)
    for r in perm:
        top_k[int(r)] += 1
    return np.cumsum(top_k) / n


def eval_allrec_onequery(params, esm_params, loader, tokenizer, mcfg,
                         k: int, n_candidates: int = 256) -> list[int]:
    """API-parity equivalent of the reference's ``eval_gc_allrec_onepep``
    (training_utils.py:174-228): rank of query k's true partner among the
    candidate pool, as a single-element list (the reference returns
    ``big_batches`` with one count).

    Prefer ``evaluate_retrieval`` — it produces all N ranks for the cost the
    reference pays per single query.
    """
    pep, rec = encode_candidates(params, esm_params, loader, tokenizer, mcfg,
                                 n_candidates)
    ranks = ranks_from_embeddings(pep, rec)
    return [int(ranks[k])]


def encode_candidates_tokens(params, esm_params, loader, tokenizer, fcfg,
                             n_candidates: int = 256, num_chunks: int = 16):
    """Token-level candidate encoding for FILIP retrieval: collect the first
    n_candidates pairs and encode both sides' L2-normalised per-token
    embeddings once. Returns (ha, mask_a, hb, mask_b) with ha/hb (N, T, D).

    The reference never built a FILIP retrieval eval — its topk.py only
    scores the pooled CLIP model (topk.py:42-50); late interaction is
    FILIP's whole point, so the framework provides it.
    """
    from ..models import filip as filip_mod
    from ..train.clip_engine import expand_batch

    peps, recs = _collect_pairs(loader, n_candidates)
    batch = tokenize_pair_batch(tokenizer, peps, recs)

    @jax.jit
    def embed(params, esm_params, batch):
        batch = expand_batch(batch)
        ha, hb = filip_mod.encode_batch_tokens(
            params, esm_params, batch, fcfg, num_chunks=num_chunks)
        return ha, batch["pep_mask"], hb, batch["rec_mask"]

    return embed(params, esm_params, batch)


def filip_score_matrix(ha, mask_a, hb, mask_b, temperature,
                       row_block: int = 64,
                       col_block: int = 4096) -> np.ndarray:
    """(Q, N) late-interaction scores: (sim_a + sim_b) / 2 through the fused
    max-sim kernel (ops/filip_pallas.py — never materialises the
    (Q, N, TA, TB) tensor that is the reference's memory wall,
    models.py:332).

    Direction averaging matches both the training objective (mean of the two
    per-direction InfoNCE terms, training_utils_filip.py:26-39) and the viz
    convention (visualizations.py:54-105). Queries stream in row blocks AND
    candidates in column blocks: one kernel launch sees a (row_block, TA, D)
    query slice against at most col_block candidates, so a serving index can
    grow past the kernel's per-launch grid/SMEM comfort zone (a (1, 1, N)
    SMEM output row per program caps N per launch) without recompiling or
    failing — the (Q, N) matrix is assembled from rectangular blocks.
    """
    n = ha.shape[0]
    m = hb.shape[0]
    if m == 0:  # empty index: range(0, 0, 0) below would raise opaquely
        return np.zeros((n, 0), np.float32)
    rb = min(row_block, n)
    cb = min(col_block, m)
    rows = []
    for i in range(0, n, rb):
        cols = []
        for j in range(0, m, cb):
            cols.append(np.asarray(_filip_score_rows(
                ha[i:i + rb], mask_a[i:i + rb],
                hb[j:j + cb], mask_b[j:j + cb], temperature)))
        rows.append(np.concatenate(cols, axis=1) if len(cols) > 1
                    else cols[0])
    return np.concatenate(rows, axis=0)


def filip_score_matrix_ragged(ha, mask_a, flat, lengths, temperature,
                              row_block: int = 64,
                              col_block: int = 1024) -> np.ndarray:
    """``filip_score_matrix`` over a RAGGED candidate index ({tokens
    (sum_L, D), lengths (N,)} from ``embed --filip``): each column block is
    densified to (block, T_block, D) with T_block = the block's own max
    length rounded to the 64-token bucket grid, so one long outlier in a
    big index no longer pads every candidate row (ADVICE r3). Index rows
    are written length-sorted, keeping blocks tight and the jit shape set
    small.
    """
    lengths = np.asarray(lengths, np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    n = ha.shape[0]
    m = len(lengths)
    if m == 0:
        return np.zeros((n, 0), np.float32)
    d = flat.shape[1]
    cb = min(col_block, m)
    rb = min(row_block, n)
    out = np.empty((n, m), np.float32)
    # column-major: densify ONE candidate block, score every query row
    # block against it, free it — peak host memory is one (cb, tb, d)
    # block, never the whole index
    for j in range(0, m, cb):
        lens = lengths[j:j + cb]
        tb = max(64, int(-(-int(lens.max()) // 64) * 64))
        hb = np.zeros((len(lens), tb, d), np.float32)
        mb = np.zeros((len(lens), tb), np.int32)
        for r, g in enumerate(range(j, j + len(lens))):
            hb[r, :lengths[g]] = flat[offsets[g]:offsets[g + 1]]
            mb[r, :lengths[g]] = 1
        for i in range(0, n, rb):
            out[i:i + rb, j:j + cb] = np.asarray(_filip_score_rows(
                ha[i:i + rb], mask_a[i:i + rb], hb, mb, temperature))
    return out


@jax.jit
def _filip_score_rows(ha_rows, ma_rows, hb, mb, t):
    # module-level jit: a per-call @jax.jit is a fresh cache key and
    # retraces every invocation — the measured serving-latency trap
    # (docs/PERF.md, embed_sequences post-mortem)
    from ..ops.filip_pallas import filip_similarity_fused

    sa, sb = filip_similarity_fused(ha_rows, hb, ma_rows, mb, t)
    return (sa + sb) / 2.0


def filip_ranks_from_tokens(ha, mask_a, hb, mask_b, temperature,
                            row_block: int = 64) -> np.ndarray:
    """Late-interaction ranks over aligned pairs: the (N, N) score matrix
    from ``filip_score_matrix`` ranked by the reference counting rule
    (training_utils.py:219-223)."""
    sim = filip_score_matrix(ha, mask_a, hb, mask_b, temperature, row_block)
    diag = np.diag(sim)
    return 1 + (sim > diag[:, None]).sum(axis=1)


def evaluate_filip_retrieval(params, esm_params, loader, tokenizer, fcfg,
                             n_candidates: int = 256,
                             seed: int | None = None,
                             num_chunks: int = 16) -> RetrievalResult:
    """FILIP top-k retrieval over n_candidates queries/candidates — the
    token-level counterpart of ``evaluate_retrieval``."""
    ha, ma, hb, mb = encode_candidates_tokens(
        params, esm_params, loader, tokenizer, fcfg, n_candidates,
        num_chunks=num_chunks)
    ranks = filip_ranks_from_tokens(ha, ma, hb, mb, params["temperature"])
    return RetrievalResult(
        ranks=ranks,
        accuracies=topk_curve(ranks, n_candidates),
        random_accuracies=random_baseline_curve(n_candidates, seed),
    )


def evaluate_retrieval(params, esm_params, loader, tokenizer, mcfg,
                       n_candidates: int = 256, seed: int | None = None,
                       packed: bool = False) -> RetrievalResult:
    pep, rec = encode_candidates(params, esm_params, loader, tokenizer, mcfg,
                                 n_candidates, packed=packed)
    ranks = ranks_from_embeddings(pep, rec)
    return RetrievalResult(
        ranks=ranks,
        accuracies=topk_curve(ranks, n_candidates),
        random_accuracies=random_baseline_curve(n_candidates, seed),
    )

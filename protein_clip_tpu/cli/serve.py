"""Online serving: JSON-over-HTTP embeddings + top-k retrieval.

Completes the serving loop (embed -> retrieve are the offline halves):
load a trained checkpoint once, keep the jit-compiled encoder warm, and
answer requests from memory. The reference has no serving story at all —
its topk.py re-encodes the full candidate set per run inside a 10h SLURM
job (/root/reference/topk.py:48-76).

    python -m protein_clip_tpu.cli.serve --checkpoint runs/<ts>/best_model.npz \
        --index index.npz --port 8080

API (all JSON):
  GET  /healthz           -> {"status": "ok", "model": ..., "index_size": N}
  GET  /metrics           -> serving counters: requests, sequences,
                             device_batches, mean_requests_per_batch
                             (the coalescer's effectiveness), encode EMA
  POST /embed             {"sequences": [...], "side": "pep"|"rec"}
                          -> {"embeddings": [[...], ...]}
                          With ``Accept: application/octet-stream`` the
                          response body is raw little-endian float32
                          (row-major), headers ``X-Shape: N,D`` and
                          ``X-Dtype: <f4`` — the binary wire format. A
                          128-dim embedding is 512 bytes binary vs ~2.5 KB
                          of JSON floats, and skips float->decimal
                          serialization on the hot path.
  POST /topk              {"queries": [...], "side": "pep", "k": 10}
                          -> {"hits": [[{"id", "score", "rank"}, ...], ...]}

With ``--filip`` (a FILIP checkpoint + an `embed --filip` token index):
/embed returns token-level embeddings — JSON {"tokens", "lengths"} or
binary (X-Shape N,T,D; per-row true lengths as an int32 body prefix
declared by X-Prefix-Len, since a header line caps at 64 KiB; pads are
a row suffix) — and /topk
ranks by direction-averaged late-interaction max-sim through the fused
kernel, the online ColBERT-style serving path.

Requests batch two ways: within a request through ``embed_sequences``
(length-sorted bucket batches, pow2-padded row counts, so request shapes
hit a finite jit cache), and ACROSS concurrent requests through an
adaptive coalescer — one worker thread drains everything queued while
the device was busy and encodes it as one batch (per side), so N
concurrent single-sequence requests cost ~one dispatch instead of N
serialized ones. Because closed-loop clients unblock together and their
next requests trickle back through the HTTP stack, the worker adds a
short collection window (a fraction of the measured encode time, <=5 ms)
ONLY when the previous cycle already showed concurrency; a request
arriving at a quiet server still dispatches immediately with zero added
latency. Finetuned (combined {heads, esm}) checkpoints are auto-detected
and served with their own backbone, like the offline eval CLIs.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import jax

from . import common
from .embed import embed_sequences
from ..eval.embed import nearest_partners
from ..models import clip
from ..utils import prng


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--checkpoint", required=True,
                   help="best_model.npz from a training run")
    p.add_argument("--index", default=None,
                   help="npz from cli.embed ({ids, embeddings}; with "
                        "--filip a ragged token-level {ids, tokens, lengths} "
                        "from `embed --filip`); enables /topk")
    p.add_argument("--filip", action="store_true",
                   help="serve a FILIP checkpoint: /embed returns token-"
                        "level embeddings (binary recommended), /topk "
                        "ranks by late-interaction max-sim through the "
                        "fused kernel")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080,
                   help="0 picks an ephemeral port (printed on startup)")
    return p


class _Work:
    """One request's slice of a coalesced encode."""

    __slots__ = ("seqs", "side", "event", "result", "error")

    def __init__(self, seqs: list[str], side: str):
        self.seqs = seqs
        self.side = side
        self.event = threading.Event()
        self.result = None
        self.error: Exception | None = None


class ClipService:
    """Checkpoint + optional index, shared across requests."""

    def __init__(self, args):
        esm_cfg = common.esm_config(args.esm_config, args.esm_dtype,
                                fast_gelu=args.fast_gelu,
                                exact_gelu=args.exact_gelu)
        esm_params = common.load_esm(args, esm_cfg)
        self.tokenizer = common.make_tokenizer()
        self.mcfg = clip.CLIPConfig(
            input_dim=esm_cfg.hidden_size, embedding_dim=args.embedding_dim,
            h1=args.h1, h2=args.h2, dropout=args.dropout,
            activation=args.activation, esm=esm_cfg)
        self.params, self.esm_params = common.load_clip_checkpoint(
            args.checkpoint, self.mcfg, esm_params)
        self.filip = bool(getattr(args, "filip", False))
        if self.filip:
            from ..models import filip as filip_mod

            self.fcfg = filip_mod.FILIPConfig(
                input_dim=esm_cfg.hidden_size,
                embedding_dim=args.embedding_dim, h1=args.h1, h2=args.h2,
                dropout=args.dropout, activation=args.activation,
                esm=esm_cfg)
        self.model_name = args.esm_config
        self.batch_size = args.batch_size
        self.corpus_ids: list[str] = []
        self.corpus = None
        self.corpus_tokens = None
        self.corpus_mask = None
        self.corpus_lengths = None
        if args.index:
            index = np.load(args.index, allow_pickle=False)
            self.corpus_ids = [str(i) for i in index["ids"]]
            if self.filip:
                if "tokens" not in index:
                    raise ValueError(
                        "--filip needs a token-level index from `embed "
                        "--filip` ({ids, tokens, lengths}); this index "
                        "holds pooled embeddings")
                self.corpus_tokens = np.asarray(index["tokens"], np.float32)
                # ragged ({tokens (sum_L, D), lengths}) is what embed
                # --filip writes now; dense {tokens (N, T, D), mask}
                # indexes from older builds still serve
                self.corpus_lengths = (np.asarray(index["lengths"], np.int32)
                                       if "lengths" in index else None)
                self.corpus_mask = (np.asarray(index["mask"], np.int32)
                                    if "mask" in index else None)
                if self.corpus_lengths is None and self.corpus_mask is None:
                    raise ValueError(
                        "malformed FILIP index: has 'tokens' but neither "
                        "'lengths' (ragged) nor 'mask' (legacy dense) — "
                        "rebuild the index with `embed --filip`")
                tok_dim = self.corpus_tokens.shape[-1]
                if tok_dim != self.mcfg.embedding_dim:
                    raise ValueError(
                        f"index token dim {tok_dim} != "
                        f"model --embedding-dim {self.mcfg.embedding_dim}")
            else:
                self.corpus = np.asarray(index["embeddings"], np.float32)
                if self.corpus.shape[1] != self.mcfg.embedding_dim:
                    raise ValueError(
                        f"index embedding dim {self.corpus.shape[1]} != "
                        f"model --embedding-dim {self.mcfg.embedding_dim}")
        # adaptive request coalescing: one worker owns the device; it
        # drains whatever queued while the previous encode ran and
        # batches it. Drain-only coalescing oscillates under closed-loop
        # load (all clients unblock together; the worker grabs the first
        # re-arrival and encodes a batch of 1, then the stragglers as a
        # second batch), so when the PREVIOUS cycle showed concurrency a
        # short collection window — self-sized to a fraction of the
        # measured encode time — lets the cohort re-form. A lone request
        # after an idle/lone cycle still dispatches immediately: zero
        # added latency at low load.
        self._queue: queue.SimpleQueue[_Work] = queue.SimpleQueue()
        self._last_nreq = 1
        self._encode_ema_s = 0.0
        # observability counters (written by the worker thread only;
        # /metrics reads them racily, which is fine for monotonic counts)
        self._n_batches = 0
        self._n_requests = 0
        self._n_seqs = 0
        self._t_start = time.time()
        self._worker = threading.Thread(target=self._encode_loop,
                                        daemon=True)
        self._worker.start()

    def embed(self, sequences: list[str], side: str) -> np.ndarray:
        if side not in ("pep", "rec"):
            raise ValueError(f"side must be 'pep' or 'rec', got {side!r}")
        work = _Work(sequences, side)
        self._queue.put(work)
        work.event.wait()
        if work.error is not None:
            raise work.error
        return work.result

    def _encode_loop(self) -> None:
        while True:
            batch = [self._queue.get()]
            # collection window only under detected concurrency (25% of
            # the encode EMA, capped at 5 ms — small next to a dispatch,
            # long enough for an unblocked client cohort's next requests
            # to cross the HTTP stack)
            deadline = None
            if self._last_nreq > 1:
                deadline = time.perf_counter() + min(
                    0.005, 0.25 * self._encode_ema_s)
            while True:  # drain everything that arrived meanwhile
                try:
                    batch.append(self._queue.get_nowait())
                except queue.Empty:
                    if deadline is None or time.perf_counter() >= deadline:
                        break
                    time.sleep(0.0002)
            self._last_nreq = len(batch)
            t_encode = time.perf_counter()
            by_side: dict[str, list[_Work]] = {}
            for w in batch:
                by_side.setdefault(w.side, []).append(w)
            for side, works in by_side.items():
                try:
                    flat = [s for w in works for s in w.seqs]
                    # pad_batch: coalesced-group sizes vary with load; a
                    # pow2 row-count grid keeps the jit shape set finite
                    # (an unseen exact size would cold-compile mid-request)
                    if self.filip:
                        from .embed import embed_sequences_tokens

                        toks, msk = embed_sequences_tokens(
                            self.params, self.esm_params, flat, side,
                            self.fcfg, self.tokenizer,
                            batch_size=self.batch_size, pad_batch=True)
                        off = 0
                        for w in works:
                            w.result = (toks[off:off + len(w.seqs)],
                                        msk[off:off + len(w.seqs)])
                            off += len(w.seqs)
                    else:
                        emb = embed_sequences(self.params, self.esm_params,
                                              flat, side, self.mcfg,
                                              self.tokenizer,
                                              batch_size=self.batch_size,
                                              pad_batch=True)
                        off = 0
                        for w in works:
                            w.result = emb[off:off + len(w.seqs)]
                            off += len(w.seqs)
                except Exception as e:  # noqa: BLE001 — fail the group,
                    for w in works:    # keep the worker alive
                        w.error = e
                finally:
                    for w in works:
                        w.event.set()
            dt = time.perf_counter() - t_encode
            self._encode_ema_s = (dt if self._encode_ema_s == 0.0
                                  else 0.8 * self._encode_ema_s + 0.2 * dt)
            self._n_batches += 1
            self._n_requests += len(batch)
            self._n_seqs += sum(len(w.seqs) for w in batch)

    def metrics(self) -> dict:
        """Serving counters: how well is the coalescer doing its job?"""
        nb = self._n_batches
        return {
            "uptime_s": round(time.time() - self._t_start, 1),
            "requests": self._n_requests,
            "sequences": self._n_seqs,
            "device_batches": nb,
            "mean_requests_per_batch": round(self._n_requests / nb, 2)
            if nb else None,
            "encode_ema_ms": round(1e3 * self._encode_ema_s, 2),
            "index_size": len(self.corpus_ids),
        }

    def topk(self, queries: list[str], side: str, k: int):
        if not self.corpus_ids:
            raise ValueError("no --index loaded; /topk unavailable")
        k = max(1, min(k, len(self.corpus_ids)))
        if self.filip:
            from ..eval.retrieval import (filip_score_matrix,
                                          filip_score_matrix_ragged)

            q_t, q_m = self.embed(queries, side)
            if self.corpus_lengths is not None:  # ragged index (default)
                sim = filip_score_matrix_ragged(
                    q_t, q_m.astype(np.int32), self.corpus_tokens,
                    self.corpus_lengths, self.params["temperature"])
            else:  # legacy dense {tokens, mask} index
                sim = filip_score_matrix(q_t, q_m.astype(np.int32),
                                         self.corpus_tokens,
                                         self.corpus_mask,
                                         self.params["temperature"])
            idx = np.argsort(-sim, axis=1)[:, :k]
            scores = np.take_along_axis(sim, idx, axis=1)
        else:
            qemb = self.embed(queries, side)
            idx, scores = nearest_partners(qemb, self.corpus, k=k)
        return [
            [{"id": self.corpus_ids[idx[q, r]],
              "score": float(scores[q, r]), "rank": r + 1}
             for r in range(k)]
            for q in range(len(queries))]


def make_handler(service: ClipService):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 => persistent connections (every response carries
        # Content-Length). The per-request TCP handshake was a measured
        # chunk of the concurrent-client cycle; reusing the socket lets
        # a closed-loop client's next request arrive within the
        # coalescer's collection window instead of behind a connect
        protocol_version = "HTTP/1.1"
        # idle persistent connections must not pin their handler thread
        # forever: drop the socket after 60 s without a request
        timeout = 60
        # headers and body leave in separate writes; on a persistent
        # connection Nagle holds the second segment for the peer's
        # delayed ACK (~40 ms measured on loopback — HTTP/1.0's close
        # used to flush it). TCP_NODELAY, always, on serving sockets.
        disable_nagle_algorithm = True

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _binary(self, arr: np.ndarray,
                    prefix: np.ndarray | None = None) -> None:
            """Raw little-endian float32 body; shape rides the headers.

            JSON float serialization was the measured residual of the
            concurrent-serving cycle (docs/PERF.md): each float costs ~20
            bytes of decimal text plus repr() time vs 4 bytes memcpy'd.

            ``prefix``: optional int32 vector (e.g. FILIP per-row lengths)
            shipped as a ``<i4`` section BEFORE the float payload, declared
            by X-Prefix-Len/X-Prefix-Dtype. Lengths used to ride an
            X-Lengths header, but header LINES are capped at 64 KiB by
            http.client (and most proxies) — a few thousand sequences per
            request made the response unparseable. Body bytes have no cap.
            """
            body = np.ascontiguousarray(arr, dtype="<f4").tobytes()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Shape", ",".join(map(str, arr.shape)))
            self.send_header("X-Dtype", "<f4")
            pre = b""
            if prefix is not None:
                pre = np.ascontiguousarray(prefix, dtype="<i4").tobytes()
                self.send_header("X-Prefix-Len", str(int(prefix.size)))
                self.send_header("X-Prefix-Dtype", "<i4")
            self.send_header("Content-Length", str(len(pre) + len(body)))
            self.end_headers()
            if pre:
                self.wfile.write(pre)
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/metrics":
                return self._json(200, service.metrics())
            if self.path != "/healthz":
                return self._json(404, {"error": "unknown path"})
            return self._json(200, {
                "status": "ok", "model": service.model_name,
                "embedding_dim": service.mcfg.embedding_dim,
                "index_size": len(service.corpus_ids),
                "filip": service.filip,
            })

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                seq_key = "queries" if self.path == "/topk" else "sequences"
                seqs = req.get(seq_key)
                if (not isinstance(seqs, list) or not seqs
                        or not all(isinstance(s, str) and s for s in seqs)):
                    return self._json(
                        400, {"error": f"'{seq_key}' must be a non-empty "
                                       f"list of non-empty strings"})
                side = req.get("side", "pep")
                if self.path == "/embed":
                    binary = "application/octet-stream" in (
                        self.headers.get("Accept") or "")
                    if service.filip:
                        toks, msk = service.embed(seqs, side)
                        # pads are a suffix (right-padded), so per-row true
                        # lengths reconstruct the mask on the client
                        lengths = msk.astype(np.int32).sum(axis=1)
                        if binary:
                            return self._binary(toks, prefix=lengths)
                        return self._json(200, {
                            "tokens": toks.tolist(),
                            "lengths": [int(n) for n in lengths]})
                    emb = service.embed(seqs, side)
                    if binary:
                        return self._binary(emb)
                    return self._json(200, {"embeddings": emb.tolist()})
                if self.path == "/topk":
                    hits = service.topk(seqs, side, int(req.get("k", 10)))
                    return self._json(200, {"hits": hits})
                return self._json(404, {"error": "unknown path"})
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # keep the server alive
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


class _Server(ThreadingHTTPServer):
    # stdlib default listen backlog is 5: a burst of concurrent clients
    # (exactly the case the coalescer serves well) gets connection resets
    # at the accept queue before the worker ever sees them
    request_queue_size = 128


def make_server(args) -> ThreadingHTTPServer:
    """Bound (not yet serving) HTTP server — split out for tests."""
    service = ClipService(args)
    return _Server((args.host, args.port), make_handler(service))


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    prng.set_seed(args.seed)
    server = make_server(args)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(/healthz, /embed, /topk{'' if args.index else ' [no index]'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Serving hardening: coalescer under concurrent load + binary wire + /metrics.

VERDICT r3 #8: cli/serve.py had measured throughput numbers but no CLI test
for the coalescer's cross-request batching or the /metrics endpoint. Here a
barrier-released pack of stdlib client threads hammers a server built on a
tiny random backbone (no training needed — the coalescer doesn't care what
the weights are), then /metrics must prove requests were coalesced into
fewer device batches, and the octet-stream wire must carry exact shape
headers and bit-identical float32 rows vs the JSON path.
"""

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

import jax

TINY = ["--esm-config", "tiny", "--esm-dtype", "float32"]
AAS = "LAGVSERTIDPKQNFYMHWC"


@pytest.fixture(scope="module")
def serve_ctx(tmp_path_factory):
    """Bound server on an untrained tiny checkpoint (fake backbone)."""
    from protein_clip_tpu.cli import common
    from protein_clip_tpu.cli.serve import build_argparser, make_server
    from protein_clip_tpu.models import clip
    from protein_clip_tpu.train.checkpoint import export_npz

    d = tmp_path_factory.mktemp("servework")
    ckpt = d / "best_model.npz"
    esm_cfg = common.esm_config("tiny", "float32")
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    export_npz(ckpt, clip.init_params(jax.random.key(0), mcfg))

    args = build_argparser().parse_args(TINY + [
        "--checkpoint", str(ckpt), "--port", "0", "--batch-size", "8",
    ])
    server = make_server(args)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{port}"
    finally:
        server.shutdown()
        server.server_close()


def _call(base, path, payload=None, headers=None):
    req = urllib.request.Request(
        base + path,
        data=None if payload is None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **(headers or {})})
    return urllib.request.urlopen(req, timeout=300)


def _seqs(rng, n, lo=10, hi=14):
    return ["".join(rng.choice(list(AAS), int(L)))
            for L in rng.integers(lo, hi, n)]


def test_metrics_and_coalescer_under_concurrency(serve_ctx):
    base = serve_ctx
    rng = np.random.default_rng(0)

    # warm the jit cache so the timed burst measures the coalescer, not a
    # cold compile
    warm = json.loads(_call(base, "/embed", {
        "sequences": _seqs(rng, 2), "side": "pep"}).read())
    dim = len(warm["embeddings"][0])
    assert dim > 0

    m0 = json.loads(_call(base, "/metrics").read())
    for key in ("requests", "sequences", "device_batches",
                "encode_ema_ms", "uptime_s", "index_size"):
        assert key in m0, f"/metrics missing {key}"
    assert m0["requests"] >= 1 and m0["index_size"] == 0

    n_threads, n_reqs = 8, 4
    # closed-loop burst; retry a couple of times before declaring the
    # coalescer broken (scheduling on a loaded 1-core host CAN serialize
    # one burst end to end, but not repeatedly)
    for attempt in range(3):
        before = json.loads(_call(base, "/metrics").read())
        barrier = threading.Barrier(n_threads)
        errors: list[Exception] = []

        def client():
            crng = np.random.default_rng(threading.get_ident() % 2**31)
            try:
                barrier.wait(timeout=60)
                for _ in range(n_reqs):
                    out = json.loads(_call(base, "/embed", {
                        "sequences": _seqs(crng, 1),
                        "side": "pep"}).read())
                    assert len(out["embeddings"]) == 1
                    assert len(out["embeddings"][0]) == dim
            except Exception as e:  # noqa: BLE001 — surface in main thread
                errors.append(e)

        threads = [threading.Thread(target=client) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors[0]

        after = json.loads(_call(base, "/metrics").read())
        d_req = after["requests"] - before["requests"]
        d_batches = after["device_batches"] - before["device_batches"]
        assert d_req == n_threads * n_reqs
        assert after["sequences"] - before["sequences"] == n_threads * n_reqs
        if d_batches < d_req:  # the coalescer batched >1 request somewhere
            assert d_batches >= 1
            return
    pytest.fail(
        f"no cross-request batching in 3 bursts: every burst encoded "
        f"{n_threads * n_reqs} requests as {d_batches} device batches")


def test_binary_wire_matches_json(serve_ctx):
    base = serve_ctx
    rng = np.random.default_rng(1)
    seqs = _seqs(rng, 3)

    ref = np.asarray(json.loads(_call(base, "/embed", {
        "sequences": seqs, "side": "rec"}).read())["embeddings"],
        np.float32)

    with _call(base, "/embed", {"sequences": seqs, "side": "rec"},
               {"Accept": "application/octet-stream"}) as r:
        assert r.headers["Content-Type"] == "application/octet-stream"
        assert r.headers["X-Dtype"] == "<f4"
        shape = tuple(int(d) for d in r.headers["X-Shape"].split(","))
        body = r.read()
    assert shape == (3, ref.shape[1])
    assert len(body) == 3 * ref.shape[1] * 4 == int(
        np.prod(shape)) * 4
    raw = np.frombuffer(body, "<f4").reshape(shape)
    np.testing.assert_array_equal(raw, ref)


def test_error_paths_stay_json(serve_ctx):
    base = serve_ctx
    # bad side -> 400 with an error message; server stays up
    with pytest.raises(urllib.error.HTTPError) as exc:
        _call(base, "/embed", {"sequences": ["AAAA"], "side": "nope"})
    assert exc.value.code == 400
    assert "side" in json.loads(exc.value.read())["error"]
    # /topk without an index -> 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _call(base, "/topk", {"queries": ["AAAA"], "side": "pep"})
    assert exc.value.code == 400
    # empty sequence list -> 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _call(base, "/embed", {"sequences": [], "side": "pep"})
    assert exc.value.code == 400
    # and a good request still works afterwards
    out = json.loads(_call(base, "/embed", {
        "sequences": ["AAAA"], "side": "pep"}).read())
    assert len(out["embeddings"]) == 1

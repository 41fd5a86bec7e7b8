"""CLI entry smoke tests: each entry runs in-process on the synthetic
fixture with a tiny config and produces its artifact contract."""

import json
import os
from pathlib import Path

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # trains fixture runs per module; full-suite tier

TINY = ["--esm-config", "tiny", "--esm-dtype", "float32"]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cliwork")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


@pytest.fixture(scope="module")
def trained_run(workdir):
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "2", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--length-groups", "2",
        "--synthetic-fixture", "--data-dir", "data",
        "--fixture-families", "40",
    ])
    assert rc == 0
    runs = sorted(Path("runs").iterdir())
    assert runs
    return runs[-1]


def test_training_artifacts(trained_run):
    csv = (trained_run / "losses_per_epoch.txt").read_text().strip()
    lines = csv.split("\n")
    assert lines[0] == "Epoch,Train Loss,Validation Loss"
    assert len(lines) == 3
    for line in lines[1:]:
        epoch, tr, va = line.split(",")
        assert np.isfinite(float(tr)) and np.isfinite(float(va))
    assert (trained_run / "best_model.npz").exists()
    figures = list((trained_run / "figures").glob("figure *.png"))
    assert len(figures) >= 5
    # raw matrices saved alongside similarity heatmaps
    assert list((trained_run / "figures").glob("*.npy"))
    metrics = [json.loads(l) for l in
               (trained_run / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2 and metrics[0]["epoch"] == 1


def test_cosine_similarity_entry(workdir, trained_run):
    from protein_clip_tpu.cli.cosine_similarity import main
    rc = main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
    ])
    assert rc == 0


def test_topk_entry(workdir, trained_run, capsys):
    from protein_clip_tpu.cli.topk import main
    rc = main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
        "--n-candidates", "16", "--split", "train",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "top-1 accuracy:" in out


def test_mlm_sweep_entry(workdir, trained_run, capsys):
    from protein_clip_tpu.cli.mlm_sweep import main
    rc = main(["--data-dir", "data", "--prefix", "protein1"])
    assert rc == 0
    assert "mean changed fraction" in capsys.readouterr().out


def test_resume_entry(workdir, trained_run):
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "3", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--length-groups", "2",
        "--data-dir", "data", "--resume-dir", str(trained_run),
    ])
    assert rc == 0
    csv = (trained_run / "losses_per_epoch.txt").read_text().strip()
    lines = csv.split("\n")
    assert len(lines) == 4  # header + 3 epochs (2 restored + 1 new)
    assert lines[-1].startswith("3,")


def test_eval_cli_respects_activation(workdir, trained_run):
    """A tanh-trained checkpoint must evaluate with tanh heads through the
    eval CLIs (round-1 bug: cosine_similarity/topk dropped `activation` from
    CLIPConfig and silently evaluated tanh checkpoints with relu heads)."""
    import jax

    from protein_clip_tpu.cli._clip_runner import similarity_fn
    from protein_clip_tpu.cli.cosine_similarity import main as cs_main
    from protein_clip_tpu.cli.main_2protein import main as train_main
    from protein_clip_tpu.cli import common
    from protein_clip_tpu.data.dataset import PairLoader, generate_datasets
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train.checkpoint import load_npz

    rc = train_main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--length-groups", "2", "--activation", "tanh",
        "--data-dir", "data", "--runs-dir", "runs_tanh",
    ])
    assert rc == 0
    ckpt = sorted(Path("runs_tanh").iterdir())[-1] / "best_model.npz"

    rc = cs_main(TINY + [
        "--checkpoint", str(ckpt), "--activation", "tanh",
        "--data-dir", "data", "--batch-size", "4",
        "--runs-dir", "runs_tanh_eval",
    ])
    assert rc == 0
    eval_run = sorted(Path("runs_tanh_eval").iterdir())[-1]
    # figure 3 = "Trained ... on Val Set": val loader is shuffle=False, so
    # its first batch is deterministic and reproducible here.
    cli_matrix = np.load(eval_run / "figures" / "figure 3.npy")

    esm_cfg = esm2.ESM2Config.tiny(compute_dtype=np.float32)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=np.float32)
    tokenizer = common.make_tokenizer()
    _, val_ds, _ = generate_datasets("data", "protein1", "protein2", seed=42)
    loader = PairLoader(val_ds, 4, shuffle=False, drop_last=True, seed=42)
    peps, recs = next(iter(loader))

    def matrix_for(activation):
        mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size,
                               activation=activation, esm=esm_cfg)
        params = load_npz(ckpt, clip.init_params(jax.random.key(0), mcfg))
        return similarity_fn(params, esm_params, mcfg, tokenizer)(peps, recs)

    np.testing.assert_allclose(cli_matrix, matrix_for("tanh"), atol=1e-5)
    assert not np.allclose(cli_matrix, matrix_for("relu"), atol=1e-3)


def test_embed_entry(workdir, trained_run):
    """Bulk-embedding CLI: npz out, values match the training-time encoder."""
    import jax
    import jax.numpy as jnp

    from protein_clip_tpu.cli import common
    from protein_clip_tpu.cli.embed import main as embed_main
    from protein_clip_tpu.data.fasta import parse_fasta
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.data.tokenizer import PAD_ID
    from protein_clip_tpu.train.checkpoint import load_npz

    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "emb.npz", "--batch-size", "8",
    ])
    assert rc == 0
    out = np.load("emb.npz")
    records = parse_fasta("data/protein1.fasta")
    assert out["embeddings"].shape == (len(records), 128)
    assert list(out["ids"]) == [r[0] for r in records]

    # spot-check value parity against the in-process encoder
    esm_cfg = esm2.ESM2Config.tiny(compute_dtype=np.float32)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=np.float32)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = load_npz(trained_run / "best_model.npz",
                      clip.init_params(jax.random.key(0), mcfg))
    tok = common.make_tokenizer()
    seqs = [records[i][1] for i in (0, 3)]
    enc = tok(seqs)
    ids = jnp.asarray(enc["input_ids"], jnp.int32)
    mask = (ids != PAD_ID).astype(jnp.int32)
    hidden = esm2.forward(esm_params, ids, mask, esm_cfg)
    want = np.asarray(clip.encode_side(
        params, "pep", hidden.astype(jnp.float32), mask, mcfg,
        train=False))
    np.testing.assert_allclose(out["embeddings"][[0, 3]], want, atol=1e-5)


def test_embed_pad_batch(workdir, trained_run):
    """pad_batch=True returns exact-shape values while the jit shape set
    stays on the pow2 row-count grid — the serving property: coalesced
    group sizes vary freely and must not each compile a program."""
    import jax

    from protein_clip_tpu.cli import common
    from protein_clip_tpu.cli.embed import _encode_fn, embed_sequences
    from protein_clip_tpu.models import clip, esm2
    from protein_clip_tpu.train.checkpoint import load_npz

    esm_cfg = esm2.ESM2Config.tiny(compute_dtype=np.float32)
    esm_params = esm2.init_params(jax.random.key(0), esm_cfg,
                                  dtype=np.float32)
    mcfg = clip.CLIPConfig(input_dim=esm_cfg.hidden_size, esm=esm_cfg)
    params = load_npz(trained_run / "best_model.npz",
                      clip.init_params(jax.random.key(0), mcfg))
    tok = common.make_tokenizer()
    rng = np.random.default_rng(7)
    aas = list("LAGVSERTIDPKQNFYMHWC")
    # equal lengths -> one pad bucket, so cache growth counts row shapes
    seqs = ["".join(rng.choice(aas, 37)) for _ in range(7)]

    want = embed_sequences(params, esm_params, seqs, "pep", mcfg, tok,
                           batch_size=8)
    encode = _encode_fn("pep", mcfg)
    base = encode._cache_size()
    got = embed_sequences(params, esm_params, seqs, "pep", mcfg, tok,
                          batch_size=8, pad_batch=True)  # 7 rows -> 8
    np.testing.assert_allclose(got, want, atol=1e-6)
    for n in (1, 2, 3, 5, 6):  # every size rides {1,2,4,8}
        sub = embed_sequences(params, esm_params, seqs[:n], "pep", mcfg,
                              tok, batch_size=8, pad_batch=True)
        np.testing.assert_allclose(sub, want[:n], atol=1e-6)
    assert encode._cache_size() - base <= 4, "non-pow2 shape compiled"


def test_packed_training_entry(workdir, trained_run):
    """--packed path through the real CLI (fresh run dir); rides along
    --grad-clip to keep the clipped-optimizer wiring covered end to end."""
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--packed", "--data-dir", "data",
        "--runs-dir", "runs_packed", "--grad-clip", "1.0",
    ])
    assert rc == 0
    run = sorted(Path("runs_packed").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))


def test_tiered_packed_training_entry(workdir, trained_run):
    """--packed --pack-tiers 4 through the real CLI: fixture receptors
    (60-180 aa) straddle the 128/256 tier split, so the epoch loop runs
    genuinely tiered batches end to end."""
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--packed", "--pack-tiers", "4",
        "--data-dir", "data", "--runs-dir", "runs_tiered",
    ])
    assert rc == 0
    run = sorted(Path("runs_tiered").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))


def test_filip_training_entry_packed(workdir, trained_run, capsys):
    """FILIP CLI end-to-end with --packed (packed backbone + token
    scatter-back; train/filip_packed.py), then late-interaction top-k
    retrieval on the trained checkpoint (topk --filip)."""
    from protein_clip_tpu.cli.main_2protein_filip import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--num-chunks", "2",
        "--packed", "--data-dir", "data", "--runs-dir", "runs_filip",
    ])
    assert rc == 0
    run = sorted(Path("runs_filip").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))

    from protein_clip_tpu.cli.topk import main as topk_main
    rc = topk_main(TINY + [
        "--checkpoint", str(run / "best_model.npz"), "--filip",
        "--data-dir", "data", "--batch-size", "4", "--num-chunks", "2",
        "--n-candidates", "16", "--split", "train",
        "--runs-dir", "runs_filip_topk",
    ])
    assert rc == 0
    assert "top-1 accuracy:" in capsys.readouterr().out


def test_filip_training_entry_packed_finetune(workdir, trained_run):
    """FILIP CLI with --finetune --packed (the packed token-level
    two-pass, train/filip_finetune.make_train_step_packed): runs end to
    end in bf16, checkpoint carries the combined {heads, esm} pytree."""
    from protein_clip_tpu.cli.main_2protein_filip import main
    rc = main([
        "--esm-config", "tiny", "--esm-dtype", "bfloat16",
        "--epochs", "1", "--batch-size", "4", "--finetune",
        "--backbone-lr", "1e-4", "--packed",
        "--data-dir", "data", "--runs-dir", "runs_filip_ft",
    ])
    assert rc == 0
    run = sorted(Path("runs_filip_ft").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    ckpt = np.load(run / "best_model.npz")
    assert any(k.startswith("heads/") for k in ckpt.files)
    assert any(k.startswith("esm/") for k in ckpt.files)


def test_retrieve_entry(workdir, trained_run):
    """Retrieval CLI: index via cli.embed, query it, check self-retrieval
    (same side + same sequences => top-1 hit is the query itself) and the
    TSV contract."""
    from protein_clip_tpu.cli.embed import main as embed_main
    from protein_clip_tpu.cli.retrieve import main as retrieve_main
    from protein_clip_tpu.data.fasta import parse_fasta

    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "index.npz", "--batch-size", "8",
    ])
    assert rc == 0
    rc = retrieve_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--index", "index.npz", "--queries", "data/protein1.fasta",
        "--side", "pep", "--k", "3", "--out", "hits.tsv",
        "--batch-size", "8",
    ])
    assert rc == 0
    lines = Path("hits.tsv").read_text().splitlines()
    assert lines[0] == "query_id\trank\thit_id\tscore"
    records = parse_fasta("data/protein1.fasta")
    assert len(lines) == 1 + 3 * len(records)
    top1 = {}
    for ln in lines[1:]:
        qid, rank, hit, score = ln.split("\t")
        float(score)
        if rank == "1":
            top1[qid] = hit
    hits = sum(top1[r[0]] == r[0] for r in records)
    assert hits / len(records) > 0.7, top1


def test_serve_filip_entry(workdir, trained_run):
    """Online FILIP serving (serve --filip): token-level /embed (JSON +
    binary with int32 lengths body-prefix), late-interaction /topk
    self-retrieval, and
    loud refusal of a pooled index."""
    import json as json_mod
    import threading
    import urllib.request

    from protein_clip_tpu.cli.embed import (embed_sequences_tokens,
                                            main as embed_main)
    from protein_clip_tpu.cli.serve import (ClipService, build_argparser,
                                            make_server)
    from protein_clip_tpu.data.fasta import parse_fasta

    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "serve_tindex.npz", "--batch-size", "8", "--filip",
    ])
    assert rc == 0

    pooled_args = build_argparser().parse_args(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--index", "serve_index_pooled.npz", "--port", "0", "--filip",
    ])
    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "serve_index_pooled.npz", "--batch-size", "8",
    ])
    assert rc == 0
    with pytest.raises(ValueError, match="token-level"):
        ClipService(pooled_args)

    args = build_argparser().parse_args(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--index", "serve_tindex.npz", "--port", "0", "--batch-size", "8",
        "--filip",
    ])
    server = make_server(args)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def call(path, payload=None, headers=None):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json", **(headers or {})})
        return urllib.request.urlopen(req, timeout=120)

    try:
        health = json_mod.loads(call("/healthz").read())
        assert health["filip"] is True and health["index_size"] > 0

        records = parse_fasta("data/protein1.fasta")[:4]
        seqs = [r[1] for r in records]
        out = json_mod.loads(call("/embed", {"sequences": seqs,
                                             "side": "pep"}).read())
        got_t = np.asarray(out["tokens"], np.float32)
        got_l = out["lengths"]

        svc = ClipService(args)
        want_t, want_m = embed_sequences_tokens(
            svc.params, svc.esm_params, seqs, "pep", svc.fcfg,
            svc.tokenizer, batch_size=8)
        assert got_l == [int(m.sum()) for m in want_m]
        # rows may be padded to different common T; compare the real span
        t = min(got_t.shape[1], want_t.shape[1])
        np.testing.assert_allclose(got_t[:, :t], want_t[:, :t], atol=1e-6)

        with call("/embed", {"sequences": seqs, "side": "pep"},
                  {"Accept": "application/octet-stream"}) as r:
            shape = tuple(int(d) for d in r.headers["X-Shape"].split(","))
            # per-row lengths ride an int32 BODY prefix (a header line caps
            # at 64 KiB in http.client; ADVICE r3), declared by X-Prefix-Len
            n_pre = int(r.headers["X-Prefix-Len"])
            assert r.headers["X-Prefix-Dtype"] == "<i4"
            body = r.read()
            lens = np.frombuffer(body[:4 * n_pre], "<i4").tolist()
            raw = np.frombuffer(body[4 * n_pre:], "<f4").reshape(shape)
        assert lens == got_l and shape == got_t.shape
        np.testing.assert_array_equal(raw, got_t)

        hits = json_mod.loads(call("/topk", {"queries": seqs, "side": "pep",
                                             "k": 3}).read())["hits"]
        assert len(hits) == len(seqs) and all(len(h) == 3 for h in hits)
        top1 = sum(h[0]["id"] == r[0] for h, r in zip(hits, records))
        assert top1 >= len(seqs) - 1, [h[0] for h in hits]
    finally:
        server.shutdown()
        server.server_close()


def test_retrieve_filip_entry(workdir, trained_run):
    """Late-interaction retrieval: token-level index via `embed --filip`,
    queried with `retrieve --filip` (fused max-sim scoring). Self-retrieval
    must be near-perfect — identical token sets make the diagonal the
    maximum possible mean-max cosine."""
    from protein_clip_tpu.cli.embed import main as embed_main
    from protein_clip_tpu.cli.retrieve import main as retrieve_main
    from protein_clip_tpu.data.fasta import parse_fasta

    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "tindex.npz", "--batch-size", "8", "--filip",
    ])
    assert rc == 0
    with np.load("tindex.npz") as idx:
        # ragged format (ADVICE r3): trimmed rows concatenated + lengths,
        # so one long outlier can't pad the whole index to its width
        assert {"ids", "tokens", "lengths"} <= set(idx.files)
        assert idx["tokens"].ndim == 2 and idx["lengths"].ndim == 1
        assert idx["tokens"].shape[0] == int(idx["lengths"].sum())
        assert len(idx["ids"]) == len(idx["lengths"])

    rc = retrieve_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--index", "tindex.npz", "--queries", "data/protein1.fasta",
        "--side", "pep", "--k", "3", "--out", "fhits.tsv",
        "--batch-size", "8", "--filip",
    ])
    assert rc == 0
    lines = Path("fhits.tsv").read_text().splitlines()
    assert lines[0] == "query_id\trank\thit_id\tscore"
    records = parse_fasta("data/protein1.fasta")
    assert len(lines) == 1 + 3 * len(records)
    top1 = {}
    for ln in lines[1:]:
        qid, rank, hit, score = ln.split("\t")
        float(score)
        if rank == "1":
            top1[qid] = hit
    hits = sum(top1[r[0]] == r[0] for r in records)
    assert hits / len(records) > 0.7, top1

    # --filip against a pooled index must refuse loudly
    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "pooled.npz", "--batch-size", "8",
    ])
    assert rc == 0
    with pytest.raises(ValueError, match="token-level"):
        retrieve_main(TINY + [
            "--checkpoint", str(trained_run / "best_model.npz"),
            "--index", "pooled.npz", "--queries", "data/protein1.fasta",
            "--side", "pep", "--filip",
        ])


@pytest.mark.parametrize("mode", ["--finetune", "--lora-rank"])
def test_mlm_unfrozen_entries(workdir, trained_run, mode):
    """MLM continued pretraining through the real CLI: --finetune trains
    the backbone itself (combined {esm, head} checkpoint), --lora-rank
    trains adapters over the frozen base ({lora, head})."""
    from protein_clip_tpu.cli.mlm_train import main
    extra = [mode] if mode == "--finetune" else [mode, "4"]
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--mask-prob", "0.2",
        "--backbone-lr", "1e-4", "--data-dir", "data",
        "--prefix-a", "protein1", "--prefix-b", "protein2",
        "--runs-dir", f"runs_mlm_{mode.strip('-')}",
    ] + extra)
    assert rc == 0
    run = sorted(Path(f"runs_mlm_{mode.strip('-')}").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    ckpt = np.load(run / "best_model.npz")
    want = "esm/" if mode == "--finetune" else "lora/"
    assert any(k.startswith(want) for k in ckpt.files)
    assert any(k.startswith("head/") for k in ckpt.files)


def test_mlm_packed_entry(workdir, trained_run):
    """--packed MLM through the real CLI: head-only training over packed
    rows (segment-aware token-dropout ratios; loss exact vs unpacked,
    tests/test_mlm.py)."""
    from protein_clip_tpu.cli.mlm_train import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--mask-prob", "0.2",
        "--data-dir", "data", "--prefix-a", "protein1",
        "--prefix-b", "protein2", "--runs-dir", "runs_mlm_packed",
        "--packed",
    ])
    assert rc == 0
    run = sorted(Path("runs_mlm_packed").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    assert (run / "best_model.npz").exists()


def test_mlm_packed_dp_entry(workdir, trained_run):
    """--packed --dp 2 MLM: packed rows dealt over a 2-device data mesh
    (parallel/mlm_step.make_sharded_packed_mlm_train_step; exact global-
    mean parity in tests/test_parallel.py)."""
    from protein_clip_tpu.cli.mlm_train import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--mask-prob", "0.2",
        "--data-dir", "data", "--prefix-a", "protein1",
        "--prefix-b", "protein2", "--runs-dir", "runs_mlm_packed_dp",
        "--packed", "--dp", "2",
    ])
    assert rc == 0
    run = sorted(Path("runs_mlm_packed_dp").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    assert (run / "best_model.npz").exists()


def test_mlm_dp_tp_entry(workdir, trained_run):
    """--dp 2 --tp 2 MLM (VERDICT r4 #7): the backbone carries Megatron
    splits over the GSPMD 'model' axis; per-epoch losses must match the
    dp2-only run (same data seed, same fold_in(data-index) mask keys —
    exact-step parity in tests/test_parallel.py::
    test_sharded_mlm_step_composes_with_tp)."""
    from protein_clip_tpu.cli.mlm_train import main

    def losses(runs_dir, extra):
        rc = main(TINY + [
            "--epochs", "1", "--batch-size", "4", "--mask-prob", "0.2",
            "--data-dir", "data", "--prefix-a", "protein1",
            "--prefix-b", "protein2", "--runs-dir", runs_dir,
        ] + extra)
        assert rc == 0
        run = sorted(Path(runs_dir).iterdir())[-1]
        csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
        _, tr, va = csv[1].split(",")
        return float(tr), float(va)

    tr_dp, va_dp = losses("runs_mlm_dp2", ["--dp", "2"])
    tr_tp, va_tp = losses("runs_mlm_dp2tp2", ["--dp", "2", "--tp", "2"])
    np.testing.assert_allclose(tr_tp, tr_dp, rtol=2e-4)
    np.testing.assert_allclose(va_tp, va_dp, rtol=2e-4)


def test_mlm_lora_packed_dp_entry(workdir, trained_run):
    """--lora-rank --packed --dp 2 MLM: continued pretraining over the data
    mesh with adapters and packed rows composed (exact parity in
    tests/test_parallel.py::test_sharded_mlm_finetune_step_matches_manual)."""
    from protein_clip_tpu.cli.mlm_train import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--mask-prob", "0.2",
        "--data-dir", "data", "--prefix-a", "protein1",
        "--prefix-b", "protein2", "--runs-dir", "runs_mlm_lora_dp",
        "--packed", "--dp", "2", "--lora-rank", "2",
    ])
    assert rc == 0
    run = sorted(Path("runs_mlm_lora_dp").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    ckpt = np.load(run / "best_model.npz")
    assert any(k.startswith("lora/") for k in ckpt.files)


def test_lora_training_entry(workdir, trained_run, capsys):
    """--lora-rank through the real CLI: adapters train against the frozen
    base, best_model.npz carries {lora, heads}, and topk auto-detects it
    (merging adapters into the base backbone at eval)."""
    from protein_clip_tpu.cli.main_2protein import main
    rc = main(TINY + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--lora-rank", "4", "--backbone-lr", "1e-3",
        "--data-dir", "data", "--runs-dir", "runs_lora",
    ])
    assert rc == 0
    run = sorted(Path("runs_lora").iterdir())[-1]
    ckpt = np.load(run / "best_model.npz")
    assert any(k.startswith("lora/attn/q/a") for k in ckpt.files)
    assert any(k.startswith("heads/") for k in ckpt.files)
    assert not any(k.startswith("esm/") for k in ckpt.files)

    from protein_clip_tpu.cli.topk import main as topk_main
    rc = topk_main(TINY + [
        "--checkpoint", str(run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
        "--n-candidates", "16", "--split", "train",
        "--runs-dir", "runs_lora_topk",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "LoRA adapters found (rank 4)" in out
    assert "top-1 accuracy:" in out


def test_serve_entry(workdir, trained_run):
    """HTTP serving (cli/serve.py): /healthz, /embed (matches the offline
    encoder bit-for-bit), /topk self-retrieval against a cli.embed index,
    and input-validation errors — all over a real localhost socket."""
    import json as json_mod
    import threading
    import urllib.request

    from protein_clip_tpu.cli.embed import embed_sequences, main as embed_main
    from protein_clip_tpu.cli.serve import build_argparser, make_server
    from protein_clip_tpu.data.fasta import parse_fasta

    rc = embed_main(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--fasta", "data/protein1.fasta", "--side", "pep",
        "--out", "serve_index.npz", "--batch-size", "8",
    ])
    assert rc == 0

    args = build_argparser().parse_args(TINY + [
        "--checkpoint", str(trained_run / "best_model.npz"),
        "--index", "serve_index.npz", "--port", "0", "--batch-size", "8",
    ])
    server = make_server(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"

    def call(path, payload=None, expect=200):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else json_mod.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == expect
                return json_mod.loads(r.read())
        except urllib.error.HTTPError as e:
            assert e.code == expect, (e.code, e.read())
            return json_mod.loads(e.read())

    try:
        health = call("/healthz")
        assert health["status"] == "ok" and health["index_size"] > 0

        records = parse_fasta("data/protein1.fasta")[:6]
        seqs = [r[1] for r in records]
        out = call("/embed", {"sequences": seqs, "side": "pep"})
        got = np.asarray(out["embeddings"], np.float32)

        from protein_clip_tpu.cli.serve import ClipService
        svc = ClipService(args)
        want = embed_sequences(svc.params, svc.esm_params, seqs, "pep",
                               svc.mcfg, svc.tokenizer, batch_size=8)
        np.testing.assert_allclose(got, want, atol=1e-6)

        # binary wire (Accept: octet-stream): raw <f4 rows, shape in
        # X-Shape, bit-identical to the JSON path's float32 payload
        breq = urllib.request.Request(
            base + "/embed",
            data=json_mod.dumps({"sequences": seqs, "side": "pep"}).encode(),
            headers={"Content-Type": "application/json",
                     "Accept": "application/octet-stream"})
        with urllib.request.urlopen(breq, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "application/octet-stream"
            shape = tuple(int(d) for d in r.headers["X-Shape"].split(","))
            assert r.headers["X-Dtype"] == "<f4"
            raw = np.frombuffer(r.read(), "<f4").reshape(shape)
        assert shape == (len(seqs), int(want.shape[1]))
        # same server, same warm jit cache: the binary body must be the
        # very floats the JSON path serialized
        np.testing.assert_array_equal(raw, got)

        # HTTP/1.1 keep-alive: two requests over ONE connection
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        for i in (0, 1):
            conn.request("POST", "/embed",
                         json_mod.dumps({"sequences": [seqs[i]],
                                         "side": "pep"}),
                         {"Content-Type": "application/json"})
            r = conn.getresponse()
            ka = np.asarray(json_mod.loads(r.read())["embeddings"],
                            np.float32)[0]
            np.testing.assert_allclose(ka, want[i], atol=1e-5)
        conn.close()

        hits = call("/topk", {"queries": seqs, "side": "pep", "k": 3})["hits"]
        assert len(hits) == len(seqs) and all(len(h) == 3 for h in hits)
        top1 = sum(h[0]["id"] == r[0] for h, r in zip(hits, records))
        assert top1 >= len(seqs) - 1, [h[0] for h in hits]

        # concurrent single-sequence requests: the adaptive coalescer must
        # return each caller ITS rows (whatever batching happened), equal
        # to the batch encode of the same sequences
        results = [None] * len(seqs)
        barrier = threading.Barrier(len(seqs))

        def one(i):
            barrier.wait()
            out = call("/embed", {"sequences": [seqs[i]], "side": "pep"})
            results[i] = np.asarray(out["embeddings"], np.float32)[0]

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(len(seqs))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert all(r is not None for r in results)
        np.testing.assert_allclose(np.stack(results), want, atol=1e-5)

        # /metrics: worker-side counters reflect the traffic above
        m = call("/metrics")
        assert m["requests"] >= 3 + len(seqs)
        assert m["sequences"] >= m["requests"]  # batch requests carry >1
        assert 1 <= m["device_batches"] <= m["requests"]
        assert m["mean_requests_per_batch"] >= 1.0
        assert m["encode_ema_ms"] > 0 and m["index_size"] > 0

        err = call("/embed", {"sequences": []}, expect=400)
        assert "non-empty" in err["error"]
        err = call("/embed", {"sequences": ["MKV"], "side": "x"}, expect=400)
        assert "side" in err["error"]
        err = call("/nope", {"sequences": ["MKV"]}, expect=404)
        assert "unknown path" in err["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_finetune_training_entry(workdir, trained_run, capsys):
    """--finetune through the real CLI: unfrozen backbone trains end to
    end, best_model.npz carries the combined {heads, esm} pytree, and
    topk auto-detects it (evaluating with the checkpoint's OWN backbone).

    Runs bf16 (the shipping compute dtype): the f32 master copy fed to a
    bf16-config eval flips the layer-scan carry dtype — viz/eval views
    must cast first, and this catches it where f32 tests cannot."""
    from protein_clip_tpu.cli.main_2protein import main
    BF16 = ["--esm-config", "tiny", "--esm-dtype", "bfloat16"]
    rc = main(BF16 + [
        "--epochs", "1", "--batch-size", "4", "--accumulated-batches", "2",
        "--num-chunks", "2", "--finetune", "--backbone-lr", "1e-4",
        "--data-dir", "data", "--runs-dir", "runs_finetune",
    ])
    assert rc == 0
    run = sorted(Path("runs_finetune").iterdir())[-1]
    csv = (run / "losses_per_epoch.txt").read_text().strip().split("\n")
    assert len(csv) == 2 and csv[1].startswith("1,")
    _, tr, va = csv[1].split(",")
    assert np.isfinite(float(tr)) and np.isfinite(float(va))
    ckpt = np.load(run / "best_model.npz")
    assert any(k.startswith("heads/") for k in ckpt.files)
    assert any(k.startswith("esm/") for k in ckpt.files)

    from protein_clip_tpu.cli.topk import main as topk_main
    rc = topk_main(BF16 + [
        "--checkpoint", str(run / "best_model.npz"),
        "--data-dir", "data", "--batch-size", "4",
        "--n-candidates", "16", "--split", "train",
        "--runs-dir", "runs_finetune_topk",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "finetuned backbone found" in out
    assert "top-1 accuracy:" in out

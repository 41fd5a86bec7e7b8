"""Data pipeline: native clusterer, TSV contract, split/sampler semantics."""

import random
from pathlib import Path

import numpy as np
import pytest

from protein_clip_tpu.data import cluster as cluster_mod
from protein_clip_tpu.data import synthetic
from protein_clip_tpu.data.dataset import (
    ClusterPairDataset, PairLoader, build_pair_clusters, generate_datasets,
    split_clusters,
)
from protein_clip_tpu.data.fasta import parse_fasta, sequences_only, write_fasta


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    synthetic.write_fixture(d, n_families=12, seed=7)
    return d


def test_fasta_roundtrip(tmp_path):
    recs = [("a", "MKTV"), ("b_chain", "ACDEFG")]
    p = tmp_path / "x.fasta"
    write_fasta(p, recs)
    assert parse_fasta(p) == recs
    assert sequences_only(p) == ["MKTV", "ACDEFG"]


def test_native_clusterer_groups_families():
    rng = random.Random(0)
    peps, recs = synthetic.make_pair_corpus(
        n_families=8, members_per_family=(3, 3), mutation_rate=0.05, seed=3)
    reps = cluster_mod.cluster_indices(recs, min_seq_id=0.5)
    # family members (95% identical) must co-cluster
    n_clusters = len(set(reps))
    assert n_clusters == 8, f"expected 8 family clusters, got {n_clusters}"
    for fam in range(8):
        fam_reps = {reps[fam * 3 + j] for j in range(3)}
        assert len(fam_reps) == 1


def test_native_clusterer_separates_unrelated():
    rng = random.Random(1)
    seqs = ["".join(rng.choice(synthetic.AA) for _ in range(100))
            for _ in range(20)]
    reps = cluster_mod.cluster_indices(seqs, min_seq_id=0.5)
    assert len(set(reps)) == 20  # random sequences don't reach 50% identity


def test_identical_sequences_cocluster():
    seqs = ["MKTVRQERLKSIVRILERSKEPVSGAQLAEE"] * 3 + ["ACDEFGHIKLMNPQRSTVWY"]
    reps = cluster_mod.cluster_indices(seqs, min_seq_id=0.9)
    assert reps[0] == reps[1] == reps[2]
    assert reps[3] != reps[0]


def test_tsv_contract(tmp_path):
    ids = ["r0", "r1", "r2"]
    seqs = ["MKTVRQERLKSIVRILE"] * 2 + ["ACDEFGHIKLMNPQRSTVWY"]
    tsv = tmp_path / "c.tsv"
    cluster_mod.cluster_to_tsv(ids, seqs, tsv)
    lines = tsv.read_text().strip().split("\n")
    assert all(len(l.split("\t")) == 2 for l in lines)
    clusters = cluster_mod.load_cluster_tsv(tsv)
    assert clusters["r0"] == ["r0", "r1"]
    assert clusters["r2"] == ["r2"]


def test_split_clusters_seeded():
    ids = [f"c{i}" for i in range(100)]
    tr, va, te = split_clusters(ids, seed=42)
    assert len(tr) == 70 and len(va) == 15 and len(te) == 15
    assert sorted(tr + va + te) == sorted(ids)
    tr2, va2, te2 = split_clusters(ids, seed=42)
    assert (tr, va, te) == (tr2, va2, te2)
    tr3, _, _ = split_clusters(ids, seed=43)
    assert tr != tr3


def test_dataset_resamples_each_access():
    clusters = {"c": [("p1", "r1"), ("p2", "r2"), ("p3", "r3")]}
    ds = ClusterPairDataset(clusters, ["c"], seed=0)
    seen = {ds[0] for _ in range(50)}
    assert len(seen) == 3  # all members eventually sampled


def test_empty_cluster_returns_empty_pair():
    ds = ClusterPairDataset({"c": []}, ["c"])
    assert ds[0] == ("", "")


def test_loader_drop_last_and_shuffle():
    clusters = {f"c{i}": [(f"p{i}", f"r{i}")] for i in range(10)}
    ds = ClusterPairDataset(clusters, list(clusters), seed=0)
    loader = PairLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert all(len(b[0]) == 4 for b in batches)
    # second epoch shuffles differently
    batches2 = list(loader)
    assert batches != batches2


def test_loader_reseed_epoch_is_history_free():
    """reseed_epoch(k) must yield the same epoch-k stream regardless of how
    many epochs ran before — this is what makes --resume-dir replay the
    uninterrupted run's host randomness (shuffle AND member sampling)."""
    clusters = {f"c{i}": [(f"p{i}a", f"r{i}a"), (f"p{i}b", f"r{i}b")]
                for i in range(12)}

    def fresh_loader():
        ds = ClusterPairDataset(clusters, list(clusters), seed=7)
        return PairLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                          seed=3)

    straight = fresh_loader()
    epochs = []
    for e in range(4):
        straight.reseed_epoch(e)
        epochs.append(list(straight))

    resumed = fresh_loader()
    list(resumed)  # unrelated pre-resume consumption perturbs raw RNG state
    for e in (2, 3):
        resumed.reseed_epoch(e)
        assert list(resumed) == epochs[e]
    # distinct epochs still differ (not a constant stream)
    assert epochs[0] != epochs[1]


def test_generate_datasets_end_to_end(fixture_dir):
    tr, va, te = generate_datasets(fixture_dir, seed=42)
    assert len(tr) > 0 and len(va) > 0 and len(te) > 0
    # cluster-level disjointness
    assert set(tr.cluster_ids).isdisjoint(va.cluster_ids)
    assert set(tr.cluster_ids).isdisjoint(te.cluster_ids)
    p, r = tr[0]
    assert isinstance(p, str) and isinstance(r, str) and len(r) > 0
    # idempotence: TSV is cached
    assert (Path(fixture_dir) / "receptorDB_clustered.tsv").exists()
    tr2, _, _ = generate_datasets(fixture_dir, seed=42)
    assert tr2.cluster_ids == tr.cluster_ids


def test_build_pair_clusters_duplicate_b_collapses():
    # zip-dict semantics: duplicate B seq maps to the LAST paired A
    side_a = ["a1", "a2"]
    side_b = ["SAME", "SAME"]
    tsv = {"r0": ["r0", "r1"]}
    id_to_seq = {"r0": "SAME", "r1": "SAME"}
    out = build_pair_clusters(side_a, side_b, ["r0", "r1"], tsv, id_to_seq)
    assert out == {"r0": [("a2", "SAME"), ("a2", "SAME")]}


def test_max_sequence_length_filter(tmp_path):
    write_fasta(tmp_path / "peptide.fasta",
                [("p0", "MK"), ("p1", "MKTV")])
    write_fasta(tmp_path / "receptor.fasta",
                [("r0", "ACDEFGHIKL"), ("r1", "A" * 50)])
    tr, va, te = generate_datasets(tmp_path, max_sequence_length=20, seed=0)
    all_pairs = [ds[i] for ds in (tr, va, te) for i in range(len(ds))]
    assert all(len(r) <= 20 for _, r in all_pairs)

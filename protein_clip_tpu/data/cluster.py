"""Sequence clustering at min-seq-id — drives the cluster-level data split.

Three interchangeable producers behind one TSV-shaped contract
(rep_id -> member_ids, byte-compatible with the reference's
``mmseqs createtsv`` output consumed at data_utils.py:143-150):

1. the bundled native C++ greedy clusterer (default, hermetic);
2. an external real ``mmseqs`` binary when present (escape hatch);
3. a cached TSV on disk (idempotent re-runs, like the reference's
   data/<db>_clustered.tsv caching at data_utils.py:126).
"""

from __future__ import annotations

import ctypes
import shutil
import subprocess
import tempfile
from pathlib import Path

from .native.build import build_library

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        path = build_library("cluster")
        lib = ctypes.CDLL(str(path))
        lib.pct_cluster.restype = ctypes.c_int
        lib.pct_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    return _LIB


def cluster_indices(seqs: list[str], min_seq_id: float = 0.5,
                    band: int = 16) -> list[int]:
    """rep_index[i] = original index of the representative of seqs[i]."""
    n = len(seqs)
    if n == 0:
        return []
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in seqs])
    out = (ctypes.c_int * n)()
    rc = _lib().pct_cluster(arr, n, float(min_seq_id), int(band), out)
    if rc < 0:
        raise RuntimeError("pct_cluster failed")
    return list(out)


def cluster_to_tsv(ids: list[str], seqs: list[str], tsv_path: str | Path,
                   min_seq_id: float = 0.5) -> None:
    """Write the mmseqs-format TSV: '<rep_id>\\t<member_id>' per sequence."""
    reps = cluster_indices(seqs, min_seq_id)
    with open(tsv_path, "w") as f:
        for i, rep in enumerate(reps):
            f.write(f"{ids[rep]}\t{ids[i]}\n")


def mmseqs_available() -> bool:
    return shutil.which("mmseqs") is not None


def cluster_with_mmseqs(fasta_path: str | Path, tsv_path: str | Path,
                        min_seq_id: float = 0.5) -> None:
    """Escape hatch: real mmseqs2, same three commands as the reference
    (data_utils.py:126-134)."""
    fasta_path = Path(fasta_path)
    tsv_path = Path(tsv_path)
    with tempfile.TemporaryDirectory() as tmp:
        db = Path(tmp) / "DB"
        clu = Path(tmp) / "DB_clustered"
        for cmd in (
            ["mmseqs", "createdb", str(fasta_path), str(db)],
            ["mmseqs", "cluster", str(db), str(clu), str(Path(tmp) / "tmp"),
             "--min-seq-id", str(min_seq_id)],
            ["mmseqs", "createtsv", str(db), str(db), str(clu), str(tsv_path)],
        ):
            subprocess.run(cmd, check=True, capture_output=True)


def load_cluster_tsv(tsv_path: str | Path) -> dict[str, list[str]]:
    """TSV -> {rep_id: [member_ids]} preserving file order
    (the reference's in-order dict build, data_utils.py:143-150)."""
    clusters: dict[str, list[str]] = {}
    with open(tsv_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rep, member = line.split("\t")
            clusters.setdefault(rep, []).append(member)
    return clusters


def get_or_build_clusters(
    ids: list[str], seqs: list[str], tsv_path: str | Path,
    min_seq_id: float = 0.5, prefer_mmseqs: bool = False,
    fasta_path: str | Path | None = None,
) -> dict[str, list[str]]:
    """Idempotent: reuse cached TSV, else produce one and load it."""
    tsv_path = Path(tsv_path)
    if not tsv_path.exists():
        if prefer_mmseqs and mmseqs_available() and fasta_path is not None:
            cluster_with_mmseqs(fasta_path, tsv_path, min_seq_id)
        else:
            cluster_to_tsv(ids, seqs, tsv_path, min_seq_id)
    return load_cluster_tsv(tsv_path)

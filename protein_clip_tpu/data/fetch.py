"""Dataset acquisition (reference data_utils.py:75-110 / data_utils_2protein.py:88-166).

Disk-cached and idempotent like the reference: files already present are
never re-fetched. Network access is optional — environments without egress
use the synthetic fixture (cli --synthetic-fixture) or pre-staged files.
"""

from __future__ import annotations

from pathlib import Path

PROPEDIA_URLS = {
    "peptide.fasta":
        "http://bioinfo.dcc.ufmg.br/propedia/public/download/peptide.fasta",
    "receptor.fasta":
        "http://bioinfo.dcc.ufmg.br/propedia/public/download/receptor.fasta",
}


def download_propedia(data_dir: str | Path) -> None:
    """Fetch the two Propedia FASTAs (data_utils.py:87-96)."""
    import urllib.request

    data_dir = Path(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    for name, url in PROPEDIA_URLS.items():
        dest = data_dir / name
        if dest.exists():
            continue
        try:
            with urllib.request.urlopen(url, timeout=60) as r:
                dest.write_bytes(r.read())
        except Exception as e:
            raise RuntimeError(
                f"could not download {url} ({e}). In offline environments "
                f"stage {name} into {data_dir} manually or pass "
                f"--synthetic-fixture.") from e


def download_pdb_two_chain(data_dir: str | Path,
                           max_sequence_length: int = 2000,
                           limit: int | None = None) -> None:
    """Protein–protein corpus from the RCSB PDB (data_utils_2protein.py:88-145).

    Pure-Python re-implementation (no rcsbsearchapi/BioPython): see
    protein_clip_tpu.data.pdb. Requires network; offline environments stage
    the FASTAs manually or pass --synthetic-fixture.
    """
    data_dir = Path(data_dir)
    f1 = data_dir / "protein1.fasta"
    f2 = data_dir / "protein2.fasta"
    if f1.exists() and f2.exists():
        return
    from .pdb import build_two_chain_fastas
    try:
        build_two_chain_fastas(data_dir, max_sequence_length, limit=limit)
    except Exception as e:
        raise RuntimeError(
            f"PDB acquisition failed ({e}). In offline environments stage "
            f"protein1.fasta / protein2.fasta into {data_dir}, or pass "
            f"--synthetic-fixture.") from e
